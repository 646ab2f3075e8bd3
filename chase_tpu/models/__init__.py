"""Test-problem generators (the reference's example/test matrices)."""

from .generators import (  # noqa: F401
    clement, clement_eigenvalues, random_hermitian, random_pseudo_hermitian,
    structured_pseudo_hermitian, hermitian_sequence,
)
