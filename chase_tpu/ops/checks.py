"""Structure checks: randomized (pseudo-)hermiticity probe, triangle mirror.

Mirrors linalg/internal/cpu/symOrHerm.hpp:44-140 (checkSymmetryEasy: a
randomized u=Hv vs uᵀ=Hᴴv probe with tol = 10·N·ε, symOrHermMatrix triangle
mirroring) and checkPseudoHermicityEasy (chase_cpu.hpp:272-285: flip,
symmetry-check, flip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import real_dtype
from .pseudo import apply_s

__all__ = ["check_hermitian", "check_pseudo_hermitian", "force_hermitian"]


@partial(jax.jit, static_argnames=("precision",))
def _herm_probe(H, v, *, precision="highest"):
    u = jnp.matmul(H, v, precision=precision)
    ut = jnp.matmul(H.conj().T, v, precision=precision)
    return jnp.linalg.norm(u - ut).real, jnp.linalg.norm(u).real


def check_hermitian(H, key=None, *, precision="highest") -> bool:
    """Randomized Hermitian check: ‖Hv − Hᴴv‖ ≤ 10·N·ε·‖Hv‖."""
    if key is None:
        key = jax.random.key(0)
    N = H.shape[0]
    v = jax.random.normal(key, (N, 1), dtype=H.dtype)
    diff, scale = _herm_probe(H, v, precision=precision)
    eps = np.finfo(np.dtype(real_dtype(H.dtype))).eps
    return bool(diff <= 10.0 * N * eps * max(float(scale), 1e-300))


def check_pseudo_hermitian(H, key=None, *, precision="highest") -> bool:
    """Randomized S-pseudo-hermiticity check: S·H must be Hermitian."""
    if key is None:
        key = jax.random.key(0)
    return check_hermitian(apply_s(H), key, precision=precision)


@partial(jax.jit, static_argnames=("upper",))
def force_hermitian(H, *, upper: bool = True):
    """Mirror one triangle onto the other (symOrHermMatrix analogue)."""
    U = jnp.triu(H, 1)
    Ld = jnp.tril(H, -1)
    d = jnp.diag(jnp.diagonal(H).real.astype(H.dtype))
    if upper:
        return U + U.conj().T + d
    return Ld + Ld.conj().T + d
