"""Result-validation helpers.

The analogue of the reference's correctness guards (orthogonality
validation `nccl_validate_orthogonality`, nccl/householder_qr.hpp:292, and
the e2e tests' residual checks): quick assertions a user (or a test) runs
on a SolveResult against the original matrix.
"""

from __future__ import annotations

import numpy as np

__all__ = ["orthonormality_error", "residual_norms", "validate_result"]


def orthonormality_error(V) -> float:
    """max |VᴴV − I| of the eigenvector block."""
    V = np.asarray(V)
    G = V.conj().T @ V
    return float(np.abs(G - np.eye(V.shape[1])).max())


def residual_norms(H, V, evals) -> np.ndarray:
    """‖H v − λ v‖₂ per column, computed independently in numpy."""
    H = np.asarray(H)
    V = np.asarray(V)
    R = H @ V - V * np.asarray(evals)[None, :].astype(V.dtype)
    return np.linalg.norm(R, axis=0)


def validate_result(H, res, *, tol_factor: float = 100.0) -> dict:
    """Independent check of a SolveResult: recomputed residuals,
    orthonormality, and eigenvalue ordering.  Returns a report dict and
    raises AssertionError on violations.
    """
    nev = len(res.ritzv)
    V = np.asarray(res.V)[:, :nev]
    r = residual_norms(H, V, res.ritzv)
    oerr = orthonormality_error(V)
    report = {
        "max_residual": float(r.max()),
        "max_reported_residual": float(np.asarray(res.resid).max()),
        "orthonormality_error": oerr,
        "sorted": bool(np.all(np.diff(res.ritzv) >= -1e-12)),
    }
    scale = max(1.0, float(np.abs(res.ritzv).max()))
    assert report["sorted"], "eigenvalues not ascending"
    assert oerr < 1e-5 * np.sqrt(V.shape[0]), f"orthonormality {oerr}"
    if res.converged:
        assert r.max() <= tol_factor * max(res.resid.max(), 1e-300) + \
            1e-12 * scale, \
            f"recomputed residual {r.max()} disagrees with reported " \
            f"{res.resid.max()}"
    return report
