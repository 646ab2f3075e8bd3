"""Rayleigh–Ritz projection fused with residual computation.

TPU-native redesign of the reference's RR + Resd pair
(linalg/internal/cpu/rayleighRitz.hpp:60-112 and cpu/residuals.hpp:56-83).

Key deviations, all TPU-motivated:

* **Static shapes**: the reference projects only the active columns
  ``Q[:, locked:]`` (shrinking shapes every iteration).  We always project
  the full ``nev+nex`` block but zero the locked columns and pin their
  projected diagonal entries to a value strictly above the spectrum of the
  active block (``2·‖A‖_F + 1``).  The small eigenproblem then decouples
  exactly: the locked slots produce eigenpairs (big, e_j) that sort to the
  tail of the ascending `eigh` output and are discarded.  One XLA program
  serves every ``locked``.
* **Fusion**: the reference runs two full HEMMs per iteration — ``W = H·Q``
  inside RR and a second ``H·V`` inside Resd.  Here residuals reuse
  ``(H·Q)·Z = H·(Q·Z)``, eliminating one N×N×k matmul per iteration
  (the second-hottest op after the filter).
* The rotated eigenvector block is *rolled* right by ``locked`` so callers
  can merge it into the full V with a column mask.
* ``small_dense="host"`` routes the k×k projected eigh through host LAPACK
  in full f64 between two jitted halves (a split-sync, NOT a
  ``pure_callback`` — some PJRT backends don't implement host callbacks).
  This is the redundant-heevd + RR_DOUBLE_PRECISION analogue (P8,
  mpi/rayleighRitz.hpp:147-180): the k×k transfer is tiny and on
  accelerators where the dense eigensolver is slow or f64 is emulated it
  removes the dominant phase at large nev (measured: RR was 60% of a
  N=30000/nev=2250 solve on one v5e chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import real_dtype

__all__ = ["rayleigh_ritz_residuals", "host_eigh_f64"]


def host_eigh_f64(A_h, rt):
    """Host LAPACK eigh of the projected matrix in full f64/c128; results
    cast back to the problem precision.  Shared by the split-sync host
    path below and the fused solver's pure_callback."""
    wide = np.complex128 if np.iscomplexobj(A_h) else np.float64
    w, Z = np.linalg.eigh(np.asarray(A_h).astype(wide))
    return w.astype(np.dtype(rt)), Z.astype(A_h.dtype)


def _pin_locked(A, active, rt):
    """Decouple the locked slots: eigh(A + big·diag(1-active)) has
    eigenpairs (big, e_j) there, and ‖A‖_F ≥ λ_max keeps them strictly
    above the active spectrum."""
    big = 2 * jnp.linalg.norm(A).real.astype(rt) + 1
    return A + jnp.diag(jnp.where(active, jnp.zeros((), rt),
                                  big)).astype(A.dtype)


@partial(jax.jit, static_argnames=("precision",))
def _rr_project(H, V, locked, *, precision="highest"):
    """Device half 1: masked block, H·Q, pinned projected matrix."""
    k = V.shape[1]
    rt = real_dtype(V.dtype)
    active = jnp.arange(k) >= locked
    Q = jnp.where(active[None, :], V, jnp.zeros((), V.dtype))
    W = jnp.matmul(H, Q, precision=precision)            # H·Q (one big HEMM)
    A = jnp.matmul(Q.conj().T, W, precision=precision)   # QᴴHQ, k×k
    return Q, W, _pin_locked(A, active, rt)


@partial(jax.jit, static_argnames=("precision",))
def _rr_finish(Q, W, V, ritz, Z, locked, *, precision="highest"):
    """Device half 2: rotate, residuals, roll, merge."""
    k = V.shape[1]
    rt = real_dtype(V.dtype)
    active = jnp.arange(k) >= locked
    Vrot = jnp.matmul(Q, Z, precision=precision)         # Ritz vectors
    Wrot = jnp.matmul(W, Z, precision=precision)         # = H · Vrot (reused)
    R = Wrot - Vrot * ritz[None, :].astype(V.dtype)
    resid = jnp.linalg.norm(R, axis=0).real.astype(rt)
    # Active results live at positions [0, k-locked); roll to [locked, k).
    Vrot = jnp.roll(Vrot, locked, axis=1)
    ritz = jnp.roll(ritz, locked)
    resid = jnp.roll(resid, locked)
    V_out = jnp.where(active[None, :], Vrot, V)
    return V_out, ritz, resid


@partial(jax.jit, static_argnames=("precision",))
def _rr_device(H, V, locked, *, precision="highest"):
    """Fully on-device RR+residuals (single program)."""
    rt = real_dtype(V.dtype)
    Q, W, A = _rr_project(H, V, locked, precision=precision)
    ritz, Z = jnp.linalg.eigh(A)                         # ascending
    ritz = ritz.real.astype(rt)
    return _rr_finish(Q, W, V, ritz, Z, locked, precision=precision)


def rayleigh_ritz_residuals(H, V, locked, *, precision="highest",
                            small_dense="device"):
    """Project H on the active columns of V, solve, rotate, and compute
    residuals, with ``locked`` as a traced scalar.

    Args:
      H: (N, N) Hermitian operator.
      V: (N, k) orthonormal block; columns [0, locked) are converged and are
        excluded from the projection.
      locked: traced int scalar.
      small_dense: "device" — the k×k eigh stays in the XLA program;
        "host" — split-sync host LAPACK eigh in f64 (see module docstring).

    Returns:
      V_out:  (N, k) — V with columns [locked, k) replaced by the rotated
              Ritz vectors (ascending Ritz value); [0, locked) untouched.
      ritzv:  (k,) real — positions [locked, k) hold the active Ritz values
              ascending; [0, locked) are garbage (caller keeps its own).
      resid:  (k,) real — same layout; ‖H v_j − θ_j v_j‖₂ per active column.
    """
    if small_dense != "host":
        return _rr_device(H, V, locked, precision=precision)

    rt = real_dtype(V.dtype)
    Q, W, A = _rr_project(H, V, locked, precision=precision)
    w, Z = host_eigh_f64(np.asarray(A), rt)              # k×k device→host
    return _rr_finish(Q, W, V, jnp.asarray(w), jnp.asarray(Z), locked,
                      precision=precision)
