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
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..types import real_dtype

__all__ = ["rayleigh_ritz_residuals"]


def _host_eigh(A):
    """Replicated host eigh of the small projected problem, in full f64.

    The reference runs the (nev+nex)² heevd redundantly on every rank
    (mpi/rayleighRitz.hpp:147-180) and optionally in double precision
    (CHASE_RR_DOUBLE_PRECISION).  On TPUs f64 is emulated (slow), so for
    64-bit problems the small dense solve can round-trip to the host LAPACK
    instead — the k×k matrix is tiny next to the N×k transfers XLA already
    avoids.  Upcasting to f64 on host doubles as the RR_DOUBLE_PRECISION
    analogue for 32-bit problems.
    """
    import numpy as np

    def cb(a):
        wide = np.complex128 if np.iscomplexobj(a) else np.float64
        w, z = np.linalg.eigh(a.astype(wide))
        return (w.astype(real_dtype(a.dtype)), z.astype(a.dtype))

    k = A.shape[0]
    out_shapes = (jax.ShapeDtypeStruct((k,), real_dtype(A.dtype)),
                  jax.ShapeDtypeStruct((k, k), A.dtype))
    return jax.pure_callback(cb, out_shapes, A, vmap_method="sequential")


@partial(jax.jit, static_argnames=("precision", "small_dense"))
def rayleigh_ritz_residuals(H, V, locked, *, precision="highest",
                            small_dense="device"):
    """Project H on the active columns of V, solve, rotate, and compute
    residuals, with ``locked`` as a traced scalar.

    Args:
      H: (N, N) Hermitian operator.
      V: (N, k) orthonormal block; columns [0, locked) are converged and are
        excluded from the projection.
      locked: traced int scalar.

    Returns:
      V_out:  (N, k) — V with columns [locked, k) replaced by the rotated
              Ritz vectors (ascending Ritz value); [0, locked) untouched.
      ritzv:  (k,) real — positions [locked, k) hold the active Ritz values
              ascending; [0, locked) are garbage (caller keeps its own).
      resid:  (k,) real — same layout; ‖H v_j − θ_j v_j‖₂ per active column.
    """
    k = V.shape[1]
    rt = real_dtype(V.dtype)
    cols = jnp.arange(k)
    active = cols >= locked

    Q = jnp.where(active[None, :], V, jnp.zeros((), V.dtype))
    W = jnp.matmul(H, Q, precision=precision)            # H·Q (one big HEMM)
    A = jnp.matmul(Q.conj().T, W, precision=precision)   # QᴴHQ, k×k

    # Decouple the locked slots: eigh(A + big·diag(1-active)) has eigenpairs
    # (big, e_j) there, and ‖A‖_F ≥ λ_max keeps them strictly above the
    # active spectrum.
    big = 2 * jnp.linalg.norm(A).real.astype(rt) + 1
    A = A + jnp.diag(jnp.where(active, jnp.zeros((), rt), big)).astype(A.dtype)

    if small_dense == "host":
        ritz, Z = _host_eigh(A)                          # host LAPACK, f64
    else:
        ritz, Z = jnp.linalg.eigh(A)                     # ascending
    ritz = ritz.real.astype(rt)

    Vrot = jnp.matmul(Q, Z, precision=precision)         # Ritz vectors
    Wrot = jnp.matmul(W, Z, precision=precision)         # = H · Vrot (reused)
    R = Wrot - Vrot * ritz[None, :].astype(V.dtype)
    resid = jnp.linalg.norm(R, axis=0).real.astype(rt)

    # Active results live at positions [0, k-locked); roll them to [locked, k).
    Vrot = jnp.roll(Vrot, locked, axis=1)
    ritz = jnp.roll(ritz, locked)
    resid = jnp.roll(resid, locked)
    V_out = jnp.where(active[None, :], Vrot, V)
    return V_out, ritz, resid
