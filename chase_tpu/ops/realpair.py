"""Complex Hermitian solves on real-only accelerators (real-pair mode).

The sandbox TPU backend does not implement complex dtypes at all, and even
runtimes with native complex lower complex matmuls only at the slowest
(highest) MXU precision — complex problems could never reach the bf16 /
default-precision rungs.  This module solves a complex Hermitian problem
with PURELY REAL device arithmetic via the standard symplectic embedding:

    H = Hr + i·Hi  (Hr symmetric, Hi antisymmetric)
    J = [[Hr, -Hi],
         [Hi,  Hr]]          — real symmetric, (2N, 2N)

Each eigenvalue λ of H appears twice in J; the 2-dimensional real
eigenspace of the pair is span{[a; b], [-b; a]} where v = a + i·b is the
complex eigenvector, so ANY unit vector [x; y] in it reconstructs a valid
complex eigenvector v = x + i·y with ‖Jz − λz‖₂ = ‖Hv − λv‖₂ exactly.

The whole real solver stack (filter windows, refinement ladder, bf16 rung,
ring schedules, sharding) applies unchanged to J — this is the TPU-native
counterpart of the reference's {c,z} backends (its kernels call complex
BLAS, e.g. Impl/chase_cpu/chase_cpu.hpp:449-508; test matrix
tests/chase_serial_solve.cpp:23-120).  Cost: the subspace doubles, so the
filter does 2× the FLOPs of a native complex HEMM — but it runs on the
fast real MXU paths (bf16/f32) instead of 4× highest-precision passes,
which more than compensates on TPU.

Degenerate eigenvalues of H (multiplicity m → 2m in J) are handled in the
pair extraction: candidates are clustered by Ritz value and each cluster's
complex span is re-orthonormalized (pivoted QR), keeping exactly m
independent complex vectors.
"""

from __future__ import annotations

import numpy as np

__all__ = ["embed_real", "embed_block", "extract_pairs"]


def embed_real(H):
    """Complex (N, N) Hermitian → real symmetric (2N, 2N) J (numpy)."""
    H = np.asarray(H)
    rdt = np.float32 if H.dtype == np.complex64 else np.float64
    Hr = np.ascontiguousarray(H.real, dtype=rdt)
    Hi = np.ascontiguousarray(H.imag, dtype=rdt)
    N = H.shape[0]
    J = np.empty((2 * N, 2 * N), rdt)
    J[:N, :N] = Hr
    J[:N, N:] = -Hi
    J[N:, :N] = Hi
    J[N:, N:] = Hr
    return J


def embed_block(V):
    """Complex (N, k) multivector → real (2N, 2k) warm-start basis.

    Each complex column v = a + i·b spans a 2-dimensional real eigenspace
    of J; the pair ([a; b], [-b; a]) = (v, i·v) seeds both members, so a
    complex warm start covers the full doubled subspace (columns
    interleaved to match ``np.repeat(ritzv0, 2)``)."""
    V = np.asarray(V)
    rdt = np.float32 if V.dtype == np.complex64 else np.float64
    a = V.real.astype(rdt)
    b = V.imag.astype(rdt)
    N, k = V.shape
    X = np.empty((2 * N, 2 * k), rdt)
    X[:N, 0::2] = a
    X[N:, 0::2] = b
    X[:N, 1::2] = -b
    X[N:, 1::2] = a
    return X


def extract_pairs(ritzv2, X2, resid2, nev, *, cluster_tol=None):
    """Collapse the doubled real solution back to complex eigenpairs.

    Args:
      ritzv2: (≥2·nev,) doubled Ritz values, ascending.
      X2: (2N, ≥2·nev) real eigenvectors of J ([x; y] stacking).
      resid2: (≥2·nev,) residuals ‖Jz − λz‖ = ‖Hv − λv‖.
      nev: number of complex pairs wanted.
      cluster_tol: eigenvalues closer than this are treated as one
        degenerate cluster (default: 1e3·eps·max|λ|).

    Returns (ritzv (nev,), V (N, nev) complex, resid (nev,)).
    """
    ritzv2 = np.asarray(ritzv2, np.float64)
    X2 = np.asarray(X2)
    n2, k2 = X2.shape
    N = n2 // 2
    cdt = np.complex64 if X2.dtype == np.float32 else np.complex128
    if cluster_tol is None:
        scale = float(np.max(np.abs(ritzv2))) or 1.0
        eps = np.finfo(X2.dtype).eps
        cluster_tol = 1e3 * eps * scale

    # cluster boundaries over the doubled spectrum
    bounds = [0]
    for j in range(1, k2):
        if ritzv2[j] - ritzv2[j - 1] > cluster_tol:
            bounds.append(j)
    bounds.append(k2)

    vals, vecs, res = [], [], []
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        if len(vals) >= nev:
            break
        m2 = b1 - b0                      # J-multiplicity (= 2m for exact m)
        m = max(1, m2 // 2)               # complex multiplicity
        cand = X2[:N, b0:b1] + 1j * X2[N:, b0:b1]        # (N, m2) candidates
        if m2 == 2:
            # the generic case: both candidates span the SAME complex
            # direction — keep the one with the better residual
            jbest = b0 + int(np.argmin(resid2[b0:b1]))
            v = X2[:N, jbest] + 1j * X2[N:, jbest]
            nrm = np.linalg.norm(v)
            vals.append(ritzv2[jbest])
            vecs.append((v / nrm).astype(cdt))
            res.append(float(resid2[jbest]))
            continue
        # degenerate cluster: complex rank of the 2m candidates is m —
        # pivoted QR keeps the m best-conditioned directions (any
        # orthonormal basis of the eigenspace is valid; within the cluster
        # the values are numerically equal so ordering is immaterial)
        import scipy.linalg as sla
        Q, _, _ = sla.qr(cand.astype(np.complex128), mode="economic",
                         pivoting=True)
        take = min(m, nev - len(vals))
        cl_vals = np.sort(ritzv2[b0:b1])
        cl_res = float(np.max(resid2[b0:b1]))
        for t in range(take):
            vals.append(float(cl_vals[2 * t]))
            vecs.append(Q[:, t].astype(cdt))
            res.append(cl_res)
    vals = np.asarray(vals[:nev])
    V = np.stack(vecs[:nev], axis=1)
    return vals, V, np.asarray(res[:nev])
