"""Hard-spectrum robustness tests: degeneracies, clusters at the search
boundary, extreme scaling, trivial matrices — the failure modes subspace
eigensolvers are known to stumble on."""

import numpy as np
import pytest

import chase_tpu


def _with_spectrum(evals, seed=0):
    n = len(evals)
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    H = (Q * np.asarray(evals)) @ Q.T
    return (H + H.T) / 2


def test_degenerate_lowest_eigenvalue():
    """Multiplicity-5 lowest eigenvalue: all copies must be found and the
    5-dim eigenspace resolved."""
    N = 200
    evals = np.concatenate([np.full(5, -3.0), np.linspace(-1, 5, N - 5)])
    H = _with_spectrum(evals, seed=1)
    res = chase_tpu.eigsh(H, 10, 10, tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(res.ritzv[:5], -3.0, atol=1e-8)
    V = np.asarray(res.V)[:, :10]
    R = H @ V - V * res.ritzv
    assert np.linalg.norm(R, axis=0).max() < 1e-8


def test_cluster_at_nev_boundary():
    """A tight cluster straddling the nev cut: nex must absorb it and the
    returned nev values must still be the true lowest nev."""
    N, nev, nex = 200, 10, 12
    evals = np.concatenate([
        np.linspace(-5, -4, 8),
        np.full(6, -3.0) + np.linspace(0, 1e-6, 6),   # cluster at positions 8..13
        np.linspace(-2, 4, N - 14)])
    H = _with_spectrum(np.sort(evals), seed=2)
    res = chase_tpu.eigsh(H, nev, nex, tol=1e-10)
    assert res.converged
    exact = np.sort(evals)[:nev]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-7)


def test_wide_dynamic_range():
    """Spectrum spanning 8 orders of magnitude with the wanted cluster well
    below the bulk.  The convergence criterion is an *absolute* residual
    (like the reference), so tol is read relative to ‖H‖ ≈ 1e4.

    (A single extreme outlier dwarfing everything else — e.g. one -1e5 next
    to O(1) eigenvalues — is intrinsically pathological for Chebyshev
    filtering: the amplification reference point λ1 flattens the filter over
    the rest of the spectrum. The reference's filter math behaves the same;
    such problems need spectrum folding, out of scope for both.)"""
    N = 150
    evals = np.concatenate([np.linspace(-1e4, -9e3, 10),
                            np.logspace(-4, 4, N - 10)])
    H = _with_spectrum(evals, seed=3)
    res = chase_tpu.eigsh(H, 6, 10, tol=1e-7)
    assert res.converged
    exact = np.sort(evals)[:6]
    np.testing.assert_allclose(res.ritzv, exact, rtol=1e-8, atol=1e-6)


def test_diagonal_matrix():
    H = np.diag(np.arange(100, dtype=np.float64))
    res = chase_tpu.eigsh(H, 8, 8, tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, np.arange(8.0), atol=1e-9)


def test_identical_spectrum_fused_vs_host_on_degenerate():
    N = 160
    evals = np.concatenate([np.full(4, -2.0), np.linspace(0, 3, N - 4)])
    H = _with_spectrum(evals, seed=4)
    a = chase_tpu.eigsh(H, 8, 8, tol=1e-10)
    b = chase_tpu.eigsh_fused(H, 8, 8, tol=1e-10)
    assert a.converged and b.converged
    np.testing.assert_allclose(a.ritzv, b.ritzv, atol=1e-8)


def test_tiny_problem():
    """N barely above nev+nex."""
    H = np.diag(np.arange(20, dtype=np.float64))
    res = chase_tpu.eigsh(H, 4, 4, tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, np.arange(4.0), atol=1e-9)
