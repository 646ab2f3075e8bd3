"""End-to-end solver tests.

Mirrors tests/chase_serial_solve.cpp: Clement N=256 (+1e-6 random Hermitian
perturbation), nev=24 nex=16, convergence asserted to 1e-8 DP / 1e-3 SP for
all four scalar types; golden eigenvalues from numpy instead of shipped
binaries (SURVEY §4).
"""

import numpy as np
import pytest

import chase_tpu
from chase_tpu.models import clement, clement_eigenvalues, random_hermitian


E2E_TOL = {np.dtype(np.float32): 1e-3, np.dtype(np.complex64): 1e-3,
           np.dtype(np.float64): 1e-8, np.dtype(np.complex128): 1e-8}


def _perturbed_clement(N, dtype, seed=0):
    rng = np.random.default_rng(seed)
    H = clement(N)
    E = rng.standard_normal((N, N))
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        E = E + 1j * rng.standard_normal((N, N))
    H = H + 1e-6 * (E + E.conj().T) / 2
    return H.astype(dtype)


@pytest.mark.parametrize(
    "dtype", [np.float32, np.float64, np.complex64, np.complex128],
    ids=["f32", "f64", "c64", "c128"])
def test_clement_solve(dtype):
    dtype = np.dtype(dtype)
    N, nev, nex = 256, 24, 16
    tol = E2E_TOL[dtype]
    H = _perturbed_clement(N, dtype)
    res = chase_tpu.eigsh(H, nev, nex, tol=tol)
    assert res.converged
    wide = np.complex128 if np.issubdtype(dtype, np.complexfloating) else np.float64
    exact = np.linalg.eigvalsh(H.astype(wide))[:nev]
    scale = float(N)  # eigenvalue scale of the Clement matrix
    np.testing.assert_allclose(res.ritzv, exact, atol=tol * scale * 10)
    assert np.all(res.resid < tol * scale * 10)
    # eigenvectors: residual check against the true matrix
    V = np.asarray(res.V)[:, :nev]
    R = H @ V - V * res.ritzv[None, :].astype(V.dtype)
    assert np.linalg.norm(R, axis=0).max() < tol * scale * 10


@pytest.mark.quick
def test_clement_exact_spectrum_found():
    """Unperturbed Clement: eigenvalues are exactly ±(N-1), ±(N-3), ..."""
    N, nev, nex = 200, 20, 20
    res = chase_tpu.eigsh(clement(N), nev, nex, tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, clement_eigenvalues(N)[:nev],
                               atol=1e-7)


@pytest.mark.quick
def test_bf16_filter_rung_converges():
    """bf16-storage filter rung (P10, one rung below the reference's DP->SP
    switch): an f32 problem filtered with bf16 matmul inputs early on must
    still converge to the f32 tolerance and spectrum."""
    N, nev, nex = 256, 24, 16
    H = _perturbed_clement(N, np.float32)
    cfg = chase_tpu.ChaseConfig(bf16_filter=True)
    res = chase_tpu.eigsh(H, nev, nex, tol=1e-3, config=cfg)
    assert res.converged
    exact = np.linalg.eigvalsh(H.astype(np.float64))[:nev]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-3 * N * 10)
    V = np.asarray(res.V)[:, :nev]
    R = H @ V - V * res.ritzv[None, :].astype(V.dtype)
    assert np.linalg.norm(R, axis=0).max() < 1e-3 * N * 10


def test_bf16_filter_negative_definite_disengages():
    """Regression: with a fully negative spectrum (upperb < 0) the bf16
    gate must still compare against the spectral-radius MAGNITUDE and hand
    the final iterations back to f32."""
    N, nev, nex = 192, 12, 12
    H = (np.asarray(clement(N)) - 2.0 * N * np.eye(N)).astype(np.float32)
    cfg = chase_tpu.ChaseConfig(bf16_filter=True)
    res = chase_tpu.eigsh(H, nev, nex, tol=1e-4, config=cfg)
    assert res.converged
    assert res.resid.max() < 1e-4 * 3 * N   # f32 polish, not the bf16 floor
    exact = np.linalg.eigvalsh(H.astype(np.float64))[:nev]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-2)


def test_random_hermitian_complex():
    N, nev, nex = 300, 30, 20
    H = random_hermitian(N, dtype=np.complex128, seed=11)
    res = chase_tpu.eigsh(H, nev, nex, tol=1e-10)
    assert res.converged
    exact = np.linalg.eigvalsh(H)[:nev]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-8 * N)


def test_no_degree_optimization():
    """opt='N' path: uniform degrees."""
    N, nev, nex = 200, 16, 12
    cfg = chase_tpu.ChaseConfig(optimization=False)
    res = chase_tpu.eigsh(clement(N), nev, nex, tol=1e-9, config=cfg)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, clement_eigenvalues(N)[:nev],
                               atol=1e-6)


@pytest.mark.quick
def test_warm_start_sequence():
    """mode='A': second solve of a perturbed problem reuses the subspace and
    must converge in fewer iterations (the sequence feature)."""
    from chase_tpu.models import hermitian_sequence
    N, nev, nex = 256, 24, 16
    H1, H2 = hermitian_sequence(N, 2, dtype=np.float64, seed=4, drift=0.005)
    r1 = chase_tpu.eigsh(H1, nev, nex, tol=1e-9, collect_perf=True)
    assert r1.converged
    cold = chase_tpu.eigsh(H2, nev, nex, tol=1e-9)
    warm = chase_tpu.eigsh(H2, nev, nex, tol=1e-9,
                           v0=np.asarray(r1.V), ritzv0=r1.ritzv_full,
                           approx=True)
    assert warm.converged
    exact = np.linalg.eigvalsh(H2)[:nev]
    np.testing.assert_allclose(warm.ritzv, exact, atol=1e-6)
    assert warm.iterations <= cold.iterations


def test_perf_data_populated():
    N, nev, nex = 128, 12, 8
    res = chase_tpu.eigsh(clement(N), nev, nex, tol=1e-9, collect_perf=True)
    assert res.converged
    p = res.perf
    assert p.timings["All"] > 0
    assert p.timings["Filter"] > 0
    assert p.filtered_vecs > 0
    assert p.get_filter_flops(N, np.float64) > 0
    assert p.get_flops(N, 20, 4, np.float64) > 0
    assert "GFLOPS" in p.report(N, 20, 4, np.float64)


def test_uneven_n_on_grid():
    """N not divisible by the mesh: Gershgorin padding must be invisible."""
    import jax
    import chase_tpu
    grid = chase_tpu.make_grid()
    H = clement(250)   # 250 % 4 != 0 on the 2x4 grid
    res = chase_tpu.eigsh(H, 10, 10, tol=1e-10, grid=grid)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, clement_eigenvalues(250)[:10],
                               atol=1e-7)
    V = np.asarray(res.V)[:, :10]
    assert V.shape[0] == 250
    assert np.linalg.norm(H @ V - V * res.ritzv, axis=0).max() < 1e-7


def test_largest_mode():
    """largest=True returns the top-nev eigenpairs ascending."""
    import chase_tpu
    H = random_hermitian(200, dtype=np.float64, seed=30)
    res = chase_tpu.eigsh(H, 8, 8, tol=1e-10, largest=True)
    assert res.converged
    exact = np.linalg.eigvalsh(H)[-8:]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-8)
    V = np.asarray(res.V)[:, :8]
    assert np.linalg.norm(H @ V - V * res.ritzv, axis=0).max() < 1e-8


def test_eigsh_sequence_generator():
    """Sequence API: warm-starts automatically, works from a generator."""
    import chase_tpu
    from chase_tpu.models import hermitian_sequence
    mats = hermitian_sequence(180, 3, dtype=np.float64, seed=17, drift=0.004)
    results = list(chase_tpu.eigsh_sequence(iter(mats), 10, 8, tol=1e-9))
    assert len(results) == 3
    assert all(r.converged for r in results)
    # warm-started solves must not be slower than the cold first one
    assert results[2].iterations <= results[0].iterations
    exact = np.linalg.eigvalsh(mats[2])[:10]
    np.testing.assert_allclose(results[2].ritzv, exact, atol=1e-6)


def test_validate_result_helper():
    import chase_tpu
    from chase_tpu.utils import validate_result
    H = clement(150)
    res = chase_tpu.eigsh(H, 8, 8, tol=1e-9)
    report = validate_result(H, res)
    assert report["max_residual"] < 1e-7
    assert report["orthonormality_error"] < 1e-10


def test_eigsh_accepts_operator():
    import chase_tpu
    H = clement(128)
    op = chase_tpu.DenseOperator(H)
    res = chase_tpu.eigsh(op, 6, 6, tol=1e-9)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, clement_eigenvalues(128)[:6],
                               atol=1e-7)


def test_largest_mode_warm_restart_alignment():
    """ritzv_full must stay column-aligned with V after the largest-mode
    reorder, or warm restarts feed the wrong Ritz estimates."""
    N, nev, nex = 200, 10, 10
    H = np.asarray(clement(N))
    r1 = chase_tpu.eigsh(H, nev, nex, tol=1e-9, largest=True)
    assert r1.converged
    # each ritzv_full[i] must be the Rayleigh quotient of V[:, i]
    V = np.asarray(r1.V)
    for i in range(nev):
        rq = V[:, i] @ H @ V[:, i] / (V[:, i] @ V[:, i])
        assert abs(rq - r1.ritzv_full[i]) < 1e-6, i
    # and the warm restart converges quickly with correct estimates
    r2 = chase_tpu.eigsh(H, nev, nex, tol=1e-9, largest=True,
                         v0=np.asarray(r1.V), ritzv0=r1.ritzv_full,
                         approx=True)
    assert r2.converged and r2.iterations <= r1.iterations


@pytest.mark.slow
def test_randomized_parity_sweep():
    """Property-style sweep: random (N, nev, nex, dtype, spectrum shift)
    configurations must match numpy's eigh at the dtype tolerance."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        N = int(rng.integers(80, 320))
        nev = int(rng.integers(4, max(5, N // 12)))
        nex = int(rng.integers(4, 16))
        dtype = np.dtype([np.float32, np.float64, np.complex64,
                          np.complex128][trial % 4])
        shift = float(rng.normal()) * N / 4
        H = np.asarray(random_hermitian(N, dtype=dtype, seed=100 + trial))
        H = (H + shift * np.eye(N)).astype(dtype)
        tol = 1e-4 if dtype.itemsize <= 8 else 1e-9
        res = chase_tpu.eigsh(H, nev, nex, tol=tol)
        assert res.converged, (trial, N, nev, nex, dtype)
        wide = np.complex128 if np.issubdtype(dtype, np.complexfloating) \
            else np.float64
        exact = np.linalg.eigvalsh(H.astype(wide))[:nev]
        np.testing.assert_allclose(res.ritzv, exact,
                                   atol=tol * np.sqrt(N) * 20,
                                   err_msg=str((trial, N, nev, nex, dtype)))
