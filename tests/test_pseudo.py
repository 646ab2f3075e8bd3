"""Pseudo-Hermitian (BSE) path tests.

Mirrors tests/chase_serial_solve_pseudo_bse_test.cpp and the pseudo kernel
suites (pseudo_hermitian_lanczos/rayleighRitz/flipSign): golden eigenvalues
regenerated with numpy on BSE-structured random matrices instead of the
reference's shipped binary fixtures (SURVEY §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import chase_tpu
from chase_tpu.models import random_pseudo_hermitian
from chase_tpu.ops.pseudo import (
    apply_s, k_conjugate_cols, rayleigh_ritz_residuals_pseudo,
    lanczos_scan_pseudo, chebyshev_filter_h2)
from chase_tpu.ops.lanczos import lanczos_tridiag_host


E2E_TOL = {np.dtype(np.float32): 1e-4, np.dtype(np.complex64): 1e-4,
           np.dtype(np.float64): 1e-9, np.dtype(np.complex128): 1e-9}


def _positive_spectrum(H, k):
    ev = np.linalg.eigvals(H.astype(
        np.complex128 if np.iscomplexobj(H) else np.float64))
    assert np.abs(ev.imag).max() < 1e-8
    evr = np.sort(ev.real)
    return evr[evr > 0][:k]


def test_generator_structure():
    """Spectrum real, symmetric about zero; S-pseudo-Hermitian; K-symmetry."""
    H = random_pseudo_hermitian(80, dtype=np.complex128, seed=0)
    N = 80
    S = np.ones(N); S[N // 2:] = -1
    np.testing.assert_allclose((S[:, None] * H * S[None, :]),
                               H.conj().T, atol=1e-12)
    ev = np.linalg.eigvals(H)
    assert np.abs(ev.imag).max() < 1e-10
    evr = np.sort(ev.real)
    np.testing.assert_allclose(evr, -evr[::-1], atol=1e-8)
    # M = S·H is HPD (stability condition)
    M = S[:, None] * H
    assert np.linalg.eigvalsh((M + M.conj().T) / 2).min() > 0


def test_k_conjugation_maps_eigenvectors():
    H = random_pseudo_hermitian(60, dtype=np.complex128, seed=1)
    w, X = np.linalg.eig(H)
    i = np.argsort(np.abs(w.real))[0]
    lam, x = w[i].real, X[:, i]
    V = np.zeros((60, 4), np.complex128)
    V[:, 1] = x
    src = np.array([0, 1, 1, 3]); mask = np.array([False, False, True, False])
    out = np.asarray(k_conjugate_cols(jnp.asarray(V), jnp.asarray(src),
                                      jnp.asarray(mask)))
    kx = out[:, 2]
    r = H @ kx - (-lam) * kx
    assert np.linalg.norm(r) / np.linalg.norm(kx) < 1e-10
    np.testing.assert_array_equal(out[:, 1], V[:, 1])  # others untouched


@pytest.mark.quick
def test_pseudo_rr_exact_subspace():
    N = 60
    H = random_pseudo_hermitian(N, dtype=np.float64, seed=2)
    w, X = np.linalg.eig(H)
    idxs = np.argsort(np.abs(w.real))[:8]
    Q, _ = np.linalg.qr(X[:, idxs].real)
    Vout, theta, resid, ok = rayleigh_ritz_residuals_pseudo(
        jnp.asarray(H), jnp.asarray(Q), jnp.int32(0))
    assert bool(ok)
    pos = _positive_spectrum(H, 4)
    np.testing.assert_allclose(np.asarray(theta)[:4], pos, atol=1e-10)
    assert np.asarray(resid)[:4].max() < 1e-10


def test_s_lanczos_spectral_range():
    N = 120
    H = random_pseudo_hermitian(N, dtype=np.complex128, seed=3)
    ev = np.sort(np.linalg.eigvals(H).real)
    rng = np.random.default_rng(0)
    V0 = rng.standard_normal((N, 4)) + 1j * rng.standard_normal((N, 4))
    V0[N // 2:] *= 0.001
    a, b, _ = lanczos_scan_pseudo(jnp.asarray(H), jnp.asarray(V0.astype(np.complex128)), m=20)
    th, _, _ = lanczos_tridiag_host(np.asarray(a, np.float64),
                                    np.asarray(b, np.float64))
    assert th.max() <= ev[-1] * 1.01 + 0.1
    assert th.max() >= ev[-1] * 0.8           # captures the top
    assert abs(th).min() <= abs(ev).min() * 3 + 0.5


def test_filter_h2_amplifies_small_lambda():
    N = 100
    H = random_pseudo_hermitian(N, dtype=np.float64, seed=4)
    w, X = np.linalg.eig(H)
    wr = w.real
    i_small = np.argmin(np.abs(wr))
    i_big = np.argmax(np.abs(wr))
    x = X[:, i_small].real + X[:, i_big].real
    ev2 = np.sort(wr ** 2)
    Y = np.asarray(chebyshev_filter_h2(
        jnp.asarray(H), jnp.asarray(x[:, None]), jnp.asarray(np.array([16], np.int32)),
        float(ev2[0]), float(ev2[N // 3]), float(ev2[-1] * 1.01),
        jnp.int32(16)))
    c_small = abs(X[:, i_small].real @ Y[:, 0])
    c_big = abs(X[:, i_big].real @ Y[:, 0])
    assert c_small / max(c_big, 1e-300) > 1e3


@pytest.mark.parametrize("dtype", [np.float64, np.complex128, np.float32],
                         ids=["f64", "c128", "f32"])
@pytest.mark.quick
def test_bse_solve(dtype):
    dtype = np.dtype(dtype)
    N, nev, nex = 200, 10, 8
    tol = E2E_TOL[dtype]
    H = random_pseudo_hermitian(N, dtype=dtype, seed=5)
    pos = _positive_spectrum(H, nev)
    res = chase_tpu.eigsh_pseudo(H, nev, nex, tol=tol)
    assert res.converged
    scale = max(1.0, float(pos[-1]))
    np.testing.assert_allclose(res.ritzv, pos, atol=tol * scale * 100)
    V = np.asarray(res.V)[:, :nev]
    R = H @ V - V * res.ritzv[None, :].astype(V.dtype)
    assert np.linalg.norm(R, axis=0).max() < tol * scale * 100


def test_bse_solve_with_locking_progression():
    """Tighter tol forces multiple locking rounds (exercises the locked>0
    QR/RR/K-conj paths)."""
    N, nev, nex = 160, 16, 6
    H = random_pseudo_hermitian(N, dtype=np.complex128, seed=6,
                                coupling=0.4, spread=0.8)
    pos = _positive_spectrum(H, nev)
    res = chase_tpu.eigsh_pseudo(H, nev, nex, tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, pos, atol=1e-7)
    assert res.iterations >= 2          # must have gone through locking rounds


def test_apply_s():
    x = np.arange(8.0).reshape(8, 1)
    y = np.asarray(apply_s(jnp.asarray(x)))
    np.testing.assert_array_equal(y[:4], x[:4])
    np.testing.assert_array_equal(y[4:], -x[4:])


def test_geev_debug_rr_matches_v2():
    """The v1 (geev) debug path must agree with the production v2 pencil RR
    (the reference keeps both; SURVEY §7 risk 3)."""
    import jax.numpy as jnp
    import jax
    from chase_tpu.ops.pseudo import rayleigh_ritz_pseudo_geev
    N = 60
    H = random_pseudo_hermitian(N, dtype=np.float64, seed=2)
    w, X = np.linalg.eig(H)
    idxs = np.argsort(np.abs(w.real))[:8]
    Q, _ = np.linalg.qr(X[:, idxs].real)
    th_geev, _ = rayleigh_ritz_pseudo_geev(H, Q)
    _, th_v2, _, _ = rayleigh_ritz_residuals_pseudo(
        jnp.asarray(H), jnp.asarray(Q), jnp.int32(0))
    pos_geev = np.sort(th_geev[th_geev > 0])[:4]
    np.testing.assert_allclose(pos_geev, np.asarray(th_v2)[:4], atol=1e-12)


def test_pseudo_rr_host_matches_device():
    """Split-sync host pencil RR must match the device path."""
    import jax.numpy as jnp
    from chase_tpu.ops.pseudo import rayleigh_ritz_residuals_pseudo
    from chase_tpu.models import random_pseudo_hermitian
    import chase_tpu

    H = random_pseudo_hermitian(96, dtype=np.float64, seed=9)
    # build an S-orthonormal-ish block via one solver QR step
    rng = np.random.default_rng(0)
    V = rng.standard_normal((96, 16))
    Q, _ = np.linalg.qr(V)
    Hd, Qd = jnp.asarray(H), jnp.asarray(Q)
    Vd_d, th_d, rs_d, ok_d = rayleigh_ritz_residuals_pseudo(
        Hd, Qd, jnp.int32(0))
    Vd_h, th_h, rs_h, ok_h = rayleigh_ritz_residuals_pseudo(
        Hd, Qd, jnp.int32(0), small_dense="host")
    assert bool(ok_d) == bool(ok_h)
    np.testing.assert_allclose(np.asarray(th_d), np.asarray(th_h),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(rs_d), np.asarray(rs_h),
                               atol=1e-7)


def test_pseudo_solver_host_small_dense_e2e():
    import chase_tpu
    from chase_tpu.models import random_pseudo_hermitian
    H = random_pseudo_hermitian(128, dtype=np.float64, seed=3)
    cfg = chase_tpu.ChaseConfig(small_dense_backend="host")
    res = chase_tpu.eigsh_pseudo(H, 6, 6, tol=1e-8, config=cfg)
    assert res.converged
    exact = np.linalg.eigvals(np.asarray(H, np.float64))
    pos = np.sort(exact.real[exact.real > 0])[:6]
    np.testing.assert_allclose(res.ritzv, pos, atol=1e-6)


def test_filter_h2_bf16_rung_matches_f32():
    """The bf16 storage rung of the H² filter (bf16 matmul inputs, f32
    carry/accumulation — ops/pseudo._h2_shift) applies the same polynomial
    to bf16-input accuracy.  Reference baseline: the same bf16-rounded
    operator run through the all-f32 path, isolating the reduced-input
    arithmetic from the operator rounding itself."""
    N = 128
    H32 = np.asarray(random_pseudo_hermitian(N, dtype=np.float64, seed=7),
                     np.float32)
    Hbf = jnp.asarray(H32, jnp.bfloat16)
    Hrt = jnp.asarray(np.asarray(Hbf, np.float32))     # bf16-rounded, f32
    rng = np.random.default_rng(0)
    X = np.asarray(rng.standard_normal((N, 6)), np.float32)
    deg = jnp.asarray(np.array([0, 1, 4, 8, 8, 8], np.int32))
    ev2 = np.sort(np.linalg.eigvals(H32.astype(np.float64)).real ** 2)
    args = (deg, float(ev2[0]), float(ev2[N // 3]),
            float(ev2[-1] * 1.01), jnp.int32(8))
    Yref = np.asarray(chebyshev_filter_h2(Hrt, jnp.asarray(X), *args))
    Ybf = np.asarray(chebyshev_filter_h2(Hbf, jnp.asarray(X), *args))
    assert Ybf.dtype == np.float32                     # carry stays f32
    # degree-0 column untouched bit-exactly
    np.testing.assert_array_equal(Ybf[:, 0], X[:, 0])
    err = np.linalg.norm(Ybf - Yref) / np.linalg.norm(Yref)
    assert err < 0.05, err


def test_bse_solve_bf16_filter():
    """f32 BSE solve with the bf16 storage rung (P10 on the pseudo path)
    reaches the same SP tolerance; the rung runs only the far-from-converged
    iterations (perf counts low-precision filter FLOPs)."""
    N, nev, nex = 200, 10, 8
    H = random_pseudo_hermitian(N, dtype=np.float32, seed=5)
    pos = _positive_spectrum(H, nev)
    tol = E2E_TOL[np.dtype(np.float32)]
    cfg = chase_tpu.ChaseConfig(bf16_filter=True)
    res = chase_tpu.eigsh_pseudo(H, nev, nex, tol=tol, config=cfg,
                                 collect_perf=True)
    assert res.converged
    scale = max(1.0, float(pos[-1]))
    np.testing.assert_allclose(res.ritzv, pos, atol=tol * scale * 100)
    V = np.asarray(res.V)[:, :nev]
    R = H @ V - V * res.ritzv[None, :].astype(V.dtype)
    assert np.linalg.norm(R, axis=0).max() < tol * scale * 100
    assert res.perf.filtered_vecs_low > 0


def test_bse_solve_mixed_precision_dp():
    """f64 BSE with the f32 H² shadow (the reference's DP→SP filter switch,
    chase_cpu.hpp:384-447, applied to HEMM_H2) still converges to DP
    tolerance — the shadow disengages once residuals cross
    mixed_precision_threshold."""
    N, nev, nex = 200, 10, 8
    H = random_pseudo_hermitian(N, dtype=np.float64, seed=5)
    pos = _positive_spectrum(H, nev)
    cfg = chase_tpu.ChaseConfig(mixed_precision=True)
    res = chase_tpu.eigsh_pseudo(H, nev, nex, tol=1e-9, config=cfg,
                                 collect_perf=True)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, pos, atol=1e-6)
    V = np.asarray(res.V)[:, :nev]
    R = H @ V - V * res.ritzv[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-7
    assert res.perf.filtered_vecs_low > 0


def test_structured_pseudo_generator_exact_spectrum():
    """structured_pseudo_hermitian's closed-form spectrum matches a direct
    eigendecomposition (the property the scale benchmarks rely on)."""
    from chase_tpu.models import structured_pseudo_hermitian
    H, lam = structured_pseudo_hermitian(120, seed=3)
    S = np.diag(np.concatenate([np.ones(60), -np.ones(60)]))
    np.testing.assert_allclose(S @ H @ S, H.T, atol=1e-12)  # pseudo-Herm
    ev = np.linalg.eigvals(H)
    assert np.abs(ev.imag).max() < 1e-10
    pos = np.sort(ev.real[ev.real > 0])
    np.testing.assert_allclose(pos, lam, atol=1e-10)
    # M = S·H positive definite (stable BSE)
    assert np.linalg.eigvalsh((S @ H + H.T @ S) / 2).min() > 0


def test_bse_solve_structured_exact():
    """e2e on the exact-spectrum BSE generator (what the scale benchmark
    checks against on-chip)."""
    from chase_tpu.models import structured_pseudo_hermitian
    N, nev, nex = 240, 12, 8
    H, lam = structured_pseudo_hermitian(N, dtype=np.float64, seed=11)
    res = chase_tpu.eigsh_pseudo(H, nev, nex, tol=1e-9)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, lam[:nev], atol=1e-7)
