"""Subspace-width shrinking (windowed QR/RR) tests.

The reference shrinks every post-filter phase to the unconverged block
(algorithm.inc:1712-1718; RR on `unconverged` only,
linalg/internal/mpi/rayleighRitz.hpp:103-186).  chase_tpu shrinks to the
filter's padded width buckets (static shapes).  These tests assert (a) the
windowed path actually engages, (b) spectra/residuals match the full-width
path, (c) it composes with the mixed-precision refinement ladder and with
a device grid.
"""

import numpy as np
import pytest

import chase_tpu
from chase_tpu.models import clement
from chase_tpu.ops import qr as qrops


def _perturbed_clement(N, dtype, seed=0):
    rng = np.random.default_rng(seed)
    H = clement(N)
    E = rng.standard_normal((N, N))
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        E = E + 1j * rng.standard_normal((N, N))
    return (H + 1e-6 * (E + E.conj().T) / 2).astype(dtype)


def test_windowed_qr_rr_engages_and_matches(monkeypatch):
    N, nev, nex = 256, 24, 16
    H = _perturbed_clement(N, np.float64)
    calls = {"window": 0}
    orig = qrops.orthonormalize_window

    def spy(*a, **kw):
        calls["window"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(chase_tpu.solver.qrops, "orthonormalize_window", spy)
    # small degree cap → staggered locking → the window actually shrinks
    cfg = chase_tpu.ChaseConfig(col_block=8, max_iter=60, deg=6, max_deg=8)
    res = chase_tpu.eigsh(H, nev, nex, tol=1e-10, config=cfg)
    assert res.converged
    assert calls["window"] >= 1, "windowed QR/RR never engaged"
    exact = np.linalg.eigvalsh(H)[:nev]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-9)
    V = np.asarray(res.V)[:, :nev]
    R = H @ V - V * res.ritzv[None, :]
    assert np.linalg.norm(R, axis=0).max() < 5e-9


@pytest.mark.parametrize("dtype", [np.float32, np.complex64],
                         ids=["f32", "c64"])
def test_shrink_on_off_same_spectrum(dtype):
    N, nev, nex = 200, 20, 12
    H = _perturbed_clement(N, dtype)
    cfg_on = chase_tpu.ChaseConfig(col_block=8)
    cfg_off = chase_tpu.ChaseConfig(col_block=8, shrink_subspace=False)
    r_on = chase_tpu.eigsh(H, nev, nex, tol=1e-4, config=cfg_on)
    r_off = chase_tpu.eigsh(H, nev, nex, tol=1e-4, config=cfg_off)
    assert r_on.converged and r_off.converged
    np.testing.assert_allclose(r_on.ritzv, r_off.ritzv, atol=1e-3)


def test_shrink_with_ladder_and_grid():
    """Window path on a 2D device grid + mixed-precision refinement."""
    from chase_tpu.parallel.mesh import make_grid
    from chase_tpu.parallel.operator import DenseOperator

    N, nev, nex = 256, 24, 16
    H = _perturbed_clement(N, np.float64)
    grid = make_grid()       # all 8 test devices
    op = DenseOperator(H, grid=grid)
    cfg = chase_tpu.ChaseConfig(mixed_precision=True, col_block=8,
                                max_iter=40)
    res = chase_tpu.eigsh(op, nev, nex, tol=1e-10, config=cfg)
    assert res.converged
    exact = np.linalg.eigvalsh(H)[:nev]
    np.testing.assert_allclose(res.ritzv, exact, atol=1e-9)
