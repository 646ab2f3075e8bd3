"""API input-validation contract (the verify-skill probe list).

Mirrors the reference's constructor argument checks (e.g. the dimension
throws in Impl/pchase_cpu/pchase_cpu.hpp and the mode='A' warm-start
contract of interface/chase_c_interface.h:38-41).
"""

import numpy as np
import pytest

import chase_tpu
from chase_tpu.models import clement, random_pseudo_hermitian


@pytest.fixture(scope="module")
def H():
    return clement(64)


def test_nonsquare_raises(H):
    with pytest.raises(ValueError, match="square"):
        chase_tpu.eigsh(np.asarray(H)[:, :10], 4, 4)


def test_nevex_exceeds_n_raises(H):
    with pytest.raises(ValueError, match="exceeds"):
        chase_tpu.eigsh(H, 60, 20)


def test_approx_without_v0_raises(H):
    with pytest.raises(ValueError, match="approx"):
        chase_tpu.eigsh(H, 4, 4, approx=True)


def test_approx_with_v0_without_ritzv0_raises(H):
    v0 = np.random.default_rng(0).standard_normal((64, 8))
    with pytest.raises(ValueError, match="ritzv0"):
        chase_tpu.eigsh(H, 4, 4, v0=v0, approx=True)


def test_pseudo_approx_without_v0_raises():
    Hp = np.asarray(random_pseudo_hermitian(32, dtype=np.float64))
    with pytest.raises(ValueError, match="approx"):
        chase_tpu.eigsh_pseudo(Hp, 2, 2, approx=True)


def test_unreachable_tol_caps_at_max_iter(H):
    cfg = chase_tpu.ChaseConfig(max_iter=3)
    res = chase_tpu.eigsh(np.asarray(H, np.float32), 4, 4, tol=1e-30,
                          config=cfg)
    assert not res.converged
