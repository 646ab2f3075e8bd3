"""Native C++ I/O layer tests (the MPI-IO analogue) + fallback parity."""

import os

import numpy as np
import pytest

from chase_tpu import _native
from chase_tpu import io as cio
from chase_tpu.models import random_hermitian


def test_native_builds_and_loads():
    assert _native.available(), "native chaseio library failed to build"


def test_native_read_block_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    N, M = 64, 48
    A = rng.standard_normal((N, M))
    p = str(tmp_path / "a.bin")
    cio.save_matrix(A, p)
    blk = _native.read_block(p, N, np.float64, 10, 20, 5, 17)
    np.testing.assert_array_equal(blk, A[10:30, 5:22])
    # full read
    full = _native.read_block(p, N, np.float64, 0, N, 0, M)
    np.testing.assert_array_equal(full, A)


def test_native_read_complex(tmp_path):
    H = random_hermitian(40, dtype=np.complex128, seed=1)
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    blk = _native.read_block(p, 40, np.complex128, 8, 16, 0, 40)
    np.testing.assert_array_equal(blk, H[8:24])


def test_native_write_block_roundtrip(tmp_path):
    N = 32
    p = str(tmp_path / "w.bin")
    # pre-size the file
    np.zeros(N * N).tofile(p)
    rng = np.random.default_rng(2)
    blk = rng.standard_normal((12, 8))
    _native.write_block(p, N, blk, 4, 3)
    back = _native.read_block(p, N, np.float64, 4, 12, 3, 8)
    np.testing.assert_array_equal(back, blk)


def test_read_block_errors(tmp_path):
    with pytest.raises(OSError):
        _native.read_block(str(tmp_path / "missing.bin"), 10, np.float64,
                           0, 10, 0, 10)
    # truncated file → premature EOF error
    p = str(tmp_path / "short.bin")
    np.zeros(10).tofile(p)
    with pytest.raises(OSError):
        _native.read_block(p, 100, np.float64, 0, 100, 0, 100)


def test_sharded_load_uses_native(tmp_path):
    import chase_tpu
    H = random_hermitian(96, dtype=np.float64, seed=3)
    p = str(tmp_path / "h96.bin")
    cio.save_matrix(H, p)
    grid = chase_tpu.make_grid()
    Hs = cio.load_matrix_sharded(p, 96, np.float64, grid)
    np.testing.assert_array_equal(np.asarray(Hs), H)


def test_numpy_fallback_parity(tmp_path, monkeypatch):
    H = random_hermitian(48, dtype=np.complex64, seed=4)
    p = str(tmp_path / "h48.bin")
    cio.save_matrix(H, p)
    a = cio.load_matrix(p, 48, np.complex64)
    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", True)
    b = cio.load_matrix(p, 48, np.complex64)
    np.testing.assert_array_equal(a, b)
