"""Binary matrix I/O and solver-state checkpointing.

Mirrors the reference's two persistence mechanisms (SURVEY §5 "Checkpoint /
resume"):

1. Raw column-major binary matrix files — byte-compatible with
   ``Matrix::saveToBinaryFile/readFromBinaryFile`` (matrix.hpp:276-351) and
   the CLI's ``--path_in`` files, so existing ChASE problem files load
   directly.  The distributed variant replaces MPI-IO subarray reads
   (``MPI_File_set_view`` + ``*_all``, distMatrix.hpp:2243-2410) with
   per-shard ``np.memmap`` slices assembled into a global sharded array via
   ``jax.make_array_from_callback`` — each host touches only the bytes of
   its own shards.

2. Warm-restart checkpoints: the (V, ritzv) pair that the "sequence of
   eigenproblems" feature feeds back through mode='A'.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from .parallel.mesh import Grid2D, matrix_sharding

__all__ = ["save_matrix", "load_matrix", "load_matrix_sharded",
           "save_state", "load_state"]


def save_matrix(H, path: str):
    """Raw column-major dump (ChASE binary format)."""
    H = np.asarray(H)
    H.T.tofile(path)           # .T of C-order == column-major stream


def load_matrix(path: str, N: int, dtype, M: Optional[int] = None):
    """Load a column-major N×M binary matrix (ChASE format) into numpy."""
    M = M if M is not None else N
    dtype = np.dtype(dtype)
    expect = N * M * dtype.itemsize
    if os.path.getsize(path) < expect:
        raise ValueError(f"{path}: {os.path.getsize(path)} bytes < "
                         f"expected {expect}")
    from . import _native
    if _native.available():
        return _native.read_block(path, N, dtype, 0, N, 0, M)
    data = np.fromfile(path, dtype=dtype, count=N * M)
    return data.reshape(M, N).T     # column-major → (N, M)


def load_matrix_sharded(path: str, N: int, dtype, grid: Grid2D,
                        M: Optional[int] = None):
    """Load a column-major binary matrix directly into a 2D-sharded device
    array; each process reads only its own shards (MPI-IO analogue)."""
    M = M if M is not None else N
    dtype = np.dtype(dtype)
    expect = N * M * dtype.itemsize
    size = os.path.getsize(path)
    if size < expect:
        raise ValueError(f"{path}: {size} bytes < expected {expect}")
    from . import _native
    native = _native.available()
    mm = None
    if not native:
        # memmap is the transposed (column-major) view: element (i, j) of
        # the logical matrix lives at mm[j, i].
        mm = np.memmap(path, dtype=dtype, mode="r", shape=(M, N))
    sharding = matrix_sharding(grid)

    def cb(index):
        # index: tuple of slices into the logical (N, M) array
        ri, ci = index
        r0, r1 = ri.indices(N)[:2]
        c0, c1 = ci.indices(M)[:2]
        if native:
            return _native.read_block(path, N, dtype, r0, r1 - r0,
                                      c0, c1 - c0)
        return np.ascontiguousarray(mm[ci, ri].T)

    return jax.make_array_from_callback((N, M), sharding, cb)


def save_state(path: str, V, ritzv, meta: Optional[dict] = None):
    """Persist a warm-restart checkpoint (V, ritzv) for sequence solves."""
    np.savez(path, V=np.asarray(V), ritzv=np.asarray(ritzv),
             meta=json.dumps(meta or {}))


def load_state(path: str):
    z = np.load(path if path.endswith(".npz") else path + ".npz",
                allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    return z["V"], z["ritzv"], meta
