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
           "save_matrix_sharded", "load_matrix_blockcyclic",
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


def save_matrix_sharded(H, path: str):
    """Write a (possibly grid-sharded) device matrix to a global
    column-major ChASE binary file.

    Collective-write analogue of ``BlockBlockMatrix::saveToBinaryFile``
    (distMatrix.hpp:2241-2298, MPI subarray ``MPI_File_write_all``): every
    process writes only the byte ranges of its own addressable shards, so
    on a multi-host mesh with a shared filesystem no host ever gathers the
    global matrix.  Replicated copies (replica_id != 0) are skipped, so
    each global block is written exactly once.
    """
    N, M = H.shape
    dtype = np.dtype(H.dtype)
    # Ensure the file exists at full size (sparse; cheap on POSIX).
    # O_CREAT *without* O_TRUNC + extend-only ftruncate: on a shared
    # filesystem a late-arriving host must never wipe shards another host
    # already wrote.
    expect = N * M * dtype.itemsize
    fd = os.open(path, os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        if os.fstat(fd).st_size != expect:
            # size to EXACTLY the matrix: an oversized pre-existing file
            # would otherwise keep stale trailing bytes and break the
            # byte-compatibility with save_matrix output.  Still multi-host
            # safe: no writer ever writes beyond `expect`, so truncating
            # down cannot drop another host's shard.
            os.ftruncate(fd, expect)
    finally:
        os.close(fd)
    shards = getattr(H, "addressable_shards", None)
    if not shards:
        save_matrix(H, path)
        return
    from . import _native
    native = _native.available()
    mm = None
    if not native:
        # column-major global file == (M, N) C-order view, transposed indices
        mm = np.memmap(path, dtype=dtype, mode="r+", shape=(M, N))
    for shard in shards:
        if shard.replica_id != 0:
            continue
        ri, ci = shard.index
        r0 = ri.indices(N)[0]
        c0 = ci.indices(M)[0]
        block = np.asarray(shard.data)
        if native:
            _native.write_block(path, N, block, r0, c0)
        else:
            mm[c0:c0 + block.shape[1], r0:r0 + block.shape[0]] = block.T
    if mm is not None:
        mm.flush()


def load_matrix_blockcyclic(path: str, N: int, dtype, grid: Grid2D, mb: int,
                            layout=None):
    """Load a *global* column-major ChASE file straight into the
    block-cyclic sharded layout.

    Analogue of ``BlockCyclicMatrix::readFromBinaryFile``
    (distMatrix.hpp:3210-3260): the reference builds an
    ``MPI_Type_create_darray`` view so each rank pulls exactly the
    mb×nb-cyclically-owned elements out of the global file.  Here each
    shard's callback gathers its block-cyclically owned rows/columns
    (``BlockCyclicLayout`` ownership permutation) from the file, producing
    the permuted operator that contiguous mesh sharding distributes exactly
    like ScaLAPACK block-cyclic would.

    Returns (H_sharded, layout); pass eigenvector rows through
    ``layout.restore_rows`` on the way out.  N must divide the mesh tiling
    (use DenseOperator's padding for ragged N); mb need not divide N.
    """
    from .parallel.layouts import BlockCyclicLayout
    dtype = np.dtype(dtype)
    expect = N * N * dtype.itemsize
    size = os.path.getsize(path)
    if size < expect:
        raise ValueError(f"{path}: {size} bytes < expected {expect}")
    if layout is None:
        shape = grid.shape
        layout = BlockCyclicLayout(N, mb, shape.get("r", 1),
                                   shape.get("c", 1))
    # Hermitian similarity transform: the same (row) ownership permutation
    # on both sides (layouts.BlockCyclicLayout.apply).
    perm = layout.row_perm
    from . import _native
    native = _native.available()
    mm = None
    if not native:
        mm = np.memmap(path, dtype=dtype, mode="r", shape=(N, N))  # (col,row)
    sharding = matrix_sharding(grid)

    def _runs(idx):
        """Contiguous (start, stop, out_offset) runs of an index array.

        Block-cyclic ownership is piecewise-contiguous in mb-blocks
        (block_cyclic_perm groups whole blocks per owner), so each shard
        assembles from ~N/(mb·p) contiguous slices instead of an
        element-granularity gather."""
        brk = np.flatnonzero(np.diff(idx) != 1) + 1
        starts = np.concatenate([[0], brk])
        stops = np.concatenate([brk, [len(idx)]])
        return [(int(idx[s]), int(idx[e - 1]) + 1, int(s))
                for s, e in zip(starts, stops)]

    def cb(index):
        ri, ci = index
        rows = perm[ri]
        cols = perm[ci]
        out = np.empty((len(rows), len(cols)), dtype)
        for c0, c1, co in _runs(cols):
            for r0, r1, ro in _runs(rows):
                if native:
                    blk = _native.read_block(path, N, dtype, r0, r1 - r0,
                                             c0, c1 - c0)
                else:
                    blk = mm[c0:c1, r0:r1].T
                out[ro:ro + (r1 - r0), co:co + (c1 - c0)] = blk
        return out

    H = jax.make_array_from_callback((N, N), sharding, cb)
    return H, layout


def save_state(path: str, V, ritzv, meta: Optional[dict] = None, *,
               sharded: bool = False):
    """Persist a warm-restart checkpoint (V, ritzv) for sequence solves.

    ``sharded=True`` writes V through the per-shard collective writer
    (each host touches only its own byte ranges — multi-host safe) into
    ``path + ".V.bin"``, with the small (ritzv, meta, shape) sidecar in
    the npz; V never gathers to one host.
    """
    if sharded:
        import jax
        base = path[:-4] if path.endswith(".npz") else path
        meta = dict(meta or {})
        meta["_sharded_V"] = {"rows": int(V.shape[0]),
                              "cols": int(V.shape[1]),
                              "dtype": np.dtype(V.dtype).name}
        save_matrix_sharded(V, base + ".V.bin")
        # sidecar written once (np.savez is not atomic; concurrent hosts
        # writing the same shared-FS file would corrupt it)
        if jax.process_index() == 0:
            np.savez(base + ".npz", ritzv=np.asarray(ritzv),
                     meta=json.dumps(meta))
        return
    np.savez(path, V=np.asarray(V), ritzv=np.asarray(ritzv),
             meta=json.dumps(meta or {}))


def load_state(path: str, grid: Optional[Grid2D] = None):
    """Load a warm-restart checkpoint; pass ``grid`` to load a sharded V
    directly onto the mesh (each process reads only its shards)."""
    base = path[:-4] if path.endswith(".npz") else path
    z = np.load(base + ".npz", allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    sv = meta.pop("_sharded_V", None)
    if sv is not None:
        vpath = base + ".V.bin"
        if grid is not None:
            V = _load_tall_sharded(vpath, sv["rows"], sv["cols"],
                                   np.dtype(sv["dtype"]), grid)
        else:
            V = load_matrix(vpath, sv["rows"], np.dtype(sv["dtype"]),
                            M=sv["cols"])
        return V, z["ritzv"], meta
    return z["V"], z["ritzv"], meta


def _load_tall_sharded(path: str, N: int, M: int, dtype, grid: Grid2D):
    """Load an (N, M) column-major file with the multivector sharding
    P('r', None) — the warm-start V layout."""
    from .parallel.mesh import colvec_sharding
    from . import _native
    native = _native.available()
    mm = None
    if not native:
        mm = np.memmap(path, dtype=dtype, mode="r", shape=(M, N))

    def cb(index):
        ri, ci = index
        r0, r1 = ri.indices(N)[:2]
        c0, c1 = ci.indices(M)[:2]
        if native:
            return _native.read_block(path, N, dtype, r0, r1 - r0,
                                      c0, c1 - c0)
        return np.ascontiguousarray(mm[ci, ri].T)

    return jax.make_array_from_callback((N, M), colvec_sharding(grid), cb)
