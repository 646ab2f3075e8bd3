"""Pallas ring collective matmul — explicit RDMA/compute overlap (P11).

Hand-scheduled TPU analogue of the reference's dual-stream GEMM+allreduce
overlap (nccl/hemm.hpp:95-266) for the filter HEMM on a 1D device ring:
H row-sharded (each device holds an (m = N/p) × N stripe in HBM), V
row-sharded ((b = N/p) × k chunk).  Per ring step, each device

  * DMAs the next H block HBM→VMEM (double-buffered),
  * RDMAs its current V chunk to the right neighbor (double-buffered),
  * runs the MXU dot of the current (m×b)·(b×k) pair,

so interconnect transfers hide behind the matmul.  A neighbor barrier at
the top of each step protects buffer-slot reuse.

The same kernel runs compiled on real TPU meshes and in interpreter mode
on the forced-host-device CPU mesh (how CI validates it — the reference's
"mpirun -n 4 is the cluster" testing strategy, SURVEY §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

__all__ = ["pallas_ring_hemm", "make_hemm_local"]


def _ring_kernel(p, axis, mt, h_ref, v_ref, o_ref, h_buf, v_buf, h_sem,
                 send_sem, recv_sem):
    me = jax.lax.axis_index(axis).astype(jnp.int32)
    p32 = jnp.int32(p)
    right = jax.lax.rem(me + 1, p32)
    left = jax.lax.rem(me - 1 + p32, p32)
    b = v_ref.shape[0]
    m = o_ref.shape[0]
    nmt = m // mt          # static row-tile count
    total = p * nmt        # static global H-tile count

    v_buf[0] = v_ref[...]

    def h_dma(slot, t):
        # Global tile index t = s*nmt + i: ring step s picks the H column
        # block (chunks travel rightward, so at step s we hold chunk
        # me-s), row tile i picks the mt-row stripe.  H stays in HBM
        # (memory_space=ANY) and streams through a (2, mt, b) VMEM double
        # buffer — the whole (m, b) block would blow the ~128 MB VMEM
        # (measured RESOURCE_EXHAUSTED on the v5e at m=b=4096).
        s = t // jnp.int32(nmt)
        i = t - s * jnp.int32(nmt)
        src = jax.lax.rem(me - s + p32, p32)
        return pltpu.make_async_copy(
            h_ref.at[pl.ds(i * mt, mt), pl.ds(src * b, b)],
            h_buf.at[slot], h_sem.at[slot])

    h_dma(0, jnp.int32(0)).start()

    def step_fn(s, _):
        vslot = jax.lax.rem(s, jnp.int32(2))
        nvslot = 1 - vslot

        # neighbor barrier: everyone finished step s-1 before we overwrite
        # the V buffers they might still be reading
        @pl.when(s > 0)
        def _():
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(bar, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(bar, inc=1, device_id=right,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bar, 2)

        # pass the current chunk onward while we compute with it
        rdma = pltpu.make_async_remote_copy(
            src_ref=v_buf.at[vslot], dst_ref=v_buf.at[nvslot],
            send_sem=send_sem.at[vslot], recv_sem=recv_sem.at[nvslot],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)

        @pl.when(s + 1 < p)
        def _():
            rdma.start()

        def tile_fn(i, _):
            t = s * jnp.int32(nmt) + i
            tslot = jax.lax.rem(t, jnp.int32(2))
            h_dma(tslot, t).wait()

            @pl.when(t + 1 < total)
            def _():
                h_dma(1 - tslot, t + 1).start()

            acc = jnp.dot(h_buf[tslot], v_buf[vslot],
                          preferred_element_type=jnp.float32)
            rows = pl.ds(i * mt, mt)

            @pl.when(s == 0)
            def _():
                o_ref[rows, :] = acc.astype(o_ref.dtype)

            @pl.when(s > 0)
            def _():
                o_ref[rows, :] = o_ref[rows, :] + acc.astype(o_ref.dtype)

            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nmt), tile_fn,
                          jnp.int32(0))

        @pl.when(s + 1 < p)
        def _():
            rdma.wait()

        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(p), step_fn, jnp.int32(0))


def _pick_row_tile(m, budget_rows=512):
    """Largest divisor of m that is <= budget_rows, preferring sublane
    (x8) alignment; m itself when m <= budget_rows."""
    if m <= budget_rows:
        return m
    for mult in (8, 1):
        for mt in range(budget_rows, 0, -1):
            if m % mt == 0 and mt % mult == 0:
                return mt
    return m


def make_hemm_local(p, axis, m, b, k, h_dtype, v_dtype, *,
                    interpret: bool = False, collective_id: int = 0):
    """Per-shard callable ``local(h, v) -> (m, k)`` running the pipelined
    ring HEMM as ONE pallas_call — for embedding the kernel inside a
    larger shard_map body (e.g. the Chebyshev recurrence of
    parallel.ring.chebyshev_filter_ring_pallas).  ``h`` is the local
    (m, N) stripe, ``v`` the local (b, k) chunk.

    ``interpret=True`` routes through the TPU interpreter
    (pltpu.InterpretParams) — the plain HLO interpreter cannot model the
    barrier/DMA semaphores this kernel uses."""
    if interpret is True:
        interpret = pltpu.InterpretParams()
    mt = _pick_row_tile(m)
    kernel = functools.partial(_ring_kernel, p, axis, mt)

    # resident VMEM: H double buffer + V double buffer + V input + output
    isz_h = jnp.dtype(h_dtype).itemsize
    isz_v = jnp.dtype(v_dtype).itemsize
    vmem = 2 * mt * b * isz_h + 3 * b * k * isz_v + m * k * isz_v
    if not interpret and vmem > 100 * 2**20:
        raise ValueError(
            f"pallas ring HEMM VMEM footprint {vmem / 2**20:.0f} MB "
            f"(m={m}, b={b}, k={k}, mt={mt}) exceeds the ~100 MB budget; "
            "shrink k (filter in column windows) or grow the ring")

    def local(h, v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, k), v_dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, mt, b), h_dtype),
                pltpu.VMEM((2, b, k), v_dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                collective_id=collective_id, has_side_effects=True,
                # the dot's operand reads from the scratch refs spill to
                # the kernel stack (~2(mt·b + b·k) f32); the default 16 MB
                # scoped-vmem limit rejects that at mt=b... tiles
                # (measured on the v5e — BENCH_NOTES round 5)
                vmem_limit_bytes=100 * 2**20),
        )(h, v)

    return local


def pallas_ring_hemm(grid, H, V, *, axis: str = "r", interpret: bool = False,
                     collective_id: int = 0):
    """W = H @ V on a 1D ring: H in P(axis, None), V in P(axis, None).

    Requires the mesh to be effectively 1D along `axis` (the other axis, if
    present, must have size 1 — Pallas LOGICAL RDMA addressing supports one
    named axis).
    """
    from jax.sharding import Mesh
    p = grid.mesh.shape[axis]
    for name, size in grid.mesh.shape.items():
        if name != axis and size != 1:
            raise ValueError("pallas_ring_hemm needs a 1D mesh along "
                             f"'{axis}'; axis '{name}' has size {size}")
    # Pallas LOGICAL RDMA addressing supports exactly one named axis: run
    # the kernel under a flattened 1D view of the same devices.
    mesh = Mesh(grid.mesh.devices.reshape(-1), (axis,))
    N, k = H.shape[0], V.shape[1]
    if N % p:
        raise ValueError(f"N={N} not divisible by ring size {p}")
    m = N // p
    b = N // p

    local = make_hemm_local(p, axis, m, b, k, H.dtype, V.dtype,
                            interpret=interpret,
                            collective_id=collective_id)

    spec = P(axis, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                   check_vma=False)
    return fn(H, V)
