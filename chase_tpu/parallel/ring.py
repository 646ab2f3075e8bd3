"""Ring collective matmul — explicit compute/communication overlap (P11).

The reference overlaps the filter's GEMM with its allreduce via dual CUDA
streams (nccl/hemm.hpp:95-266 split-GEMM path) and fuses the multivector
redistribution into HEMM (mpi/hemm.hpp:282-494).  The TPU-native analogue
is a *collective matmul* (the scaling-book pattern): with H row-sharded
P('x', None) and V row-sharded P('x'), each device needs all of V — instead
of an up-front all-gather, V circulates around the ring in p chunks and
each device multiplies its local H stripe against the chunk it currently
holds while the next chunk is in flight on ICI.

Two implementations:

* `ring_hemm` — shard_map + `lax.ppermute`, software-pipelined (the
  permute for step s+1 is issued before the dot of step s so XLA's
  latency-hiding scheduler can overlap them).  Runs everywhere (tested on
  the virtual CPU mesh).
* `pallas_ring_hemm` (ops/pallas_ring.py) — Pallas kernel with explicit
  inter-chip RDMA double-buffering for real TPU meshes.

Against GSPMD's default lowering (all-gather V, then one big dot) the ring
trades one large exposed collective for p overlapped small ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["ring_hemm", "chebyshev_filter_ring"]


def ring_hemm(grid, H, V, *, axis: str = "r", precision="highest"):
    """W = H @ V with H in P(axis, None), V in P(axis), W out in P(axis).

    Args:
      grid: Grid2D whose mesh carries `axis`.
      H: (N, N) row-sharded over `axis` (each device: (N/p, N) stripe).
      V: (N, k) row-sharded over `axis`.
    """
    mesh = grid.mesh
    p = mesh.shape[axis]

    def local(h, v):
        # h: (N/p, N) local stripe; v: (N/p, k) local chunk
        n_loc = v.shape[0]
        me = jax.lax.axis_index(axis)

        def step(s, carry):
            acc, cur = carry
            # chunk `cur` is the V rows owned by (me + s) mod p
            src = (me + s) % p
            # issue the transfer of the next chunk first (overlap with dot)
            nxt = jax.lax.ppermute(
                cur, axis, [(i, (i - 1) % p) for i in range(p)])
            h_blk = jax.lax.dynamic_slice(
                h, (jnp.int32(0), (src * n_loc).astype(jnp.int32)),
                (h.shape[0], n_loc))
            acc = acc + jnp.matmul(h_blk, cur, precision=precision)
            return (acc, nxt)

        acc = jnp.zeros((h.shape[0], v.shape[1]),
                        jnp.promote_types(h.dtype, v.dtype))
        acc = jax.lax.pcast(acc, (axis,), to="varying")  # device-varying
        acc, _ = jax.lax.fori_loop(0, p, step, (acc, v))
        return acc.astype(v.dtype)

    spec_h = P(axis, None)
    spec_v = P(axis, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec_h, spec_v),
                   out_specs=spec_v)
    return fn(H, V)


def chebyshev_filter_ring(grid, H, X, degrees, lam1, lower, upper, deg_max,
                          *, axis: str = "r", precision="highest"):
    """Chebyshev filter with the ring collective matmul as the HEMM (P11
    integrated): the whole recurrence runs inside one shard_map, each step's
    H·V expressed as the software-pipelined ring so the V-chunk transfers
    overlap the local dots.

    H in P(axis, None) (1D row stripes), X in P(axis).  Semantics identical
    to ops.filter.chebyshev_filter.
    """
    mesh = grid.mesh
    p = mesh.shape[axis]
    rt = jnp.asarray(0.0, H.real.dtype).dtype

    lam1 = jnp.asarray(lam1, rt)
    lower = jnp.asarray(lower, rt)
    upper = jnp.asarray(upper, rt)
    c = (upper + lower) / 2
    e = (upper - lower) / 2
    sigma1 = e / (lam1 - c)
    deg_max = jnp.asarray(deg_max, jnp.int32)

    def local(h, x, degs):
        n_loc = x.shape[0]
        me = jax.lax.axis_index(axis)

        def ring_dot(v):
            def step(s, carry):
                acc, cur = carry
                src = (me + s) % p
                nxt = jax.lax.ppermute(
                    cur, axis, [(i, (i - 1) % p) for i in range(p)])
                h_blk = jax.lax.dynamic_slice(
                    h, (jnp.int32(0), (src * n_loc).astype(jnp.int32)),
                    (h.shape[0], n_loc))
                acc = acc + jnp.matmul(h_blk, cur, precision=precision)
                return (acc, nxt)
            acc = jnp.zeros((h.shape[0], v.shape[1]), v.dtype)
            acc = jax.lax.pcast(acc, (axis,), to="varying")
            acc, _ = jax.lax.fori_loop(0, p, step, (acc, v))
            return acc

        def hemm_shift(v):
            return ring_dot(v) - c.astype(rt) * v

        Y = (sigma1 / e) * hemm_shift(x)
        Y = jnp.where(degs[None, :] >= 1, Y, x)

        def body(t, carry):
            Xp, Yc, sigma = carry
            sigma_new = 1.0 / (2.0 / sigma1 - sigma)
            Z = (2.0 * sigma_new / e) * hemm_shift(Yc) \
                - (sigma * sigma_new) * Xp
            Z = jnp.where(degs[None, :] >= t, Z, Yc)
            return (Yc, Z, sigma_new)

        _, Y, _ = jax.lax.fori_loop(2, deg_max + 1, body, (x, Y, sigma1))
        return Y

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis, None), P(axis, None), P()),
                   out_specs=P(axis, None))
    return fn(H, X, degrees)
