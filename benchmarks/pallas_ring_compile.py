"""Compile + run the Pallas ring HEMM on the REAL TPU backend.

VERDICT r4 missing #5: the hand-scheduled RDMA ring kernel
(ops/pallas_ring) had only ever executed in the TPU *interpreter* on the
CPU mesh.  Multi-chip hardware is unavailable in this sandbox, so this
drives the degenerate p=1 ring on the single chip — the kernel's DMA
double-buffering, barrier semaphores, and RDMA-to-self all go through the
real Mosaic compile + hardware paths, retiring the "does it even compile"
risk.  Output parity is checked against a plain matmul.  One JSON line.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    import chase_tpu
    from chase_tpu.ops.pallas_ring import pallas_ring_hemm

    log(f"devices: {jax.devices()}")
    N, K = 4096, 512
    rng = np.random.default_rng(0)
    H = rng.standard_normal((N, N)).astype(np.float32)
    H = (H + H.T) / 2
    V = rng.standard_normal((N, K)).astype(np.float32)
    grid = chase_tpu.make_grid(jax.devices()[:1], shape=(1, 1))
    Hd = jnp.asarray(H)
    Vd = jnp.asarray(V)

    t0 = time.perf_counter()
    W = pallas_ring_hemm(grid, Hd, Vd, interpret=False)
    W = np.asarray(W)
    t_compile = time.perf_counter() - t0
    ref = np.asarray(jnp.matmul(Hd, Vd, precision="highest"))
    rel = np.abs(W - ref).max() / np.abs(ref).max()
    log(f"pallas ring p=1 compiled: {t_compile:.1f}s, parity {rel:.3e}")

    # marginal-cost rate of the compiled kernel
    @jax.jit
    def sweep(h, v, n):
        def body(i, vv):
            w = pallas_ring_hemm(grid, h, vv, interpret=False)
            return w / (jnp.linalg.norm(w) + 1.0)
        return jax.lax.fori_loop(0, n, body, v)

    def run(n):
        t0 = time.perf_counter()
        out = sweep(Hd, Vd, jnp.int32(n))
        _ = float(jnp.sum(jnp.abs(out[:2, :2])))
        return time.perf_counter() - t0

    run(1)
    t_lo, t_hi = run(1), run(17)
    rate = 2.0 * N * N * K * 16 / 1e9 / max(t_hi - t_lo, 1e-9)
    log(f"rate: {rate:,.0f} GFLOP/s (lo={t_lo:.3f}s hi={t_hi:.3f}s)")
    print(json.dumps({"metric": "pallas_ring_p1", "N": N, "k": K,
                      "parity_rel": float(rel),
                      "gflops": round(rate, 1),
                      "compiled": True}), flush=True)


if __name__ == "__main__":
    main()
