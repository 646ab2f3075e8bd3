"""Benchmark: filter HEMM throughput on the local accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the only absolute perf number the reference repo publishes is the
sample table in docs/usage.rst:367-368 — GFLOPS(filter) = 1.000e+03 on 4
MPI processes.  vs_baseline = our filter GFLOP/s / 1000.

The FLOP count uses the reference's analytic model
(performance.hpp:248-260): 2 · factor · N² · filtered_vecs, factor 4 for
complex.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from chase_tpu.ops.filter import chebyshev_filter

    # Config sized for a single v5e chip (16 GB HBM): f32 8192² operator.
    N, k, deg = 8192, 1024, 20
    dtype = jnp.float32
    precision = "highest"   # f32-accurate MXU path (bf16x6) — the solve path

    key = jax.random.key(0)
    H = jax.random.normal(key, (N, N), dtype)
    H = (H + H.T) / 2
    V = jax.random.normal(jax.random.key(1), (N, k), dtype)
    degrees = jnp.full((k,), deg, jnp.int32)
    lam1 = jnp.asarray(-2.2 * np.sqrt(N), jnp.float32)
    lower = jnp.asarray(0.0, jnp.float32)
    upper = jnp.asarray(2.2 * np.sqrt(N), jnp.float32)
    dm = jnp.int32(deg)

    def run(v):
        return chebyshev_filter(H, v, degrees, lam1, lower, upper, dm,
                                precision=precision)

    # warmup/compile
    out = run(V)
    out.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    v = out
    for _ in range(reps):
        v = run(v)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    filtered_vecs = deg * k
    gflops = 2.0 * N * N * filtered_vecs / 1e9   # real dtype: factor 1
    rate = gflops / dt

    print(json.dumps({
        "metric": "filter_hemm_gflops",
        "value": round(rate, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(rate / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
