"""Peak-HBM repro for the wide RR projection at the DP north-star shape.

The N=30000 nev=2250 f64 solve OOM'd the chip at the FIRST wide RR
(BENCH_NOTES round 5).  This reproduces just that program with
device-generated random slices (no 25-min host slicing), plus ballast
approximating the solver's resident basis state, so fixes can be
iterated in minutes.  One JSON line: ok/oom per stage.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=30000)
    p.add_argument("--k", type=int, default=3000)
    p.add_argument("--L", type=int, default=7)
    p.add_argument("--s", type=int, default=6)
    p.add_argument("--ballast-gb", type=float, default=1.4,
                   help="solver-resident state stand-in (V is allocated "
                        "separately)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from chase_tpu.ops import rr as rrops

    N, k, L, s = args.n, args.k, args.L, args.s
    log(f"devices: {jax.devices()}")
    dev = jax.devices()[0]

    def mem():
        try:
            st = dev.memory_stats()
            return {kk: st[kk] for kk in ("bytes_in_use", "peak_bytes_in_use")
                    if kk in st}
        except Exception as e:  # noqa: BLE001
            return {"unavailable": str(e)}

    # resident operator slice stack (random int8 — same bytes as real)
    keys = jax.random.split(jax.random.key(0), L + 3)
    slices = tuple(
        jax.random.randint(keys[i], (N, N), -127, 128, jnp.int8)
        for i in range(L))
    sa = jnp.ones((N, 1), jnp.float64)
    jax.block_until_ready(slices[-1])
    log(f"slice stack resident: {L} x {N*N/2**30:.2f} GB  mem={mem()}")

    ballast = None
    if args.ballast_gb > 0:
        nb = int(args.ballast_gb * 2**30 / 4 / 1024)
        ballast = jnp.ones((nb, 1024), jnp.float32)
        jax.block_until_ready(ballast)

    V = jax.random.normal(keys[L], (N, k), jnp.float64)
    nrm = jnp.linalg.norm(V, axis=0)
    V = V / nrm[None, :]
    jax.block_until_ready(V)
    log(f"V placed.  mem={mem()}")

    t0 = time.perf_counter()
    try:
        out = rrops.rayleigh_ritz_residuals(
            None, V, jnp.int32(0), want_vectors=True,
            H_wide=(slices, sa, s, L))
        jax.block_until_ready(out[0])
        wall = time.perf_counter() - t0
        log(f"wide RR ok in {wall:.1f}s (cold).  mem={mem()}")
        # warm repeat for the marginal cost
        t0 = time.perf_counter()
        out = rrops.rayleigh_ritz_residuals(
            None, V, jnp.int32(0), want_vectors=True,
            H_wide=(slices, sa, s, L))
        jax.block_until_ready(out[0])
        warm = time.perf_counter() - t0
        log(f"warm {warm:.1f}s")
        print(json.dumps({"metric": "rr_wide_peak", "ok": True,
                          "cold_s": round(wall, 1), "warm_s": round(warm, 1),
                          "mem": mem()}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"metric": "rr_wide_peak", "ok": False,
                          "error": str(e)[:500], "mem": mem()}), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
