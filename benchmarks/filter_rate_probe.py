"""Raw Chebyshev-filter kernel rate at an exact window shape — same-day
control for the in-solve effective rate (BENCH_NOTES round-5 folded A/B).

The in-solve north-star filter runs ~90-92 TF/s effective while the raw
kernel measured 168.8 TF/s at the same (N=30000, w=750) shape — but that
figure is from round 4 and the relay drifts, so it cannot be compared
across days (CLAUDE.md).  This probe re-measures the raw kernel rate the
same day, in three configurations that bracket the in-solve conditions:

  raw      bf16 H x bf16 carries (the round-4 probe's configuration)
  carry32  bf16 H x f32 carries + masked writeback — the solve's actual
           bf16-rung inner loop (ops/filter.py): extra f32 V traffic +
           per-step cast + degree-mask select
  ballast  carry32 with ~6 GB of resident HBM ballast (the solve's
           H f32 shadow + basis state) — tests the HBM-pressure hypothesis

Marginal-cost methodology (bench.py): traced sweep count, scalar readback
forces materialization, rate = dFLOPs / dtime.  One JSON line.
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
    p.add_argument("--w", type=int, default=750)
    p.add_argument("--deg", type=int, default=20)
    p.add_argument("--hi", type=int, default=9)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--ballast-gb", type=float, default=6.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    N, W, DEG = args.n, args.w, args.deg
    log(f"devices: {jax.devices()}")
    key = jax.random.key(0)
    H_bf = jax.random.normal(key, (N, N), jnp.bfloat16)
    H_bf.block_until_ready()
    V0 = jax.random.normal(jax.random.key(1), (N, W), jnp.float32)
    flops_per_sweep = 2.0 * N * N * W * DEG

    def measure(step_of, ctx, state0):
        @jax.jit
        def run_prog(ctx, state, sweeps):
            return jax.lax.fori_loop(0, sweeps, step_of(ctx), state)

        def run(sweeps):
            t0 = time.perf_counter()
            out = run_prog(ctx, state0, jnp.int32(sweeps))
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.sum(jnp.abs(leaf[:2, :2]).astype(jnp.float32)))
            return time.perf_counter() - t0

        run(1)
        diffs = []
        for rep in range(args.reps):
            t_lo = run(1)
            t_hi = run(args.hi)
            diffs.append(t_hi - t_lo)
            log(f"  t_lo={t_lo:.3f}s t_hi={t_hi:.3f}s diff={t_hi-t_lo:.3f}s")
        pos = [d for d in diffs if d > 0]
        dt = min(pos) if pos else max(sum(diffs) / len(diffs), 1e-9)
        return flops_per_sweep * (args.hi - 1) / 1e12 / dt

    # --- raw: bf16 H x bf16 carries -------------------------------------
    def raw_step_of(h):
        def step(s, V):
            Y = jnp.matmul(h, V, preferred_element_type=jnp.float32)

            def body(t, carry):
                Xp, Yc = carry
                Z = 2.0 * jnp.matmul(h, Yc.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32) \
                    - Xp.astype(jnp.float32)
                return (Yc, Z.astype(jnp.bfloat16))

            _, Y = jax.lax.fori_loop(2, DEG + 1, body,
                                     (V, Y.astype(jnp.bfloat16)))
            nrm = jnp.linalg.norm(Y.astype(jnp.float32)) + 1.0
            return (Y.astype(jnp.float32) / nrm).astype(V.dtype)
        return step

    rate_raw = measure(raw_step_of, H_bf, V0.astype(jnp.bfloat16))
    log(f"raw bf16xbf16: {rate_raw:.1f} TF/s")

    # --- carry32: the solve's bf16 rung (f32 carries + degree mask) ------
    mask = (jnp.arange(W) < W).astype(jnp.float32)  # all-active window

    def carry32_step_of(h):
        def step(s, V):
            Y = jnp.matmul(h, V.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

            def body(t, carry):
                Xp, Yc = carry
                Z = 2.0 * jnp.matmul(h, Yc.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32) - Xp
                Z = jnp.where(mask[None, :] > 0, Z, Yc)  # degree-mask select
                return (Yc, Z)

            _, Y = jax.lax.fori_loop(2, DEG + 1, body, (V, Y))
            nrm = jnp.linalg.norm(Y) + 1.0
            return Y / nrm
        return step

    rate_c32 = measure(carry32_step_of, H_bf, V0)
    log(f"carry32 (solve inner loop): {rate_c32:.1f} TF/s")

    # --- ballast: carry32 with resident HBM pressure ----------------------
    nb = int(args.ballast_gb * 2**30 / 4)
    ballast = jnp.zeros((nb // 1024, 1024), jnp.float32) + 1.0
    ballast.block_until_ready()
    rate_bal = measure(carry32_step_of, H_bf, V0)
    del ballast
    log(f"carry32 + {args.ballast_gb:.0f} GB ballast: {rate_bal:.1f} TF/s")

    print(json.dumps({
        "metric": "filter_rate_probe", "unit": "TF/s",
        "config": {"N": N, "w": W, "deg": DEG},
        "raw_bf16": round(rate_raw, 1),
        "carry32": round(rate_c32, 1),
        "carry32_ballast": round(rate_bal, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
