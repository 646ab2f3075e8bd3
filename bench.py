"""Benchmark: Chebyshev-filter HEMM throughput on the local accelerator.

Prints ONE JSON line.  Headline fields {"metric", "value", "unit",
"vs_baseline"} report the f32-`highest` path (the accuracy-default solve
path, comparable across rounds); the decision-grade detail rides along:

  "ladder":  GFLOP/s for every MXU precision rung on the same recurrence —
             highest (f32, bf16x6 passes), high (bf16x3), default (bf16),
             and the bf16-storage rung (bf16 inputs, f32 accumulation) —
             the menu the mixed-precision ladder (config.mixed_precision /
             bf16_filter + refine_filter) actually schedules.
  "complex_gflops": complex64 filter figure.  The sandbox TPU backend does
             not implement complex dtypes, so when native complex fails the
             bench measures the explicit 4-real-matmul decomposition
             ON-DEVICE (what XLA lowers complex GEMMs to on real TPUs) and
             reports that rate in complex-FLOP terms (8·N²·k per matmul
             pair step).

Baseline: the only absolute perf number the reference repo publishes is the
sample table in docs/usage.rst:367-368 — GFLOPS(filter) = 1.000e+03 (4 MPI
processes).  vs_baseline = our filter GFLOP/s / 1000.

Methodology: the sandbox TPU is reached through a relay with seconds of
fixed per-dispatch overhead and an async `block_until_ready`, so wall-clock
around a single call is meaningless.  We run the whole filter loop inside
one jitted program with a *traced* sweep count (one compilation), call it
with a low and a high sweep count, force materialization with a scalar
readback, and report marginal GFLOP/s = ΔFLOPs / Δtime — the fixed
dispatch/transfer overhead cancels.
"""

import json
import sys
import time
from functools import partial

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _get_backend_with_retry():
    """The sandbox TPU plugin registration is flaky (tunnel contention).
    jax memoizes backend-init failures, so an in-process retry needs the
    platform list reset; last resort is CPU so a JSON line always prints."""
    import jax
    try:
        devs = jax.devices()
        log(f"bench devices: {devs}")
        return devs
    except RuntimeError as e:
        log(f"bench: backend init failed: {e}")
    jax.config.update("jax_platforms", "cpu")
    log("bench: FALLING BACK TO CPU — TPU backend never registered")
    return jax.devices()


N, K, DEG = 8192, 1024, 20


def _measure(step_maker, ctx, state0, flops_per_sweep, reps=2, hi_sweeps=17):
    """Marginal-cost rate of `sweeps` repetitions of the sweep.

    ``ctx`` (the operand arrays, e.g. H) is passed as a jit ARGUMENT —
    closing over a 256 MB array would embed it as a constant in the
    program shipped to the remote compiler (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_prog(ctx, state, sweeps):
        return jax.lax.fori_loop(0, sweeps, step_maker(ctx), state)

    def run(sweeps):
        t0 = time.perf_counter()
        out = run_prog(ctx, state0, jnp.int32(sweeps))
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(jnp.abs(leaf[:2, :2]).astype(jnp.float32)))
        return time.perf_counter() - t0

    run(1)                      # compile + warm
    diffs = []
    for rep in range(reps):
        t_lo = run(1)
        t_hi = run(hi_sweeps)
        diffs.append(t_hi - t_lo)
        log(f"  rep {rep}: t_lo={t_lo:.3f}s t_hi={t_hi:.3f}s "
            f"diff={t_hi - t_lo:.3f}s")
    dt = min(d for d in diffs if d > 0) if any(d > 0 for d in diffs) \
        else max(sum(diffs) / len(diffs), 1e-9)
    return flops_per_sweep * (hi_sweeps - 1) / 1e9 / dt


def _filter_sweep(matvec_of, dtype):
    """step_maker: ctx → one renormalized DEG-step Chebyshev sweep."""
    import jax.numpy as jnp

    def maker(ctx):
        import jax
        matvec = matvec_of(ctx)
        c = jnp.float32(0.0)
        e = jnp.float32(2.2 * np.sqrt(N))
        sigma1 = jnp.float32(0.5)

        def sweep(s, V):
            Y = (sigma1 / e) * (matvec(V) - c * V)

            def body(t, carry):
                Xp, Yc, sigma = carry
                sigma_new = 1.0 / (2.0 / sigma1 - sigma)
                Z = (2.0 * sigma_new / e) * (matvec(Yc) - c * Yc) \
                    - (sigma * sigma_new) * Xp
                return (Yc, Z, sigma_new)

            _, Y, _ = jax.lax.fori_loop(2, DEG + 1, body, (V, Y, sigma1))
            # abs() first: complex sweeps must renormalize by the full
            # modulus, not the real part
            nrm = jnp.linalg.norm(jnp.abs(Y).astype(jnp.float32)) + 1.0
            return (Y / nrm.astype(Y.real.dtype)).astype(dtype)

        return sweep

    return maker


def main():
    import jax
    import jax.numpy as jnp

    _get_backend_with_retry()

    key = jax.random.key(0)
    H = jax.random.normal(key, (N, N), jnp.float32)
    H = (H + H.T) / 2
    V0 = jax.random.normal(jax.random.key(1), (N, K), jnp.float32)
    H_bf = H.astype(jnp.bfloat16)
    real_flops_per_sweep = 2.0 * N * N * K * DEG

    ladder = {}
    for name, mv_of, hmat in [
        ("highest",
         lambda h: lambda v: jnp.matmul(h, v, precision="highest"), H),
        ("high",
         lambda h: lambda v: jnp.matmul(h, v, precision="high"), H),
        ("default",
         lambda h: lambda v: jnp.matmul(h, v, precision="default"), H),
        ("bf16_in_f32_acc",
         lambda h: lambda v: jnp.matmul(
             h, v.astype(jnp.bfloat16), precision="default",
             preferred_element_type=jnp.float32), H_bf),
    ]:
        log(f"bench ladder rung: {name}")
        reps = 3 if name == "highest" else 2
        rate = _measure(_filter_sweep(mv_of, jnp.float32), hmat, V0,
                        real_flops_per_sweep, reps=reps)
        ladder[name] = round(rate, 1)
        log(f"  -> {rate:,.0f} GFLOP/s")

    # f64-accurate GEMM on the bf16 MXU (ops/wide Ozaki-scheme slicing):
    # the chip has NO f64 matmul hardware; this is the true-f64 rate the
    # refinement ladder's RR/QR could use (also ~60x faster to compile
    # than the emulated-f64 dot at this size — measured in BENCH_NOTES).
    try:
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from chase_tpu.ops.wide import presplit, wide_params, slice_f64, \
            _pair_products
        jax.config.update("jax_enable_x64", True)
        H64 = H.astype(jnp.float64)
        V64 = V0[:, :256].astype(jnp.float64)
        s, L, cut = wide_params(N)
        hs = presplit(H64)

        def maker_w(ctx):
            a_slices, sa = ctx

            def sweep_w(i, v):
                b_slices, sb = slice_f64(v, s, L, axis=0)
                cmat = _pair_products(a_slices, b_slices, cut) * sa * sb
                return cmat / (jnp.linalg.norm(cmat) + 1.0)

            return sweep_w

        log(f"bench wide-f64 GEMM (s={s}, L={L}, "
            f"{sum(1 for l in range(L) for m in range(L) if l + m <= cut)}"
            f" bf16 passes)")
        wide_rate = _measure(maker_w, (hs[0], hs[1]), V64,
                             2.0 * N * N * 256, reps=2, hi_sweeps=9)
        ladder["wide_f64"] = round(wide_rate, 1)
        log(f"  -> wide f64 GEMM: {wide_rate:,.0f} GFLOP/s (f64-accurate)")
    except Exception as e:   # never let the extra rung kill the bench line
        log(f"bench: wide_f64 rung skipped ({type(e).__name__}: {e})")

    # complex64 figure: native if the backend supports it, else the explicit
    # real-pair decomposition on-device (XLA's own complex lowering).
    complex_rate = None
    Vr = V0[:, : K // 2]
    Vi = jax.random.normal(jax.random.key(2), (N, K // 2), jnp.float32)
    Hr, Hi = H, (H - H.T)  # any real pair works for a throughput figure
    # A FAILED eager complex op wedges the relay backend for the rest of
    # the process, so don't try-and-fall-back: attempt native complex only
    # where it is known to work (CPU, or explicitly requested on real TPU
    # runtimes via CHASE_BENCH_NATIVE_COMPLEX=1); otherwise measure the
    # explicit real-pair decomposition, which is XLA's own complex lowering.
    import os
    native_ok = (jax.devices()[0].platform == "cpu"
                 or os.environ.get("CHASE_BENCH_NATIVE_COMPLEX") == "1")
    if native_ok:
        Hc = (Hr + 1j * Hi).astype(jnp.complex64)
        Vc = (Vr + 1j * Vi).astype(jnp.complex64)
        log("bench complex64 (native)")
        complex_rate = _measure(
            _filter_sweep(
                lambda h: lambda v: jnp.matmul(h, v, precision="highest"),
                jnp.complex64),
            Hc, Vc, 8.0 * N * N * (K // 2) * DEG, reps=2)
        complex_mode = "native"
    else:
        log("bench: complex64 via the 4-real-matmul decomposition on-device")

        def maker_c(ctx):
            hr, hi = ctx
            c = jnp.float32(0.0)
            e = jnp.float32(2.2 * np.sqrt(N))
            sigma1 = jnp.float32(0.5)

            def mv(ar, ai):
                wr = jnp.matmul(hr, ar, precision="highest") \
                    - jnp.matmul(hi, ai, precision="highest")
                wi = jnp.matmul(hr, ai, precision="highest") \
                    + jnp.matmul(hi, ar, precision="highest")
                return wr, wi

            def sweep_c(s, st):
                vr, vi = st
                yr, yi = mv(vr, vi)
                yr = (sigma1 / e) * (yr - c * vr)
                yi = (sigma1 / e) * (yi - c * vi)

                def body(t, carry):
                    xr, xi, yr, yi, sigma = carry
                    sn = 1.0 / (2.0 / sigma1 - sigma)
                    zr, zi = mv(yr, yi)
                    zr = (2.0 * sn / e) * (zr - c * yr) - (sigma * sn) * xr
                    zi = (2.0 * sn / e) * (zi - c * yi) - (sigma * sn) * xi
                    return (yr, yi, zr, zi, sn)

                xr, xi, yr, yi, _ = jax.lax.fori_loop(
                    2, DEG + 1, body, (vr, vi, yr, yi, sigma1))
                nrm = jnp.sqrt(jnp.linalg.norm(yr) ** 2
                               + jnp.linalg.norm(yi) ** 2) + 1.0
                return (yr / nrm, yi / nrm)

            return sweep_c

        complex_rate = _measure(maker_c, (Hr, Hi), (Vr, Vi),
                                8.0 * N * N * (K // 2) * DEG, reps=2)
        complex_mode = "real_pair_decomposition"
    log(f"  -> complex64 ({complex_mode}): {complex_rate:,.0f} GFLOP/s")

    rate = ladder["highest"]
    print(json.dumps({
        "metric": "filter_hemm_gflops",
        "value": round(rate, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(rate / 1000.0, 3),
        "ladder": ladder,
        "complex_gflops": round(complex_rate, 1),
        "complex_mode": complex_mode,
        "shape": {"N": N, "k": K, "deg": DEG},
    }))


if __name__ == "__main__":
    main()
