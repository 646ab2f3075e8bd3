"""Same-day A/B: int8 vs bf16 Ozaki wide-GEMM schemes on the local chip.

Marginal-cost methodology (bench.py): the f64-accurate GEMM C = H @ V at
N=8192, k=256, once with the bf16 slice scheme (s=5, L=11, 66 passes) and
once with the int8 scheme (s=7, L=8, 36 passes at the MXU's int8 rate).
Accuracy is cross-checked against the f64 host product.  One JSON line.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


N, K = 8192, 256


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    log(f"devices: {jax.devices()}")

    sys.path.insert(0, "/root/repo")
    from chase_tpu.ops.wide import (presplit, wide_params, wide_params_i8,
                                    slice_f64, slice_f64_i8,
                                    _pair_products, _pair_products_i8)

    rng = np.random.default_rng(0)
    H = rng.standard_normal((N, N))
    H = (H + H.T) / 2
    V = rng.standard_normal((N, K))
    C_ref = H @ V
    den = (np.linalg.norm(H, axis=1)[:, None]
           * np.linalg.norm(V, axis=0)[None, :])
    H64 = jnp.asarray(H)
    V64 = jnp.asarray(V)

    results = {}
    for scheme in ("bf16", "i8"):
        params = wide_params_i8 if scheme == "i8" else wide_params
        s, L, cut = params(N)
        npairs = sum(1 for l in range(L) for m in range(L) if l + m <= cut)
        hs = presplit(H64, scheme=scheme)
        slicer = slice_f64_i8 if scheme == "i8" else slice_f64

        def maker(ctx, slicer=slicer, s=s, L=L, cut=cut, scheme=scheme):
            a_slices, sa = ctx

            def sweep(i, v):
                b_slices, sb = slicer(v, s, L, axis=0)
                if scheme == "i8":
                    cmat = _pair_products_i8(
                        a_slices, jnp.stack(b_slices), cut, s) * sa * sb
                else:
                    cmat = _pair_products(a_slices, b_slices, cut) * sa * sb
                return cmat / (jnp.linalg.norm(cmat) + 1.0)

            return sweep

        @jax.jit
        def run_prog(ctx, v, sweeps, maker=maker):
            return jax.lax.fori_loop(0, sweeps, maker(ctx), v)

        # accuracy check (single application, no renormalization)
        @jax.jit
        def once(ctx, v, slicer=slicer, s=s, L=L, cut=cut, scheme=scheme):
            a_slices, sa = ctx
            b_slices, sb = slicer(v, s, L, axis=0)
            if scheme == "i8":
                return _pair_products_i8(a_slices, jnp.stack(b_slices),
                                         cut, s) * sa * sb
            return _pair_products(a_slices, b_slices, cut) * sa * sb

        ctx = (hs[0], hs[1])
        t0 = time.perf_counter()
        C = np.asarray(once(ctx, V64))
        t_first = time.perf_counter() - t0
        rel = (np.abs(C - C_ref) / den).max()
        log(f"{scheme}: s={s} L={L} passes={npairs} "
            f"accuracy={rel:.3e} (first call {t_first:.1f}s)")

        def run(sweeps):
            t0 = time.perf_counter()
            out = run_prog(ctx, V64, jnp.int32(sweeps))
            _ = float(jnp.sum(jnp.abs(out[:2, :2]).astype(jnp.float32)))
            return time.perf_counter() - t0

        run(1)
        diffs = []
        for rep in range(2):
            t_lo = run(1)
            t_hi = run(9)
            diffs.append(t_hi - t_lo)
            log(f"  rep {rep}: t_lo={t_lo:.3f}s t_hi={t_hi:.3f}s "
                f"diff={t_hi - t_lo:.3f}s")
        dt = min(d for d in diffs if d > 0) if any(d > 0 for d in diffs) \
            else 1e-9
        rate = 2.0 * N * N * K * 8 / 1e9 / dt
        results[scheme] = {"gflops_f64_equiv": round(rate, 1),
                           "passes": npairs, "accuracy": float(rel)}
        log(f"  -> {scheme}: {rate:,.0f} GFLOP/s (f64-equivalent)")

    speedup = results["i8"]["gflops_f64_equiv"] / \
        max(results["bf16"]["gflops_f64_equiv"], 1e-9)
    print(json.dumps({"metric": "wide_scheme_ab", "N": N, "k": K,
                      "results": results,
                      "i8_over_bf16": round(speedup, 2)}), flush=True)


if __name__ == "__main__":
    main()
