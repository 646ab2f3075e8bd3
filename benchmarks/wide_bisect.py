"""On-chip bisect of the DP-ladder N>=8192 stall (BENCH_NOTES round 2).

Measures, on the real accelerator:
  1. the EMULATED-f64 device matmul's error vs host numpy f64 (the prime
     suspect: the RR projection/residual HEMM feeding the refinement
     ladder's injection),
  2. ops/wide.wide_matmul's error on the same operands (validates the
     exact-bf16-slice scheme on the real MXU + emulated-f64 elementwise
     slicing),
  3. warm timings of both (marginal cost between reps).

Run from /root/repo on the TPU: `python benchmarks/wide_bisect.py [Nmax]`.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = 512
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}", flush=True)

    from chase_tpu.ops.wide import wide_matmul, wide_params

    rng = np.random.default_rng(0)
    for N in [2048, 4096, 8192, 16384]:
        if N > n_max:
            break
        # Ritz-block-like operands: H Hermitian with unit-scale spectrum,
        # V orthonormal-ish columns
        A = rng.standard_normal((N, N))
        A = (A + A.T) / (2 * np.sqrt(N))
        B = np.linalg.qr(rng.standard_normal((N, k)))[0]
        C_ref = A @ B
        scale = np.abs(C_ref).max()

        Ad = jax.device_put(jnp.asarray(A), dev)
        Bd = jax.device_put(jnp.asarray(B), dev)

        mm = jax.jit(lambda x, y: jnp.matmul(x, y, precision="highest"))
        t0 = time.perf_counter()
        C_emu = np.asarray(mm(Ad, Bd).block_until_ready())
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            mm(Ad, Bd).block_until_ready()
            ts.append(time.perf_counter() - t0)
        err_emu = np.abs(C_emu - C_ref).max() / scale

        s, L, cut = wide_params(N)
        t0 = time.perf_counter()
        C_w = np.asarray(wide_matmul(Ad, Bd).block_until_ready())
        t_compile_w = time.perf_counter() - t0
        tw = []
        for _ in range(3):
            t0 = time.perf_counter()
            wide_matmul(Ad, Bd).block_until_ready()
            tw.append(time.perf_counter() - t0)
        err_w = np.abs(C_w - C_ref).max() / scale

        flops = 2.0 * N * N * k
        print(f"N={N} k={k}: emulated-f64 err={err_emu:.3e} "
              f"warm={min(ts):.3f}s ({flops/min(ts)/1e12:.2f} TF/s eff) "
              f"compile={t_compile:.1f}s | wide(s={s},L={L},pairs"
              f"={sum(1 for l in range(L) for m in range(L) if l+m<=cut)}) "
              f"err={err_w:.3e} warm={min(tw):.3f}s "
              f"({flops/min(tw)/1e12:.2f} TF/s eff) "
              f"compile={t_compile_w:.1f}s", flush=True)


if __name__ == "__main__":
    main()
