"""Weak-scaling harness on the virtual 8-device CPU mesh.

Defends the BASELINE north star (>= 80% weak-scaling efficiency at >= 2
hosts) without pod access: on one host the 8 forced CPU devices share a
single core, so WALL-CLOCK weak scaling is meaningless — what this harness
validates instead is the two things that determine weak-scaling efficiency
on real ICI:

  1. the COLLECTIVE STRUCTURE of the compiled filter stays ring-shaped
     (collective-permute / reduce-scatter, no all-gather of V) as the mesh
     grows, with per-device communication bytes ~constant;
  2. an analytic roofline: efficiency_p = T_mxu / (T_mxu + T_ici) from the
     measured per-chip MXU rate (BENCH_r*.json) and the v5e ICI link
     bandwidth, evaluated at the north-star shape.

Per weak-scaling convention the problem grows with the mesh: N_p = N_1*sqrt(p)
keeps per-device filter FLOPs (2 N^2 k deg / p) constant.

Run:  JAX_PLATFORMS=cpu python benchmarks/weak_scaling_bench.py
Prints one JSON line per mesh + a summary line.
"""

import json
import os
import re
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax                                                   # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chase_tpu.parallel.mesh import make_grid                # noqa: E402
from chase_tpu.parallel.ring import (chebyshev_filter_ring,  # noqa: E402
                                     chebyshev_filter_ring2d)

# per-chip numbers for the analytic model (v5e; MXU rate = measured
# f32-highest filter rate from bench.py, ICI = one bidirectional link pair)
MXU_F32_GFLOPS = 30_000.0
ICI_BYTES_PER_S = 45e9

COLLECTIVES = ("collective-permute", "all-gather", "all-reduce",
               "reduce-scatter", "all-to-all")


def collective_counts(hlo_text: str):
    # match sync ops AND the async thunk forms (all-gather-start/-done);
    # count -start only once so async ops are not double-counted
    return {c: len(re.findall(rf"{c}(?:-start)?[.\" (]", hlo_text))
            for c in COLLECTIVES}


def analyze(shape, N, k, deg):
    p = shape[0] * shape[1]
    grid = make_grid(jax.devices()[:p], shape=shape)
    rng = np.random.default_rng(0)
    H = rng.standard_normal((N, N)).astype(np.float32)
    H = (H + H.T) / 2
    X = rng.standard_normal((N, k)).astype(np.float32)
    degrees = jnp.full((k,), deg, jnp.int32)
    is2d = shape[0] > 1 and shape[1] > 1

    if p == 1:
        fn = None
        counts = {c: 0 for c in COLLECTIVES}
        ring_bytes = 0.0
    else:
        if is2d:
            Hs = jax.device_put(jnp.asarray(H), grid.sharding("r", "c"))
            Xs = jax.device_put(jnp.asarray(X), grid.sharding("r", None))
            fn = lambda: chebyshev_filter_ring2d(     # noqa: E731
                grid, Hs, Xs, degrees, -3.0, -1.0, 3.0, deg)
        else:
            Hs = jax.device_put(jnp.asarray(H), grid.sharding("r", None))
            Xs = jax.device_put(jnp.asarray(X), grid.sharding("r", None))
            fn = lambda: chebyshev_filter_ring(       # noqa: E731
                grid, Hs, Xs, degrees, -3.0, -1.0, 3.0, deg)
        out = fn()
        out.block_until_ready()
        # collective structure from the compiled module
        if is2d:
            traced = jax.jit(lambda h, x: chebyshev_filter_ring2d(
                grid, h, x, degrees, -3.0, -1.0, 3.0, deg)).lower(Hs, Xs)
        else:
            traced = jax.jit(lambda h, x: chebyshev_filter_ring(
                grid, h, x, degrees, -3.0, -1.0, 3.0, deg)).lower(Hs, Xs)
        hlo = traced.compile().as_text()
        counts = collective_counts(hlo)
        # per-device ring traffic per recurrence step (bytes)
        itemsize = 4
        if is2d:
            r, c = shape
            ring_bytes = ((r - 1) * N * k * itemsize / (r * c)    # ring
                          + N * k * itemsize / (r * c)            # flip hop
                          + N * k * itemsize * (c - 1) / (r * c)) # scatter
        else:
            ring_bytes = (p - 1) * N * k * itemsize / p

    flops_dev = 2.0 * N * N * k * deg / p
    t_mxu = flops_dev / (MXU_F32_GFLOPS * 1e9)
    t_ici = deg * ring_bytes / ICI_BYTES_PER_S if p > 1 else 0.0
    # overlap model: the ring permutes WHILE dotting; exposed comm is the
    # excess of comm over compute per step (0 when compute-bound)
    t_exposed = max(0.0, t_ici - t_mxu) if p > 1 else 0.0
    eff = t_mxu / (t_mxu + t_exposed)
    eff_no_overlap = t_mxu / (t_mxu + t_ici)
    return {
        "mesh": f"{shape[0]}x{shape[1]}", "N": N, "k": k,
        "flops_per_device_G": round(flops_dev / 1e9, 1),
        "collectives": counts,
        "ring_bytes_per_step_MB": round(ring_bytes / 1e6, 2),
        "modeled_eff_overlapped": round(eff, 3),
        "modeled_eff_unoverlapped": round(eff_no_overlap, 3),
    }


def main():
    k, deg = 256, 20
    N1 = 4096
    rows = []
    for shape in [(1, 1), (2, 1), (4, 1), (2, 2), (8, 1), (4, 2)]:
        p = shape[0] * shape[1]
        # weak scaling: constant per-device work, N_p = N1 * sqrt(p),
        # rounded to a multiple of r*c (ring chunking requirement)
        N = int(round(N1 * np.sqrt(p)))
        tile = shape[0] * shape[1]
        N = -(-N // tile) * tile
        row = analyze(shape, N, k, deg)
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["flops_per_device_G"]
    per_dev_ok = all(abs(r["flops_per_device_G"] - base) / base < 0.05
                     for r in rows)
    no_allgather = all(r["collectives"]["all-gather"] == 0 for r in rows)
    min_eff = min(r["modeled_eff_overlapped"] for r in rows)
    print(json.dumps({
        "summary": "weak_scaling",
        "per_device_flops_constant": per_dev_ok,
        "no_v_allgather": no_allgather,
        "min_modeled_efficiency": min_eff,
        "north_star_80pct": bool(min_eff >= 0.80),
    }))


if __name__ == "__main__":
    main()
