"""Fused single solver iteration as one jittable program.

This is the "training step" of the eigensolver: Chebyshev filter →
CholQR2 → Rayleigh–Ritz + residuals, expressed as one function so the
whole iteration can be jitted/sharded/compile-checked as a unit (used by
``__graft_entry__`` and benchmarks; the production driver in
:mod:`chase_tpu.solver` calls the phases separately because locking and
degree decisions live on host).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ops.filter import chebyshev_filter
from .ops.qr import cholqr
from .ops.rr import rayleigh_ritz_residuals

__all__ = ["iteration_step"]


@partial(jax.jit, static_argnames=("precision",))
def iteration_step(H, V, degrees, lam1, lower, upper, locked, *,
                   precision="highest"):
    """One full subspace-iteration step on the complete block.

    Returns (V_next, ritz_values, residuals).
    """
    deg_max = jnp.max(degrees)
    V = chebyshev_filter(H, V, degrees, lam1, lower, upper, deg_max,
                         precision=precision)
    V, _ok = cholqr(V, passes=2, precision=precision)
    V, ritz, resid = rayleigh_ritz_residuals(H, V, locked,
                                             precision=precision)
    return V, ritz, resid
