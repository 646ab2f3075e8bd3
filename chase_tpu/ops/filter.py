"""Chebyshev polynomial filter — the hot kernel.

TPU-native redesign of the reference's scaled-and-shifted three-term
Chebyshev recurrence (algorithm/algorithm.inc:942-1009 `Algorithm::filter`
driving `HEMM` per backend, e.g. Impl/chase_cpu/chase_cpu.hpp:449-508).

Differences from the reference, driven by XLA/TPU semantics:

* The diagonal shift ``H - cI`` is folded into the matmul epilogue
  (``H@V - c*V``) instead of mutating H's diagonal in place
  (``ChaseBase::Shift``).  H stays immutable — important because on TPU H is
  a sharded, donated-free constant that XLA keeps resident in HBM.
* Per-vector degree retirement (the reference shrinks the GEMM width via
  pointer walks as columns retire, algorithm.inc:974-1000) is expressed with
  a *static-width* window plus per-column degree masks: step ``t`` updates
  column ``j`` iff ``t <= degrees[j]``.  Columns with ``degrees == 0`` pass
  through untouched, which the solver uses both for bucket padding and for
  locked columns caught inside the window.
* The whole recurrence is one ``lax.fori_loop`` with a *traced* trip count,
  so one XLA compilation serves every degree distribution at a given window
  width.
* Mixed precision (reference `ENABLE_MIXED_PRECISION`,
  chase_cpu.hpp:384-447): the caller passes an ``H`` already cast to the
  reduced dtype; ``X`` is cast on entry and the result cast back.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..types import filter_carry_dtype, real_dtype

__all__ = ["chebyshev_filter", "filter_carry_init", "filter_steps"]


def _hemm_shift(H, X, c, precision):
    """(H - c·I) @ X without touching H's diagonal.

    When H is stored in a narrower dtype than the carry X (the bf16
    storage rung of the mixed-precision ladder, P10), the matmul takes
    reduced-precision inputs but accumulates in X's dtype on the MXU
    (``preferred_element_type``) — ~5× the f32-highest throughput on v5e
    with the carry kept at full f32.
    """
    if H.dtype != X.dtype:
        HX = jnp.matmul(H, X.astype(H.dtype), precision=precision,
                        preferred_element_type=X.dtype)
        return HX - c * X
    return jnp.matmul(H, X, precision=precision) - c * X


@partial(jax.jit, static_argnames=("precision",), donate_argnums=(1,))
def chebyshev_filter(H, X, degrees, lam1, lower, upper, deg_max, *,
                     precision="highest"):
    """Apply the degree-masked scaled Chebyshev filter to the window ``X``.

    Args:
      H: (N, N) operator, possibly in a reduced dtype (mixed precision).
      X: (N, w) active window of the search subspace (problem dtype).
      degrees: (w,) int32 per-column polynomial degrees; 0 = leave untouched.
      lam1: estimate of the smallest eigenvalue (filter amplification point).
      lower, upper: interval of the spectrum to damp.
      deg_max: traced scalar — max(degrees); loop trip count.
      precision: matmul precision for the recurrence.

    Returns:
      (N, w) filtered window, in X's dtype.
    """
    out_dtype = X.dtype
    carry = filter_carry_dtype(H.dtype, X.dtype)
    rt = real_dtype(carry)
    Xc = X.astype(carry)

    lam1 = jnp.asarray(lam1, rt)
    lower = jnp.asarray(lower, rt)
    upper = jnp.asarray(upper, rt)
    c = (upper + lower) / 2
    e = (upper - lower) / 2
    sigma1 = e / (lam1 - c)

    # --- step 1: Y = (sigma1/e) (H - cI) X  (algorithm.inc:962-975) -------
    alpha1 = sigma1 / e
    Y = alpha1 * _hemm_shift(H, Xc, c, precision)
    Y = jnp.where(degrees[None, :] >= 1, Y, Xc)

    # --- steps t = 2..deg_max ---------------------------------------------
    def body(t, carry):
        Xp, Yc, sigma = carry
        sigma_new = 1.0 / (2.0 / sigma1 - sigma)
        alpha = 2.0 * sigma_new / e
        beta = -sigma * sigma_new
        Z = alpha * _hemm_shift(H, Yc, c, precision) + beta * Xp
        upd = degrees[None, :] >= t
        Z = jnp.where(upd, Z, Yc)
        return (Yc, Z, sigma_new)

    deg_max = jnp.asarray(deg_max, jnp.int32)
    _, Y, _ = jax.lax.fori_loop(2, deg_max + 1, body, (Xc, Y, sigma1))
    return Y.astype(out_dtype)


# -- segmented-filter building blocks (used by the perf-tuned solver path) --

@partial(jax.jit, static_argnames=("precision",))
def filter_carry_init(H, X, degrees, c, e, sigma1, *, precision="highest"):
    """First recurrence step; returns (X, Y, sigma) carry.

    X arrives already cast to the carry dtype (filter_carry_dtype);
    scalars follow the carry, not H's (possibly bf16) storage dtype."""
    alpha1 = jnp.asarray(sigma1 / e, real_dtype(X.dtype))
    c = jnp.asarray(c, real_dtype(X.dtype))
    Y = alpha1 * _hemm_shift(H, X, c, precision)
    Y = jnp.where(degrees[None, :] >= 1, Y, X)
    return X, Y, jnp.asarray(sigma1, real_dtype(X.dtype))


@partial(jax.jit, static_argnames=("precision",))
def filter_steps(H, Xp, Yc, degrees, sigma, sigma1, c, e, t0, t1, *,
                 precision="highest"):
    """Run recurrence steps t in [t0, t1) on a (possibly shrunk) window."""
    def body(t, carry):
        Xp, Yc, sigma = carry
        sigma_new = 1.0 / (2.0 / sigma1 - sigma)
        alpha = 2.0 * sigma_new / e
        beta = -sigma * sigma_new
        Z = alpha * _hemm_shift(H, Yc, c, precision) + beta * Xp
        upd = degrees[None, :] >= t
        Z = jnp.where(upd, Z, Yc)
        return (Yc, Z, sigma_new)

    return jax.lax.fori_loop(jnp.asarray(t0, jnp.int32),
                             jnp.asarray(t1, jnp.int32),
                             body, (Xp, Yc, sigma))
