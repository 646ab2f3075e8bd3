"""Sharded dense operator.

TPU-native replacement for the reference's matrix containers
(``linalg/matrix/matrix.hpp`` Matrix<T,CPU|GPU> and
``linalg/distMatrix/distMatrix.hpp`` BlockBlock/BlockCyclic matrices):
one class that pins the dense operator H on the device grid and caches the
reduced-precision shadow copy used by the mixed-precision filter
(the enableSinglePrecision/disableSinglePrecision machinery of
matrix.hpp:365-443 becomes a single lazy ``astype``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import low_precision_dtype, real_dtype
from .mesh import Grid2D, matrix_sharding, colvec_sharding

__all__ = ["DenseOperator"]


class DenseOperator:
    """Dense (pseudo-)Hermitian operator resident on the device grid."""

    def __init__(self, H, grid: Optional[Grid2D] = None, *,
                 pseudo_hermitian: bool = False):
        if H.ndim != 2 or H.shape[0] != H.shape[1]:
            raise ValueError(f"H must be square, got {H.shape}")
        if np.dtype(H.dtype).itemsize >= 8 and np.dtype(H.dtype).kind in "fc" \
                and not jax.config.jax_enable_x64:
            # Without x64, jnp.asarray silently downcasts f64/c128 to 32 bits
            # and DP tolerances (1e-10) become unreachable.
            from ..logger import get_logger
            get_logger().info("enabling jax x64 for a 64-bit input matrix")
            jax.config.update("jax_enable_x64", True)
        self.grid = grid
        self.pseudo_hermitian = pseudo_hermitian
        sh = matrix_sharding(grid)
        self.H = jax.device_put(jnp.asarray(H), sh) if sh is not None \
            else jnp.asarray(H)
        self._H_low = None

    @property
    def N(self) -> int:
        return self.H.shape[0]

    @property
    def dtype(self):
        return self.H.dtype

    @property
    def real_dtype(self):
        return real_dtype(self.H.dtype)

    @property
    def H_low(self):
        """Reduced-precision shadow of H (cached; the SP copy of P10)."""
        if self._H_low is None:
            lp = low_precision_dtype(self.dtype)
            self._H_low = self.H.astype(lp)
        return self._H_low

    def free_low(self):
        self._H_low = None

    def place_block(self, V):
        """Pin a multivector on the grid with the canonical V sharding."""
        sh = colvec_sharding(self.grid)
        return jax.device_put(jnp.asarray(V), sh) if sh is not None \
            else jnp.asarray(V)
