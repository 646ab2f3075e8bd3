"""Block-cyclic layout support (P2).

The reference offers ScaLAPACK-style mb×nb block-cyclic distribution
(linalg/distMatrix/distMatrix.hpp:2867 BlockCyclicMatrix,
DistMultiVectorBlockCyclic1D) for load balance of trapezoidal work.  On a
TPU mesh the HEMM work is uniform across shards, so block-cyclic brings no
performance benefit — but for parity (and for interop with matrices whose
natural ordering is the ScaLAPACK ownership order) we provide it as a
*similarity transform*: a row/column permutation that makes contiguous
block sharding own exactly the rows a (nb, p)-block-cyclic distribution
would own.  Eigenvalues are invariant; eigenvector rows are un-permuted on
the way out.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["block_cyclic_perm", "BlockCyclicLayout"]


def block_cyclic_perm(n: int, nb: int, p: int) -> np.ndarray:
    """Ownership-ordered global indices: perm[i] = the global index that a
    contiguous p-way block layout should place at position i so that part q
    holds exactly the indices block-cyclically owned by process q
    (owner(g) = (g // nb) % p, ScaLAPACK descriptor convention)."""
    owner = (np.arange(n) // nb) % p
    return np.argsort(owner, kind="stable")


class BlockCyclicLayout:
    """Symmetric block-cyclic reindexing of an N×N operator."""

    def __init__(self, N: int, mb: int, p_r: int, p_c: int = None):
        p_c = p_c if p_c is not None else p_r
        self.N = N
        self.mb = mb
        self.row_perm = block_cyclic_perm(N, mb, p_r)
        self.col_perm = block_cyclic_perm(N, mb, p_c)
        self._row_inv = np.argsort(self.row_perm)

    def apply(self, H):
        """Reorder H so block sharding == block-cyclic ownership.

        For Hermitian solves the row and column permutations must agree
        (similarity transform); we use the row permutation on both sides.
        """
        perm = jnp.asarray(self.row_perm)
        return jnp.asarray(H)[perm][:, perm]

    def restore_rows(self, V):
        """Un-permute eigenvector rows back to the user's global ordering."""
        return jnp.asarray(V)[jnp.asarray(self._row_inv)]
