"""Block-cyclic layout tests (mirrors the reference's BlockCyclicMatrix /
distMultiVector block-cyclic container tests: layout math + solve parity)."""

import numpy as np
import pytest

import chase_tpu
from chase_tpu.parallel.layouts import block_cyclic_perm, BlockCyclicLayout
from chase_tpu.models import clement, clement_eigenvalues


def test_ownership_matches_scalapack_convention():
    n, nb, p = 20, 3, 4
    perm = block_cyclic_perm(n, nb, p)
    # after permutation, contiguous quarter q must hold exactly the indices
    # with (g // nb) % p == q
    sizes = [len([g for g in range(n) if (g // nb) % p == q])
             for q in range(p)]
    start = 0
    for q, sz in enumerate(sizes):
        got = sorted(perm[start:start + sz])
        want = [g for g in range(n) if (g // nb) % p == q]
        assert got == want, q
        start += sz


def test_block_cyclic_solve_parity():
    N, nev, nex, mb = 192, 12, 8, 16
    H = clement(N)
    grid = chase_tpu.make_grid()
    layout = BlockCyclicLayout(N, mb, grid.shape["r"], grid.shape["c"])
    Hbc = np.asarray(layout.apply(H))
    res = chase_tpu.eigsh(Hbc, nev, nex, tol=1e-10, grid=grid)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, clement_eigenvalues(N)[:nev],
                               atol=1e-7)
    # eigenvectors restored to the user's global row ordering solve H itself
    V = np.asarray(layout.restore_rows(np.asarray(res.V)[:, :nev]))
    R = H @ V - V * res.ritzv[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-7
