"""I/O (ChASE binary format, sharded loading, checkpoints), CLI, and the
flat C-interface-parity module; structure checks."""

import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import chase_tpu
from chase_tpu import io as cio
from chase_tpu.models import clement, clement_eigenvalues, random_hermitian
from chase_tpu.ops.checks import (check_hermitian, check_pseudo_hermitian,
                                  force_hermitian)


def test_matrix_roundtrip(tmp_path):
    H = random_hermitian(64, dtype=np.complex128, seed=0)
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    H2 = cio.load_matrix(p, 64, np.complex128)
    np.testing.assert_array_equal(H, H2)


def test_matrix_file_is_column_major(tmp_path):
    """Byte-compatibility with ChASE: file stream is column-major."""
    H = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "cm.bin")
    cio.save_matrix(H, p)
    raw = np.fromfile(p, dtype=np.float64)
    np.testing.assert_array_equal(raw, H.flatten(order="F"))


def test_sharded_load_matches(tmp_path):
    H = random_hermitian(96, dtype=np.float64, seed=1)
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    grid = chase_tpu.make_grid()
    Hs = cio.load_matrix_sharded(p, 96, np.float64, grid)
    np.testing.assert_array_equal(np.asarray(Hs), H)
    assert len(Hs.sharding.device_set) == 8
    # and it solves
    res = chase_tpu.eigsh(chase_tpu.DenseOperator(Hs, grid=grid), 8, 8,
                          tol=1e-9)
    assert res.converged


def test_sharded_save_roundtrip(tmp_path):
    """save_matrix_sharded is the MPI_File_write_all analogue
    (distMatrix.hpp:2241-2298): per-shard subarray writes must reproduce
    the exact global column-major file."""
    H = random_hermitian(96, dtype=np.float64, seed=5)
    grid = chase_tpu.make_grid()
    Hd = jax.device_put(jnp.asarray(H), grid.sharding("r", "c"))
    p = str(tmp_path / "h_sharded.bin")
    cio.save_matrix_sharded(Hd, p)
    back = cio.load_matrix(p, 96, np.float64)
    np.testing.assert_array_equal(back, H)
    # byte-compatible with the host writer (ChASE column-major format)
    p2 = str(tmp_path / "h_host.bin")
    cio.save_matrix(H, p2)
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_blockcyclic_darray_load_and_solve(tmp_path):
    """load_matrix_blockcyclic is the MPI_Type_create_darray read analogue
    (distMatrix.hpp:3210-3260): a global ChASE file lands in block-cyclic
    ownership order and the solve still produces the true eigenpairs."""
    N, mb = 192, 16
    H = np.asarray(clement(N))
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    grid = chase_tpu.make_grid()
    Hbc, layout = cio.load_matrix_blockcyclic(p, N, np.float64, grid, mb)
    # the loaded array equals the layout's similarity transform of H
    np.testing.assert_array_equal(np.asarray(Hbc),
                                  np.asarray(layout.apply(H)))
    res = chase_tpu.eigsh(Hbc, 12, 8, tol=1e-10, grid=grid)
    assert res.converged
    np.testing.assert_allclose(res.ritzv, clement_eigenvalues(N)[:12],
                               atol=1e-7)
    V = np.asarray(layout.restore_rows(np.asarray(res.V)[:, :12]))
    R = H @ V - V * res.ritzv[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-7


def test_state_checkpoint_roundtrip(tmp_path):
    H = clement(128)
    r = chase_tpu.eigsh(H, 8, 8, tol=1e-9)
    p = str(tmp_path / "state")
    cio.save_state(p, r.V, r.ritzv_full, {"N": 128})
    V, ritzv, meta = cio.load_state(p)
    assert meta["N"] == 128
    # warm restart from checkpoint
    r2 = chase_tpu.eigsh(H, 8, 8, tol=1e-9, v0=V, ritzv0=ritzv, approx=True)
    assert r2.converged and r2.iterations <= r.iterations


def test_cli_generated_problem(capsys):
    from chase_tpu.cli import main
    rc = main(["--n", "200", "--nev", "10", "--nex", "10",
               "--isMatGen", "clement", "--tol", "1e-9"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "converged" in out and "GFLOPS" in out


def test_cli_sequence_and_file(tmp_path, capsys):
    H = random_hermitian(150, dtype=np.float64, seed=3)
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    from chase_tpu.cli import main
    rc = main(["--n", "150", "--nev", "8", "--nex", "8", "--path_in", p,
               "--dtype", "float64", "--sequence", "2", "--tol", "1e-9"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("converged") >= 2


def test_cli_blockcyclic_file(tmp_path, capsys):
    N = 160
    H = np.asarray(clement(N))
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    from chase_tpu.cli import main
    rc = main(["--n", str(N), "--nev", "8", "--nex", "8", "--path_in", p,
               "--grid", "--mb", "16", "--tol", "1e-9"])
    assert rc == 0
    assert "converged" in capsys.readouterr().out


def test_interface_singleton_lifecycle():
    import chase_tpu.interface as chase
    N, nev, nex = 128, 8, 8
    H = clement(N)
    assert chase.init(N, nev, nex, H) == 0
    chase.set_tol(1e-9)
    chase.set_deg(20)
    assert chase.solve(mode="R", opt="S", qr="C") == 0
    evals, evecs = chase.get_eigenpairs()
    np.testing.assert_allclose(evals, clement_eigenvalues(N)[:nev], atol=1e-6)
    assert evecs.shape == (N, nev)
    # warm-start second solve through the interface
    assert chase.solve(mode="A") == 0
    assert chase.finalize() == 0
    with pytest.raises(RuntimeError):
        chase.get_eigenpairs()
    assert chase.has_pseudo()


def test_checks():
    H = random_hermitian(64, dtype=np.complex128, seed=5)
    assert check_hermitian(jnp.asarray(H))
    bad = H.copy()
    bad[0, 1] += 1.0
    assert not check_hermitian(jnp.asarray(bad))
    from chase_tpu.models import random_pseudo_hermitian
    P = random_pseudo_hermitian(64, dtype=np.complex128, seed=6)
    assert check_pseudo_hermitian(jnp.asarray(P))
    assert not check_pseudo_hermitian(jnp.asarray(H))
    # force_hermitian mirrors the upper triangle
    F = np.asarray(force_hermitian(jnp.asarray(bad)))
    np.testing.assert_allclose(F, F.conj().T)
    np.testing.assert_allclose(np.triu(F, 1), np.triu(bad, 1))


def test_interface_warm_start_from_init_buffers():
    """mode='A' directly from the V/ritzv buffers passed at init (the
    reference's cross-application warm-restart pattern)."""
    import chase_tpu.interface as chase
    N, nev, nex = 128, 8, 8
    H = clement(N)
    chase.init(N, nev, nex, H)
    chase.set_tol(1e-9)
    assert chase.solve() == 0
    evals, evecs = chase.get_eigenpairs()
    full_V = np.asarray(chase._session.result.V)
    full_r = chase._session.result.ritzv_full
    chase.finalize()
    # new session seeded with the previous results
    chase.init(N, nev, nex, H, V=full_V, ritzv=full_r)
    chase.set_tol(1e-9)
    assert chase.solve(mode="A") == 0
    assert chase._session.result.iterations <= 2
    chase.finalize()


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Multi-host-safe warm-restart checkpoint: V written per-shard, loaded
    back onto the mesh, and usable as a warm start."""
    H = clement(128)
    grid = chase_tpu.make_grid()
    r = chase_tpu.eigsh(H, 8, 8, tol=1e-9, grid=grid)
    p = str(tmp_path / "state")
    cio.save_state(p, r.V, r.ritzv_full, {"N": 128}, sharded=True)
    V, ritzv, meta = cio.load_state(p, grid=grid)
    assert meta["N"] == 128
    np.testing.assert_array_equal(np.asarray(V), np.asarray(r.V))
    assert len(V.sharding.device_set) == 8
    r2 = chase_tpu.eigsh(H, 8, 8, tol=1e-9, grid=grid,
                         v0=V, ritzv0=ritzv, approx=True)
    assert r2.converged and r2.iterations <= r.iterations
    # host load (no grid) also works
    V2, _, _ = cio.load_state(p)
    np.testing.assert_array_equal(np.asarray(V2), np.asarray(r.V))


def test_blockcyclic_load_indivisible_shapes(tmp_path):
    """Run-based darray reads with N not divisible by mb*p (ragged block
    runs; N itself must divide the mesh — the operator pads otherwise)."""
    N, mb = 176, 24
    H = random_hermitian(N, dtype=np.float64, seed=8)
    p = str(tmp_path / "h.bin")
    cio.save_matrix(H, p)
    grid = chase_tpu.make_grid()
    Hbc, layout = cio.load_matrix_blockcyclic(p, N, np.float64, grid, mb)
    np.testing.assert_array_equal(np.asarray(Hbc),
                                  np.asarray(layout.apply(H)))


def test_cli_pseudo_blockcyclic(capsys):
    """--mb with --pseudo now routes through PseudoBlockCyclicLayout
    (the round-1 hard rejection is lifted)."""
    from chase_tpu.cli import main
    rc = main(["--n", "128", "--nev", "6", "--nex", "6", "--pseudo",
               "--grid", "--mb", "8", "--tol", "1e-6"])
    assert rc == 0
    assert "converged" in capsys.readouterr().out


def test_interface_init_blockcyclic_roundtrip():
    """init_blockcyclic applies the ownership similarity transform and
    get_eigenpairs restores the caller's row ordering (the C ABI's
    p?chase_init_blockcyclic_ backing path)."""
    import chase_tpu.interface as iface
    N, nev, nex = 64, 6, 6
    H = np.asarray(clement(N), np.float64)
    iface.init_blockcyclic(N, nev, nex, 8, 8, H, grid_shape=(2, 2))
    assert iface.solve(tol=1e-10) == 0
    evals, evecs = iface.get_eigenpairs()
    iface.finalize()
    np.testing.assert_allclose(evals, clement_eigenvalues(N)[:nev],
                               atol=1e-8)
    # residual in the CALLER's ordering catches a missing un-permutation
    R = H @ evecs - evecs * evals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-8


def test_interface_init_pseudo_distributed():
    """p{c,z}chase_init_pseudo_ backing path: a distributed BSE solve on a
    2x2 device mesh through the flat interface."""
    import chase_tpu.interface as iface
    from chase_tpu.models import random_pseudo_hermitian
    N, nev, nex = 64, 4, 6
    H = np.asarray(random_pseudo_hermitian(N, dtype=np.complex128, seed=3))
    iface.init_pseudo(N, nev, nex, H, distributed=True, grid_shape=(2, 2))
    assert iface.solve(tol=1e-9) == 0
    evals, evecs = iface.get_eigenpairs()
    iface.finalize()
    import numpy.linalg as la
    full = np.sort(la.eigvals(H).real)
    pos = full[full > 0][:nev]
    np.testing.assert_allclose(evals, pos, atol=1e-7)


def test_interface_init_pseudo_blockcyclic():
    """p?chase_init_pseudo_blockcyclic_ backing path: the per-half
    block-cyclic similarity preserves the S-metric and the spectrum."""
    import chase_tpu.interface as iface
    from chase_tpu.models import random_pseudo_hermitian
    N, nev, nex = 64, 4, 6
    H = np.asarray(random_pseudo_hermitian(N, dtype=np.complex128, seed=4))
    iface.init_blockcyclic(N, nev, nex, 8, 8, H, pseudo=True,
                           grid_shape=(2, 2))
    assert iface.solve(tol=1e-9) == 0
    evals, evecs = iface.get_eigenpairs()
    iface.finalize()
    import numpy.linalg as la
    full = np.sort(la.eigvals(H).real)
    pos = full[full > 0][:nev]
    np.testing.assert_allclose(evals, pos, atol=1e-7)
    # eigenvector rows restored to the caller's ordering: check S-residual
    R = H @ evecs - evecs * evals[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-6
