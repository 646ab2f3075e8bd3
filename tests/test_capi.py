"""C-ABI link-compatibility test: build libchase_tpu.so, compile the C demo
against the reference-named symbols, run it as a real process.

The reference's analogue is tests via examples/4_interface (C and Fortran
drivers linked against the chase_c_interface singletons)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_c_driver_links_and_solves(tmp_path):
    from chase_tpu import _native
    lib = _native.build_capi(str(tmp_path / "libchase_tpu.so"))
    exe = str(tmp_path / "c_demo")
    subprocess.run(
        ["cc", os.path.join(REPO, "examples", "c_interface_demo.c"),
         "-L", str(tmp_path), "-lchase_tpu", "-lm", "-o", exe],
        check=True, capture_output=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["LD_LIBRARY_PATH"] = str(tmp_path)
    env["CHASE_TPU_PLATFORM"] = "cpu"
    r = subprocess.run([exe], capture_output=True, text=True, env=env,
                       timeout=500)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "C-interface demo: PASS" in r.stdout


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_capi_symbol_surface(tmp_path):
    """Every serial symbol family of the reference header must be exported."""
    from chase_tpu import _native
    lib = _native.build_capi(str(tmp_path / "libchase_tpu.so"))
    syms = subprocess.run(["nm", "-D", lib], capture_output=True,
                          text=True).stdout
    for fam in ["chase_init_", "chase_", "chase_get_eigenpairs_",
                "chase_finalize_"]:
        for t in "sdcz":
            assert f" T {t}{fam}" in syms or f"{t}{fam}" in syms, (t, fam)
    for extra in ["zchase_init_pseudo_", "cchase_pseudo_", "chase_set_tol_",
                  "chase_has_mpi_", "chase_get_version_",
                  "pdchase_readHam_", "pzchase_get_eigenpairs_"]:
        assert extra in syms, extra
    # serial internal-init variants (chase_c_interface.h:25-32, 49-55)
    for t in "sdcz":
        assert f" T {t}chase_init_internal_" in syms, t
    for t in "cz":
        assert f" T {t}chase_init_pseudo_internal_" in syms, t
    # distributed init surface (chase_c_interface.h:61-175)
    for t in "sdcz":
        for fam in ["chase_init_", "chase_init_internal_",
                    "chase_init_blockcyclic_",
                    "chase_init_blockcyclic_internal_"]:
            assert f"p{t}{fam}" in syms, (t, fam)
    for t in "cz":
        for fam in ["chase_init_pseudo_", "chase_init_pseudo_internal_",
                    "chase_init_pseudo_blockcyclic_",
                    "chase_init_pseudo_blockcyclic_internal_"]:
            assert f"p{t}{fam}" in syms, (t, fam)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_c_dist_driver_blockcyclic_and_pseudo(tmp_path):
    """End-to-end C callers of the distributed ABI: a block-cyclic
    Hermitian solve (checks eigenvalues AND the row un-permutation via a
    residual computed in C) and a distributed pseudo (BSE) solve on a 2x2
    device mesh (reference parity: chase_c_interface.h:61-175)."""
    from chase_tpu import _native
    _native.build_capi(str(tmp_path / "libchase_tpu.so"))
    exe = str(tmp_path / "c_dist_demo")
    subprocess.run(
        ["cc", os.path.join(REPO, "examples", "c_dist_interface_demo.c"),
         "-L", str(tmp_path), "-lchase_tpu", "-lm", "-o", exe],
        check=True, capture_output=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["LD_LIBRARY_PATH"] = str(tmp_path)
    env["CHASE_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run([exe], capture_output=True, text=True, env=env,
                       timeout=500)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "C-dist-interface demo: PASS" in r.stdout
