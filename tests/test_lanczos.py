"""Lanczos spectral-estimator tests (mirrors tests/linalg/internal/*/lanczos.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chase_tpu.models import clement, random_hermitian
from chase_tpu.ops.lanczos import (
    lanczos_scan, lanczos_tridiag_host, upper_bound, dos_lower_bound)
from conftest import ALL_DTYPES

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("dtype", ALL_DTYPES, ids=["f32", "f64", "c64", "c128"])
def test_upper_bound_bounds_spectrum(dtype):
    dtype = np.dtype(dtype)
    N, m, numvec = 200, 20, 4
    if np.issubdtype(dtype, np.complexfloating):
        H = random_hermitian(N, dtype=dtype, seed=3)
    else:
        H = clement(N).astype(dtype)
    evals = np.linalg.eigvalsh(H.astype(np.complex128 if
                               np.issubdtype(dtype, np.complexfloating)
                               else np.float64))
    rng = np.random.default_rng(0)
    V0 = rng.standard_normal((N, numvec)).astype(dtype)
    alphas, betas, _ = lanczos_scan(jnp.asarray(H), jnp.asarray(V0), m=m,
                                    want_basis=False)
    theta, tau, _ = lanczos_tridiag_host(
        np.asarray(alphas, np.float64), np.asarray(betas, np.float64),
        want_vectors=False)
    ub = upper_bound(theta, np.asarray(betas, np.float64)[-1])
    assert ub >= evals[-1] * (1 - 1e-3)
    # should not grossly overestimate either
    assert ub <= abs(evals).max() * 3


def test_tridiagonal_matches_dense_lanczos():
    """Batched scan must equal a plain single-vector Lanczos in numpy."""
    N, m = 120, 15
    H = clement(N)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(N)
    V0 = np.stack([v, rng.standard_normal(N)], axis=1)

    alphas, betas, basis = lanczos_scan(jnp.asarray(H), jnp.asarray(V0), m=m)
    a = np.asarray(alphas, np.float64)[:, 0]
    b = np.asarray(betas, np.float64)[:, 0]

    # numpy reference
    v1 = v / np.linalg.norm(v)
    v0 = np.zeros_like(v1)
    beta = 0.0
    a_ref, b_ref = [], []
    for k in range(m):
        w = H @ v1
        alpha = v1 @ w
        w = w - alpha * v1 - beta * v0
        beta_new = np.linalg.norm(w)
        a_ref.append(alpha)
        b_ref.append(beta_new)
        v0, v1, beta = v1, w / beta_new, beta_new
    np.testing.assert_allclose(a, a_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(b, b_ref, rtol=1e-8, atol=1e-8)
    # basis contains the Lanczos vectors of the LAST column
    assert basis.shape == (m, N)


def test_dos_lower_bound_in_range():
    """The DoS quantile must land inside the spectrum, above the nevex-th
    eigenvalue region and below the top."""
    N, m, numvec, nevex = 400, 25, 4, 60
    H = clement(N)
    evals = np.linalg.eigvalsh(H)
    rng = np.random.default_rng(2)
    V0 = rng.standard_normal((N, numvec))
    alphas, betas, _ = lanczos_scan(jnp.asarray(H), jnp.asarray(V0), m=m)
    theta, tau, _ = lanczos_tridiag_host(
        np.asarray(alphas, np.float64), np.asarray(betas, np.float64))
    lam, lowerb = dos_lower_bound(theta, tau, nevex, N)
    assert evals[0] - 1 <= lam <= evals[0] + 0.2 * (evals[-1] - evals[0])
    assert evals[0] < lowerb < evals[-1]


def test_estimate_spectral_bounds_api():
    """Standalone spectral estimator brackets the true spectrum."""
    import numpy as np
    from chase_tpu.api import estimate_spectral_bounds
    from chase_tpu.models import clement

    N = 300
    H = np.asarray(clement(N))
    b = estimate_spectral_bounds(H, nev=30)
    assert b["upperb"] >= N - 1            # true lambda_max = N-1
    assert b["lambda_min"] >= -(N - 1) - 1e-6
    assert b["lambda_min"] <= -(N - 1) * 0.8   # Lanczos reaches the edge
    assert b["lambda_min"] <= b["lowerb"] <= b["upperb"]
