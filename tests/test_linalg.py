"""Closed-form small-matrix linalg tests (fusion-friendly solves that back
every solver's hot loop)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu.ops import linalg


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_det_inv_solve(n):
    rng = np.random.default_rng(n)
    for _ in range(10):
        A = rng.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)
        np.testing.assert_allclose(
            float(linalg.det_small(jnp.asarray(H))), np.linalg.det(H), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(linalg.inv_small(jnp.asarray(H))), np.linalg.inv(H),
            rtol=1e-8, atol=1e-10,
        )
        b = rng.normal(size=n)
        np.testing.assert_allclose(
            np.asarray(linalg.psd_solve(jnp.asarray(H), jnp.asarray(b))),
            np.linalg.solve(H, b), rtol=1e-8, atol=1e-10,
        )
        B = rng.normal(size=(n, 3))
        np.testing.assert_allclose(
            np.asarray(linalg.psd_solve(jnp.asarray(H), jnp.asarray(B))),
            np.linalg.solve(H, B), rtol=1e-8, atol=1e-10,
        )


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6])
def test_is_pd(n):
    rng = np.random.default_rng(n + 10)
    A = rng.normal(size=(n, n))
    H = A @ A.T + n * np.eye(n)
    assert bool(linalg.is_pd(jnp.asarray(H)))
    H_bad = H - (np.linalg.eigvalsh(H).max() + 1) * np.eye(n)
    assert not bool(linalg.is_pd(jnp.asarray(H_bad)))
    H_nan = H.copy(); H_nan[0, 0] = np.nan
    assert not bool(linalg.is_pd(jnp.asarray(H_nan)))


def test_solve_and_check_batched():
    import jax
    rng = np.random.default_rng(0)
    A = rng.normal(size=(16, 3, 3))
    H = A @ A.transpose(0, 2, 1) + 3 * np.eye(3)
    B = rng.normal(size=(16, 3, 2))
    X, ok = jax.vmap(linalg.solve_and_check)(jnp.asarray(H), jnp.asarray(B))
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(H, B), rtol=1e-8)


def test_large_n_fallback():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 6))
    H = A @ A.T + 6 * np.eye(6)
    b = rng.normal(size=6)
    np.testing.assert_allclose(
        np.asarray(linalg.psd_solve(jnp.asarray(H), jnp.asarray(b))),
        np.linalg.solve(H, b), rtol=1e-8,
    )
