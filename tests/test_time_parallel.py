"""Horizon-sharded parallel-in-time Riccati vs the sequential recursion
(8 virtual CPU devices, conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu.ops.parallel_riccati import parallel_lqr_backward
from cddp_tpu.parallel.time_parallel import horizon_mesh, sharded_lqr_backward
from cddp_tpu.solvers.ipddp import _solve_sequential_lqr


def _random_lqr(key, N, n, m, dtype=jnp.float64):
    ks = jax.random.split(key, 7)
    W = 0.3 * jax.random.normal(ks[0], (N + 1, n, n), dtype)
    Q = jnp.eye(n, dtype=dtype) * 0.5 + W @ W.swapaxes(-1, -2)
    q = jax.random.normal(ks[1], (N + 1, n), dtype)
    Wu = 0.3 * jax.random.normal(ks[2], (N, m, m), dtype)
    R = jnp.eye(m, dtype=dtype) + Wu @ Wu.swapaxes(-1, -2)
    r = jax.random.normal(ks[3], (N, m), dtype)
    M = 0.1 * jax.random.normal(ks[4], (N, n, m), dtype)
    A = jnp.eye(n, dtype=dtype) + 0.05 * jax.random.normal(ks[5], (N, n, n), dtype)
    B = 0.2 * jax.random.normal(ks[6], (N, n, m), dtype)
    return Q, q, R, r, M, A, B


@pytest.mark.parametrize("N", [16, pytest.param(23, marks=pytest.mark.slow),
                               pytest.param(40, marks=pytest.mark.slow)])
# 23: P=24 = 8*3; 40: P=41 needs padding — each sharded variant pays a
# fresh ~30s shard_map compile (not covered by the persistent cache), so
# one representative stays in the fast tier
def test_sharded_matches_sequential(N):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = horizon_mesh(8)
    args = _random_lqr(jax.random.PRNGKey(0), N, n=4, m=2)

    # reference: single-device associative scan (itself parity-tested vs the
    # sequential scan in test_parallel_riccati.py)
    K_r, k_r, S_r, v_r = jax.jit(parallel_lqr_backward)(*args)
    K, k, S, v = jax.jit(
        lambda *a: sharded_lqr_backward(*a, mesh=mesh)
    )(*args)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_r), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_r), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_r), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), rtol=1e-9, atol=1e-10)


@pytest.mark.slow  # ~3 min shard_map compile on 1 CPU
def test_sharded_matches_ipddp_sequential_lqr():
    """End-to-end against the IPDDP sequential-LQR recursion (the workload
    ipddp_solver.cpp:413-476 — gains must agree)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = horizon_mesh(8)
    Q, q, R, r, M, A, B = _random_lqr(jax.random.PRNGKey(1), 31, n=3, m=2)
    K_seq, k_seq, P_seq, p_seq, ok = _solve_sequential_lqr(Q, q, R, r, M, A, B)
    assert bool(ok)
    K, k, S, v = sharded_lqr_backward(Q, q, R, r, M, A, B, mesh=mesh)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_seq), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_seq), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(S), np.asarray(P_seq), rtol=1e-8, atol=1e-9)


def test_sharded_with_drift_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = horizon_mesh(8)
    Q, q, R, r, M, A, B = _random_lqr(jax.random.PRNGKey(2), 24, n=3, m=2)
    d = 0.2 * jax.random.normal(jax.random.PRNGKey(9), (24, 3))
    K_r, k_r, S_r, v_r = jax.jit(lambda *a: parallel_lqr_backward(*a, d=d))(Q, q, R, r, M, A, B)
    K, k, S, v = jax.jit(
        lambda *a: sharded_lqr_backward(*a, mesh=mesh)
    )(Q, q, R, r, M, A, B, d)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_r), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_r), rtol=1e-9, atol=1e-10)
