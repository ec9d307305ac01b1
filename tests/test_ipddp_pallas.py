"""Fused IPDDP condensed-backward Pallas kernel vs the lax.scan reference
(interpreter mode on CPU; the real TPU path is exercised by bench_mpcc.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.ops.pallas.ipddp_riccati import ipddp_backward_fused
from cddp_tpu.solvers.ipddp import _condensed_scan_single


def _random_stage_data(key, B, N, nx, nu, m, dtype):
    ks = jax.random.split(key, 16)
    rnd = lambda i, shape, scale=1.0: (
        scale * jax.random.normal(ks[i], shape, dtype)
    )
    eye = jnp.eye(nx, dtype=dtype)
    A = eye + 0.05 * rnd(0, (B, N, nx, nx))
    Bm = 0.2 * rnd(1, (B, N, nx, nu))
    lx = rnd(2, (B, N, nx), 0.5)
    lu = rnd(3, (B, N, nu), 0.5)
    W = 0.1 * rnd(4, (B, N, nx, nx))
    lxx = jnp.eye(nx, dtype=dtype) * 0.5 + W @ W.swapaxes(-1, -2)
    Wu = 0.1 * rnd(5, (B, N, nu, nu))
    luu = jnp.eye(nu, dtype=dtype) * 1.0 + Wu @ Wu.swapaxes(-1, -2)
    lux = 0.05 * rnd(6, (B, N, nu, nx))
    Y = jax.random.uniform(ks[7], (B, N, m), dtype, 0.05, 1.0)
    S = jax.random.uniform(ks[8], (B, N, m), dtype, 0.05, 1.0)
    G = 0.2 * rnd(9, (B, N, m)) - 0.3
    Gx = 0.3 * rnd(10, (B, N, m, nx))
    Gu = 0.3 * rnd(11, (B, N, m, nu))
    VxT = rnd(12, (B, nx), 0.5)
    Wt = 0.2 * rnd(13, (B, nx, nx))
    VxxT = jnp.eye(nx, dtype=dtype) * 2.0 + Wt @ Wt.swapaxes(-1, -2)
    mu = jnp.full((B,), 0.1, dtype)
    reg = jnp.full((B,), 1e-6, dtype)
    return (A, Bm, lx, lu, lxx, luu, lux, Y, S, G, Gx, Gu, VxT, VxxT, mu, reg)


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float64, 1e-9, 1e-11),
    # interpret-mode f32 costs a second full interpret run for a looser
    # tolerance check — slow tier.
    pytest.param(jnp.float32, 2e-3, 2e-3, marks=pytest.mark.slow),
])
def test_ipddp_fused_matches_scan(dtype, rtol, atol):
    # Small B/N: interpret-mode Pallas executes the grid in Python, so the
    # fast tier pays ~linear in B*N (B=8,N=10 measured 43s; B=2,N=6 keeps
    # the full algebra — nx=4, nu=2, m=3, batching — at a fraction).
    args = _random_stage_data(
        jax.random.PRNGKey(0), B=2, N=6, nx=4, nu=2, m=3, dtype=dtype
    )
    ref = jax.jit(jax.vmap(_condensed_scan_single))(*args)
    fused = jax.jit(
        functools.partial(ipddp_backward_fused, interpret=True)
    )(*args)
    names = ["k_u", "K_u", "k_y", "K_y", "k_s", "K_s", "Vx", "Vxx", "stats"]
    for name, r, f in zip(names, ref, fused):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), rtol=rtol, atol=atol, err_msg=name
        )


def test_ipddp_engine_dispatch_parity():
    """IPDDP end-to-end: backward_engine="fused" (custom_vmap op; CPU/f64
    falls back to the vmapped scan rule) must match "scan" exactly."""
    from cddp_tpu.models import Unicycle
    from cddp_tpu.parallel.batch import batched_solve

    dtype = jnp.float64
    dt, N = 0.05, 15
    goal = jnp.asarray([1.5, 1.5, 0.8], dtype)
    obj = ct.quadratic_objective(
        jnp.eye(3, dtype=dtype) * 0.1, jnp.eye(2, dtype=dtype) * 0.05,
        jnp.eye(3, dtype=dtype) * 50.0, goal, dt,
    )
    prob = ct.problem(Unicycle(), obj, jnp.zeros(3, dtype), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(
            jnp.asarray([-2.0, -3.0], dtype), jnp.asarray([2.0, 3.0], dtype)
        ),
    )
    x0s = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.2, -0.1, 0.3], [-0.3, 0.1, -0.2]], dtype
    )
    auto = ct.CDDPOptions(max_iterations=20, backward_engine="fused")
    scan = auto.replace(backward_engine="scan")

    sol_a = batched_solve(prob, x0s, "IPDDP", auto)
    sol_s = batched_solve(prob, x0s, "IPDDP", scan)
    np.testing.assert_allclose(
        np.asarray(sol_a.final_objective),
        np.asarray(sol_s.final_objective), rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sol_a.control_trajectory),
        np.asarray(sol_s.control_trajectory), rtol=1e-8, atol=1e-10,
    )
    assert bool(jnp.all(jnp.isfinite(sol_a.final_objective)))
