"""BoxQP tests (mirror of tests/cddp_core/test_boxqp.cpp): random PD problems
checked against a projected-gradient oracle, plus status/clamping behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu.ops.boxqp import BoxQPStatus, boxqp_solve
from cddp_tpu.options import BoxQPOptions


def _reference_boxqp(H, g, lo, hi, iters=20000, lr=None):
    """Projected-gradient oracle for the strictly-convex box QP."""
    H = np.asarray(H)
    g = np.asarray(g)
    x = np.clip(np.zeros_like(g), lo, hi)
    L = np.linalg.eigvalsh(H).max()
    lr = 1.0 / L
    for _ in range(iters):
        x = np.clip(x - lr * (H @ x + g), lo, hi)
    return x


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (3, 2), (4, 3), (6, 4)])
def test_boxqp_random_pd(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    H = A @ A.T + n * np.eye(n)
    g = rng.normal(size=n)
    lo = -np.ones(n) * 0.5
    hi = np.ones(n) * 0.5

    res = boxqp_solve(
        jnp.asarray(H), jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi),
        jnp.zeros(n),
    )
    assert int(res.status) in (BoxQPStatus.SUCCESS, BoxQPStatus.ALL_CLAMPED)
    x_ref = _reference_boxqp(H, g, lo, hi)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)


def test_boxqp_unconstrained_interior():
    H = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    g = jnp.array([-1.0, 1.0])
    res = boxqp_solve(H, g, -jnp.ones(2) * 10, jnp.ones(2) * 10, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.x), [0.5, -0.5], atol=1e-8)
    assert bool(res.free.all())


def test_boxqp_all_clamped():
    # Strong linear term pushes both coordinates to the same bound.
    H = jnp.eye(2)
    g = jnp.array([-100.0, -100.0])
    res = boxqp_solve(H, g, -jnp.ones(2), jnp.ones(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-12)
    assert int(res.status) in (BoxQPStatus.ALL_CLAMPED, BoxQPStatus.SUCCESS)


def test_boxqp_not_pd():
    H = jnp.array([[1.0, 0.0], [0.0, -1.0]])
    g = jnp.array([0.5, 0.5])
    res = boxqp_solve(H, g, -jnp.ones(2), jnp.ones(2), jnp.zeros(2))
    assert int(res.status) in (BoxQPStatus.HESSIAN_NOT_PD, BoxQPStatus.NO_DESCENT)


def test_boxqp_vmap():
    # The solver must batch under vmap (core requirement for batched MPC).
    n, B = 3, 16
    rng = np.random.default_rng(7)
    As = rng.normal(size=(B, n, n))
    Hs = jnp.asarray(As @ As.transpose(0, 2, 1) + 3 * np.eye(n))
    gs = jnp.asarray(rng.normal(size=(B, n)))
    lo = -jnp.ones(n)
    hi = jnp.ones(n)

    batched = jax.vmap(lambda H, g: boxqp_solve(H, g, lo, hi, jnp.zeros(n)))
    res = batched(Hs, gs)
    for i in range(B):
        ref = _reference_boxqp(np.asarray(Hs[i]), np.asarray(gs[i]), np.asarray(lo), np.asarray(hi))
        np.testing.assert_allclose(np.asarray(res.x[i]), ref, atol=1e-6)


def test_enum_matches_newton():
    # Exact enumeration and projected Newton agree on the unique optimum.
    from cddp_tpu.ops.boxqp import boxqp_solve_enum

    rng = np.random.default_rng(11)
    for n in (1, 2, 3, 4):
        # One jitted vmap per n (5 trials batched): eager per-trial calls
        # paid ~20 uncached trace+dispatch rounds.
        A = rng.normal(size=(5, n, n))
        Hs = jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n))
        gs = jnp.asarray(rng.normal(size=(5, n)))
        lo = -jnp.ones(n) * 0.7
        hi = jnp.ones(n) * 0.7
        r_enum = jax.jit(jax.vmap(
            lambda H, g: boxqp_solve_enum(H, g, lo, hi)
        ))(Hs, gs)
        r_newton = jax.jit(jax.vmap(
            lambda H, g: boxqp_solve(H, g, lo, hi, jnp.zeros(n))
        ))(Hs, gs)
        np.testing.assert_allclose(
            np.asarray(r_enum.x), np.asarray(r_newton.x), atol=1e-6
        )
        assert bool(jnp.all(r_enum.free == r_newton.free)), n


def test_enum_not_pd():
    from cddp_tpu.ops.boxqp import boxqp_solve_enum

    H = jnp.array([[1.0, 0.0], [0.0, -1.0]])
    g = jnp.array([0.5, 0.5])
    res = boxqp_solve_enum(H, g, -jnp.ones(2), jnp.ones(2))
    assert int(res.status) == BoxQPStatus.HESSIAN_NOT_PD
