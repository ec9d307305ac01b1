"""Parallel-layer tests: batched solves, sharded mesh solves, MPC controller
(plus solver error surfaces, mirroring python/tests/test_solver_errors.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Unicycle
from cddp_tpu.parallel.batch import batched_solve, make_mpc_controller
from cddp_tpu.parallel.mesh import dp_mesh, sharded_batched_solve


def _prob(N=20, dt=0.05):
    model = Unicycle()
    goal = jnp.array([2.0, 2.0, jnp.pi / 2])
    obj = ct.quadratic_objective(
        0.1 * jnp.eye(3), 0.05 * jnp.eye(2), 100.0 * jnp.eye(3), goal, dt
    )
    p = ct.problem(model, obj, jnp.zeros(3), N, dt)
    return p.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -jnp.pi]), jnp.array([2.0, jnp.pi])),
    )


def test_batched_solve_matches_loop():
    prob = _prob()
    opts = ct.CDDPOptions(max_iterations=10, tolerance=1e-4)
    x0s = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (6, 3)))
    sols = batched_solve(prob, x0s, solver="CLDDP", options=opts)
    assert sols.final_objective.shape == (6,)
    from cddp_tpu.solvers import clddp

    for i in (0, 3, 5):
        p = prob.replace(x0=x0s[i])
        X0 = jnp.broadcast_to(x0s[i], (prob.horizon + 1, 3))
        si = clddp.solve(p, opts, X0=X0)
        np.testing.assert_allclose(
            float(sols.final_objective[i]), float(si.final_objective), rtol=1e-9
        )


def test_sharded_solve_matches_batched():
    # 8 virtual CPU devices (conftest); sharded == unsharded per element,
    # including the non-divisible-batch padding path.
    prob = _prob()
    opts = ct.CDDPOptions(max_iterations=5, tolerance=1e-4)
    x0s = jnp.asarray(np.random.default_rng(1).uniform(-0.5, 0.5, (11, 3)))
    mesh = dp_mesh()
    assert mesh.devices.size == 8
    sols_sharded = sharded_batched_solve(prob, x0s, mesh=mesh, options=opts)
    sols_local = batched_solve(prob, x0s, options=opts)
    np.testing.assert_allclose(
        np.asarray(sols_sharded.final_objective),
        np.asarray(sols_local.final_objective),
        rtol=1e-6,
    )


# slow tier: fleet MPC integration (sharded solve parity stays fast)
@pytest.mark.slow
def test_mpc_controller_fleet():
    prob = _prob(N=15)
    init_fn, step_fn = make_mpc_controller(
        prob, "CLDDP", ct.CDDPOptions(max_iterations=5, tolerance=1e-3)
    )
    B = 4
    x0s = jnp.asarray(np.random.default_rng(2).uniform(-0.3, 0.3, (B, 3)))
    states = jax.vmap(init_fn)(x0s)
    fleet_step = jax.jit(jax.vmap(lambda s, x: step_fn(s, x)[:2]))
    xs = x0s
    for _ in range(5):
        us, states = fleet_step(states, xs)
        xs = jax.vmap(lambda x, u: prob.model.discrete_dynamics(x, u, 0.0, prob.timestep))(xs, us)
    assert bool(jnp.all(jnp.isfinite(xs)))
    # Fleet should be moving toward the goal
    d0 = jnp.linalg.norm(x0s[:, :2] - jnp.array([2.0, 2.0]), axis=1)
    d1 = jnp.linalg.norm(xs[:, :2] - jnp.array([2.0, 2.0]), axis=1)
    assert float(jnp.mean(d1)) < float(jnp.mean(d0))


def test_solver_error_surfaces():
    # Mirror of python/tests/test_solver_errors.py:21-123.
    from cddp_tpu.compat import CDDP

    s = CDDP(jnp.zeros(3), jnp.zeros(3), 10, 0.1)
    with pytest.raises(RuntimeError, match="Dynamical system"):
        s.solve()
    # Abstract model rejection at SET time (pycddp isExactCoreType guard;
    # previously this surfaced later as NotImplementedError on trace).
    from cddp_tpu.models.base import DynamicalSystem

    with pytest.raises(TypeError, match="abstract base"):
        s.set_dynamical_system(DynamicalSystem(state_dim=3, control_dim=2))


# slow tier: fleet MPC integration (sharded solve parity stays fast)
@pytest.mark.slow
def test_warm_start_mpc_controller():
    # IPDDP MPC with solver-state threading between ticks.
    prob = _prob(N=15)
    init_fn, step_fn = make_mpc_controller(
        prob, "IPDDP",
        ct.CDDPOptions(max_iterations=20, tolerance=1e-3,
                       acceptable_tolerance=1e-4),
        warm_start_solver_state=True,
    )
    x = jnp.array([0.1, -0.1, 0.2])
    state = init_fn(x)
    step = jax.jit(step_fn)
    iters = []
    for _ in range(6):
        u, state, info = step(state, x)
        x = prob.model.discrete_dynamics(x, u, 0.0, prob.timestep)
        iters.append(int(info["iterations"]))
    assert bool(jnp.all(jnp.isfinite(x)))
    # Warm-started later ticks should need no more iterations than the first.
    assert min(iters[1:]) <= iters[0]
