"""Tier-3 integration matrix (SURVEY.md §4): every solver on the canonical
Car and Quadrotor problems (Pendulum/Unicycle are covered in each solver's
own test file). Assertions mirror the reference's: convergence-or-cost-
improvement plus loose goal-error bounds (test_{clddp,logddp,ipddp,
msipddp}_solver.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Car, quadrotor
from cddp_tpu.solvers import clddp, ipddp, logddp, msipddp

from test_parity_anchors import car_parking_objective

_SOLVERS = {
    "CLDDP": clddp.solve,
    "LogDDP": logddp.solve,
    "IPDDP": ipddp.solve,
    "MSIPDDP": msipddp.solve,
}

_OK = (
    "OptimalSolutionFound",
    "AcceptableSolutionFound",
    "MaxIterationsReached",
    "RegularizationLimitReached_Converged",
)


def _car_problem(dt=0.03, N=150):
    model = Car(wheelbase=2.0, timestep=dt)
    obj = car_parking_objective(dt)
    x0 = jnp.array([1.0, 1.0, 1.5 * jnp.pi, 0.0])
    prob = ct.problem(model, obj, x0, N, dt)
    return prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-0.5, -2.0]), jnp.array([0.5, 2.0])),
    )


def _quadrotor_problem(dt=0.02, N=60):
    mass = 1.0
    model = quadrotor(
        mass=mass,
        inertia=jnp.diag(jnp.asarray([0.01, 0.01, 0.02])),
        arm_length=0.2,
        integration_type="rk4",
    )
    nx, nu = 13, 4
    goal = jnp.zeros(nx).at[0].set(1.5).at[2].set(1.0).at[3].set(1.0)
    Q = jnp.zeros((nx, nx)).at[4, 4].set(0.1).at[5, 5].set(0.1).at[6, 6].set(0.1)
    Qf = jnp.diag(
        jnp.asarray([500.0, 500.0, 500.0, 1.0, 1.0, 1.0, 1.0, 10.0, 10.0,
                     10.0, 0.0, 0.0, 0.0])
    )
    obj = ct.quadratic_objective(Q, 0.1 * jnp.eye(nu), Qf, goal, dt)
    x0 = jnp.zeros(nx).at[3].set(1.0)
    prob = ct.problem(model, obj, x0, N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.zeros(nu), jnp.full((nu,), 9.0)),
    )
    U0 = jnp.full((N, nu), mass * 9.81 / 4.0)
    return prob, goal, U0


@pytest.mark.slow
@pytest.mark.parametrize("name", list(_SOLVERS))
def test_car_parking_all_solvers(name):
    """The Tassa parking cost's zero-control rollout is (near-)stationary at
    this scale, so assert the reference-style contract: an accepted terminal
    status, objective improvement over the seeded rollout, and box-feasible
    controls. (The strong cost<1.91 anchor is the IPDDP N=500 configuration
    in test_parity_anchors.py.) LogDDP additionally promises a decreasing
    barrier merit and strictly interior controls — pinned below so a
    regression to divergence fails."""
    from cddp_tpu.models.base import rollout

    prob = _car_problem()
    # reg 1e-2 matches the IPDDP parking anchor; MSIPDDP's multiple-shooting
    # step stalls against that inflated floor and wants the 1e-4 default.
    reg0 = 1e-4 if name == "MSIPDDP" else 1e-2
    opts = ct.CDDPOptions(
        max_iterations=80, tolerance=1e-4,
        regularization=ct.RegularizationOptions(initial_value=reg0),
        return_iteration_info=(name == "LogDDP"),
    )
    # Seed small controls: the zero-control stationary start is an exact
    # saddle for this cost (Qu == 0 — acceleration reaches the cost only at
    # second order), which no DDP variant escapes; the reference seeds its
    # car/quadrotor examples for the same reason.
    U0 = jnp.tile(jnp.asarray([[0.05, -0.3]]), (prob.horizon, 1))
    X0 = rollout(prob.model, prob.x0, U0, prob.timestep)
    cost0 = prob.objective.evaluate(X0, U0)
    sol = _SOLVERS[name](prob, opts, X0=X0, U0=U0)
    assert sol.status_message in _OK, (name, sol.status_message)
    assert bool(jnp.isfinite(sol.final_objective))
    # ALL solvers — LogDDP included — must improve the true objective over
    # the seeded rollout on this problem (measured 5.77 -> 4.64 for LogDDP).
    assert float(sol.final_objective) < float(cost0), name
    # controls respect the box
    U = sol.control_trajectory
    assert float(jnp.max(jnp.abs(U[:, 0]))) <= 0.5 + 1e-6
    assert float(jnp.max(jnp.abs(U[:, 1]))) <= 2.0 + 1e-6
    if name == "LogDDP":
        # LogDDP-specific promises: strictly interior controls (the relaxed
        # log barrier pushes off the bounds) and a decreasing barrier merit
        # from the first recorded point to the accepted iterate.
        assert float(jnp.max(jnp.abs(U[:, 0]))) < 0.5
        assert float(jnp.max(jnp.abs(U[:, 1]))) < 2.0
        it = int(sol.iterations_completed)
        merit = sol.history.merit_function
        assert float(merit[it]) < float(merit[0]), (
            float(merit[0]), float(merit[it]))


@pytest.mark.slow
@pytest.mark.parametrize("name", list(_SOLVERS))
def test_quadrotor_point_all_solvers(name):
    prob, goal, U0 = _quadrotor_problem()
    opts = ct.CDDPOptions(
        max_iterations=100, tolerance=1e-4,
        regularization=ct.RegularizationOptions(initial_value=1e-4),
    )
    sol = _SOLVERS[name](prob, opts, U0=U0)
    assert sol.status_message in _OK, (name, sol.status_message)
    err = float(jnp.linalg.norm(sol.state_trajectory[-1][:3] - goal[:3]))
    assert err < 0.5, (name, err)  # reference bound (test_ipddp_solver.cpp:1077)
    qn = float(jnp.linalg.norm(sol.state_trajectory[-1][3:7]))
    assert abs(qn - 1.0) < 0.1, (name, qn)


@pytest.mark.slow
def test_car_warm_start_iteration_bound():
    """test_ipddp_solver.cpp:875: warm start from the solved point takes at
    most cold + 50 iterations on the Car parking problem."""
    from cddp_tpu.solvers import ipddp

    prob = _car_problem()
    opts = ct.CDDPOptions(max_iterations=300, tolerance=1e-4,
                          acceptable_tolerance=1e-5)
    cold, state = ipddp.solve(prob, opts, return_state=True)
    warm = ipddp.solve(
        prob, opts.replace(warm_start=True),
        X0=cold.state_trajectory, U0=cold.control_trajectory, state=state,
    )
    assert warm.status_message in _OK
    assert int(warm.iterations_completed) <= int(cold.iterations_completed) + 50


@pytest.mark.slow
def test_quadrotor_warm_start_iteration_bound():
    """test_ipddp_solver.cpp:1144: warm start takes at most cold + 20
    iterations on the quadrotor point-to-point problem."""
    from cddp_tpu.solvers import ipddp

    prob, goal, U0 = _quadrotor_problem()
    opts = ct.CDDPOptions(max_iterations=150, tolerance=1e-4,
                          acceptable_tolerance=1e-4,
                          regularization=ct.RegularizationOptions(initial_value=1e-4))
    cold, state = ipddp.solve(prob, opts, U0=U0, return_state=True)
    warm = ipddp.solve(
        prob, opts.replace(warm_start=True),
        X0=cold.state_trajectory, U0=cold.control_trajectory, state=state,
    )
    assert int(warm.iterations_completed) <= int(cold.iterations_completed) + 20


@pytest.mark.slow
@pytest.mark.parametrize("name", ["LogDDP", "MSIPDDP"])
def test_vmap_batching_invariance_ip_solvers(name):
    """Batched solve row i == unbatched solve i (SURVEY.md §4 new tier) for
    the two solvers not covered by their own files' invariance tests."""
    import jax

    prob = _car_problem(N=40)
    solve = _SOLVERS[name]
    opts = ct.CDDPOptions(max_iterations=30, tolerance=1e-4)

    x0s = jnp.stack([
        jnp.array([1.0, 1.0, 1.5 * jnp.pi, 0.0]),
        jnp.array([0.8, 1.2, 1.4 * jnp.pi, 0.0]),
        jnp.array([1.2, 0.8, 1.6 * jnp.pi, 0.0]),
    ])

    def solve_from(x0):
        return solve(prob.replace(x0=x0), opts).control_trajectory

    batched = jax.vmap(solve_from)(x0s)
    for i in range(x0s.shape[0]):
        single = solve_from(x0s[i])
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-6, atol=1e-8
        )
