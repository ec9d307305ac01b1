"""CLDDP solver integration tests.

Mirrors tests/cddp_core/test_clddp_solver.cpp: pendulum swing-up with a ±10
torque box (N=500, dt=0.05), unconstrained iLQR sanity, warm-start behavior,
and vmap batching invariance (new tier per SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Pendulum, Unicycle
from cddp_tpu.solvers import clddp


def _pendulum_problem(horizon=500, dt=0.05, bound=10.0):
    model = Pendulum(length=1.0, mass=1.0, damping=0.0)
    goal = jnp.array([0.0, 0.0])
    obj = ct.quadratic_objective(
        jnp.zeros((2, 2)), 0.1 * jnp.eye(1), 100.0 * jnp.eye(2), goal, dt
    )
    x0 = jnp.array([jnp.pi, 0.0])
    prob = ct.problem(model, obj, x0, horizon, dt)
    prob = prob.add_constraint(
        "ControlConstraint", ct.control_constraint(jnp.array([-bound]), jnp.array([bound]))
    )
    return prob, x0, goal


def test_pendulum_swingup_box():
    prob, x0, goal = _pendulum_problem()
    opts = ct.CDDPOptions(
        max_iterations=100, tolerance=1e-3, acceptable_tolerance=1e-4
    )
    # X seeded at the initial state for every step (reference test does this).
    X0 = jnp.tile(x0, (prob.horizon + 1, 1))
    U0 = jnp.zeros((prob.horizon, 1))
    J0 = float(prob.objective.evaluate(X0, U0))

    sol = clddp.solve(prob, opts, X0=X0, U0=U0)

    assert sol.status_message in ("OptimalSolutionFound", "AcceptableSolutionFound")
    assert int(sol.iterations_completed) > 0
    assert float(sol.final_objective) < J0
    # Controls respect the box
    assert float(jnp.max(jnp.abs(sol.control_trajectory))) <= 10.0 + 1e-9
    # Swing-up should get close to upright
    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.2, f"final error {err}"


def test_pendulum_unconstrained_ilqr():
    model = Pendulum(length=1.0, mass=1.0, damping=0.0)
    dt, N = 0.05, 200
    goal = jnp.array([0.0, 0.0])
    obj = ct.quadratic_objective(
        jnp.zeros((2, 2)), 0.1 * jnp.eye(1), 100.0 * jnp.eye(2), goal, dt
    )
    prob = ct.problem(model, obj, jnp.array([jnp.pi, 0.0]), N, dt)
    opts = ct.CDDPOptions(max_iterations=200, tolerance=1e-4)
    X0 = jnp.tile(prob.x0, (N + 1, 1))
    sol = clddp.solve(prob, opts, X0=X0)
    assert sol.status_message in ("OptimalSolutionFound", "AcceptableSolutionFound")
    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.3


def test_unicycle_clddp():
    # Reference unicycle example (examples/cddp_unicycle.cpp): N=100, dt=0.03.
    dt, N = 0.03, 100
    model = Unicycle()
    goal = jnp.array([2.0, 2.0, jnp.pi / 2])
    Q = jnp.diag(jnp.array([1.0, 1.0, 0.1])) * 0.0
    obj = ct.quadratic_objective(
        Q, 0.05 * jnp.eye(2), 100.0 * jnp.eye(3), goal, dt
    )
    prob = ct.problem(model, obj, jnp.zeros(3), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -jnp.pi]), jnp.array([2.0, jnp.pi])),
    )
    opts = ct.CDDPOptions(max_iterations=300, tolerance=1e-4)
    X0 = jnp.tile(prob.x0, (N + 1, 1))
    sol = clddp.solve(prob, opts, X0=X0)
    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.3, f"{sol.status_message} err={err}"


def test_warm_start_gains():
    prob, x0, _ = _pendulum_problem(horizon=200)
    opts = ct.CDDPOptions(max_iterations=100, tolerance=1e-3, acceptable_tolerance=1e-4)
    X0 = jnp.tile(x0, (prob.horizon + 1, 1))
    cold = clddp.solve(prob, opts, X0=X0)
    warm_opts = opts.replace(warm_start=True)
    warm = clddp.solve(
        prob,
        warm_opts,
        X0=cold.state_trajectory,
        U0=cold.control_trajectory,
        gains=(cold.feedforward_gains, cold.feedback_gains),
    )
    # Warm start from the converged point should finish in few iterations.
    assert int(warm.iterations_completed) <= int(cold.iterations_completed)


def test_vmap_batching_invariance():
    # Batched solve row i == unbatched solve i (SURVEY.md §4 new tier).
    prob, x0, _ = _pendulum_problem(horizon=100)
    opts = ct.CDDPOptions(max_iterations=30, tolerance=1e-3)

    x0s = jnp.stack([x0, x0 * 0.9, x0 * 1.05, jnp.array([2.0, 0.3])])

    def solve_one(x0i):
        p = prob.replace(x0=x0i)
        X0 = jnp.tile(x0i, (p.horizon + 1, 1))
        sol = clddp.solve(p, opts, X0=X0)
        return sol.final_objective, sol.state_trajectory

    batched_cost, batched_X = jax.vmap(solve_one)(x0s)
    for i in range(x0s.shape[0]):
        ci, Xi = solve_one(x0s[i])
        np.testing.assert_allclose(float(batched_cost[i]), float(ci), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(batched_X[i]), np.asarray(Xi), rtol=1e-8, atol=1e-10)


def test_solver_registry():
    prob, x0, _ = _pendulum_problem(horizon=50)
    with pytest.raises(ValueError):
        ct.solve(prob, "NotASolver")
    called = {}

    def fake(problem, options, **kw):
        called["yes"] = True
        return None

    ct.register_solver("Fake", fake)
    ct.solve(prob, "Fake")
    assert called["yes"]


def test_iteration_history():
    prob, x0, _ = _pendulum_problem(horizon=100)
    opts = ct.CDDPOptions(
        max_iterations=50, tolerance=1e-3, return_iteration_info=True
    )
    X0 = jnp.tile(x0, (prob.horizon + 1, 1))
    sol = clddp.solve(prob, opts, X0=X0)
    assert sol.history is not None
    n = int(sol.iterations_completed)
    obj = np.asarray(sol.history.objective)
    assert obj.shape == (51,)
    # Initial record present and objective non-increasing over accepted iters
    assert obj[0] > 0
    assert obj[n] <= obj[0]
    assert np.all(np.asarray(sol.history.regularization)[: n + 1] >= 0)


def test_lti_exact_lqr_one_iteration():
    # Unconstrained CLDDP on a discrete LTI system with quadratic cost IS
    # finite-horizon LQR: the first backward pass yields the optimal gains
    # and the forward pass lands on the optimum (dJ ~ 0 at iteration 2).
    from cddp_tpu.models import lti_system

    dt, N = 0.1, 30
    model = lti_system(dt)  # fixed default 4x2 system
    obj = ct.quadratic_objective(
        0.5 * jnp.eye(4), 0.1 * jnp.eye(2), 5.0 * jnp.eye(4), jnp.zeros(4), dt
    )
    x0 = jnp.array([1.0, -1.0, 0.5, 0.2])
    prob = ct.problem(model, obj, x0, N, dt)
    opts = ct.CDDPOptions(max_iterations=10, tolerance=1e-8,
                          acceptable_tolerance=1e-12)
    X0 = jnp.tile(x0, (N + 1, 1))
    sol = clddp.solve(prob, opts, X0=X0)
    assert sol.status_message == "OptimalSolutionFound"
    assert int(sol.iterations_completed) <= 5, int(sol.iterations_completed)

    # Cross-check the gains against the native C++ LQR oracle when available.
    import shutil

    if shutil.which("g++"):
        from cddp_tpu.utils import native
        from cddp_tpu.solvers import base

        A, B = base.discrete_jacobians(prob, sol.state_trajectory,
                                       sol.control_trajectory)
        lx, lu, lxx, luu, lux = base.running_cost_derivatives(
            prob, sol.state_trajectory, sol.control_trajectory
        )
        # LQR data in the sequential-solver convention: note CLDDP's gains
        # come from the same recursion with Q=lxx etc.
        Qs = np.concatenate([np.asarray(lxx),
                             np.asarray(obj.terminal_cost_hessian(sol.state_trajectory[-1]))[None]])
        qs = np.concatenate([np.asarray(lx),
                             np.asarray(obj.terminal_cost_gradient(sol.state_trajectory[-1]))[None]])
        K_n, k_n = native.lqr_backward(
            Qs, qs, np.asarray(luu), np.asarray(lu),
            np.asarray(lux).transpose(0, 2, 1), np.asarray(A), np.asarray(B),
        )
        np.testing.assert_allclose(
            np.asarray(sol.feedback_gains), K_n, rtol=1e-6, atol=1e-8
        )


def test_enable_parallel_best_merit():
    # Parallel mode evaluates all alphas and picks best merit
    # (cddp_solver_base.cpp:264-314); result quality matches sequential.
    prob, x0, goal = _pendulum_problem(horizon=150)
    X0 = jnp.tile(x0, (prob.horizon + 1, 1))
    seq = clddp.solve(prob, ct.CDDPOptions(max_iterations=100, tolerance=1e-3), X0=X0)
    par = clddp.solve(
        prob,
        ct.CDDPOptions(max_iterations=100, tolerance=1e-3, enable_parallel=True),
        X0=X0,
    )
    e_s = float(jnp.linalg.norm(seq.state_trajectory[-1] - goal))
    e_p = float(jnp.linalg.norm(par.state_trajectory[-1] - goal))
    assert e_p < 0.3 and e_s < 0.3
