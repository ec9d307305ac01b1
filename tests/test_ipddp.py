"""IPDDP solver integration tests.

Mirrors tests/cddp_core/test_ipddp_solver.cpp tiers: pendulum swing-up with a
control box (examples/cddp_pendulum.cpp config), unicycle ball-obstacle
avoidance (python portfolio demo), terminal equality/inequality handling,
unsupported-terminal-type rejection, warm starting, and vmap batching.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Pendulum, Unicycle
from cddp_tpu.solvers import ipddp


def _pendulum_problem(N=100, dt=0.02, bound=20.0):
    # examples/cddp_pendulum.cpp:23-67 configuration.
    model = Pendulum(length=0.5, mass=1.0, damping=0.01)
    goal = jnp.array([0.0, 0.0])
    obj = ct.quadratic_objective(
        jnp.zeros((2, 2)), 0.1 * jnp.eye(1), 100.0 * jnp.eye(2), goal, dt
    )
    prob = ct.problem(model, obj, jnp.array([jnp.pi, 0.0]), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-bound]), jnp.array([bound])),
    )
    return prob, goal


def test_pendulum_swingup_ipddp():
    prob, goal = _pendulum_problem()
    opts = ct.CDDPOptions(max_iterations=400, tolerance=1e-4, acceptable_tolerance=1e-5)
    sol = ipddp.solve(prob, opts)
    assert sol.status_message in (
        "OptimalSolutionFound",
        "AcceptableSolutionFound",
    ), sol.status_message
    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.3, err
    assert float(jnp.max(jnp.abs(sol.control_trajectory))) <= 20.0 + 1e-6
    # Duals/slacks positive at the solution
    for name, y in sol.dual_trajectories.items():
        assert float(y.min()) > 0
    for name, s in sol.slack_trajectories.items():
        assert float(s.min()) > 0


def test_unicycle_ball_obstacle():
    # python_portfolio_lib.py:374-475: unicycle to (2,2) avoiding ball at
    # (1,1) with radius 0.4; control box.
    dt, N = 0.03, 100
    model = Unicycle()
    goal = jnp.array([2.0, 2.0, jnp.pi / 2])
    obj = ct.quadratic_objective(
        jnp.zeros((3, 3)), 0.05 * jnp.eye(2), 100.0 * jnp.eye(3), goal, dt
    )
    prob = ct.problem(model, obj, jnp.zeros(3), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -jnp.pi]), jnp.array([2.0, jnp.pi])),
    )
    prob = prob.add_constraint(
        "BallConstraint", ct.ball_constraint(0.4, jnp.array([1.0, 1.0]))
    )
    opts = ct.CDDPOptions(max_iterations=400, tolerance=1e-4, acceptable_tolerance=1e-5)
    # Seed straight-line-ish controls like the portfolio demo
    U0 = jnp.tile(jnp.array([0.5, 0.0]), (N, 1))
    sol = ipddp.solve(prob, opts, U0=U0)

    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.5, (sol.status_message, err)
    # Obstacle avoidance: min distance from center >= radius (small slack tol)
    d = jnp.linalg.norm(sol.state_trajectory[:, :2] - jnp.array([1.0, 1.0]), axis=1)
    assert float(d.min()) > 0.4 - 0.05, float(d.min())


def test_unconstrained_ipddp_runs():
    model = Pendulum(length=0.5, mass=1.0, damping=0.01)
    dt, N = 0.02, 100
    goal = jnp.array([0.0, 0.0])
    obj = ct.quadratic_objective(
        jnp.zeros((2, 2)), 0.1 * jnp.eye(1), 100.0 * jnp.eye(2), goal, dt
    )
    prob = ct.problem(model, obj, jnp.array([jnp.pi, 0.0]), N, dt)
    opts = ct.CDDPOptions(max_iterations=200, tolerance=1e-5)
    sol = ipddp.solve(prob, opts)
    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.3, (sol.status_message, err)


def test_terminal_equality():
    # Pendulum with terminal equality to the upright state
    # (test_ipddp_solver.cpp:1147-1254 analogue).
    prob, goal = _pendulum_problem(N=100, dt=0.02)
    prob = prob.add_terminal_constraint(
        "TerminalEqualityConstraint", ct.terminal_equality_constraint(goal)
    )
    opts = ct.CDDPOptions(max_iterations=400, tolerance=1e-4, acceptable_tolerance=1e-5)
    sol = ipddp.solve(prob, opts)
    residual = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    # reference bound: residual <= 1e-4 (test_ipddp_solver.cpp:1205-1206);
    # measured 2e-7 here.
    assert residual < 1e-4, (sol.status_message, residual)
    assert "TerminalEqualityConstraint" in sol.terminal_duals


# slow tier: compile-heavy warm-start/batching regressions
@pytest.mark.slow
def test_terminal_inequality():
    # Terminal box |x_N| <= 0.05 via A=[I;-I].
    prob, goal = _pendulum_problem(N=100, dt=0.02)
    A = jnp.concatenate([jnp.eye(2), -jnp.eye(2)], axis=0)
    b = jnp.full((4,), 0.05)
    prob = prob.add_terminal_constraint(
        "TerminalInequalityConstraint", ct.terminal_inequality_constraint(A, b)
    )
    opts = ct.CDDPOptions(max_iterations=400, tolerance=1e-4, acceptable_tolerance=1e-5)
    sol = ipddp.solve(prob, opts)
    g = np.asarray(A @ sol.state_trajectory[-1] - b)
    assert (g < 0.02).all(), (sol.status_message, g)


def test_unsupported_terminal_type_rejected():
    prob, goal = _pendulum_problem(N=20)

    class Fake(ct.TerminalConstraint):
        pass

    prob = prob.add_terminal_constraint("Weird", Fake(dual_dim=1))
    with pytest.raises(TypeError, match="unsupported type"):
        ipddp.solve(prob, ct.CDDPOptions(max_iterations=1))


def test_warm_start_fewer_iterations():
    # test_ipddp_solver.cpp:470-549: warm start should not take many more
    # iterations than cold start from the solved point.
    prob, goal = _pendulum_problem(N=100, dt=0.02)
    opts = ct.CDDPOptions(max_iterations=400, tolerance=1e-4, acceptable_tolerance=1e-5)
    cold, state = ipddp.solve(prob, opts, return_state=True)
    warm_opts = opts.replace(warm_start=True)
    warm = ipddp.solve(
        prob,
        warm_opts,
        X0=cold.state_trajectory,
        U0=cold.control_trajectory,
        state=state,
    )
    assert int(warm.iterations_completed) <= int(cold.iterations_completed) + 5


# slow tier: compile-heavy warm-start/batching regressions
@pytest.mark.slow
def test_warmstart_reset_x0_threshold():
    """warmstart_reset_x0_threshold discards the warm state on x0 drift
    (declared semantics of ipddp_solver.cpp:844-866 /
    options.hpp:168-177): above threshold the solve is bit-identical to a
    cold start from the new x0; below it the warm state is honored."""
    prob, goal = _pendulum_problem(N=60, dt=0.02)
    opts = ct.CDDPOptions(
        max_iterations=200, tolerance=1e-4, acceptable_tolerance=1e-5
    )
    cold, state = ipddp.solve(prob, opts, return_state=True)
    np.testing.assert_allclose(np.asarray(state.x0), np.asarray(prob.x0))

    reset_opts = opts.replace(
        warm_start=True,
        max_iterations=3,
        ipddp=ct.IPDDPOptions(warmstart_reset_x0_threshold=0.5),
    )

    # Drift above threshold -> exactly a cold start (zero controls) from x0'.
    p2 = prob.replace(x0=jnp.array([jnp.pi - 1.0, 0.3]))
    warm_reset = ipddp.solve(p2, reset_opts, U0=cold.control_trajectory, state=state)
    cold2 = ipddp.solve(p2, opts.replace(max_iterations=3))
    np.testing.assert_allclose(
        np.asarray(warm_reset.state_trajectory),
        np.asarray(cold2.state_trajectory),
        atol=1e-10,
    )

    # Drift below threshold -> warm state kept (differs from a cold restart).
    p3 = prob.replace(x0=prob.x0 + 0.01)
    warm_keep = ipddp.solve(p3, reset_opts, U0=cold.control_trajectory, state=state)
    cold3 = ipddp.solve(p3, opts.replace(max_iterations=3))
    assert not np.allclose(
        np.asarray(warm_keep.control_trajectory),
        np.asarray(cold3.control_trajectory),
    )


# slow tier: compile-heavy warm-start/batching regressions
@pytest.mark.slow
def test_warmstart_preserves_path_dual_slack_exactly():
    """test_ipddp_solver.cpp:1306-1335: warm-start initialization preserves
    fabricated interior path slack/dual values EXACTLY (1e-12). A
    zero-iteration warm solve exposes the initialized state. Values are
    chosen interior enough that warmstartNeedsReinit (:264-292) does not
    trigger (required slack = 1+offset for the unit control box)."""
    prob, _ = _pendulum_problem(N=10, bound=1.0)
    opts = ct.CDDPOptions(max_iterations=1, tolerance=1e-4)
    _, state = ipddp.solve(prob, opts, return_state=True)
    fab = state._replace(
        Y=jnp.full_like(state.Y, 0.73), S=jnp.full_like(state.S, 0.42)
    )
    wopts = opts.replace(warm_start=True, max_iterations=0)
    _, out = ipddp.solve(prob, wopts, state=fab, return_state=True)
    np.testing.assert_allclose(np.asarray(out.Y), 0.73, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.S), 0.42, atol=1e-12)


# slow tier: compile-heavy warm-start/batching regressions
@pytest.mark.slow
def test_warmstart_preserves_terminal_state_exactly():
    """test_ipddp_solver.cpp:1337-1380: terminal-inequality slack/dual and
    terminal-equality multipliers survive warm-start init at 1e-12."""
    prob, goal = _pendulum_problem(N=10, bound=1.0)
    A = jnp.concatenate([jnp.eye(2), -jnp.eye(2)], axis=0)
    b = jnp.full((4,), 4.0)
    prob = prob.add_terminal_constraint(
        "TerminalInequalityConstraint", ct.terminal_inequality_constraint(A, b)
    )
    prob = prob.add_terminal_constraint(
        "TerminalEqualityConstraint", ct.terminal_equality_constraint(goal)
    )
    opts = ct.CDDPOptions(max_iterations=1, tolerance=1e-4)
    _, state = ipddp.solve(prob, opts, return_state=True)
    fab = state._replace(
        Y_T=jnp.full_like(state.Y_T, 0.61),
        S_T=jnp.full_like(state.S_T, 0.37),
        Lambda_T_eq=jnp.full_like(state.Lambda_T_eq, 0.53),
    )
    wopts = opts.replace(warm_start=True, max_iterations=0)
    _, out = ipddp.solve(prob, wopts, state=fab, return_state=True)
    np.testing.assert_allclose(np.asarray(out.Y_T), 0.61, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.S_T), 0.37, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.Lambda_T_eq), 0.53, atol=1e-12)


def test_warmstart_stale_slack_reinit():
    """warmstartNeedsReinit (ipddp_solver.cpp:264-292): slacks far below the
    required interior level are re-initialized, not preserved."""
    prob, _ = _pendulum_problem(N=10, bound=20.0)  # required slack ~ 20
    opts = ct.CDDPOptions(max_iterations=1, tolerance=1e-4)
    _, state = ipddp.solve(prob, opts, return_state=True)
    fab = state._replace(S=jnp.full_like(state.S, 0.42))
    wopts = opts.replace(warm_start=True, max_iterations=0)
    _, out = ipddp.solve(prob, wopts, state=fab, return_state=True)
    assert float(np.asarray(out.S).min()) > 1.0  # reinit to ~20, not 0.42


# slow tier: compile-heavy warm-start/batching regressions
@pytest.mark.slow
def test_vmap_batched_ipddp():
    prob, goal = _pendulum_problem(N=50)
    opts = ct.CDDPOptions(max_iterations=50, tolerance=1e-3)

    x0s = jnp.stack(
        [jnp.array([jnp.pi, 0.0]), jnp.array([2.5, 0.1]), jnp.array([3.0, -0.2])]
    )

    def solve_one(x0):
        p = prob.replace(x0=x0)
        s = ipddp.solve(p, opts)
        return s.final_objective, s.state_trajectory

    bc, bX = jax.vmap(solve_one)(x0s)
    for i in range(3):
        ci, Xi = solve_one(x0s[i])
        np.testing.assert_allclose(float(bc[i]), float(ci), rtol=1e-9)


def test_ipddp_history_and_mu_decay():
    prob, goal = _pendulum_problem(N=80)
    opts = ct.CDDPOptions(
        max_iterations=200, tolerance=1e-4, acceptable_tolerance=1e-5,
        return_iteration_info=True,
    )
    sol = ipddp.solve(prob, opts)
    assert sol.history is not None
    n = int(sol.iterations_completed)
    mu = np.asarray(sol.history.barrier_mu)
    assert mu[0] == 1.0  # mu_initial with constraints present
    assert mu[n] < mu[0]  # barrier decayed over the solve


def test_full_ddp_second_order():
    # use_ilqr=False exercises the second-order dynamics terms
    # (ipddp_solver.cpp:1397-1409). Pendulum has nonzero Fxx. Contract:
    # full DDP must CONVERGE (not just land near the goal) and reach the
    # same optimum as iLQR — wrong tensor terms typically still "work"
    # but drag the solve to a different/worse stationary point.
    prob, goal = _pendulum_problem(N=80)
    kwargs = dict(max_iterations=300, tolerance=1e-4,
                  acceptable_tolerance=1e-5)
    sol = ipddp.solve(prob, ct.CDDPOptions(use_ilqr=False, **kwargs))
    err = float(jnp.linalg.norm(sol.state_trajectory[-1] - goal))
    assert err < 0.3, (sol.status_message, err)
    assert sol.status_message in (
        "OptimalSolutionFound", "AcceptableSolutionFound"
    ), sol.status_message
    sol_ilqr = ipddp.solve(prob, ct.CDDPOptions(**kwargs))
    c_ddp, c_ilqr = float(sol.final_objective), float(sol_ilqr.final_objective)
    assert abs(c_ddp - c_ilqr) < 1e-4 * max(1.0, abs(c_ilqr)), (c_ddp, c_ilqr)


def test_check_state_stationarity_option():
    # The optional state-stationarity term (ipddp_solver.cpp:2726-2776)
    # folds ||G_x' y||_inf into the dual infeasibility; the solve still
    # converges to the same trajectory.
    prob, goal = _pendulum_problem(N=60)
    base_kwargs = dict(max_iterations=200, tolerance=1e-4, acceptable_tolerance=1e-5)
    sol_off = ipddp.solve(prob, ct.CDDPOptions(**base_kwargs))
    sol_on = ipddp.solve(
        prob,
        ct.CDDPOptions(**base_kwargs,
                       ipddp=ct.IPDDPOptions(check_state_stationarity=True)),
    )
    np.testing.assert_allclose(
        float(sol_on.final_objective), float(sol_off.final_objective), rtol=1e-3
    )


def test_warmstart_interior_repair():
    """warmstart_repair clamps warm slacks/duals to the interior floors
    (repairWarmstartInterior, ipddp_solver.cpp:233-262) and the warm solve
    still converges."""
    prob, _goal = _pendulum_problem()
    opts = ct.CDDPOptions(max_iterations=200, tolerance=1e-4)
    sol, st = ipddp.solve(prob, opts, return_state=True)
    # poison the state with boundary-hugging slacks/duals
    st_bad = st._replace(
        S=st.S.at[0, 0].set(1e-12), Y=st.Y.at[1, 0].set(1e-12)
    )
    opts_w = opts.replace(
        warm_start=True,
        ipddp=ct.IPDDPOptions(warmstart_repair=True),
    )
    sol2 = ipddp.solve(
        prob, opts_w, X0=sol.state_trajectory, U0=sol.control_trajectory,
        state=st_bad,
    )
    assert sol2.status_message in (
        "OptimalSolutionFound", "AcceptableSolutionFound",
        "MaxIterationsReached",
    )
    assert bool(jnp.isfinite(sol2.final_objective))
    import numpy as np
    np.testing.assert_allclose(
        float(sol2.final_objective), float(sol.final_objective), rtol=0.05
    )
