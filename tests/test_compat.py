"""pycddp-style compat layer tests (mirror of python/tests API patterns:
builder workflow, error surfaces, warm-start across solve() calls)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.compat import CDDP
from cddp_tpu.models import Pendulum


def _build(horizon=80, dt=0.02):
    solver = CDDP(jnp.array([jnp.pi, 0.0]), jnp.zeros(2), horizon, dt,
                  ct.CDDPOptions(max_iterations=200, tolerance=1e-4,
                                 acceptable_tolerance=1e-5))
    solver.set_dynamical_system(Pendulum(length=0.5, damping=0.01))
    solver.set_objective(
        ct.quadratic_objective(jnp.zeros((2, 2)), 0.1 * jnp.eye(1),
                               100.0 * jnp.eye(2), jnp.zeros(2), dt))
    solver.add_path_constraint(
        "ControlConstraint", ct.control_constraint([-20.0], [20.0]))
    return solver


def test_builder_workflow_and_timing():
    solver = _build()
    assert solver.get_state_dim() == 2 and solver.get_control_dim() == 1
    sol = solver.solve("IPDDP")
    assert sol.status_message in ("OptimalSolutionFound", "AcceptableSolutionFound")
    assert sol.solve_time_ms > 0.0
    err = float(jnp.linalg.norm(sol.state_trajectory[-1]))
    assert err < 0.3


def test_missing_system_raises():
    solver = CDDP(jnp.zeros(2), jnp.zeros(2), 10, 0.1)
    with pytest.raises(RuntimeError, match="Dynamical system"):
        solver.solve("CLDDP")
    solver.set_dynamical_system(Pendulum())
    with pytest.raises(RuntimeError, match="Objective"):
        solver.solve("CLDDP")


def test_warm_start_across_solves():
    solver = _build()
    cold = solver.solve("IPDDP")
    solver.set_options(solver.options.replace(warm_start=True))
    solver.set_initial_trajectory(cold.state_trajectory, cold.control_trajectory)
    warm = solver.solve("IPDDP")
    assert int(warm.iterations_completed) <= int(cold.iterations_completed) + 5


def test_checkpoint_roundtrip(tmp_path):
    from cddp_tpu.utils.checkpoint import load_state, save_state
    from cddp_tpu.solvers import ipddp

    solver = _build(horizon=40)
    prob = ct.problem(
        solver._system, solver._objective, solver.initial_state, 40, 0.02,
        constraints=solver._constraints,
    )
    sol, state = ipddp.solve(prob, solver.options, return_state=True)
    p = tmp_path / "ckpt"
    save_state(p, state)
    state2 = load_state(p, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


import jax  # noqa: E402


def test_pycddp_export_surface():
    """Every name pycddp exports (python/pycddp/__init__.py:12-75) resolves
    in cddp_tpu.compat with the same meaning."""
    import cddp_tpu.compat as compat

    names = [
        "SolverType", "BarrierStrategy", "CDDPOptions", "BoxQPOptions",
        "LineSearchOptions", "RegularizationOptions", "BarrierOptions",
        "FilterOptions", "InteriorPointOptions", "LogBarrierOptions",
        "IPDDPOptions", "MSIPDDPOptions", "CDDP", "CDDPSolution",
        "SolutionHistory", "DynamicalSystem", "Pendulum", "Unicycle",
        "Bicycle", "Car", "CartPole", "DubinsCar", "Forklift", "Acrobot",
        "Quadrotor", "QuadrotorRate", "Manipulator", "HCW",
        "SpacecraftLinearFuel", "SpacecraftNonlinear", "DreyfusRocket",
        "SpacecraftLanding2D", "SpacecraftTwobody", "LTISystem", "Usv3Dof",
        "EulerAttitude", "QuaternionAttitude", "MrpAttitude", "Objective",
        "QuadraticObjective", "NonlinearObjective", "Constraint",
        "ControlConstraint", "StateConstraint", "LinearConstraint",
        "BallConstraint", "PoleConstraint", "SecondOrderConeConstraint",
        "ThrustMagnitudeConstraint", "MaxThrustMagnitudeConstraint",
    ]
    missing = [n for n in names if not hasattr(compat, n)]
    assert not missing, missing
    # SolverType values are the registry strings CDDP.solve accepts
    assert compat.SolverType.CLDDP == "CLDDP"
    assert compat.SolverType.MSIPDDP == "MSIPDDP"
    o = compat.InteriorPointOptions()
    assert o.dual_var_init_scale == 1e-1 and o.slack_var_init_scale == 1e-2


def test_solver_name_aliases():
    """CLCDDP -> CLDDP, LOGDDP -> LogDDP (bind_solver.cpp:96-100;
    python/tests/test_solver_errors.py:26-64)."""
    from cddp_tpu.solvers import clddp, logddp, get_solver

    assert get_solver("CLCDDP") is clddp.solve
    assert get_solver("LOGDDP") is logddp.solve


def test_error_surfaces_match_reference():
    """python/tests/test_solver_errors.py parity: unknown solver, abstract
    bases, and initial-trajectory validation."""
    import pytest as _pytest

    import cddp_tpu as ct
    from cddp_tpu.compat import CDDP
    from cddp_tpu.models import Pendulum
    from cddp_tpu.models.base import DynamicalSystem
    from cddp_tpu.costs.objective import Objective

    s = CDDP(jnp.zeros(2), jnp.zeros(2), 6, 0.1)
    with _pytest.raises(ValueError, match="Unknown solver"):
        s.solve_by_name("NONEXISTENT")
    with _pytest.raises(TypeError, match="abstract base"):
        s.set_dynamical_system(DynamicalSystem())
    with _pytest.raises(TypeError, match="abstract base"):
        s.set_objective(Objective())
    with _pytest.raises(RuntimeError, match="must be set before"):
        s.set_initial_trajectory(jnp.zeros((7, 2)), jnp.zeros((6, 1)))
    s.set_dynamical_system(Pendulum())
    with _pytest.raises(ValueError, match="horizon\\+1"):
        s.set_initial_trajectory(jnp.zeros((5, 2)), jnp.zeros((6, 1)))
    with _pytest.raises(ValueError, match="horizon = 6"):
        s.set_initial_trajectory(jnp.zeros((7, 2)), jnp.zeros((5, 1)))
    with _pytest.raises(ValueError, match="dimension 2"):
        s.set_initial_trajectory(jnp.zeros((7, 3)), jnp.zeros((6, 1)))
    with _pytest.raises(ValueError, match="dimension 1"):
        s.set_initial_trajectory(jnp.zeros((7, 2)), jnp.zeros((6, 2)))
    s.set_initial_trajectory(jnp.zeros((7, 2)), jnp.zeros((6, 1)))
