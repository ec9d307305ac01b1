"""max_cpu_time contract (cddp_solver_base.cpp:77-90): a positive limit
aborts the iteration loop with MaxCpuTimeReached and returns the current
(partial) solution; the default 0.0 disables the check entirely."""

import jax.numpy as jnp
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Unicycle
from cddp_tpu.solvers import clddp, ipddp, logddp, msipddp


def _prob(dtype=jnp.float64):
    dt, N = 0.05, 40
    model = Unicycle()
    goal = jnp.array([2.0, 2.0, jnp.pi / 2], dtype)
    obj = ct.quadratic_objective(
        0.01 * jnp.eye(3, dtype=dtype),
        0.01 * jnp.eye(2, dtype=dtype),
        100.0 * jnp.eye(3, dtype=dtype),
        goal,
        dt,
    )
    prob = ct.problem(model, obj, jnp.zeros(3, dtype), N, dt)
    return prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-1.0, -jnp.pi]), jnp.array([1.0, jnp.pi])),
    )


@pytest.mark.parametrize(
    "solve",
    [clddp.solve, ipddp.solve,
     pytest.param(logddp.solve, marks=pytest.mark.slow),
     pytest.param(msipddp.solve, marks=pytest.mark.slow)],
    ids=["CLDDP", "IPDDP", "LogDDP", "MSIPDDP"],
)
def test_tiny_limit_aborts_with_max_cpu_time_status(solve):
    prob = _prob()
    # 1 microsecond: the first iteration's post-check must fire.
    opts = ct.CDDPOptions(max_iterations=200, tolerance=1e-12, max_cpu_time=1e-6)
    sol = solve(prob, opts)
    assert sol.status_message == "MaxCpuTimeReached"
    assert int(sol.iterations_completed) < 200
    # The partial solution is still a usable trajectory.
    assert bool(jnp.all(jnp.isfinite(sol.control_trajectory)))


def test_generous_limit_does_not_trigger():
    prob = _prob()
    opts = ct.CDDPOptions(max_iterations=30, max_cpu_time=600.0)
    sol = clddp.solve(prob, opts)
    assert sol.status_message != "MaxCpuTimeReached"
