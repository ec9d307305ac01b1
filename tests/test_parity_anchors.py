"""Reference baseline anchors (BASELINE.md table).

- Tassa car parking, IPDDP cold start, N=500, dt=0.03: final cost < 1.91 and
  final distance-to-goal < 0.5 (tests/cddp_core/test_ipddp_solver.cpp:803,883).
- Quadrotor figure-8 tracking, IPDDP with per-rotor force box [0,4]:
  position error < 0.5 and quaternion norm within 0.1 of 1
  (test_ipddp_solver.cpp:1069-1080).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.costs.objective import NonlinearObjective
from cddp_tpu.models import Car, quadrotor
from cddp_tpu.solvers import ipddp


def _sabs(x, p):
    """Smooth absolute value (pseudo-Huber), test_ipddp_solver.cpp:672-676."""
    return jnp.sqrt((x / p) ** 2 + 1.0) * p - p


def car_parking_objective(timestep: float) -> NonlinearObjective:
    """CarParkingObjective (test_ipddp_solver.cpp:628-668): smooth-abs Tassa
    parking cost with cu=[1e-2,1e-4], cx=1e-3*[1,1] (px=0.1), terminal
    cf=[.1,.1,1,.3] (pf=[.01,.01,.01,1]) plus the running term at u=0."""
    cu = jnp.array([1e-2, 1e-4])
    cx = jnp.array([1e-3, 1e-3])
    px = jnp.array([0.1, 0.1])
    cf = jnp.array([0.1, 0.1, 1.0, 0.3])
    pf = jnp.array([0.01, 0.01, 0.01, 1.0])

    def running(x, u, k):
        return cu @ (u * u) + cx @ _sabs(x[:2], px)

    def terminal(x):
        return cf @ _sabs(x, pf) + cx @ _sabs(x[:2], px)

    return NonlinearObjective(running_fn=running, terminal_fn=terminal)


@pytest.mark.slow
def test_car_parking_tassa():
    dt, N = 0.03, 500
    model = Car(wheelbase=2.0, timestep=dt)
    obj = car_parking_objective(dt)
    x0 = jnp.array([1.0, 1.0, 1.5 * jnp.pi, 0.0])
    prob = ct.problem(model, obj, x0, N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-0.5, -2.0]), jnp.array([0.5, 2.0])),
    )
    opts = ct.CDDPOptions(
        max_iterations=150,
        tolerance=1e-4,
        acceptable_tolerance=1e-6,
        regularization=ct.RegularizationOptions(initial_value=1e-2),
    )
    sol = ipddp.solve(prob, opts)
    cost = float(sol.final_objective)
    dist = float(jnp.linalg.norm(sol.state_trajectory[-1][:2]))
    assert sol.status_message in ("OptimalSolutionFound", "AcceptableSolutionFound"), (
        sol.status_message, cost,
    )
    assert cost < 1.91, cost  # BASELINE.md headline number
    assert dist < 0.5, dist


@pytest.mark.slow
def test_quadrotor_figure8():
    dt, N = 0.02, 150
    mass = 1.2
    inertia = jnp.diag(jnp.array([7.782e-3, 7.782e-3, 1.439e-2]))
    model = quadrotor(mass=mass, inertia=inertia, arm_length=0.165,
                      integration_type="rk4")

    nx, nu = 13, 4
    Q = jnp.zeros((nx, nx)).at[jnp.arange(7), jnp.arange(7)].set(1.0)
    R = 0.01 * jnp.eye(nu)
    Qf = jnp.zeros((nx, nx)).at[jnp.arange(7), jnp.arange(7)].set(1.0)

    scale, alt = 3.0, 2.0
    total_time = N * dt
    omega = 2.0 * jnp.pi / total_time
    ts = jnp.arange(N + 1) * dt
    refs = jnp.zeros((N + 1, nx))
    refs = refs.at[:, 0].set(scale * jnp.cos(omega * ts))
    refs = refs.at[:, 1].set(scale * jnp.sin(omega * ts) * jnp.cos(omega * ts))
    refs = refs.at[:, 2].set(alt)
    refs = refs.at[:, 3].set(1.0)
    goal = refs[-1]

    obj = ct.quadratic_objective(Q, R, Qf, goal, dt, reference_states=refs)
    x0 = refs[0]
    prob = ct.problem(model, obj, x0, N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.zeros(nu), jnp.full((nu,), 4.0)),
    )
    opts = ct.CDDPOptions(
        max_iterations=300,
        tolerance=1e-6,
        acceptable_tolerance=1e-5,
        regularization=ct.RegularizationOptions(initial_value=1e-4),
    )
    # Hover-thrust seed (test pattern, mass*g/4 per rotor)
    U0 = jnp.full((N, nu), mass * 9.81 / 4.0)
    sol = ipddp.solve(prob, opts, U0=U0)

    X = sol.state_trajectory
    pos_err = float(jnp.linalg.norm(X[-1, :3] - goal[:3]))
    assert pos_err < 0.5, (sol.status_message, pos_err)
    qnorms = jnp.linalg.norm(X[:, 3:7], axis=1)
    assert float(jnp.max(jnp.abs(qnorms - 1.0))) < 0.1
    # Tracking sanity along the loop (not a reference assertion; the 3s lap
    # at 3m scale is aggressive, so this is loose).
    track_err = float(jnp.mean(jnp.linalg.norm(X[:, :3] - refs[:, :3], axis=1)))
    assert track_err < 2.0, track_err
