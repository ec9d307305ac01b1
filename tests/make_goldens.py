"""Generate golden-solution fixtures (f64, CPU) for regression tests.

BASELINE.md calls for golden trajectories; the C++ reference cannot be built
offline (FetchContent needs network), so these goldens freeze OUR validated
f64 solutions — any future refactor that shifts the numerics beyond 1e-9
relative will fail tests/test_goldens.py.

Run: JAX_PLATFORMS=cpu python tests/make_goldens.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pathlib import Path

import jax.numpy as jnp
import numpy as np

import cddp_tpu as ct
from cddp_tpu.models import Car, CartPole, LTISystem, Pendulum, Unicycle, quadrotor

OUT = Path(__file__).resolve().parent / "goldens"


def mpcc_tick_solution():
    """BASELINE config 5: one cold-seeded MPCC receding-horizon IPDDP tick
    (reference: examples/ipddp_mpcc_rc.py:629-661 run_ipddp_mpc inner body)
    on the synthetic track, f64, 15-iteration MPC budget like the fleet
    bench. Self-golden (the native oracle has no residual-objective cost)."""
    import dataclasses
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import mpcc_lib

    track = mpcc_lib.synthetic_track()
    cfg = dataclasses.replace(mpcc_lib.MpccConfig(), max_iterations=15,
                              matmul_precision="highest")
    x0 = jnp.asarray(mpcc_lib.initial_state(track, cfg), jnp.float64)
    _, sol = mpcc_lib.mpc_tick(track, cfg, x0)
    return sol


def configs():
    dt, N = 0.02, 100
    pend = ct.problem(
        Pendulum(length=0.5, damping=0.01),
        ct.quadratic_objective(jnp.zeros((2, 2)), 0.1 * jnp.eye(1),
                               100.0 * jnp.eye(2), jnp.zeros(2), dt),
        jnp.array([jnp.pi, 0.0]), N, dt,
    ).add_constraint("ControlConstraint", ct.control_constraint([-20.0], [20.0]))

    # BASELINE.json config 2: cart-pole swing-up, iLQR/CDDP, nx=4 nu=1, N=200.
    cp_goal = jnp.array([0.0, jnp.pi, 0.0, 0.0])
    cart = ct.problem(
        CartPole(),
        ct.quadratic_objective(jnp.diag(jnp.array([0.1, 1.0, 0.1, 0.1])),
                               0.05 * jnp.eye(1),
                               jnp.diag(jnp.array([100.0, 500.0, 10.0, 10.0])),
                               cp_goal, 0.02),
        jnp.zeros(4), 200, 0.02,
    ).add_constraint("ControlConstraint", ct.control_constraint([-100.0], [100.0]))

    # BASELINE.json config 4: quadrotor point-to-point IPDDP
    # (test_ipddp_solver.cpp:1069-1080 configuration family).
    qN, qdt = 60, 0.02
    q_goal = jnp.zeros(13).at[0].set(1.5).at[2].set(1.0).at[3].set(1.0)
    quad = ct.problem(
        quadrotor(mass=1.0, inertia=jnp.diag(jnp.array([0.01, 0.01, 0.02])),
                  arm_length=0.2, integration_type="rk4"),
        ct.quadratic_objective(
            jnp.zeros((13, 13)).at[4, 4].set(0.1).at[5, 5].set(0.1).at[6, 6].set(0.1),
            0.1 * jnp.eye(4),
            jnp.diag(jnp.array([500.0, 500.0, 500.0, 1.0, 1.0, 1.0, 1.0,
                                10.0, 10.0, 10.0, 0.0, 0.0, 0.0])),
            q_goal, qdt),
        jnp.zeros(13).at[3].set(1.0), qN, qdt,
    ).add_constraint(
        "ControlConstraint", ct.control_constraint(jnp.zeros(4), jnp.full(4, 9.0))
    )

    # Reference's terminal-equality regime (scalar integrator,
    # test_ipddp_solver.cpp:1256+): LTI x+ = x + u, terminal x_N = 0.6.
    lti_goal = jnp.array([0.6])
    lti = ct.problem(
        LTISystem(state_dim=1, control_dim=1, A=jnp.eye(1), B=jnp.eye(1), timestep=1.0),
        ct.quadratic_objective(jnp.zeros((1, 1)), 1e-2 * jnp.eye(1),
                               100.0 * jnp.eye(1), lti_goal, 1.0),
        jnp.zeros(1), 8, 1.0,
    ).add_terminal_constraint(
        "TerminalEqualityConstraint", ct.terminal_equality_constraint(lti_goal)
    )

    uni = ct.problem(
        Unicycle(),
        ct.quadratic_objective(jnp.zeros((3, 3)), 0.05 * jnp.eye(2),
                               100.0 * jnp.eye(3),
                               jnp.array([2.0, 2.0, jnp.pi / 2]), 0.03),
        jnp.zeros(3), 100, 0.03,
    ).add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -jnp.pi]), jnp.array([2.0, jnp.pi])),
    ).add_constraint("BallConstraint", ct.ball_constraint(0.4, jnp.array([1.0, 1.0])))

    # BASELINE config 4b: MSIPDDP car variant (test_msipddp_solver.cpp:365-470
    # geometry/options: start (1,1,1.5pi,0) facing backwards, park at the
    # origin, bounds [-0.5,-2]..[0.5,2], mu_initial=1, reg 1e-2, tol 1e-4/
    # acceptable 1e-6; quadratic parking cost instead of the smooth-abs
    # CarParkingObjective so the native C++ oracle can crosscheck it, and
    # N=300 (9 s) so the car actually reaches the origin (6 segments at
    # length 50).
    car_dt, car_N = 0.03, 300
    car = ct.problem(
        Car(wheelbase=2.0, timestep=car_dt),
        ct.quadratic_objective(
            jnp.diag(jnp.array([1e-2, 1e-2, 1e-3, 1e-3])), 1e-2 * jnp.eye(2),
            jnp.diag(jnp.array([100.0, 100.0, 50.0, 10.0])),
            jnp.zeros(4), car_dt),
        jnp.array([1.0, 1.0, 1.5 * jnp.pi, 0.0]), car_N, car_dt,
    ).add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-0.5, -2.0]), jnp.array([0.5, 2.0])),
    )

    opts_ipddp = ct.CDDPOptions(max_iterations=300, tolerance=1e-4,
                                acceptable_tolerance=1e-5)
    opts_clddp = ct.CDDPOptions(max_iterations=100, tolerance=1e-3,
                                acceptable_tolerance=1e-4)
    return {
        "pendulum_ipddp": (pend, "IPDDP", opts_ipddp, {}),
        "pendulum_clddp": (
            pend, "CLDDP", opts_clddp,
            {"X0": jnp.tile(pend.x0, (N + 1, 1))},
        ),
        "pendulum_logddp": (pend, "LogDDP", opts_ipddp, {}),
        "pendulum_msipddp": (pend, "MSIPDDP", opts_ipddp, {}),
        "unicycle_obstacle_ipddp": (
            uni, "IPDDP", opts_ipddp,
            {"U0": jnp.tile(jnp.array([0.5, 0.0]), (100, 1))},
        ),
        "cartpole_clddp": (
            cart, "CLDDP", ct.CDDPOptions(max_iterations=300, tolerance=1e-4,
                                          acceptable_tolerance=1e-6),
            {},
        ),
        "quadrotor_ipddp": (
            quad, "IPDDP",
            ct.CDDPOptions(max_iterations=120, tolerance=1e-4,
                           acceptable_tolerance=1e-5,
                           regularization=ct.RegularizationOptions(
                               initial_value=1e-4)),
            {"U0": jnp.full((qN, 4), 9.81 / 4.0)},
        ),
        "scalar_terminal_eq_ipddp": (
            lti, "IPDDP",
            ct.CDDPOptions(max_iterations=60, tolerance=1e-6,
                           acceptable_tolerance=1e-6,
                           ipddp=ct.IPDDPOptions(
                               barrier=ct.BarrierOptions(mu_initial=1e-1))),
            {},
        ),
        # Full-DDP (use_ilqr=False) regime: the Vx-weighted second-order
        # dynamics fold on the iterate path (no native crosscheck — the C++
        # oracle is iLQR-only like the reference's CLDDP; correctness of
        # the fold itself is FD-pinned in tests/test_full_ddp_oracle.py).
        "pendulum_ipddp_fullddp": (
            pend, "IPDDP",
            ct.CDDPOptions(max_iterations=300, tolerance=1e-4,
                           acceptable_tolerance=1e-5, use_ilqr=False),
            {},
        ),
        "car_msipddp": (
            car, "MSIPDDP",
            ct.CDDPOptions(
                max_iterations=150, tolerance=1e-4, acceptable_tolerance=1e-6,
                regularization=ct.RegularizationOptions(initial_value=1e-2),
                msipddp=ct.MSIPDDPOptions(
                    segment_length=50, rollout_type="nonlinear",
                    barrier=ct.BarrierOptions(mu_initial=1.0)),
            ),
            {},
        ),
        # BASELINE config 5 — generated by mpcc_tick_solution(), not a
        # (problem, solver) tuple.
        "mpcc_tick": mpcc_tick_solution,
    }


def main(only_missing=True):
    OUT.mkdir(exist_ok=True)
    for name, spec in configs().items():
        if only_missing and (OUT / f"{name}.npz").exists():
            continue
        if callable(spec):
            sol = spec()
        else:
            prob, solver, opts, kw = spec
            sol = ct.solve(prob, solver, opts, **kw)
        np.savez(
            OUT / f"{name}.npz",
            X=np.asarray(sol.state_trajectory),
            U=np.asarray(sol.control_trajectory),
            cost=np.asarray(sol.final_objective),
            iterations=np.asarray(sol.iterations_completed),
            status=np.asarray(sol.status_code),
        )
        print(f"{name}: {sol.status_message} cost={float(sol.final_objective):.12f}")


if __name__ == "__main__":
    main()
