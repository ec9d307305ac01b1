"""Native model-registry extension (VERDICT r3 item 2): cartpole, quadrotor
(quaternion, 13-state), scalar LTI, and the RK4 integrator encoding, all
with complex-step Jacobians (cddp_host.cpp Model::jac_cstep — exact to
double rounding, no finite-difference cancellation).

The probe entry cddp_model_eval exposes two deliberately DIFFERENT halves:
  * the effective rate f (integrator-encoded: the solvers' rollout step is
    x + dt*f, which for RK4 models IS the RK4 step — the same
    effective-rate trick the car's Tassa discrete map already used), and
  * the CONTINUOUS-rate Jacobians Fx, Fu — because the reference
    linearizes the continuous dynamics with an Euler step no matter which
    integrator rolls the trajectory (cddp_solver_base.cpp:335-345:
    F_x = I + dt*Fx_cont), and solvers/base.py discrete_jacobians
    replicates that. Differentiating the exact RK4 map instead makes the
    oracle fork from the JAX iterate path (measured on the quadrotor
    golden: fork at iteration 1, different optimum).
Reference fidelity bar: the autodiff-vs-analytic Jacobian tests at
/root/reference/tests/dynamics_model/test_cartpole.cpp and
test_quadrotor.cpp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cddp_tpu.models import CartPole, Pendulum, Unicycle, quadrotor
from cddp_tpu.models.lti_system import LTISystem
from cddp_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def _quad(integration_type):
    return quadrotor(
        mass=1.0, inertia=jnp.diag(jnp.array([0.01, 0.01, 0.02])),
        arm_length=0.2, integration_type=integration_type,
    )


CASES = {
    "cartpole-euler": (
        lambda: CartPole(), 3, [1.0, 0.2, 0.5, 9.81, 0.0], 0.02, "euler"),
    "cartpole-rk4": (
        lambda: CartPole().replace(integration_type="rk4"), 3,
        [1.0, 0.2, 0.5, 9.81, 0.0], 0.02, "rk4"),
    "cartpole-damped": (
        lambda: CartPole(damping=0.05), 3, [1.0, 0.2, 0.5, 9.81, 0.05],
        0.02, "euler"),
    "quadrotor-euler": (
        lambda: _quad("euler"), 4, [1.0, 0.01, 0.01, 0.02, 0.2, 9.81],
        0.02, "euler"),
    "quadrotor-rk4": (
        lambda: _quad("rk4"), 4, [1.0, 0.01, 0.01, 0.02, 0.2, 9.81],
        0.02, "rk4"),
    "lti-scalar": (
        lambda: LTISystem(state_dim=1, control_dim=1, A=jnp.eye(1),
                          B=jnp.eye(1), timestep=1.0),
        5, [1.0, 1.0, 1.0], 1.0, "euler"),
    "unicycle-rk4": (
        lambda: Unicycle().replace(integration_type="rk4"), 0, None,
        0.05, "rk4"),
    "pendulum-rk4": (
        lambda: Pendulum(length=0.5, damping=0.01).replace(
            integration_type="rk4"),
        1, [0.5, 1.0, 0.01], 0.02, "rk4"),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_discrete_step_and_jacobians_match_autodiff(name):
    """x + dt*f == the JAX discrete step (integrator-encoded rollout rate);
    Fx / Fu == autodiff of model.continuous_dynamics (the Euler-linearization
    Jacobians every solver uses, solvers/base.py discrete_jacobians) — to
    ~1e-13 (complex step is exact; both sides are f64)."""
    make, mid, params, dt, integ = CASES[name]
    model = make()
    nx, nu = model.state_dim, model.control_dim
    rng = np.random.default_rng(hash(name) % 2**32)
    for trial in range(3):
        x = rng.normal(size=nx)
        u = rng.normal(size=nu)
        if mid == 4:  # keep the quaternion block away from the norm guard
            x[3:7] /= np.linalg.norm(x[3:7])
        xdot, Fx, Fu = native.model_eval(mid, params, dt, x, u,
                                         integrator=integ)
        step = lambda xx, uu: model.discrete_dynamics(xx, uu, 0.0, dt)
        rate = lambda xx, uu: model.continuous_dynamics(xx, uu, 0.0)
        want_next = np.asarray(step(jnp.asarray(x), jnp.asarray(u)))
        A = np.asarray(jax.jacobian(rate, 0)(jnp.asarray(x), jnp.asarray(u)))
        B = np.asarray(jax.jacobian(rate, 1)(jnp.asarray(x), jnp.asarray(u)))
        np.testing.assert_allclose(x + dt * xdot, want_next,
                                   rtol=1e-13, atol=1e-13)
        np.testing.assert_allclose(Fx, A, rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(Fu, B, rtol=1e-12, atol=1e-13)


def test_native_rejects_unknown_integrator_and_model():
    with pytest.raises(ValueError):
        native.model_eval(0, None, 0.05, np.zeros(3), np.zeros(2),
                          integrator="heun")
    with pytest.raises(ValueError):
        native.model_eval(9, None, 0.05, np.zeros(3), np.zeros(2))


def test_native_clddp_cartpole_matches_jax():
    """Full cross-language CLDDP solve on the cart-pole (new registry model,
    Euler): same optimum as cddp_tpu.solvers.clddp."""
    import cddp_tpu as ct
    from cddp_tpu.solvers import clddp

    dt, N = 0.02, 80
    goal = np.array([0.0, np.pi, 0.0, 0.0])
    Q = np.diag([0.1, 1.0, 0.1, 0.1])
    R = 0.05 * np.eye(1)
    Qf = np.diag([100.0, 500.0, 10.0, 10.0])
    lo, hi = np.array([-100.0]), np.array([100.0])
    x0 = np.zeros(4)

    status, Xn, Un, cost, inf_du, iters = native.clddp_solve(
        3, [1.0, 0.2, 0.5, 9.81, 0.0], N, dt, Q * dt, R * dt, Qf, goal, x0,
        lower=lo, upper=hi, max_iterations=150, tolerance=1e-4,
        acceptable_tolerance=1e-5,
    )

    obj = ct.quadratic_objective(jnp.asarray(Q), jnp.asarray(R),
                                 jnp.asarray(Qf), jnp.asarray(goal), dt)
    prob = ct.problem(CartPole(), obj, jnp.asarray(x0), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.asarray(lo), jnp.asarray(hi)),
    )
    sol = clddp.solve(prob, ct.CDDPOptions(
        max_iterations=150, tolerance=1e-4, acceptable_tolerance=1e-5))

    # Both engines walk the identical iterate path (this config does not
    # certify within 150 iterations on either side — the parity statement
    # is status+iteration+trajectory equality, not convergence).
    assert status == int(sol.status_code), (status, cost, iters)
    np.testing.assert_allclose(cost, float(sol.final_objective), rtol=1e-9)
    np.testing.assert_allclose(Un, np.asarray(sol.control_trajectory),
                               rtol=1e-5, atol=1e-6)
    assert iters == int(sol.iterations_completed)


def test_native_ipddp_quadrotor_rk4_matches_jax():
    """Full cross-language IPDDP solve on the 13-state quaternion quadrotor
    with RK4 (the BASELINE.md config-4 family) — the regime the round-3
    verdict flagged as uncheckable (native registry had no quadrotor)."""
    import cddp_tpu as ct
    from cddp_tpu.solvers import ipddp

    dt, N = 0.02, 40
    goal = np.zeros(13)
    goal[0], goal[2], goal[3] = 1.0, 0.8, 1.0
    Q = np.zeros((13, 13))
    Q[4, 4] = Q[5, 5] = Q[6, 6] = 0.1
    R = 0.1 * np.eye(4)
    Qf = np.diag([500.0, 500.0, 500.0, 1.0, 1.0, 1.0, 1.0,
                  10.0, 10.0, 10.0, 0.0, 0.0, 0.0])
    lo, hi = np.zeros(4), np.full(4, 9.0)
    x0 = np.zeros(13)
    x0[3] = 1.0
    U0 = np.full((N, 4), 9.81 / 4.0)

    status, Xn, Un, info = native.ipddp_solve(
        4, [1.0, 0.01, 0.01, 0.02, 0.2, 9.81], N, dt, Q * dt, R * dt, Qf,
        goal, x0, lower=lo, upper=hi, U0=U0, max_iterations=120,
        tolerance=1e-4, acceptable_tolerance=1e-5, reg_init=1e-4,
        integrator="rk4",
    )

    obj = ct.quadratic_objective(jnp.asarray(Q), jnp.asarray(R),
                                 jnp.asarray(Qf), jnp.asarray(goal), dt)
    prob = ct.problem(_quad("rk4"), obj, jnp.asarray(x0), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.asarray(lo), jnp.asarray(hi)),
    )
    sol = ipddp.solve(
        prob,
        ct.CDDPOptions(
            max_iterations=120, tolerance=1e-4, acceptable_tolerance=1e-5,
            regularization=ct.RegularizationOptions(initial_value=1e-4),
        ),
        U0=jnp.asarray(U0),
    )

    assert status in (1, 2), (status, info)
    assert sol.status_message in ("OptimalSolutionFound",
                                  "AcceptableSolutionFound")
    np.testing.assert_allclose(info["cost"], float(sol.final_objective),
                               rtol=1e-9)
    np.testing.assert_allclose(Un, np.asarray(sol.control_trajectory),
                               rtol=1e-5, atol=1e-6)
    assert info["iters"] == int(sol.iterations_completed)
