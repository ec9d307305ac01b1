"""Fused CLDDP forward-rollout Pallas kernel vs the lax.scan reference
(interpreter mode on CPU; the real TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Car, CartPole, HCW, Pendulum, Unicycle
from cddp_tpu.models.base import rollout as open_loop_rollout
from cddp_tpu.ops.pallas.rollout import (
    forward_eligible,
    forward_rollout_fused,
)
from cddp_tpu.solvers import clddp


def _problem(model, nx, nu, x0, goal, lo, hi, N=20, dt=0.05):
    obj = ct.quadratic_objective(
        0.1 * jnp.eye(nx), 0.05 * jnp.eye(nu), 100.0 * jnp.eye(nx), goal, dt
    )
    prob = ct.problem(model, obj, x0, N, dt)
    return prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.asarray(lo), jnp.asarray(hi)),
    )


@pytest.mark.parametrize(
    "model,nx,nu,x0,goal,lo,hi",
    [
        (Unicycle(), 3, 2, jnp.zeros(3), jnp.array([2.0, 2.0, jnp.pi / 2]),
         [-2.0, -jnp.pi], [2.0, jnp.pi]),
        (Pendulum(length=0.5, damping=0.01, integration_type="rk4"), 2, 1,
         jnp.array([jnp.pi, 0.0]), jnp.zeros(2), [-10.0], [10.0]),
        (CartPole(), 4, 1, jnp.zeros(4),
         jnp.array([0.0, jnp.pi, 0.0, 0.0]), [-100.0], [100.0]),
        (Car(wheelbase=2.0, timestep=0.05), 4, 2,
         jnp.array([1.0, 1.0, 1.5, 0.0]), jnp.zeros(4),
         [-0.5, -2.0], [0.5, 2.0]),
        (HCW(mean_motion=0.00113, mass=100.0, integration_type="rk4"), 6, 3,
         jnp.array([0.0, 50.0, 5.0, 0.0, 0.0, 0.0]), jnp.zeros(6),
         [-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]),
    ],
    ids=["unicycle-euler", "pendulum-rk4", "cartpole-euler",
         "car-discrete", "hcw-rk4"],
)
def test_fused_forward_matches_scan(model, nx, nu, x0, goal, lo, hi):
    prob = _problem(model, nx, nu, x0, goal, lo, hi)
    cc = prob.get_constraint("ControlConstraint")
    assert forward_eligible(prob)

    B, N = 4, prob.horizon
    key = jax.random.PRNGKey(0)
    x0s = x0[None] + 0.1 * jax.random.normal(key, (B, nx))
    U0 = 0.2 * jax.random.normal(key, (B, N, nu))
    Xb = jax.vmap(lambda x, u: open_loop_rollout(prob.model, x, u,
                                                 prob.timestep))(x0s, U0)
    k = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, N, nu))
    K = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, N, nu, nx))
    alpha = jnp.asarray([1.0, 0.5, 0.25, 0.125])

    def ref_one(Xb_, Ub_, k_, K_, a, x0_):
        p = prob.replace(x0=x0_)
        cost = p.objective.evaluate(Xb_, Ub_)
        ok, J, Xn, Un = clddp._forward_pass(
            p, ct.CDDPOptions(backward_engine="scan"), Xb_, Ub_, k_, K_,
            jnp.zeros(2, Xb_.dtype), cost, a,
        )
        return J, Xn, Un

    Jr, Xr, Ur = jax.vmap(ref_one)(Xb, U0, k, K, alpha, x0s)
    Xf, Uf, Jf = forward_rollout_fused(prob, cc, Xb, U0, k, K, alpha,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ur), rtol=1e-9,
                               atol=1e-12)


def test_forward_engine_dispatch_identical_on_cpu():
    """On CPU the op falls back to the vmapped scan — full solves through
    the dispatch path must be bit-identical to backward_engine='scan'."""
    prob = _problem(Unicycle(), 3, 2, jnp.zeros(3),
                    jnp.array([2.0, 2.0, jnp.pi / 2]),
                    [-2.0, -jnp.pi], [2.0, jnp.pi])
    s1 = clddp.solve(prob, ct.CDDPOptions(max_iterations=30, tolerance=1e-6))
    s2 = clddp.solve(
        prob, ct.CDDPOptions(max_iterations=30, tolerance=1e-6,
                             backward_engine="scan")
    )
    np.testing.assert_array_equal(
        np.asarray(s1.control_trajectory), np.asarray(s2.control_trajectory)
    )


def test_ineligible_objective_keeps_scan():
    """NonlinearObjective problems must not dispatch to the fused forward."""
    from cddp_tpu.costs.objective import NonlinearObjective

    class Obj(NonlinearObjective):
        def running_cost(self, x, u, k):
            return jnp.sum(x ** 2) * 0.01 + jnp.sum(u ** 2) * 0.01

        def terminal_cost(self, x):
            return jnp.sum(x ** 2)

    prob = ct.problem(Unicycle(), Obj(), jnp.zeros(3), 10, 0.05)
    assert not forward_eligible(prob)
    sol = clddp.solve(prob, ct.CDDPOptions(max_iterations=5))
    assert np.isfinite(float(sol.final_objective))


def test_nondefault_gravity_reaches_lane_function():
    """Review regression: lane functions must consume the model's gravity
    field (it was once hardcoded at 9.81, silently desynchronizing the
    fused forward from the backward pass for e.g. lunar gravity)."""
    m = Pendulum(length=0.5, mass=1.0, damping=0.01, gravity=1.62)
    prob = _problem(m, 2, 1, jnp.array([jnp.pi, 0.0]), jnp.zeros(2),
                    [-10.0], [10.0], N=12)
    cc = prob.get_constraint("ControlConstraint")
    x0s = jnp.array([[jnp.pi, 0.0]])
    U0 = 0.3 * jnp.ones((1, 12, 1))
    from cddp_tpu.models.base import rollout as olr

    Xb = jax.vmap(lambda x, u: olr(prob.model, x, u, prob.timestep))(x0s, U0)
    Z = jnp.zeros
    Xf, Uf, Jf = forward_rollout_fused(
        prob, cc, Xb, U0, Z((1, 12, 1)), Z((1, 12, 1, 2)), jnp.ones((1,)),
        interpret=True,
    )
    # zero gains + alpha=1 -> open-loop: the kernel must reproduce the
    # MODEL's rollout (gravity=1.62), not the Earth-gravity one.
    np.testing.assert_allclose(np.asarray(Xf[0]), np.asarray(Xb[0]),
                               rtol=1e-9, atol=1e-12)


def test_subclass_keeps_reference_scan():
    """Review regression: a user subclass (even reusing the name) must NOT
    dispatch to the registry's lane dynamics."""
    class Pendulum(  # noqa: F811 — deliberate same-name subclass
        __import__("cddp_tpu.models", fromlist=["Pendulum"]).Pendulum
    ):
        def continuous_dynamics(self, x, u, t):
            return super().continuous_dynamics(x, u, t) * 2.0

    m = Pendulum(length=0.5, damping=0.01)
    prob = _problem(m, 2, 1, jnp.array([jnp.pi, 0.0]), jnp.zeros(2),
                    [-10.0], [10.0], N=10)
    assert not forward_eligible(prob)


def _tracking_problem_clddp(N=20, dt=0.05):
    ts = jnp.linspace(0.0, 1.0, N)
    refs = jnp.stack([jnp.sin(ts), 1.0 - jnp.cos(ts), ts], axis=1)
    obj = ct.quadratic_objective(
        0.5 * jnp.eye(3), 0.05 * jnp.eye(2), 100.0 * jnp.eye(3),
        refs[-1], dt, reference_states=refs,
    )
    prob = ct.problem(Unicycle(), obj, jnp.zeros(3), N, dt)
    return prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0])),
    )


def test_fused_forward_matches_scan_tracking():
    """reference_states trajectories ride the kernel's stage input: fused
    (interpret) == the solver's inline forward, per-step reference and
    terminal goal both honored."""
    prob = _tracking_problem_clddp()
    cc = prob.get_constraint("ControlConstraint")
    assert forward_eligible(prob)

    B, N, nx, nu = 4, prob.horizon, 3, 2
    key = jax.random.PRNGKey(5)
    x0s = 0.1 * jax.random.normal(key, (B, nx))
    U0 = 0.2 * jax.random.normal(key, (B, N, nu))
    Xb = jax.vmap(lambda x, u: open_loop_rollout(prob.model, x, u,
                                                 prob.timestep))(x0s, U0)
    k = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (B, N, nu))
    K = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (B, N, nu, nx))
    alpha = jnp.asarray([1.0, 0.5, 0.25, 0.125])

    def ref_one(Xb_, Ub_, k_, K_, a, x0_):
        p = prob.replace(x0=x0_)
        cost = p.objective.evaluate(Xb_, Ub_)
        ok, J, Xn, Un = clddp._forward_pass(
            p, ct.CDDPOptions(backward_engine="scan"), Xb_, Ub_, k_, K_,
            jnp.zeros(2, Xb_.dtype), cost, a,
        )
        return J, Xn, Un

    Jr, Xr, Ur = jax.vmap(ref_one)(Xb, U0, k, K, alpha, x0s)
    Xf, Uf, Jf = forward_rollout_fused(prob, cc, Xb, U0, k, K, alpha,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(Uf), np.asarray(Ur), rtol=1e-9,
                               atol=1e-12)


def test_clddp_tracking_dispatch_identical_on_cpu():
    """Full CLDDP solves on a tracking problem: the fused-dispatch path
    (now eligible for reference_states) must be bit-identical to
    backward_engine='scan' on CPU."""
    prob = _tracking_problem_clddp()
    s1 = clddp.solve(prob, ct.CDDPOptions(max_iterations=40, tolerance=1e-8))
    s2 = clddp.solve(
        prob, ct.CDDPOptions(max_iterations=40, tolerance=1e-8,
                             backward_engine="scan"))
    np.testing.assert_allclose(
        np.asarray(s1.state_trajectory), np.asarray(s2.state_trajectory),
        rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s1.control_trajectory), np.asarray(s2.control_trajectory),
        rtol=0, atol=1e-12)
    # the reference is actually tracked
    refs = np.asarray(prob.objective.reference_states)
    X = np.asarray(s1.state_trajectory)
    N = refs.shape[0]
    assert np.abs(X[1:N, :2] - refs[1:N, :2]).max() < 0.15


def test_tracking_accepts_n_plus_1_reference_rows():
    """Review regression: reference_states with N+1 rows (one per state,
    terminal row included — the layout quadratic_objective's last-row==goal
    check encourages) must not crash the newly tracking-eligible fused
    forward dispatch, and the auto/scan engines must agree. Only rows
    0..N-1 enter the running cost (the terminal row is Qf's job)."""
    N, dt = 20, 0.05
    ts = jnp.linspace(0.0, 1.0, N + 1)
    refs_full = jnp.stack([jnp.sin(ts), 1.0 - jnp.cos(ts), ts], axis=1)
    obj = ct.quadratic_objective(
        0.5 * jnp.eye(3), 0.05 * jnp.eye(2), 100.0 * jnp.eye(3),
        refs_full[-1], dt, reference_states=refs_full,
    )
    prob = ct.problem(Unicycle(), obj, jnp.zeros(3), N, dt).add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -2.0]),
                              jnp.array([2.0, 2.0])),
    )
    assert forward_eligible(prob)
    s1 = clddp.solve(prob, ct.CDDPOptions(max_iterations=25, tolerance=1e-8))
    s2 = clddp.solve(prob, ct.CDDPOptions(max_iterations=25, tolerance=1e-8,
                                          backward_engine="scan"))
    np.testing.assert_allclose(
        np.asarray(s1.state_trajectory), np.asarray(s2.state_trajectory),
        rtol=0, atol=1e-12)
    # IPDDP's fused forward gained the same stage-param eligibility; the
    # N+1 layout must run there too (auto == scan forward engine).
    si = ct.solve(prob, "IPDDP",
                  ct.CDDPOptions(max_iterations=12, tolerance=1e-6))
    ss = ct.solve(prob, "IPDDP",
                  ct.CDDPOptions(max_iterations=12, tolerance=1e-6,
                                 ipddp=ct.IPDDPOptions(
                                     forward_engine="scan")))
    np.testing.assert_allclose(
        np.asarray(si.state_trajectory), np.asarray(ss.state_trajectory),
        rtol=0, atol=1e-10)
