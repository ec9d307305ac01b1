"""Differentiable-solve (IFT custom_vjp) tests — cddp_tpu.diff.

No reference counterpart (the C++ library cannot differentiate through a
solve); the oracle is central finite differences OF THE SOLVER itself:
perturb a problem parameter, re-solve to tight f64 tolerance, difference
the downstream loss. The IFT gradient must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.diff import make_differentiable_solve, total_cost
from cddp_tpu.models import Pendulum
from cddp_tpu.solvers import clddp

jax.config.update("jax_enable_x64", True)


_OPTS = ct.CDDPOptions(max_iterations=300, tolerance=1e-11, acceptable_tolerance=1e-11)


def _solve_consistent(prob, U0):
    """The FD oracle: the same solver call dsolve makes internally (X seeded
    with the dynamics-consistent rollout of U0 — the zero-fill reference seed
    stalls the line search on this problem; see diff.make_differentiable_solve)."""
    from cddp_tpu.models.base import rollout

    X0 = rollout(prob.model, prob.x0, U0, prob.timestep)
    return clddp.solve(prob, _OPTS, X0=X0, U0=U0)


def _problem(goal0=jnp.array([0.7, 0.0]), bound=None, N=30, dt=0.05):
    model = Pendulum(length=1.0, mass=1.0, damping=0.1)
    obj = ct.quadratic_objective(
        0.1 * jnp.eye(2), 0.05 * jnp.eye(1), 10.0 * jnp.eye(2), goal0, dt
    )
    prob = ct.problem(model, obj, jnp.array([2.0, 0.0]), N, dt)
    if bound is not None:
        prob = prob.add_constraint(
            "ControlConstraint",
            ct.control_constraint(jnp.array([-bound]), jnp.array([bound])),
        )
    return prob


def _fd_grad(f, x, h=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        e = np.zeros_like(x)
        e.flat[i] = h
        g.flat[i] = (float(f(jnp.asarray(x + e))) - float(f(jnp.asarray(x - e)))) / (
            2 * h
        )
    return g


def test_ift_gradient_wrt_goal_matches_fd_of_solver():
    prob0 = _problem()
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])
    dsolve = make_differentiable_solve("CLDDP", _OPTS)

    def loss(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X, U = dsolve(prob, U0)
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_ift = jax.grad(loss)(jnp.array([0.7, 0.0]))

    def loss_resolve(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        sol = _solve_consistent(prob, U0)
        X, U = sol.state_trajectory, sol.control_trajectory
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_fd = _fd_grad(loss_resolve, jnp.array([0.7, 0.0]))
    np.testing.assert_allclose(np.asarray(g_ift), g_fd, rtol=2e-4, atol=1e-7)


def test_ift_gradient_wrt_x0_matches_fd_of_solver():
    prob0 = _problem()
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    dsolve = make_differentiable_solve("CLDDP", _OPTS)

    def loss(x0):
        X, U = dsolve(prob0.replace(x0=x0), U0)
        return total_cost(prob0.replace(x0=x0), U)

    x0 = jnp.array([2.0, 0.0])
    g_ift = jax.grad(loss)(x0)

    def loss_resolve(x0):
        sol = _solve_consistent(prob0.replace(x0=x0), U0)
        return total_cost(prob0.replace(x0=x0), sol.control_trajectory)

    g_fd = _fd_grad(loss_resolve, x0)
    np.testing.assert_allclose(np.asarray(g_ift), g_fd, rtol=2e-4, atol=1e-7)


def test_ift_gradient_with_active_box_constraint():
    # Tight box: several controls saturate; gradients flow only through the
    # free set and must still match finite differences of the clamped solver.
    prob0 = _problem(bound=0.6)
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])
    dsolve = make_differentiable_solve("CLDDP", _OPTS)

    # confirm the box actually binds at the solution
    sol = _solve_consistent(prob0, U0)
    n_clamped = int(jnp.sum(jnp.abs(jnp.abs(sol.control_trajectory) - 0.6) < 1e-9))
    assert n_clamped > 0, "test needs an active box"

    def loss(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X, U = dsolve(prob, U0)
        return jnp.sum((X[-1] - target) ** 2)

    g_ift = jax.grad(loss)(jnp.array([0.7, 0.0]))

    def loss_resolve(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        s = _solve_consistent(prob, U0)
        return jnp.sum((s.state_trajectory[-1] - target) ** 2)

    g_fd = _fd_grad(loss_resolve, jnp.array([0.7, 0.0]))
    np.testing.assert_allclose(np.asarray(g_ift), g_fd, rtol=5e-4, atol=1e-6)


def test_ift_gradient_wrt_active_control_bound():
    """Gradient w.r.t. the box bound ITSELF where the bound is active: the
    clamped block's sensitivity dU*/d(bound) = 1 plus its cross-Hessian
    effect on the free coordinates must flow (a frozen-clamped-set IFT
    returns a silent zero here)."""
    N = 30
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])
    dsolve = make_differentiable_solve("CLDDP", _OPTS)

    def build(bound):
        prob = _problem()
        return prob.add_constraint(
            "ControlConstraint",
            ct.control_constraint(-bound[None], bound[None]),
        )

    b0 = jnp.asarray(0.6)
    sol = _solve_consistent(build(b0), U0)
    n_clamped = int(jnp.sum(jnp.abs(jnp.abs(sol.control_trajectory) - 0.6) < 1e-9))
    assert n_clamped > 0, "test needs an active box"

    def loss(bound):
        X, U = dsolve(build(bound), U0)
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_ift = jax.grad(loss)(b0)

    def loss_resolve(bound):
        s = _solve_consistent(build(jnp.reshape(bound, ())), U0)
        X, U = s.state_trajectory, s.control_trajectory
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_fd = _fd_grad(loss_resolve, b0[None], h=1e-6)[0]
    assert abs(g_fd) > 1e-6, "test needs a nonzero true bound sensitivity"
    np.testing.assert_allclose(float(g_ift), g_fd, rtol=5e-4, atol=1e-7)


def _ipddp_opts(tol=1e-10):
    return ct.CDDPOptions(
        max_iterations=400,
        tolerance=tol,
        acceptable_tolerance=tol,
    )


def test_barrier_ift_gradient_ipddp_box_matches_fd_of_solver():
    """IPDDP + control box: the log-barrier IFT at the converged mu must
    match central finite differences of the interior-point solver itself."""
    from cddp_tpu.solvers import ipddp

    prob0 = _problem(bound=0.6)
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])
    opts = _ipddp_opts()
    dsolve = make_differentiable_solve("IPDDP", opts)

    def loss(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X, U = dsolve(prob, U0)
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_ift = jax.grad(loss)(jnp.array([0.7, 0.0]))

    def loss_resolve(goal):
        from cddp_tpu.models.base import rollout

        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X0 = rollout(prob.model, prob.x0, U0, prob.timestep)
        sol = ipddp.solve(prob, opts, X0=X0, U0=U0)
        X, U = sol.state_trajectory, sol.control_trajectory
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_fd = _fd_grad(loss_resolve, jnp.array([0.7, 0.0]))
    np.testing.assert_allclose(np.asarray(g_ift), g_fd, rtol=1e-3, atol=1e-6)


def test_barrier_ift_gradient_wrt_constraint_parameter():
    """Gradients flow into constraint parameters: d loss / d box-halfwidth
    must match finite differences of the IPDDP solver (sensitivity of the
    solution to the bound itself — impossible in the reference)."""
    from cddp_tpu.models.base import rollout
    from cddp_tpu.solvers import ipddp

    N, dt = 30, 0.05
    opts = _ipddp_opts()
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])

    def prob_with_bound(b):
        p = _problem()
        return p.add_constraint(
            "ControlConstraint",
            ct.control_constraint(-b[None], b[None]),
        )

    dsolve = make_differentiable_solve("IPDDP", opts)

    def loss(b):
        X, U = dsolve(prob_with_bound(b), U0)
        return jnp.sum((X[-1] - target) ** 2)

    b0 = jnp.asarray(0.6)
    g_ift = jax.grad(loss)(b0)

    def loss_resolve(b):
        p = prob_with_bound(jnp.asarray(b).reshape(()))
        X0 = rollout(p.model, p.x0, U0, p.timestep)
        s = ipddp.solve(p, opts, X0=X0, U0=U0)
        return jnp.sum((s.state_trajectory[-1] - target) ** 2)

    g_fd = _fd_grad(lambda b: loss_resolve(b[0]), np.array([0.6]))[0]
    assert abs(float(g_ift)) > 1e-3, "bound must actually bind"
    np.testing.assert_allclose(float(g_ift), g_fd, rtol=2e-3, atol=1e-6)


def test_barrier_ift_gradient_msipddp_box_matches_fd_of_solver():
    """MSIPDDP + control box: at convergence the defects are ~0 (the iterate
    is dynamics-consistent) and the slack-eliminated KKT system is the same
    log-barrier stationarity as IPDDP's, so the barrier IFT applies; check
    against central finite differences of the MSIPDDP solver itself."""
    from cddp_tpu.models.base import rollout
    from cddp_tpu.solvers import msipddp

    prob0 = _problem(bound=0.6)
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])
    opts = _ipddp_opts()
    dsolve = make_differentiable_solve("MSIPDDP", opts)

    def loss(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X, U = dsolve(prob, U0)
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_ift = jax.grad(loss)(jnp.array([0.7, 0.0]))

    def loss_resolve(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X0 = rollout(prob.model, prob.x0, U0, prob.timestep)
        sol = msipddp.solve(prob, opts, X0=X0, U0=U0)
        X, U = sol.state_trajectory, sol.control_trajectory
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_fd = _fd_grad(loss_resolve, jnp.array([0.7, 0.0]))
    np.testing.assert_allclose(np.asarray(g_ift), g_fd, rtol=1e-3, atol=1e-6)


def test_relaxed_ift_gradient_logddp_box_matches_fd_of_solver():
    """LogDDP + control box: the IFT on the solver's own relaxed-barrier
    merit at the final barrier coefficient must match central finite
    differences of the LogDDP solver itself."""
    from cddp_tpu.models.base import rollout
    from cddp_tpu.solvers import logddp

    prob0 = _problem(bound=0.6)
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    target = jnp.array([0.5, -0.1])
    opts = ct.CDDPOptions(max_iterations=400, tolerance=1e-10, acceptable_tolerance=1e-10)
    dsolve = make_differentiable_solve("LogDDP", opts)

    def loss(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X, U = dsolve(prob, U0)
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_ift = jax.grad(loss)(jnp.array([0.7, 0.0]))

    def loss_resolve(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X0 = rollout(prob.model, prob.x0, U0, prob.timestep)
        sol = logddp.solve(prob, opts, X0=X0, U0=U0)
        X, U = sol.state_trajectory, sol.control_trajectory
        return jnp.sum((X[-1] - target) ** 2) + 0.01 * jnp.sum(U**2)

    g_fd = _fd_grad(loss_resolve, jnp.array([0.7, 0.0]))
    np.testing.assert_allclose(np.asarray(g_ift), g_fd, rtol=1e-3, atol=1e-6)


def test_ift_gradient_wrt_model_parameter():
    """System identification through control: d loss / d pendulum-length via
    the IFT must match finite differences of the solver (model parameters
    are pytree leaves, so they are differentiable like any other)."""
    prob0 = _problem()
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    dsolve = make_differentiable_solve("CLDDP", _OPTS)
    X_demo, _ = dsolve(prob0, U0)  # demo generated at length=1.0

    def loss(length):
        p = prob0.replace(model=prob0.model.replace(length=length))
        X, _ = dsolve(p, U0)
        return jnp.sum((X - X_demo) ** 2)

    g_ift = jax.grad(loss)(jnp.asarray(1.1))

    def loss_resolve(length):
        p = prob0.replace(model=prob0.model.replace(length=length.reshape(())))
        s = _solve_consistent(p, U0)
        return jnp.sum((s.state_trajectory - X_demo) ** 2)

    g_fd = _fd_grad(lambda v: loss_resolve(v[0]), np.array([1.1]))[0]
    assert abs(float(g_ift)) > 1e-3
    np.testing.assert_allclose(float(g_ift), g_fd, rtol=2e-4, atol=1e-7)


def test_dsolve_jits_and_vmaps():
    prob0 = _problem()
    N = prob0.horizon
    U0 = jnp.zeros((N, 1))
    dsolve = make_differentiable_solve("CLDDP", _OPTS)

    @jax.jit
    def loss(goal):
        prob = prob0.replace(objective=prob0.objective.replace(reference_state=goal))
        X, _ = dsolve(prob, U0)
        return jnp.sum(X[-1] ** 2)

    goals = jnp.stack([jnp.array([0.7, 0.0]), jnp.array([0.3, 0.0])])
    gs = jax.vmap(jax.grad(loss))(goals)
    assert gs.shape == (2, 2)
    assert bool(jnp.all(jnp.isfinite(gs)))
