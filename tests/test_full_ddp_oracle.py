"""Full-DDP (use_ilqr=False) second-order oracle tests (VERDICT r3 item 6).

The oracle never touches autodiff: every dynamics derivative comes from
utils/fd.py central differences on ``model.continuous_dynamics``, the cost
derivatives from the quadratic form transcribed by hand, and the Q-expansion
/ value recursions are re-written fresh in numpy from the reference
equations — IPDDP ipddp_solver.cpp:1380-1509 (Vx-weighted dynamics
Hessians), LogDDP logddp_solver.cpp:365-612 (Vx-weighted), MSIPDDP
msipddp_solver.cpp:1260-1420 (COSTATE-weighted + defect drift). The
solvers' backward passes must reproduce the oracle's feedforward/feedback
gains at every step. Mirrors the reference's second-order fidelity tests
(/root/reference/tests/test_hessian.cpp:86-248). CLDDP has no full-DDP
path — neither does the reference's (clddp_solver.cpp never reads F_xx_).

X, U are random (NOT dynamically consistent): the backward recursions are
pure functions of the trajectory, so random iterates exercise them more
broadly than an optimizer path would.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import cddp_tpu as ct
from cddp_tpu.constraints.stack import PathStacker, TerminalStacker
from cddp_tpu.models import Pendulum, Unicycle, CartPole
from cddp_tpu.solvers import base, ipddp, logddp, msipddp
from cddp_tpu.utils.fd import finite_difference_jacobian

F64 = jnp.float64


def _fd_dynamics_derivs(model, x, u, dt, h=1e-5):
    """(A, B, Fxx, Fuu, Fux) of the solver linearization, all from central
    differences on continuous_dynamics: A = I + dt*Fx, B = dt*Fu,
    second-order tensors dt-scaled (solvers/base.py discrete_jacobians /
    discrete_hessians semantics, cddp_solver_base.cpp:335-355)."""
    nx, nu = x.size, u.size

    def f(z):
        return np.asarray(
            model.continuous_dynamics(jnp.asarray(z[:nx]), jnp.asarray(z[nx:]), 0.0)
        )

    z0 = np.concatenate([x, u])
    J = finite_difference_jacobian(f, z0, h)  # (nx, nx+nu)
    A = np.eye(nx) + dt * J[:, :nx]
    B = dt * J[:, nx:]
    # Hessian tensors: FD Jacobian of the FD Jacobian, one row block per
    # output component. h a bit larger for the second difference.
    H = finite_difference_jacobian(
        lambda z: finite_difference_jacobian(f, z, h).ravel(), z0, 1e-4
    ).reshape(nx, nx + nu, nx + nu)
    Fxx = dt * H[:, :nx, :nx]
    Fuu = dt * H[:, nx:, nx:]
    Fux = dt * H[:, nx:, :nx]
    return A, B, Fxx, Fuu, Fux


def _cost_derivs(Qs, Rs, goal, x, u):
    """Quadratic running cost e'Qs e + u'Rs u (objective.cpp:30-124
    semantics, dt pre-scaled Qs/Rs)."""
    e = x - goal
    return (
        2.0 * Qs @ e,
        2.0 * Rs @ u,
        2.0 * Qs,
        2.0 * Rs,
        np.zeros((Rs.shape[0], Qs.shape[0])),
    )


def _rand_problem(model, nx, nu, N, dt, seed):
    rng = np.random.default_rng(seed)
    Qs = dt * np.diag(rng.uniform(0.1, 1.0, nx))
    Rs = dt * np.diag(rng.uniform(0.1, 1.0, nu))
    Qf = np.diag(rng.uniform(1.0, 10.0, nx))
    goal = rng.normal(size=nx)
    # Mild iterates: wild random trajectories make the full-DDP Quu (which
    # includes the indefinite Vx-weighted curvature) non-PD at small reg,
    # and the solvers then legitimately zero the gains (solve_and_check).
    X = 0.3 * rng.normal(size=(N + 1, nx))
    U = 0.3 * rng.normal(size=(N, nu))
    obj = ct.quadratic_objective(
        jnp.asarray(Qs / dt), jnp.asarray(Rs / dt), jnp.asarray(Qf),
        jnp.asarray(goal), dt,
    )
    prob = ct.problem(model, obj, jnp.asarray(X[0]), N, dt)
    return prob, Qs, Rs, Qf, goal, X, U


MODELS = {
    "pendulum": (lambda: Pendulum(length=0.5, mass=1.0, damping=0.01), 2, 1),
    "unicycle": (lambda: Unicycle(), 3, 2),
    "cartpole": (lambda: CartPole(), 4, 1),
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_discrete_hessians_match_fd(name):
    """base.discrete_hessians (the full-DDP second-order inputs for every
    solver) == dt-scaled FD Hessians of continuous_dynamics
    (test_hessian.cpp:86-248 fidelity bar)."""
    make, nx, nu = MODELS[name]
    model = make()
    dt = 0.05
    prob, *_ , X, U = _rand_problem(model, nx, nu, 3, dt, seed=11)
    Fxx, Fuu, Fux = base.discrete_hessians(prob, jnp.asarray(X), jnp.asarray(U))
    for t in range(3):
        _, _, fxx, fuu, fux = _fd_dynamics_derivs(model, X[t], U[t], dt)
        np.testing.assert_allclose(np.asarray(Fxx)[t], fxx, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Fuu)[t], fuu, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Fux)[t], fux, rtol=2e-4, atol=1e-6)


def _oracle_gains(model, Qs, Rs, Qf, goal, X, U, dt, reg, weight,
                  defects=None, Lambda=None):
    """Reverse full-DDP recursion in numpy with FD dynamics derivatives.

    weight="value": second-order dynamics terms weighted by Vx (IPDDP
    ipddp_solver.cpp:1397-1409 / LogDDP logddp_solver.cpp:505-515).
    weight="costate": weighted by the supplied costate Lambda[t], with the
    defect drift folded into Qx/Qu (MSIPDDP msipddp_solver.cpp:1260-1320).
    """
    N, nx = U.shape[0], X.shape[1]
    nu = U.shape[1]
    Vx = 2.0 * Qf @ (X[N] - goal)
    Vxx = 2.0 * Qf
    ks = np.zeros((N, nu))
    Ks = np.zeros((N, nu, nx))
    for t in reversed(range(N)):
        A, B, Fxx, Fuu, Fux = _fd_dynamics_derivs(model, X[t], U[t], dt)
        lx, lu, lxx, luu, lux = _cost_derivs(Qs, Rs, goal, X[t], U[t])
        if weight == "costate":
            d = defects[t]
            drift = Vx + Vxx @ d
            Qx = lx + A.T @ drift
            Qu = lu + B.T @ drift
            w = Lambda[t]
        else:
            Qx = lx + A.T @ Vx
            Qu = lu + B.T @ Vx
            w = Vx
        Qxx = lxx + A.T @ Vxx @ A + np.einsum("i,ijk->jk", w, Fxx)
        Qux = lux + B.T @ Vxx @ A + np.einsum("i,ijk->jk", w, Fux)
        Quu = luu + B.T @ Vxx @ B + np.einsum("i,ijk->jk", w, Fuu)
        Quu_reg = 0.5 * (Quu + Quu.T) + reg * np.eye(nu)
        kK = np.linalg.solve(Quu_reg, np.concatenate([Qu[:, None], Qux], 1))
        k = -kK[:, 0]
        K = -kK[:, 1:]
        ks[t], Ks[t] = k, K
        Vx = Qx + K.T @ Quu @ k + Qux.T @ k + K.T @ Qu
        Vxx = Qxx + K.T @ Quu @ K + Qux.T @ K + K.T @ Qux
        Vxx = 0.5 * (Vxx + Vxx.T)
    return ks, Ks


@pytest.mark.parametrize("name", ["pendulum", "unicycle"])
def test_ipddp_full_ddp_gains_match_fd_oracle(name):
    make, nx, nu = MODELS[name]
    model = make()
    dt, N, reg = 0.05, 4, 1.0
    prob, Qs, Rs, Qf, goal, X, U = _rand_problem(model, nx, nu, N, dt, seed=3)
    opts = ct.CDDPOptions(use_ilqr=False)
    stk, tstk = PathStacker(prob), TerminalStacker(prob)
    z = jnp.zeros((N, 0), F64)
    z0 = jnp.zeros((0,), F64)
    bp = ipddp._backward_condensed(
        prob, opts, stk, tstk, jnp.asarray(X), jnp.asarray(U), z, z, z, z0,
        z0, jnp.asarray(0.1, F64), jnp.asarray(reg, F64),
    )
    ks, Ks = _oracle_gains(model, Qs, Rs, Qf, goal, X, U, dt, reg, "value")
    assert bool(bp.ok)
    np.testing.assert_allclose(np.asarray(bp.k_u), ks, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bp.K_u), Ks, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["pendulum", "unicycle"])
def test_logddp_full_ddp_gains_match_fd_oracle(name):
    from cddp_tpu.constraints.barrier import RelaxedLogBarrier

    make, nx, nu = MODELS[name]
    model = make()
    dt, N, reg = 0.05, 4, 1.0
    prob, Qs, Rs, Qf, goal, X, U = _rand_problem(model, nx, nu, N, dt, seed=7)
    opts = ct.CDDPOptions(use_ilqr=False)
    barrier = RelaxedLogBarrier(barrier_coeff=1e-2, relaxation_delta=1e-1)
    bp = logddp._backward_pass(
        prob, opts, barrier, jnp.asarray(X), jnp.asarray(U),
        jnp.asarray(reg, F64),
    )
    ks, Ks = _oracle_gains(model, Qs, Rs, Qf, goal, X, U, dt, reg, "value")
    np.testing.assert_allclose(np.asarray(bp.k), ks, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bp.K), Ks, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["pendulum", "unicycle"])
def test_msipddp_full_ddp_gains_match_fd_oracle(name):
    """The costate-weighted variant: MSIPDDP folds lambda (not Vx) into the
    dynamics-Hessian contraction, plus the defect drift Vx + Vxx d
    (msipddp_solver.cpp:1260-1320). Nonzero defects and costates so both
    paths are actually exercised."""
    make, nx, nu = MODELS[name]
    model = make()
    dt, N, reg = 0.05, 4, 1.0
    prob, Qs, Rs, Qf, goal, X, U = _rand_problem(model, nx, nu, N, dt, seed=13)
    rng = np.random.default_rng(17)
    F = X[1:] + 0.01 * rng.normal(size=(N, nx))  # segment endpoints -> defects
    Lambda = rng.normal(size=(N, nx))
    opts = ct.CDDPOptions(use_ilqr=False)
    stk = PathStacker(prob)
    z = jnp.zeros((N, 0), F64)
    bp = msipddp._backward_pass(
        prob, opts, stk, jnp.asarray(X), jnp.asarray(U), z, z, z,
        jnp.asarray(F), jnp.asarray(Lambda), jnp.asarray(0.1, F64),
        jnp.asarray(reg, F64),
    )
    ks, Ks = _oracle_gains(
        model, Qs, Rs, Qf, goal, X, U, dt, reg, "costate",
        defects=F - X[1:], Lambda=Lambda,
    )
    np.testing.assert_allclose(np.asarray(bp.k_u), ks, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bp.K_u), Ks, rtol=1e-4, atol=1e-6)
