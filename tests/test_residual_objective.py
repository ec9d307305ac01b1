"""ResidualObjective (NONLINEAR_LS / Gauss-Newton) unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

import cddp_tpu as ct


class _Rosenbrockish(ct.ResidualObjective):
    """Nonlinear residuals with a known structure + a linear extra term."""

    def running_residuals(self, x, u, k):
        return jnp.stack([
            x[0] ** 2 - x[1],
            0.5 * jnp.sin(x[1]) + u[0],
            u[1] * x[0],
        ])

    def terminal_residuals(self, x):
        return 2.0 * (x - 1.0)

    def running_cost_extra(self, x, u, k):
        return 0.3 * x[1] + 0.1 * u[0]

    def terminal_cost_extra(self, x):
        return -0.7 * x[0]


def _setup():
    obj = _Rosenbrockish()
    x = jnp.asarray([0.4, -0.8])
    u = jnp.asarray([0.2, 1.1])
    return obj, x, u


def test_cost_composition():
    obj, x, u = _setup()
    r = obj.running_residuals(x, u, 0)
    np.testing.assert_allclose(
        float(obj.running_cost(x, u, 0)),
        float(jnp.sum(r * r) + 0.3 * x[1] + 0.1 * u[0]), rtol=1e-12,
    )


def test_gradients_exact():
    """GN gradients are EXACT (2 J^T r + grad extra), unlike the Hessian."""
    obj, x, u = _setup()
    lx, lu = obj.running_cost_gradients(x, u, 0)
    gx = jax.grad(lambda xx: obj.running_cost(xx, u, 0))(x)
    gu = jax.grad(lambda uu: obj.running_cost(x, uu, 0))(u)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(gx), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lu), np.asarray(gu), rtol=1e-12)
    tg = obj.terminal_cost_gradient(x)
    np.testing.assert_allclose(
        np.asarray(tg), np.asarray(jax.grad(obj.terminal_cost)(x)), rtol=1e-12
    )


def test_hessians_gauss_newton():
    """Hessians are 2 J^T J + hess(extra): PSD part + the dropped curvature
    term equals the full AD Hessian."""
    obj, x, u = _setup()
    lxx, luu, lux = obj.running_cost_hessians(x, u, 0)
    # PSD check of the GN part (extra is linear here, zero Hessian)
    evals = np.linalg.eigvalsh(np.asarray(lxx))
    assert (evals >= -1e-12).all()
    # Full AD Hessian = GN + sum_i r_i * hess(r_i); verify the identity.
    r = obj.running_residuals(x, u, 0)
    Hr = jax.jacfwd(jax.jacrev(lambda xx: obj.running_residuals(xx, u, 0)))(x)
    full = jax.hessian(lambda xx: obj.running_cost(xx, u, 0))(x)
    np.testing.assert_allclose(
        np.asarray(lxx + 2.0 * jnp.einsum("i,ijk->jk", r, Hr)),
        np.asarray(full), rtol=1e-9, atol=1e-12,
    )
    assert lux.shape == (2, 2)
    # terminal: residuals linear => GN Hessian is exact there
    np.testing.assert_allclose(
        np.asarray(obj.terminal_cost_hessian(x)),
        np.asarray(jax.hessian(obj.terminal_cost)(x)), rtol=1e-12,
    )


def test_solves_with_clddp():
    """End-to-end: a ResidualObjective drives a CLDDP solve (pendulum
    tracking written as residuals) and reaches the quadratic-objective
    optimum."""
    from cddp_tpu.models import Pendulum
    from cddp_tpu.solvers import clddp

    dt, N = 0.05, 60
    goal = jnp.asarray([jnp.pi, 0.0])

    class PendulumLS(ct.ResidualObjective):
        def running_residuals(self, x, u, k):
            return jnp.concatenate([
                jnp.sqrt(0.1 * dt) * (x - goal),
                jnp.sqrt(0.1 * dt) * u,
            ])

        def terminal_residuals(self, x):
            return jnp.sqrt(100.0) * (x - goal)

    prob_ls = ct.problem(Pendulum(), PendulumLS(), jnp.zeros(2), N, dt)
    obj_q = ct.quadratic_objective(
        0.1 * jnp.eye(2), 0.1 * jnp.eye(1), 100.0 * jnp.eye(2), goal, dt
    )
    prob_q = ct.problem(Pendulum(), obj_q, jnp.zeros(2), N, dt)
    opts = ct.CDDPOptions(max_iterations=100, tolerance=1e-6)
    sol_ls = clddp.solve(prob_ls, opts)
    sol_q = clddp.solve(prob_q, opts)
    # Same cost definition (sum of squares == quadratic form), same optimum.
    np.testing.assert_allclose(
        float(sol_ls.final_objective), float(sol_q.final_objective),
        rtol=1e-4,
    )
