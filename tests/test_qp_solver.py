"""SDQP QPSolver tests — cross-checked against BoxQP on random PD problems
(the reference's own validation pattern, tests/cddp_core/test_boxqp.cpp:46-123)."""

import jax.numpy as jnp
import numpy as np

from cddp_tpu.ops.boxqp import boxqp_solve_enum
from cddp_tpu.ops.qp_solver import QPSolver, QPSolverOptions, QPStatus


def test_unconstrained_like():
    # Single far-away constraint: solution = unconstrained minimizer.
    Q = np.diag([2.0, 4.0])
    c = np.array([-2.0, -8.0])
    A = np.array([[1.0, 0.0]])
    b = np.array([-100.0])  # x0 <= 100
    s = QPSolver()
    s.set_dimensions(2, 1)
    s.set_hessian(Q)
    s.set_gradient(c)
    s.set_constraints(A, b)
    r = s.solve()
    assert r.status == QPStatus.OPTIMAL
    np.testing.assert_allclose(r.x, [1.0, 2.0], atol=1e-8)


def test_active_constraint():
    # min ||x||^2 s.t. -x0 + 1 <= 0 (x0 >= 1) -> x = (1, 0)
    Q = 2 * np.eye(2)
    c = np.zeros(2)
    A = np.array([[-1.0, 0.0]])
    b = np.array([1.0])
    s = QPSolver()
    s.set_dimensions(2, 1)
    s.set_hessian(Q)
    s.set_gradient(c)
    s.set_constraints(A, b)
    r = s.solve()
    assert r.status == QPStatus.OPTIMAL
    np.testing.assert_allclose(r.x, [1.0, 0.0], atol=1e-8)
    assert np.isclose(r.objective_value, 1.0)


def test_cross_check_vs_boxqp():
    # Box constraints encoded as Ax + b <= 0; solutions must agree with the
    # interior-point-exact enum BoxQP.
    rng = np.random.default_rng(5)
    for n in (2, 3):
        for _ in range(5):
            Aa = rng.normal(size=(n, n))
            H = Aa @ Aa.T + n * np.eye(n)
            g = rng.normal(size=n)
            lo, hi = -0.5 * np.ones(n), 0.5 * np.ones(n)

            qp = QPSolver(QPSolverOptions(random_seed=42))
            qp.set_dimensions(n, 2 * n)
            qp.set_hessian(H)
            qp.set_gradient(g)
            A = np.vstack([np.eye(n), -np.eye(n)])  # x <= hi; -x <= -lo
            b = np.concatenate([-hi, lo])
            qp.set_constraints(A, b)
            r = qp.solve()
            assert r.status == QPStatus.OPTIMAL

            rb = boxqp_solve_enum(
                jnp.asarray(H), jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi)
            )
            np.testing.assert_allclose(r.x, np.asarray(rb.x), atol=1e-6)


def test_seeded_reproducibility():
    rng = np.random.default_rng(9)
    n, m = 3, 8
    Aa = rng.normal(size=(n, n))
    H = Aa @ Aa.T + n * np.eye(n)
    g = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m) - 2.0

    def run():
        s = QPSolver(QPSolverOptions(random_seed=42))
        s.set_dimensions(n, m)
        s.set_hessian(H)
        s.set_gradient(g)
        s.set_constraints(A, b)
        return s.solve()

    r1, r2 = run(), run()
    assert r1.status == r2.status
    if r1.status == QPStatus.OPTIMAL:
        np.testing.assert_array_equal(r1.x, r2.x)
