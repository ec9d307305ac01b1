"""Parallel (associative-scan) LQR backward vs the sequential scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu.ops.parallel_riccati import parallel_lqr_backward
from cddp_tpu.solvers.ipddp import _solve_sequential_lqr


@pytest.mark.parametrize("seed,N,n,m", [(0, 16, 3, 2), (1, 64, 4, 3), (2, 7, 2, 1)])
def test_parallel_matches_sequential(seed, N, n, m):
    rng = np.random.default_rng(seed)
    Q = np.stack([np.eye(n) * (0.5 + 0.1 * (i % 5)) for i in range(N + 1)])
    q = rng.normal(size=(N + 1, n))
    R = np.stack([np.eye(m) * (0.4 + 0.05 * (i % 3)) for i in range(N)])
    r = rng.normal(size=(N, m))
    M = rng.normal(size=(N, n, m)) * 0.02
    A = np.stack([np.eye(n) + 0.02 * rng.normal(size=(n, n)) for _ in range(N)])
    B = rng.normal(size=(N, n, m)) * 0.1

    args = [jnp.asarray(v) for v in (Q, q, R, r, M, A, B)]
    K_s, k_s, P_s, p_s, ok = jax.jit(_solve_sequential_lqr)(*args)
    assert bool(ok)
    K_p, k_p, S_p, v_p = jax.jit(parallel_lqr_backward)(*args)

    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s), rtol=1e-8, atol=1e-9)
    # Value function: S == P, v == -p
    np.testing.assert_allclose(np.asarray(S_p), np.asarray(P_s), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_p), -np.asarray(p_s), rtol=1e-8, atol=1e-9)


def test_ipddp_terminal_eq_parallel_backend():
    # Full IPDDP terminal-equality solve with the associative-scan LQR engine
    # matches the sequential engine's solution.
    import cddp_tpu as ct
    from cddp_tpu.models import Pendulum
    from cddp_tpu.solvers import ipddp

    # Same (shape, options) as tests/test_ipddp.py::test_terminal_equality so
    # the sequential-engine XLA program is shared via the persistent cache
    # (compile-time consolidation, VERDICT r3 #3).
    dt, N = 0.02, 100
    model = Pendulum(length=0.5, mass=1.0, damping=0.01)
    goal = jnp.zeros(2)
    obj = ct.quadratic_objective(jnp.zeros((2, 2)), 0.1 * jnp.eye(1),
                                 100.0 * jnp.eye(2), goal, dt)
    prob = ct.problem(model, obj, jnp.array([jnp.pi, 0.0]), N, dt)
    prob = prob.add_constraint("ControlConstraint",
                               ct.control_constraint([-20.0], [20.0]))
    prob = prob.add_terminal_constraint(
        "TerminalEqualityConstraint", ct.terminal_equality_constraint(goal))

    base_opts = dict(max_iterations=400, tolerance=1e-4, acceptable_tolerance=1e-5)
    sol_seq = ipddp.solve(prob, ct.CDDPOptions(**base_opts))
    sol_par = ipddp.solve(
        prob,
        ct.CDDPOptions(**base_opts, ipddp=ct.IPDDPOptions(lqr_backend="parallel")),
    )
    r_seq = float(jnp.linalg.norm(sol_seq.state_trajectory[-1] - goal))
    r_par = float(jnp.linalg.norm(sol_par.state_trajectory[-1] - goal))
    assert r_par < 1e-2, (sol_par.status_message, r_par)
    np.testing.assert_allclose(
        float(sol_par.final_objective), float(sol_seq.final_objective),
        rtol=1e-4,
    )


def test_ipddp_condensed_parallel_backend():
    """Path-constrained (condensed) IPDDP with lqr_backend='parallel': the
    backward outputs match the sequential scan at vanishing regularization
    (the two backends differ by O(reg) in the value propagation), and the
    full solve lands on the same solution."""
    import cddp_tpu as ct
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker
    from cddp_tpu.models import Unicycle
    from cddp_tpu.solvers import ipddp

    dt, N = 0.05, 50
    goal = jnp.array([1.5, 1.5, jnp.pi / 2])
    obj = ct.quadratic_objective(0.05 * jnp.eye(3), 0.05 * jnp.eye(2),
                                 200.0 * jnp.eye(3), goal, dt)
    prob = ct.problem(Unicycle(), obj, jnp.zeros(3), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-1.0, -jnp.pi]), jnp.array([1.0, jnp.pi])),
    )

    # Direct backward parity at tiny reg.
    stk, tstk = PathStacker(prob), TerminalStacker(prob)
    X = jnp.tile(prob.x0, (N + 1, 1))
    U = jnp.full((N, 2), 0.1)
    ks = jnp.arange(N)
    G = jax.vmap(stk.evaluate_shifted)(X[:-1], U, ks)
    S = jnp.maximum(-G, 1e-2)
    Y = jnp.full_like(S, 0.1)
    zt = jnp.zeros((tstk.ineq_dim,))
    mu, reg = jnp.asarray(0.1), jnp.asarray(1e-11)
    bp = {}
    for backend in ("sequential", "parallel"):
        opts = ct.CDDPOptions(ipddp=ct.IPDDPOptions(lqr_backend=backend))
        # jit: eager associative_scan is ~12s/call on CPU and uncacheable.
        bp[backend] = jax.jit(
            lambda *a, _o=opts: ipddp._backward_condensed(
                prob, _o, stk, tstk, *a
            )
        )(X, U, Y, S, G, zt, zt, mu, reg)
    for field in ("k_u", "K_u", "k_y", "K_y", "k_s", "K_s", "dV", "inf_du",
                  "inf_pr", "inf_comp", "step_norm"):
        np.testing.assert_allclose(
            np.asarray(getattr(bp["parallel"], field)),
            np.asarray(getattr(bp["sequential"], field)),
            rtol=1e-6, atol=1e-8, err_msg=field,
        )
    assert bool(bp["parallel"].ok)

    # Full-solve agreement at default options.
    base_opts = dict(max_iterations=150, tolerance=1e-5)
    sol_seq = ipddp.solve(prob, ct.CDDPOptions(**base_opts))
    sol_par = ipddp.solve(
        prob,
        ct.CDDPOptions(**base_opts, ipddp=ct.IPDDPOptions(lqr_backend="parallel")),
    )
    assert float(jnp.linalg.norm(sol_par.state_trajectory[-1] - goal)) < 1e-2
    np.testing.assert_allclose(
        float(sol_par.final_objective), float(sol_seq.final_objective), rtol=1e-4
    )


def test_parallel_lqr_with_drift():
    """Drift support (x+ = Ax + Bu + d — the multiple-shooting defect
    structure) vs a sequential Riccati-with-drift oracle."""
    import numpy as np
    from cddp_tpu.ops.parallel_riccati import parallel_lqr_backward

    key = jax.random.PRNGKey(7)
    N, n, m = 25, 3, 2
    ks = jax.random.split(key, 8)
    W = 0.3 * jax.random.normal(ks[0], (N + 1, n, n))
    Q = jnp.eye(n) * 0.5 + W @ W.swapaxes(-1, -2)
    q = jax.random.normal(ks[1], (N + 1, n))
    Wu = 0.3 * jax.random.normal(ks[2], (N, m, m))
    R = jnp.eye(m) + Wu @ Wu.swapaxes(-1, -2)
    r = jax.random.normal(ks[3], (N, m))
    M = 0.1 * jax.random.normal(ks[4], (N, n, m))
    A = jnp.eye(n) + 0.05 * jax.random.normal(ks[5], (N, n, n))
    B = 0.2 * jax.random.normal(ks[6], (N, n, m))
    d = 0.3 * jax.random.normal(ks[7], (N, n))

    # sequential oracle: V = 0.5 x'Px + p'x
    P = np.asarray(Q[N]); p = np.asarray(q[N])
    Ks = np.zeros((N, m, n)); ks_ = np.zeros((N, m))
    for t in range(N - 1, -1, -1):
        At, Bt, dt_ = np.asarray(A[t]), np.asarray(B[t]), np.asarray(d[t])
        Quu = np.asarray(R[t]) + Bt.T @ P @ Bt
        Qux = Bt.T @ P @ At + np.asarray(M[t]).T
        Qu = np.asarray(r[t]) + Bt.T @ (p + P @ dt_)
        Qx = np.asarray(q[t]) + At.T @ (p + P @ dt_)
        Kt = -np.linalg.solve(Quu, Qux)
        kt = -np.linalg.solve(Quu, Qu)
        Pn = np.asarray(Q[t]) + At.T @ P @ At + Qux.T @ Kt + Kt.T @ Qux + Kt.T @ Quu @ Kt
        p = Qx + Qux.T @ kt + Kt.T @ Qu + Kt.T @ Quu @ kt
        P = 0.5 * (Pn + Pn.T)
        Ks[t], ks_[t] = Kt, kt

    K, k, S, v = jax.jit(lambda *a: parallel_lqr_backward(*a, d=d))(Q, q, R, r, M, A, B)
    np.testing.assert_allclose(np.asarray(K), Ks, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k), ks_, rtol=1e-8, atol=1e-10)
