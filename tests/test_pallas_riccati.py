"""Fused Pallas backward pass vs the lax.scan reference implementation
(interpreter mode on CPU; the real TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Unicycle
from cddp_tpu.solvers import base, clddp
from cddp_tpu.ops.pallas.riccati import clddp_backward_fused


def _setup(B=3, N=8, dtype=jnp.float32):
    dt = 0.05
    model = Unicycle()
    goal = jnp.asarray([2.0, 2.0, 1.57], dtype)
    obj = ct.quadratic_objective(
        jnp.eye(3, dtype=dtype) * 0.1, jnp.eye(2, dtype=dtype) * 0.05,
        jnp.eye(3, dtype=dtype) * 100.0, goal, dt,
    )
    cc = ct.control_constraint(
        jnp.asarray([-2.0, -3.14], dtype), jnp.asarray([2.0, 3.14], dtype)
    )
    prob = ct.problem(model, obj, jnp.zeros(3, dtype), N, dt)
    prob = prob.add_constraint("ControlConstraint", cc)
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (B, N + 1, 3), dtype, -1.0, 2.0)
    U = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 2), dtype, -1.5, 1.5)
    return prob, cc, X, U


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float64, 1e-9, 1e-11),
    pytest.param(jnp.float32, 1e-3, 5e-4, marks=pytest.mark.slow),
])
def test_fused_matches_scan(dtype, rtol, atol):
    prob, cc, X, U = _setup(dtype=dtype)
    opts = ct.CDDPOptions(backward_engine="scan")
    reg = jnp.full((X.shape[0],), 1e-6, X.dtype)

    # Reference: vmapped scan implementation
    def ref_one(Xi, Ui, regi):
        bp = clddp._backward_pass(prob, opts, Xi, Ui, jnp.zeros_like(Ui), regi)
        return bp.k, bp.K, bp.dV, bp.inf_du, bp.ok

    k_r, K_r, dV_r, inf_r, ok_r = jax.jit(jax.vmap(ref_one))(X, U, reg)

    # Fused kernel inputs: precompute stagewise data per batch element
    def prep_one(Xi, Ui):
        A, Bm = base.discrete_jacobians(prob, Xi, Ui)
        lx, lu, lxx, luu, lux = base.running_cost_derivatives(prob, Xi, Ui)
        lb = cc.lower[None, :] - Ui
        ub = cc.upper[None, :] - Ui
        VxT = prob.objective.terminal_cost_gradient(Xi[-1])
        VxxT = prob.objective.terminal_cost_hessian(Xi[-1])
        return A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT

    args = jax.jit(jax.vmap(prep_one))(X, U)
    k_f, K_f, dV_f, qerr_f, nvx_f, ok_f = clddp_backward_fused(
        *args, reg, tile_b=1024, interpret=True
    )

    np.testing.assert_allclose(np.asarray(k_f), np.asarray(k_r), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(K_f), np.asarray(K_r), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(dV_f), np.asarray(dV_r), rtol=rtol, atol=atol)
    assert bool(jnp.all(ok_f == ok_r))
    # inf_du = Qu_err / scaling with scaling from norm_Vx (incl terminal term)
    VxT_l1 = jax.vmap(
        lambda Xi: jnp.sum(jnp.abs(prob.objective.terminal_cost_gradient(Xi[-1])))
    )(X)
    scaling = base.kkt_scaling(nvx_f + VxT_l1, prob.horizon, 3, opts)
    np.testing.assert_allclose(
        np.asarray(qerr_f / scaling), np.asarray(inf_r), rtol=max(rtol, 1e-5), atol=atol
    )

def test_backward_engine_dispatch_parity():
    """backward_engine="auto" (custom_vmap op) must match "scan" exactly —
    unbatched (primal impl) and under vmap (CPU fallback rule) — and the full
    vmapped solve must agree between engines."""
    prob, cc, X, U = _setup(dtype=jnp.float64)
    auto = ct.CDDPOptions()
    scan = auto.replace(backward_engine="scan")
    reg = jnp.full((X.shape[0],), 1e-6, X.dtype)

    def bp(opts, Xi, Ui, regi):
        r = clddp._backward_pass(prob, opts, Xi, Ui, jnp.zeros_like(Ui), regi)
        return r.k, r.K, r.dV, r.inf_du, r.ok

    # unbatched
    a1 = bp(auto, X[0], U[0], reg[0])
    s1 = bp(scan, X[0], U[0], reg[0])
    for x, y in zip(a1, s1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-12)

    # vmapped (exercises the custom batching rule's scan fallback on CPU)
    aB = jax.jit(jax.vmap(lambda Xi, Ui, ri: bp(auto, Xi, Ui, ri)))(X, U, reg)
    sB = jax.jit(jax.vmap(lambda Xi, Ui, ri: bp(scan, Xi, Ui, ri)))(X, U, reg)
    for x, y in zip(aB, sB):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-12)

    # end-to-end batched solve (backward retry while_loop + line search on top)
    x0s = jnp.stack([X[i, 0] for i in range(X.shape[0])])
    opts10 = auto.replace(max_iterations=10)
    from cddp_tpu.parallel.batch import batched_solve
    sol_a = batched_solve(prob, x0s, "CLDDP", opts10)
    sol_s = batched_solve(prob, x0s, "CLDDP", opts10.replace(backward_engine="scan"))
    np.testing.assert_allclose(
        np.asarray(sol_a.final_objective), np.asarray(sol_s.final_objective), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sol_a.control_trajectory),
        np.asarray(sol_s.control_trajectory), rtol=1e-8, atol=1e-10,
    )
