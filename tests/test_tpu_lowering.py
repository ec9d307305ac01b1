"""Mosaic TPU lowering regressions for the per-pass Pallas kernels.

``jax.export.export(..., platforms=['tpu'])`` runs the full Pallas-to-Mosaic
lowering (and the MLIR verifier) with no TPU attached, so kernel
legalization bugs — f64 constants under x64, i64/i32 loop-index mixes,
unsupported primitives — surface in CI instead of on hardware. The
whole-solve kernel has its own suite in test_mega_clddp.py; this module
covers the streamed backward kernel, the CLDDP forward kernel, and the
IPDDP interior-point forward kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.models import Unicycle

B, N, NX, NU = 1024, 20, 3, 2
F32 = jnp.float32


def _unicycle_problem():
    obj = ct.quadratic_objective(
        np.eye(NX, dtype=np.float32) * 0.1,
        np.eye(NU, dtype=np.float32) * 0.05,
        np.eye(NX, dtype=np.float32) * 100.0,
        np.zeros(NX, np.float32), 0.05,
    )
    return ct.problem(
        Unicycle(), obj, np.zeros(NX, np.float32), N, 0.05,
        constraints={"ControlConstraint": ct.ControlConstraint(
            lower=np.full(NU, -2.0, np.float32),
            upper=np.full(NU, 2.0, np.float32))},
    )


@pytest.mark.slow
def test_export_clddp_backward_kernel():
    from cddp_tpu.ops.pallas.riccati import clddp_backward_fused

    def fn(A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT, reg):
        return clddp_backward_fused(
            A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT, reg
        )

    args = (
        jnp.zeros((B, N, NX, NX), F32), jnp.zeros((B, N, NX, NU), F32),
        jnp.zeros((B, N, NX), F32), jnp.zeros((B, N, NU), F32),
        jnp.zeros((B, N, NX, NX), F32), jnp.zeros((B, N, NU, NU), F32),
        jnp.zeros((B, N, NU, NX), F32), jnp.zeros((B, N, NU), F32),
        jnp.zeros((B, N, NU), F32), jnp.zeros((B, NX), F32),
        jnp.zeros((B, NX, NX), F32), jnp.zeros((B,), F32),
    )
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.slow
@pytest.mark.parametrize("tracking", [False, True])
def test_export_clddp_forward_kernel(tracking):
    from cddp_tpu.ops.pallas.rollout import forward_rollout_fused

    prob = _unicycle_problem()
    if tracking:
        refs = np.zeros((N, NX), np.float32)
        prob = prob.replace(
            objective=prob.objective.replace(
                reference_states=jnp.asarray(refs)
            )
        )
    cc = prob.get_constraint("ControlConstraint")

    def fn(Xb, Ub, k, K, alpha):
        return forward_rollout_fused(prob, cc, Xb, Ub, k, K, alpha)

    args = (
        jnp.zeros((B, N + 1, NX), F32), jnp.zeros((B, N, NU), F32),
        jnp.zeros((B, N, NU), F32), jnp.zeros((B, N, NU, NX), F32),
        jnp.ones((B,), F32),
    )
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.slow
def test_export_ipddp_forward_kernel():
    # The MPCC-shape interior-point rollout (7-state latch bicycle, control
    # box, Gauss-Newton track cost) through the Mosaic lowering. Built with
    # x64 OFF: production kernels only ever trace f32, and under x64 the
    # track fixture's closures materialize as f64 constants — an artifact
    # of this test environment (conftest enables x64 for CPU parity), not
    # of the production path.
    jax.config.update("jax_enable_x64", False)
    try:
        _run_ipddp_export()
    finally:
        jax.config.update("jax_enable_x64", True)


def _run_ipddp_export():
    from examples import mpcc_lib as mpcc
    from cddp_tpu.constraints.stack import PathStacker
    from cddp_tpu.ops.pallas import ip_rollout

    track = mpcc.synthetic_track(120)
    cfg = mpcc.MpccConfig(track_eval="local", local_coeffs=32)
    ref = track.interpolate(jnp.asarray(0.0))
    x = jnp.stack([ref["x"], ref["y"], ref["heading"], jnp.asarray(0.0),
                   jnp.asarray(1.0), jnp.asarray(0.0),
                   jnp.asarray(1.0)]).astype(jnp.float32)
    trk = mpcc.solve_track(track, cfg, x[mpcc.IDX_THETA])
    prob = mpcc.build_problem(trk, cfg, x)
    stk = PathStacker(prob)
    m_entry = ip_rollout.model_lane(prob.model)
    c_entry = ip_rollout.cost_lane(prob.objective)
    assert m_entry is not None and c_entry is not None
    _, _, model_f, model_discrete = m_entry
    _, cparams, _cstage, cost_f = c_entry

    Bq, nx, nu, m = 1024, 7, 3, 6
    n_cp = cparams.shape[0]
    z = lambda *s: jnp.zeros((Bq,) + s, F32)
    cc = stk.items[0][1]
    args = (
        z(N, nx), z(N, nu), z(N, m) + 0.1, z(N, m) + 0.1, z(N, nu),
        z(N, nu, nx), z(N, nx), z(N, nx, nx), z(N, nx), z(N, m),
        z(N, m, nx), z(N, m), z(N, m, nx),
        jnp.broadcast_to(jnp.asarray(x, F32), (Bq, nx)),
        jnp.full((Bq,), 0.5, F32), jnp.full((Bq,), 0.5, F32),
        jnp.full((Bq,), 0.9, F32), jnp.ones((Bq,), F32),
        jnp.full((Bq,), F32(cfg.dt)),
        jnp.broadcast_to(jnp.stack(
            [F32(cfg.wheelbase), F32(cfg.dt)]), (Bq, 2)),
        jnp.broadcast_to(jnp.asarray(cparams, F32)[None], (Bq, n_cp)),
        jnp.zeros((Bq, N, 1), F32),
        jnp.broadcast_to(jnp.asarray(cc.lower, F32)[None], (Bq, nu)),
        jnp.broadcast_to(jnp.asarray(cc.upper, F32)[None], (Bq, nu)),
        jnp.full((Bq, 1), F32(cc.scale_factor)),
    )
    model_key = type(prob.model)
    cost_key = (type(prob.objective),) + c_entry[0]
    ip_rollout._LANES_BY_KEY[(model_key, cost_key)] = dict(
        model_f=model_f, model_discrete=model_discrete,
        integrator=prob.model.integration_type, cost_f=cost_f,
    )

    def fn(*a):
        return ip_rollout._ip_forward_fused_impl(
            *a, model_key=model_key, cost_key=cost_key, slack_soc=False,
            box_layout=("control",), interpret=False,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0
