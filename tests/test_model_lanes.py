"""Full-zoo lane-function parity: every registered model's lane math vs the
generic ``discrete_dynamics`` scan (f64), and interpret-mode kernel checks
for the solve-based lanes (closed-form 2x2/3x3 inverses vs jnp.linalg.solve).

The lane registry (ops/pallas/rollout.py) is the TPU-kernel analogue of the
native engine's model registry; models.base.rollout dispatches through it,
so this is the correctness gate for every solver's init rollout on these
models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu.models import (
    REGISTRY as MODEL_REGISTRY,
    Acrobot,
    Bicycle,
    DreyfusRocket,
    DubinsCar,
    Forklift,
    Manipulator,
    QuadrotorRate,
    SpacecraftLanding2D,
    SpacecraftLinearFuel,
    SpacecraftNonlinear,
    SpacecraftTwobody,
    USV3DOF,
    base,
    euler_attitude,
    mrp_attitude,
    quaternion_attitude,
)
from cddp_tpu.ops.pallas import ip_rollout
from cddp_tpu.ops.pallas.rollout import lane_spec

# (factory, x0, control_scale, dt) per model; x0/scales keep short rollouts
# in each model's sane regime (orbital radii, normalized quaternions, ...).
CASES = {
    "bicycle": (lambda: Bicycle(wheelbase=1.4),
                [0.0, 0.0, 0.3, 1.0], 0.3, 0.05),
    "dubins": (lambda: DubinsCar(speed=1.2), [0.0, 0.0, 0.2], 0.4, 0.05),
    "forklift": (lambda: Forklift(), [0.0, 0.0, 0.1, 0.5, 0.05], 0.3, 0.05),
    "forklift-front": (lambda: Forklift(rear_steer=False),
                       [0.0, 0.0, 0.1, 0.5, 0.05], 0.3, 0.05),
    "dreyfus": (lambda: DreyfusRocket(), [0.0, 0.0], 0.4, 0.05),
    "acrobot": (lambda: Acrobot(), [0.1, -0.2, 0.05, 0.1], 0.5, 0.01),
    "quadrotor-rate": (lambda: QuadrotorRate(mass=0.8, gravity=9.81),
                       [0.0, 0.0, 1.0, 0.0, 0.0, 0.0,
                        0.995, 0.06, -0.05, 0.03], None, 0.02),
    "manipulator": (lambda: Manipulator(),
                    [0.1, 0.2, -0.1, 0.0, 0.0, 0.0], 1.0, 0.01),
    "usv3dof": (lambda: USV3DOF(), [0.0, 0.0, 0.1, 0.5, 0.1, 0.05],
                10.0, 0.05),
    "sc-linear-fuel": (lambda: SpacecraftLinearFuel(),
                       [100.0, 50.0, 20.0, 0.1, 0.0, 0.0, 100.0, 0.0],
                       0.5, 1.0),
    "sc-nonlinear": (lambda: SpacecraftNonlinear(),
                     [0.01, -0.02, 0.005, 0.0, 0.0, 0.0,
                      1.0, 0.0, 0.0, 1.0], 0.01, 0.01),
    "sc-landing2d": (lambda: SpacecraftLanding2D(),
                     [0.0, 10.0, 1000.0, -30.0, 0.05, 0.01],
                     [0.5, 0.02], 0.05),
    "sc-twobody": (lambda: SpacecraftTwobody(),
                   [7000.0, 0.0, 0.0, 0.0, 7.546, 0.0], 0.01, 1.0),
    "euler-attitude": (lambda: euler_attitude(),
                       [0.1, 0.2, -0.1, 0.05, -0.02, 0.03], 0.1, 0.02),
    "quaternion-attitude": (lambda: quaternion_attitude(),
                            [0.995, 0.06, -0.05, 0.03,
                             0.05, -0.02, 0.03], 0.1, 0.02),
    "mrp-attitude": (lambda: mrp_attitude(),
                     [0.05, -0.02, 0.08, 0.1, -0.05, 0.02], 0.1, 0.02),
}


def _controls(model, scale, N, key=0):
    nu = model.control_dim
    U = 0.5 * jax.random.normal(jax.random.PRNGKey(key), (N, nu))
    if isinstance(scale, list):
        return U * jnp.asarray(scale)
    if scale is None:  # quadrotor-rate: hover thrust + small rates
        return U.at[:, 0].set(8.0 + 0.5 * U[:, 0]) * jnp.array(
            [1.0, 0.2, 0.2, 0.2]
        )
    return U * scale


def _plain_rollout(model, x0, U, dt):
    ts = jnp.arange(U.shape[0], dtype=x0.dtype) * dt

    def step(x, inp):
        u, t = inp
        xn = model.discrete_dynamics(x, u, t, dt)
        return xn, xn

    _, Xt = jax.lax.scan(step, x0, (U, ts))
    return jnp.concatenate([x0[None], Xt], 0)


@pytest.mark.parametrize("name", sorted(CASES))
def test_lane_rollout_matches_generic_scan(name):
    """base.rollout (lane-scan dispatch) == discrete_dynamics scan. Bounds
    are relative per-step: closed-form adjugate inverses and sin/cos-ratio
    tangents differ from linalg.solve/tan only in final ulps."""
    factory, x0, scale, dt = CASES[name]
    model = factory()
    assert lane_spec(model) is not None, f"{name}: lane not registered"
    x0 = jnp.asarray(x0, jnp.float64)
    U = _controls(model, scale, N=12).astype(jnp.float64)
    X = np.asarray(base.rollout(model, x0, U, dt))
    ref = np.asarray(_plain_rollout(model, x0, U, dt))
    assert np.isfinite(ref).all(), f"{name}: reference rollout diverged"
    scale_ref = np.maximum(np.abs(ref).max(axis=0), 1e-9)
    np.testing.assert_allclose(X / scale_ref, ref / scale_ref,
                               rtol=0, atol=5e-12, err_msg=name)


def test_registry_covers_zoo_except_lti():
    """Every fixed-dimension zoo model has a lane; only the variable-shape
    LTISystem (and the CustomSystem escape hatch) keep the generic scan."""
    missing = []
    for regname, cls in MODEL_REGISTRY.items():
        try:
            mdl = cls()
        except TypeError:
            continue  # needs-args classes are covered via CASES factories
        if lane_spec(mdl) is None and regname != "LTISystem":
            missing.append(regname)
    assert missing == [], f"zoo models without a lane function: {missing}"


@pytest.mark.parametrize(
    "name", ["acrobot", "usv3dof", "manipulator", "quadrotor-rate",
             "mrp-attitude", "sc-twobody"]
)
def test_kernel_interpret_matches_lane_scan(name):
    """The open-loop Pallas kernel (interpret mode, f32) == the vmapped lane
    scan for the solve-based/transcendental lanes."""
    factory, x0, scale, dt = CASES[name]
    model = factory()
    entry = ip_rollout.model_lane(model)
    n_mp, mp_fn, model_f, disc = entry
    lane_key = (type(model), disc, model.integration_type)
    ip_rollout._OL_LANES_BY_KEY[lane_key] = dict(
        model_f=model_f, model_discrete=disc,
        integrator=model.integration_type,
    )
    B, N = 3, 7
    x0 = jnp.asarray(x0, jnp.float32)
    x0b = jnp.stack([x0 * (1.0 + 0.01 * i) for i in range(B)])
    Ub = jnp.stack(
        [_controls(model, scale, N, key=i).astype(jnp.float32)
         for i in range(B)]
    )
    dtv = jnp.full((B,), dt, jnp.float32)
    mp = jnp.broadcast_to(
        jnp.asarray(mp_fn(model), jnp.float32)[None], (B, max(n_mp, 1))
    )
    out_k = jax.jit(lambda *a: ip_rollout._ol_fused_impl(
        *a, lane_key=lane_key, interpret=True))(Ub, x0b, dtv, mp)
    out_s = jax.vmap(
        lambda u, x: ip_rollout._ol_scan_single(
            model.state_dim, model.control_dim, model_f, disc,
            model.integration_type, u, x, jnp.float32(dt), mp[0])
    )(Ub, x0b)
    scale_ref = np.maximum(np.abs(np.asarray(out_s)).max(), 1e-9)
    np.testing.assert_allclose(
        np.asarray(out_k) / scale_ref, np.asarray(out_s) / scale_ref,
        rtol=0, atol=1e-6, err_msg=name,
    )
