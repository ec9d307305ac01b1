"""Fused IPDDP forward rollout (ops/pallas/ip_rollout.py): lane-scan parity
with the library forward, kernel (interpret) parity with the lane scan, and
registry/eligibility gates. The semantics being fused are
ipddp_solver.cpp:1571-1876 (ipddp._forward_pass's scan)."""

import dataclasses
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import mpcc_lib as mpcc
from cddp_tpu.solvers import ipddp
from cddp_tpu.ops.pallas import ip_rollout


def _fleet(B, n_points=120, coeffs=32, iters=6):
    track = mpcc.synthetic_track(n_points)
    cfg = mpcc.MpccConfig(
        max_iterations=iters, track_eval="local", local_coeffs=coeffs
    )
    s0 = jnp.linspace(0.0, float(track.length) * 0.4, B)

    def place(si):
        ref = track.interpolate(si)
        return jnp.stack([ref["x"], ref["y"], ref["heading"], si,
                          jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0)])

    return track, cfg, jax.vmap(place)(s0).astype(jnp.float32)


def _tick(track, cfg, x, engine):
    trk = mpcc.solve_track(track, cfg, x[mpcc.IDX_THETA])
    prob = mpcc.build_problem(trk, cfg, x)
    U0 = mpcc.seed_controls(trk, cfg, x[mpcc.IDX_THETA])
    opts = mpcc.solver_options(cfg)
    opts = dataclasses.replace(
        opts, ipddp=dataclasses.replace(opts.ipddp, forward_engine=engine)
    )
    sol = ipddp.solve(prob, opts, U0=U0)
    return sol.state_trajectory, sol.control_trajectory, sol.final_objective


def test_lane_scan_matches_library_forward():
    """The op's unbatched primal (lane scan) must reproduce the library's
    inline forward scan through a full MPCC solve — identical accepted
    iterates."""
    track, cfg, xb = _fleet(2)
    Xa, Ua, Ja = jax.jit(jax.vmap(lambda x: _tick(track, cfg, x, "auto")))(xb)
    Xs, Us, Js = jax.jit(jax.vmap(lambda x: _tick(track, cfg, x, "scan")))(xb)
    np.testing.assert_allclose(np.asarray(Ua), np.asarray(Us), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Xa), np.asarray(Xs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ja), np.asarray(Js), rtol=1e-5)


def test_kernel_interpret_matches_lane_scan():
    """pallas_call (interpret) == vmapped lane scan on the op's own inputs,
    including slack SOC handling and acceptance masks."""
    B, N, nx, nu, m = 4, 12, 7, 3, 6
    track, cfg, xb = _fleet(B)
    x = xb[0]
    trk = mpcc.solve_track(track, cfg, x[mpcc.IDX_THETA])
    prob = mpcc.build_problem(trk, cfg, x)
    from cddp_tpu.constraints.stack import PathStacker

    stk = PathStacker(prob)
    m_entry = ip_rollout.model_lane(prob.model)
    c_entry = ip_rollout.cost_lane(prob.objective)
    assert m_entry is not None and c_entry is not None
    _, _, model_f, model_discrete = m_entry
    _, cparams, cost_f = c_entry

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 16)
    dt = jnp.float32(cfg.dt)
    n_cp = cparams.shape[0]

    def mk(k, *shape, scale=0.05):
        return jax.random.normal(k, (B,) + shape, jnp.float32) * scale

    Xb = mk(ks[0], N, nx, scale=0.3) + xb[:B, None, :]
    Ub = mk(ks[1], N, nu) + 1.0
    Y = jnp.abs(mk(ks[2], N, m)) + 0.1
    S = jnp.abs(mk(ks[3], N, m)) + 0.1
    ku = mk(ks[4], N, nu)
    Ku = mk(ks[5], N, nu, nx)
    klam = mk(ks[6], N, nx)
    Klam = mk(ks[7], N, nx, nx)
    lam = mk(ks[8], N, nx)
    ky = mk(ks[9], N, m)
    Ky = mk(ks[10], N, m, nx)
    ksl = mk(ks[11], N, m)
    Ksl = mk(ks[12], N, m, nx)
    x0 = xb[:B]
    a_pr = jnp.full((B,), 0.5, jnp.float32)
    a_du = jnp.full((B,), 0.25, jnp.float32)
    tau = jnp.full((B,), 0.9, jnp.float32)
    soc = jnp.ones((B,), jnp.float32)
    dtv = jnp.full((B,), dt, jnp.float32)
    mp = jnp.broadcast_to(
        jnp.stack([jnp.float32(cfg.wheelbase), jnp.float32(cfg.dt)]), (B, 2)
    )
    cc = stk.items[0][1]
    cp = jnp.broadcast_to(
        jnp.asarray(c_entry[1], jnp.float32)[None], (B, n_cp)
    )
    lo = jnp.broadcast_to(jnp.asarray(cc.lower, jnp.float32)[None], (B, nu))
    hi = jnp.broadcast_to(jnp.asarray(cc.upper, jnp.float32)[None], (B, nu))
    sf = jnp.full((B,), jnp.float32(cc.scale_factor))

    args = (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky, ksl, Ksl, x0,
            a_pr, a_du, tau, soc, dtv, mp, cp, lo, hi, sf)

    for slack_soc in (True, False):
        scan = jax.jit(jax.vmap(
            lambda *a: ip_rollout._scan_ip_forward_single(
                nx, nu, m, model_f, model_discrete,
                prob.model.integration_type, cost_f, slack_soc, *a)
        ))
        ref = scan(*args)

        model_key = type(prob.model)
        cost_key = (type(prob.objective),) + c_entry[0]
        ip_rollout._LANES_BY_KEY[(model_key, cost_key)] = dict(
            model_f=model_f, model_discrete=model_discrete,
            integrator=prob.model.integration_type, cost_f=cost_f,
        )
        out = jax.jit(lambda *a: ip_rollout._ip_forward_fused_impl(
            *a, model_key=model_key, cost_key=cost_key, slack_soc=slack_soc,
            interpret=True))(*args)

        x_last_r, J_r, F_r = ref[0], ref[1], ref[2]
        Xt_r, U_r, S_r, Y_r, G_r, L_r = ref[3:]
        x_last_k, J_k, F_k, Xt_k, U_k, S_k, Y_k, G_k, L_k = out
        # f32: dot-product vs unrolled-FMA associativity costs a few ulp.
        np.testing.assert_allclose(np.asarray(Xt_k), np.asarray(Xt_r),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(U_k), np.asarray(U_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S_k), np.asarray(S_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Y_k), np.asarray(Y_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(G_k), np.asarray(G_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(L_k), np.asarray(L_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(J_k), np.asarray(J_r),
                                   rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(F_k), np.asarray(F_r))


def test_eligibility_gates():
    """Fourier-track objectives, unregistered models and forward_engine=
    'scan' must all fall back to the reference scan."""
    track, cfg, xb = _fleet(1)
    x = xb[0]
    # Fourier track: cost factory declines.
    cfg_f = mpcc.MpccConfig(max_iterations=2, track_eval="fourier")
    prob_f = mpcc.build_problem(track, cfg_f, x)
    assert ip_rollout.cost_lane(prob_f.objective) is None
    from cddp_tpu.constraints.stack import PathStacker

    opts = mpcc.solver_options(cfg)
    assert not ip_rollout.ip_forward_eligible(
        prob_f, opts, PathStacker(prob_f))
    # LocalTrack problem IS eligible...
    trk = mpcc.solve_track(track, cfg, x[mpcc.IDX_THETA])
    prob_l = mpcc.build_problem(trk, cfg, x)
    assert ip_rollout.ip_forward_eligible(prob_l, opts, PathStacker(prob_l))
    # ...unless the engine is forced to "scan".
    opts_s = dataclasses.replace(
        opts, ipddp=dataclasses.replace(opts.ipddp, forward_engine="scan")
    )
    assert not ip_rollout.ip_forward_eligible(
        prob_l, opts_s, PathStacker(prob_l))
