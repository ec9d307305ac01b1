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
    _, cparams, _cstage, cost_f = c_entry

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
    cps = jnp.zeros((B, N, 1), jnp.float32)
    lo = jnp.broadcast_to(jnp.asarray(cc.lower, jnp.float32)[None], (B, nu))
    hi = jnp.broadcast_to(jnp.asarray(cc.upper, jnp.float32)[None], (B, nu))
    sf = jnp.full((B, 1), jnp.float32(cc.scale_factor))

    args = (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky, ksl, Ksl, x0,
            a_pr, a_du, tau, soc, dtv, mp, cp, cps, lo, hi, sf)

    for slack_soc in (True, False):
        scan = jax.jit(jax.vmap(
            lambda *a: ip_rollout._scan_ip_forward_single(
                nx, nu, m, model_f, model_discrete,
                prob.model.integration_type, cost_f, slack_soc,
                ("control",), *a)
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
            box_layout=("control",), interpret=True))(*args)

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


class TestOpenLoopRollout:
    """models.base.rollout dispatches lane-registered models through
    open_loop_rollout_op: the unbatched path must stay bit-identical to the
    generic discrete_dynamics scan, AD must survive the custom_vmap op
    (diff.py vjp's the rollout at diff.py:288), and the interpret-mode
    kernel must match the lane scan."""

    def _plain(self, model, x0, U, dt):
        ts = jnp.arange(U.shape[0], dtype=x0.dtype) * dt

        def step(x, inp):
            u, t = inp
            xn = model.discrete_dynamics(x, u, t, dt)
            return xn, xn

        _, Xt = jax.lax.scan(step, x0, (U, ts))
        return jnp.concatenate([x0[None], Xt], 0)

    def test_unbatched_bit_identical(self):
        from cddp_tpu.models import base
        from cddp_tpu.models.pendulum import Pendulum
        from cddp_tpu.models.unicycle import Unicycle

        for model, x0 in (
            (Unicycle(integration_type="euler"), jnp.array([0.1, -0.2, 0.3])),
            (Pendulum(integration_type="rk4"), jnp.array([0.4, -0.1])),
        ):
            N, nu = 17, model.control_dim
            U = jnp.linspace(-0.5, 0.5, N * nu).reshape(N, nu)
            X = np.asarray(base.rollout(model, x0, U, 0.05))
            ref = np.asarray(self._plain(model, x0, U, 0.05))
            eps = np.finfo(X.dtype).eps
            np.testing.assert_allclose(X, ref, rtol=5 * eps, atol=5 * eps)

    def test_ad_through_rollout(self):
        """vjp AND jacfwd through the dispatched rollout, w.r.t. controls
        and model parameters, vs the plain scan."""
        from cddp_tpu.models import base
        from cddp_tpu.models.pendulum import Pendulum

        m = Pendulum(integration_type="rk4")
        N = 12
        U = jnp.linspace(-0.4, 0.4, N).reshape(N, 1)
        x0 = jnp.array([0.4, -0.1])
        dt = 0.03

        loss = lambda mm, u: (base.rollout(mm, x0, u, dt) ** 2).sum()
        loss_ref = lambda mm, u: (self._plain(mm, x0, u, dt) ** 2).sum()
        g = jax.grad(loss, argnums=(0, 1))(m, U)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(m, U)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-5)

        J = jax.jacfwd(lambda u: base.rollout(m, x0, u, dt))(U)
        J_ref = jax.jacfwd(lambda u: self._plain(m, x0, u, dt))(U)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                                   atol=1e-5)

    def test_vmapped_matches_per_item(self):
        from cddp_tpu.models import base
        from cddp_tpu.models.unicycle import Unicycle

        m = Unicycle(integration_type="euler")
        B, N = 5, 9
        key = jax.random.PRNGKey(0)
        Ub = jax.random.normal(key, (B, N, 2)) * 0.3
        x0b = jax.random.normal(jax.random.PRNGKey(1), (B, 3)) * 0.2
        Xb = jax.vmap(lambda u, x: base.rollout(m, x, u, 0.1))(Ub, x0b)
        for i in range(B):
            np.testing.assert_array_equal(
                np.asarray(Xb[i]),
                np.asarray(base.rollout(m, x0b[i], Ub[i], 0.1)),
            )

    def test_kernel_interpret_matches_scan(self):
        """_ol_fused_impl (interpret) == vmapped discrete_dynamics scan."""
        from cddp_tpu.models.pendulum import Pendulum

        m = Pendulum(integration_type="rk4")
        entry = ip_rollout.model_lane(m)
        n_mp, mp_fn, model_f, disc = entry
        lane_key = (type(m), disc, m.integration_type)
        ip_rollout._OL_LANES_BY_KEY[lane_key] = dict(
            model_f=model_f, model_discrete=disc,
            integrator=m.integration_type,
        )
        B, N = 4, 11
        dt = jnp.float32(0.03)
        Ub = (jax.random.normal(jax.random.PRNGKey(2), (B, N, 1)) * 0.5
              ).astype(jnp.float32)
        x0b = (jax.random.normal(jax.random.PRNGKey(3), (B, 2)) * 0.3
               ).astype(jnp.float32)
        dtv = jnp.full((B,), dt, jnp.float32)
        mp = jnp.broadcast_to(
            jnp.asarray(mp_fn(m), jnp.float32)[None], (B, n_mp)
        )
        out_k = jax.jit(lambda *a: ip_rollout._ol_fused_impl(
            *a, lane_key=lane_key, interpret=True))(Ub, x0b, dtv, mp)
        out_s = jax.vmap(
            lambda u, x: self._plain(m, x, u, dt)[1:])(Ub, x0b)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_s),
                                   atol=1e-6)

    def test_two_integrators_same_class(self):
        """Regression: the op/impl caches key on the integrator, so euler and
        rk4 instances of one class must not collide."""
        from cddp_tpu.models import base
        from cddp_tpu.models.pendulum import Pendulum

        N = 8
        U = jnp.linspace(-0.3, 0.3, N).reshape(N, 1)
        x0 = jnp.array([0.2, 0.0])
        for integ in ("euler", "rk4", "euler"):
            m = Pendulum(integration_type=integ)
            # allclose, not array_equal: lane-math association differs from
            # the generic integrator by ~1 ulp in f64; an integrator cache
            # collision (euler result served for rk4) is a ~1e-3 error.
            np.testing.assert_allclose(
                np.asarray(base.rollout(m, x0, U, 0.04)),
                np.asarray(self._plain(m, x0, U, 0.04)),
                rtol=1e-9, atol=1e-12,
            )


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


def test_nested_vmap_folds_total_batch():
    """Nested vmaps (alpha ladder inside, fleet outside) must fold into ONE
    total batch before the kernel/scan decision: the old single-level gate
    saw only the innermost ~11-entry ladder and silently lost the kernel for
    whole fleets under enable_parallel=True. On CPU the engine is still the
    scan, but the dispatch log must report the folded product, and the
    folded outputs must match per-instance scans exactly."""
    import logging

    from cddp_tpu.models.unicycle import Unicycle
    from cddp_tpu.ops.pallas.ip_rollout import open_loop_rollout_op

    model = Unicycle()
    a, b, N = 3, 4, 7
    key = jax.random.PRNGKey(0)
    U = 0.3 * jax.random.normal(key, (a, b, N, 2), jnp.float32)
    x0 = jnp.zeros((a, b, 3), jnp.float32)

    fn = lambda u, x: open_loop_rollout_op(model, x, u, 0.05)

    logger = logging.getLogger("cddp_tpu.dispatch")
    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _Catch(level=logging.INFO)
    old_level = logger.level
    logger.setLevel(logging.INFO)
    logger.addHandler(h)
    try:
        out = jax.jit(jax.vmap(jax.vmap(fn)))(U, x0)
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)

    ol_msgs = [m for m in records if "open-loop rollout" in m]
    assert ol_msgs, "dispatch decision not logged"
    assert any(f"batch={a * b}" in m for m in ol_msgs), ol_msgs

    for i in range(a):
        for j in range(b):
            ref = fn(U[i, j], x0[i, j])
            np.testing.assert_allclose(
                np.asarray(out[i, j]), np.asarray(ref), rtol=0, atol=0
            )


def _unicycle_box_problem(state_box_name="StateConstraint", dtype=jnp.float64):
    import cddp_tpu as ct
    from cddp_tpu.models import Unicycle

    model = Unicycle()
    dt, N = 0.05, 24
    goal = jnp.array([1.2, 1.0, jnp.pi / 4], dtype)
    obj = ct.quadratic_objective(
        0.05 * jnp.eye(3, dtype=dtype), 0.1 * jnp.eye(2, dtype=dtype),
        60.0 * jnp.eye(3, dtype=dtype), goal, dt,
    )
    prob = ct.problem(model, obj, jnp.zeros(3, dtype), N, dt)
    prob = prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-1.2, -1.5], dtype),
                              jnp.array([1.2, 1.5], dtype)),
    )
    from cddp_tpu.constraints.path import state_constraint

    prob = prob.add_constraint(
        state_box_name,
        state_constraint(jnp.array([-0.2, -0.2, -2.0], dtype),
                         jnp.array([1.05, 1.05, 2.0], dtype)),
    )
    return prob


def test_state_box_stack_is_eligible_and_ordered():
    """Control+state box stacks take the fused path; the box layout follows
    the stack's name-sorted order; non-box constraints still decline."""
    import cddp_tpu as ct
    from cddp_tpu.constraints.stack import PathStacker
    from cddp_tpu.options import CDDPOptions

    opts = CDDPOptions()
    prob = _unicycle_box_problem()
    stk = PathStacker(prob)
    assert ip_rollout.ip_forward_eligible(prob, opts, stk)
    boxes = ip_rollout._box_stack(stk)
    assert tuple(k for k, _ in boxes) == ("control", "state")

    # name-sorted: "AStateBox" < "ControlConstraint" puts the state box first
    prob2 = _unicycle_box_problem(state_box_name="AStateBox")
    boxes2 = ip_rollout._box_stack(PathStacker(prob2))
    assert tuple(k for k, _ in boxes2) == ("state", "control")

    prob3 = prob.add_constraint(
        "BallConstraint",
        ct.ball_constraint(0.3, jnp.array([0.5, 0.5])),
    )
    assert not ip_rollout.ip_forward_eligible(prob3, opts, PathStacker(prob3))


@pytest.mark.parametrize("state_box_name", ["StateConstraint", "AStateBox"])
def test_ipddp_state_box_fused_scan_matches_inline(state_box_name):
    """End-to-end IPDDP on a control+state box problem: the fused-path
    reference scan (forward_engine='auto', unbatched -> op scan) must
    reproduce the solver's inline forward scan (forward_engine='scan')
    exactly in f64 — including with the state box FIRST in stack order."""
    import dataclasses

    import cddp_tpu as ct
    from cddp_tpu.solvers import ipddp

    prob = _unicycle_box_problem(state_box_name=state_box_name)
    opts = ct.CDDPOptions(max_iterations=60, tolerance=1e-8,
                          acceptable_tolerance=1e-8)
    sol_auto = ipddp.solve(prob, opts)
    opts_scan = dataclasses.replace(
        opts, ipddp=dataclasses.replace(opts.ipddp, forward_engine="scan")
    )
    sol_scan = ipddp.solve(prob, opts_scan)
    np.testing.assert_allclose(
        np.asarray(sol_auto.state_trajectory),
        np.asarray(sol_scan.state_trajectory), rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sol_auto.control_trajectory),
        np.asarray(sol_scan.control_trajectory), rtol=0, atol=1e-12,
    )
    assert sol_auto.status_message == sol_scan.status_message
    # the state box must actually bind on this problem, and be respected
    # over the path stages (path constraints run over t=0..N-1 at pre-step
    # states — x_N is outside their scope, as in the reference).
    X = np.asarray(sol_auto.state_trajectory)
    assert X[:-1, :2].max() <= 1.05 + 1e-4
    assert X[:-1, :2].max() >= 1.0  # pushes into the constraint


def test_kernel_interpret_matches_scan_mixed_box_stack():
    """pallas_call (interpret) == scan for a ("state", "control") two-box
    stack on a builtin-lane model (unicycle + quadratic cost)."""
    import cddp_tpu as ct
    from cddp_tpu.constraints.stack import PathStacker

    prob = _unicycle_box_problem(state_box_name="AStateBox",
                                 dtype=jnp.float32)
    stk = PathStacker(prob)
    boxes = ip_rollout._box_stack(stk)
    box_layout = tuple(k for k, _ in boxes)
    assert box_layout == ("state", "control")
    m_entry = ip_rollout.model_lane(prob.model)
    c_entry = ip_rollout.cost_lane(prob.objective)
    assert m_entry is not None and c_entry is not None
    _, mp_fn, model_f, model_discrete = m_entry
    _, cparams, _cstage, cost_f = c_entry

    B, N, nx, nu = 4, 10, 3, 2
    m = stk.total_dim
    assert m == 10
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 16)

    def mk(k, *shape, scale=0.05):
        return jax.random.normal(k, (B,) + shape, jnp.float32) * scale

    Xb = mk(ks[0], N, nx, scale=0.3)
    Ub = mk(ks[1], N, nu) + 0.4
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
    x0 = mk(ks[13], nx, scale=0.1)
    a_pr = jnp.full((B,), 0.5, jnp.float32)
    a_du = jnp.full((B,), 0.25, jnp.float32)
    tau = jnp.full((B,), 0.9, jnp.float32)
    soc = jnp.ones((B,), jnp.float32)
    dtv = jnp.full((B,), jnp.float32(prob.timestep))
    mp_row = jnp.asarray(mp_fn(prob.model), jnp.float32).reshape(-1)
    if mp_row.shape[0] == 0:
        mp_row = jnp.zeros((1,), jnp.float32)
    mp = jnp.broadcast_to(mp_row[None], (B, mp_row.shape[0]))
    cp = jnp.broadcast_to(
        jnp.asarray(cparams, jnp.float32)[None], (B, cparams.shape[0])
    )
    cps = jnp.zeros((B, N, 1), jnp.float32)
    lo = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(c.lower, jnp.float32).reshape(-1)
                         for _, c in boxes])[None], (B, nx + nu))
    hi = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(c.upper, jnp.float32).reshape(-1)
                         for _, c in boxes])[None], (B, nx + nu))
    sf = jnp.broadcast_to(
        jnp.stack([jnp.float32(c.scale_factor) for _, c in boxes])[None],
        (B, 2))

    args = (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky, ksl, Ksl, x0,
            a_pr, a_du, tau, soc, dtv, mp, cp, cps, lo, hi, sf)

    scan = jax.jit(jax.vmap(
        lambda *a: ip_rollout._scan_ip_forward_single(
            nx, nu, m, model_f, model_discrete,
            prob.model.integration_type, cost_f, True, box_layout, *a)
    ))
    ref = scan(*args)

    model_key = type(prob.model)
    cost_key = (type(prob.objective),) + c_entry[0]
    ip_rollout._LANES_BY_KEY[(model_key, cost_key)] = dict(
        model_f=model_f, model_discrete=model_discrete,
        integrator=prob.model.integration_type, cost_f=cost_f,
    )
    out = jax.jit(lambda *a: ip_rollout._ip_forward_fused_impl(
        *a, model_key=model_key, cost_key=cost_key, slack_soc=True,
        box_layout=box_layout, interpret=True))(*args)

    for k_arr, r_arr in zip(out[3:], ref[3:]):
        np.testing.assert_allclose(np.asarray(k_arr), np.asarray(r_arr),
                                   atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=1e-4)  # J
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))


def _tracking_problem(dtype=jnp.float64, N=24):
    """Unicycle tracking a circular-arc reference (per-step
    reference_states) with a control box — the tracking-MPC shape."""
    import cddp_tpu as ct
    from cddp_tpu.models import Unicycle

    dt = 0.05
    ts = jnp.linspace(0.0, 1.0, N, dtype=dtype)
    refs = jnp.stack(
        [jnp.sin(ts), 1.0 - jnp.cos(ts), ts], axis=1
    ).astype(dtype)
    goal = refs[-1]
    obj = ct.quadratic_objective(
        0.5 * jnp.eye(3, dtype=dtype), 0.1 * jnp.eye(2, dtype=dtype),
        50.0 * jnp.eye(3, dtype=dtype), goal, dt, reference_states=refs,
    )
    prob = ct.problem(Unicycle(), obj, jnp.zeros(3, dtype), N, dt)
    return prob.add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.array([-2.0, -2.0], dtype),
                              jnp.array([2.0, 2.0], dtype)),
    )


def test_tracking_objective_is_eligible_and_parity():
    """reference_states objectives (tracking MPC) ride the fused path as
    per-step stage params: eligibility accepts them, and the fused-path
    reference scan reproduces the inline forward exactly in f64."""
    import dataclasses

    import cddp_tpu as ct
    from cddp_tpu.constraints.stack import PathStacker
    from cddp_tpu.solvers import ipddp as ipddp_mod

    prob = _tracking_problem()
    opts = ct.CDDPOptions(max_iterations=80, tolerance=1e-9,
                          acceptable_tolerance=1e-9)
    assert ip_rollout.ip_forward_eligible(prob, opts, PathStacker(prob))
    sol_auto = ipddp_mod.solve(prob, opts)
    opts_scan = dataclasses.replace(
        opts, ipddp=dataclasses.replace(opts.ipddp, forward_engine="scan")
    )
    sol_scan = ipddp_mod.solve(prob, opts_scan)
    np.testing.assert_allclose(
        np.asarray(sol_auto.state_trajectory),
        np.asarray(sol_scan.state_trajectory), rtol=0, atol=1e-12,
    )
    # tracking actually happened
    refs = np.asarray(prob.objective.reference_states)  # (N, nx), step k
    X = np.asarray(sol_auto.state_trajectory)  # (N+1, nx)
    N = refs.shape[0]
    assert np.abs(X[1:N, :2] - refs[1:N, :2]).max() < 0.15


def test_kernel_interpret_matches_scan_tracking_cost():
    """pallas_call (interpret) == scan with NONZERO per-step stage params
    (the quadratic_track lane): covers the kernel's stage-indexed cps
    block."""
    prob = _tracking_problem(dtype=jnp.float32, N=10)
    from cddp_tpu.constraints.stack import PathStacker

    stk = PathStacker(prob)
    boxes = ip_rollout._box_stack(stk)
    box_layout = tuple(k for k, _ in boxes)
    m_entry = ip_rollout.model_lane(prob.model)
    c_entry = ip_rollout.cost_lane(prob.objective)
    assert c_entry is not None and c_entry[2] is not None
    _, mp_fn, model_f, model_discrete = m_entry
    static, cparams, cstage, cost_f = c_entry
    assert static[0] == "quadratic_track"

    B, N, nx, nu = 4, 10, 3, 2
    m = stk.total_dim
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 16)

    def mk(k, *shape, scale=0.05):
        return jax.random.normal(k, (B,) + shape, jnp.float32) * scale

    Xb = mk(ks[0], N, nx, scale=0.3)
    Ub = mk(ks[1], N, nu) + 0.4
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
    x0 = mk(ks[13], nx, scale=0.1)
    a_pr = jnp.full((B,), 0.5, jnp.float32)
    a_du = jnp.full((B,), 0.25, jnp.float32)
    tau = jnp.full((B,), 0.9, jnp.float32)
    soc = jnp.ones((B,), jnp.float32)
    dtv = jnp.full((B,), jnp.float32(prob.timestep))
    mp_row = jnp.asarray(mp_fn(prob.model), jnp.float32).reshape(-1)
    if mp_row.shape[0] == 0:
        mp_row = jnp.zeros((1,), jnp.float32)
    mp = jnp.broadcast_to(mp_row[None], (B, mp_row.shape[0]))
    cp = jnp.broadcast_to(
        jnp.asarray(cparams, jnp.float32)[None], (B, cparams.shape[0])
    )
    cps = jnp.broadcast_to(
        jnp.asarray(cstage, jnp.float32)[None], (B, N, nx)
    )
    cc = boxes[0][1]
    lo = jnp.broadcast_to(jnp.asarray(cc.lower, jnp.float32)[None], (B, nu))
    hi = jnp.broadcast_to(jnp.asarray(cc.upper, jnp.float32)[None], (B, nu))
    sf = jnp.full((B, 1), jnp.float32(cc.scale_factor))

    args = (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky, ksl, Ksl, x0,
            a_pr, a_du, tau, soc, dtv, mp, cp, cps, lo, hi, sf)

    scan = jax.jit(jax.vmap(
        lambda *a: ip_rollout._scan_ip_forward_single(
            nx, nu, m, model_f, model_discrete,
            prob.model.integration_type, cost_f, True, box_layout, *a)
    ))
    ref = scan(*args)

    model_key = type(prob.model)
    cost_key = (type(prob.objective),) + static
    ip_rollout._LANES_BY_KEY[(model_key, cost_key)] = dict(
        model_f=model_f, model_discrete=model_discrete,
        integrator=prob.model.integration_type, cost_f=cost_f,
    )
    out = jax.jit(lambda *a: ip_rollout._ip_forward_fused_impl(
        *a, model_key=model_key, cost_key=cost_key, slack_soc=True,
        box_layout=box_layout, interpret=True))(*args)

    for k_arr, r_arr in zip(out[3:], ref[3:]):
        np.testing.assert_allclose(np.asarray(k_arr), np.asarray(r_arr),
                                   atol=1e-5, rtol=1e-4)
    # J is where the stage params enter — pin it tightly
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
