"""Pallas-fused IPDDP forward pass (interior-point closed-loop rollout).

The batched MPCC fleet profile at B=1024 (bench_mpcc.py workload, LocalTrack
engine) shows the IPDDP iteration is forward-pass bound: a bare 20-step
``lax.scan`` feedback rollout costs ~3.4 ms wall (~170 us/step of per-op
overhead at (1024, 7) shapes) while the whole iteration is ~5.9 ms — the
backward + Gauss-Newton derivatives are no longer the bottleneck once the
track trig left the hot path. This kernel runs the WHOLE single-alpha
interior-point rollout of :func:`cddp_tpu.solvers.ipddp._forward_pass`
(ipddp_solver.cpp:1571-1876 semantics) inside one ``pallas_call``:

- feedback law u = Ub + alpha_pr*k_u + K_u dx,
- costate update lam = lam + alpha_pr*k_lam + K_lam dx,
- slack/dual trial updates with their separate step sizes,
- the slack second-order correction (``ipddp.slack_soc``),
- fraction-to-boundary + finiteness acceptance masks,
- stacked box-constraint evaluation g = [(lo-var); (var-ub)]*scale per
  box item (control and/or state boxes, in stack order),
- the running cost, and
- the model integration step,

with the batch axis on the vector lanes (grid (batch_tile, time), VMEM
carry) — the same layout as :mod:`cddp_tpu.ops.pallas.rollout`.

Model dynamics and running costs enter through *extensible lane
registries*: :func:`register_model_lane` (any DynamicalSystem subclass;
the built-in registry of :mod:`cddp_tpu.ops.pallas.rollout` is the
fallback) and :func:`register_cost_lane` (any Objective subclass). The
MPCC example registers its 7-state latch bicycle and 13-residual Clenshaw
track cost this way — the registries are the public extension point, so
user models/costs get the fused path without touching the library.

Dispatch mirrors the CLDDP forward op: the unbatched primal is a
``lax.scan`` over the same lane functions (bit-identical math), and the
``custom_vmap`` rule swaps in the kernel for TPU f32 batches of at least
``MIN_KERNEL_BATCH``. The solver-side gate is
``IPDDPOptions.forward_engine`` ("auto" | "scan").

Parity with the library scan is asserted in tests (interpret mode on CPU;
tests/test_ip_rollout.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cddp_tpu.solvers import base
from cddp_tpu.ops.pallas.batched_dispatch import make_batched_op
from cddp_tpu.ops.pallas.rollout import (
    DEFAULT_TILE_B,
    MIN_KERNEL_BATCH,
    _integrate_lane,
    lane_spec as _builtin_lane_spec,
)

# --- extensible model-lane registry ----------------------------------------
# Keyed by exact class object (user classes). Built-in library models fall
# back to rollout._REGISTRY through rollout.lane_spec.

_MODEL_LANES = {}


def register_model_lane(cls, n_params, param_fn, lane_f, discrete=False):
    """Register a dynamics lane function for ``cls`` so batched fused
    kernels can integrate it in-kernel.

    ``param_fn(model) -> (n_params,) array`` of traced parameters;
    ``lane_f(x_list, u_list, p_list) -> xdot_list`` over per-state lane
    vectors (or, with ``discrete=True``, ``lane_f(x, u, p, dt) -> x_next``
    as an exact discrete map)."""
    _MODEL_LANES[cls] = (n_params, param_fn, lane_f, discrete)


def model_lane(model):
    """(n_params, param_fn, lane_f, discrete) for a registered model, else
    None. Exact-class matches only: subclasses keep the reference scan so
    overridden dynamics are honored."""
    entry = _MODEL_LANES.get(type(model))
    if entry is not None:
        return entry
    spec = _builtin_lane_spec(model)
    if spec is None:
        return None
    return (spec[0], spec[1], spec[2], len(spec) > 3 and spec[3])


# --- extensible cost-lane registry ------------------------------------------
# Keyed by exact objective class. Each factory maps an objective INSTANCE to
# (static_key, params (n,), lane_f(x_list, u_list, p_list, t_idx) -> scalar
# lane). static_key must capture everything lane_f closes over besides the
# traced params (it keys the compiled-op cache).

_COST_LANES = {}


def register_cost_lane(cls, factory):
    """Register a running-cost lane factory for an Objective subclass.

    ``factory(objective)`` returns None (decline) or a tuple:

    - 3-tuple ``(static_key, const_params (p,), lane_f)`` with
      ``lane_f(x_list, u_list, p_list, t_idx) -> scalar lane`` — costs
      whose parameters are time-invariant; or
    - 4-tuple ``(static_key, const_params, stage_params (N, q), lane_f)``
      with ``lane_f(x_list, u_list, p_list, sp_list, t_idx)`` — costs with
      per-timestep parameters (e.g. a reference trajectory): row t of
      ``stage_params`` is delivered as ``sp_list`` at step t.
    """
    _COST_LANES[cls] = factory


def cost_lane(objective):
    """Normalized lane entry ``(static_key, const_params, stage_params
    (N, q) or None, lane_f(x, u, p, sp, t))``, or None."""
    factory = _COST_LANES.get(type(objective))
    if factory is None:
        return None
    out = factory(objective)
    if out is None:
        return None
    if len(out) == 3:
        static, params, lane_f3 = out

        def lane_f(x, u, p, sp, t_idx, _f=lane_f3):
            return _f(x, u, p, t_idx)

        return static, params, None, lane_f
    return out


def _quadratic_cost_factory(obj):
    """QuadraticObjective lane (objective.cpp:30-94 semantics, dt-prescaled
    Q/R as stored): e'Qe + u'Ru, with the goal as a const param — or, when
    ``reference_states`` is set, the per-step reference row as a stage
    param (tracking MPC)."""
    nx = obj.Q.shape[0]
    nu = obj.R.shape[0]
    if obj.reference_states is not None:
        params = jnp.concatenate(
            [jnp.asarray(obj.Q).reshape(-1), jnp.asarray(obj.R).reshape(-1)]
        )

        def lane_track_f(x, u, p, sp, t_idx):
            Q = [[p[i * nx + j] for j in range(nx)] for i in range(nx)]
            R = [[p[nx * nx + i * nu + j] for j in range(nu)]
                 for i in range(nu)]
            e = [x[i] - sp[i] for i in range(nx)]
            J = jnp.zeros_like(x[0])
            for i in range(nx):
                for j in range(nx):
                    J = J + e[i] * Q[i][j] * e[j]
            for i in range(nu):
                for j in range(nu):
                    J = J + u[i] * R[i][j] * u[j]
            return J

        return (("quadratic_track", nx, nu), params,
                jnp.asarray(obj.reference_states), lane_track_f)

    params = jnp.concatenate(
        [jnp.asarray(obj.Q).reshape(-1), jnp.asarray(obj.R).reshape(-1),
         jnp.asarray(obj.reference_state).reshape(-1)]
    )

    def lane_f(x, u, p, t_idx):
        Q = [[p[i * nx + j] for j in range(nx)] for i in range(nx)]
        R = [[p[nx * nx + i * nu + j] for j in range(nu)] for i in range(nu)]
        goal = [p[nx * nx + nu * nu + i] for i in range(nx)]
        e = [x[i] - goal[i] for i in range(nx)]
        J = jnp.zeros_like(x[0])
        for i in range(nx):
            for j in range(nx):
                J = J + e[i] * Q[i][j] * e[j]
        for i in range(nu):
            for j in range(nu):
                J = J + u[i] * R[i][j] * u[j]
        return J

    return (("quadratic", nx, nu), params, lane_f)


def _register_builtin_cost_lanes():
    from cddp_tpu.costs.objective import QuadraticObjective

    register_cost_lane(QuadraticObjective, _quadratic_cost_factory)


_register_builtin_cost_lanes()


# --- eligibility -------------------------------------------------------------


def _box_stack(stk):
    """The path stack consists solely of box constraints (ControlConstraint
    / StateConstraint, exact types, possibly scaled), in stack (name-sorted)
    order. Returns a non-empty tuple of ("control"|"state", constraint)
    pairs, or None if any other constraint type is present."""
    from cddp_tpu.constraints.path import ControlConstraint, StateConstraint

    if not stk.items:
        return None
    out = []
    for _, c in stk.items:
        if type(c) is ControlConstraint:
            out.append(("control", c))
        elif type(c) is StateConstraint:
            out.append(("state", c))
        else:
            return None
    return tuple(out)


def _resolve_lanes(problem, options, stk):
    """Resolve (model_entry, cost_entry, box_stack) for the fused IPDDP
    forward rollout, or None if any static structure check fails."""
    if options.ipddp.forward_engine != "auto":
        return None
    entry = model_lane(problem.model)
    if entry is None:
        return None
    if not entry[3] and problem.model.integration_type not in (
        "euler", "heun", "rk3", "rk4"
    ):
        return None
    c_entry = cost_lane(problem.objective)
    if c_entry is None:
        return None
    boxes = _box_stack(stk)
    if boxes is None:
        return None
    return entry, c_entry, boxes


def ip_forward_eligible(problem, options, stk) -> bool:
    """Static structure check for the fused IPDDP forward rollout."""
    return _resolve_lanes(problem, options, stk) is not None


# --- the fused kernel ---------------------------------------------------------


def _make_ip_forward_kernel(nx, nu, m, N, n_mp, n_cp, n_sp, model_f,
                            model_discrete, integrator, cost_f, slack_soc,
                            box_layout, tile_b):
    """Kernel over (batch_tile, time): carry [x (nx), J, feasible]; per-step
    inputs/outputs as in ipddp._forward_pass's scan. ``box_layout`` is the
    static tuple of "control"/"state" box kinds in stack (name-sorted)
    order; ``lo``/``hi`` carry the per-item raw bounds concatenated and
    ``sf`` one scale factor per item."""
    n_carry = nx + 2
    n_items = len(box_layout)
    nb = sum(nu if kind == "control" else nx for kind in box_layout)

    def kernel(Xb_ref, Ub_ref, Y_ref, S_ref, ku_ref, Ku_ref, klam_ref,
               Klam_ref, lam_ref, ky_ref, Ky_ref, ks_ref, Ks_ref,
               x0_ref, apr_ref, adu_ref, tau_ref, soc_ref, dt_ref,
               mp_ref, cp_ref, cps_ref, lo_ref, hi_ref, sf_ref,
               Xo_ref, Uo_ref, So_ref, Yo_ref, Go_ref, Lo_ref,
               J_ref, F_ref, carry_ref):
        tt = pl.program_id(1)
        a_pr = apr_ref[0]
        a_du = adu_ref[0]
        tau = tau_ref[0]
        soc_on = soc_ref[0]
        dt = dt_ref[0]
        mp = [mp_ref[i] for i in range(n_mp)]
        cp = [cp_ref[i] for i in range(n_cp)]
        sp = [cps_ref[0, i] for i in range(n_sp)]
        sf = [sf_ref[i] for i in range(n_items)]

        @pl.when(tt == 0)
        def _init():
            for i in range(nx):
                carry_ref[i] = x0_ref[i]
            carry_ref[nx] = jnp.zeros_like(a_pr)
            carry_ref[nx + 1] = jnp.ones_like(a_pr)

        x = [carry_ref[i] for i in range(nx)]
        J = carry_ref[nx]
        feas = carry_ref[nx + 1]

        dx = [x[i] - Xb_ref[0, i] for i in range(nx)]

        def gain_apply(base_ref, k_ref_, K_ref_, n_rows, scale):
            out = []
            for i in range(n_rows):
                vi = base_ref[0, i] + scale * k_ref_[0, i]
                for j in range(nx):
                    vi = vi + K_ref_[0, i, j] * dx[j]
                out.append(vi)
            return out

        lam_new = gain_apply(lam_ref, klam_ref, Klam_ref, nx, a_pr)
        s_old = [S_ref[0, i] for i in range(m)]
        y_old = [Y_ref[0, i] for i in range(m)]
        s_new = gain_apply(S_ref, ks_ref, Ks_ref, m, a_pr)
        y_new = gain_apply(Y_ref, ky_ref, Ky_ref, m, a_du)
        u = gain_apply(Ub_ref, ku_ref, Ku_ref, nu, a_pr)

        J = J + cost_f(x, u, cp, sp, tt)

        # Per box item: g = [(lo - var); (var - hi)] * scale (box
        # evaluate - upper_bound, constraints/path.py _BoxConstraint),
        # items concatenated in stack order.
        g = []
        off = 0
        for it, kind in enumerate(box_layout):
            var, n = (u, nu) if kind == "control" else (x, nx)
            g += [(lo_ref[off + i] - var[i]) * sf[it] for i in range(n)]
            g += [(var[i] - hi_ref[off + i]) * sf[it] for i in range(n)]
            off += n

        # Fraction-to-boundary re-check with the knife-edge slop
        # (solvers/base.py ftb_ok — the lane form must match it exactly so
        # kernel and scan resolve boundary ties identically).
        eps = jnp.finfo(a_pr.dtype).eps

        def ftb_row(vn, vo):
            slop = 16.0 * eps * (1.0 + jnp.abs(vo) + jnp.abs(vn))
            return (vn > 0.0) & (vn >= (1.0 - tau) * vo - slop)

        if slack_soc:
            for i in range(m):
                s_soc = -g[i]
                ok_soc = ftb_row(s_soc, s_old[i]) & (soc_on > 0.5)
                s_new[i] = jnp.where(ok_soc, s_soc, s_new[i])

        ok = feas
        for i in range(m):
            ok = ok * jnp.where(ftb_row(s_new[i], s_old[i]), 1.0, 0.0)
            ok = ok * jnp.where(ftb_row(y_new[i], y_old[i]), 1.0, 0.0)
            ok = ok * jnp.where(jnp.isfinite(s_new[i]), 1.0, 0.0)
            ok = ok * jnp.where(jnp.isfinite(y_new[i]), 1.0, 0.0)

        if model_discrete:
            x_next = model_f(x, u, mp, dt)
        else:
            x_next = _integrate_lane(model_f, integrator, x, u, mp, dt)

        for i in range(nx):
            ok = ok * jnp.where(jnp.isfinite(x_next[i]), 1.0, 0.0)
            ok = ok * jnp.where(jnp.isfinite(lam_new[i]), 1.0, 0.0)
        for i in range(nu):
            ok = ok * jnp.where(jnp.isfinite(u[i]), 1.0, 0.0)

        for i in range(nx):
            Xo_ref[0, i] = x_next[i]
            Lo_ref[0, i] = lam_new[i]
            carry_ref[i] = x_next[i]
        for i in range(nu):
            Uo_ref[0, i] = u[i]
        for i in range(m):
            So_ref[0, i] = s_new[i]
            Yo_ref[0, i] = y_new[i]
            Go_ref[0, i] = g[i]
        carry_ref[nx] = J
        carry_ref[nx + 1] = ok

        @pl.when(tt == N - 1)
        def _final():
            J_ref[0] = J
            F_ref[0] = ok

    tbs = tile_b // 128

    def call(Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky, ks, Ks,
             x0, a_pr, a_du, tau, soc_on, dtv, mp, cp, cps, lo, hi, sf,
             interpret=False):
        Btot = Xb.shape[-1]
        assert Btot % tile_b == 0, (Btot, tile_b)
        grid = (Btot // tile_b, N)
        dtype = Xb.dtype
        rows = Btot // 128

        def fold(x):
            return x.reshape(*x.shape[:-1], rows, 128)

        def stage_spec(*dims):
            blk = (1,) + tuple(dims) + (tbs, 128)
            nd = len(dims)
            return pl.BlockSpec(
                blk, lambda b, t, _nd=nd: (t,) + (0,) * _nd + (b, 0),
                memory_space=pltpu.VMEM,
            )

        def const_spec(*dims):
            blk = tuple(dims) + (tbs, 128)
            nd = len(dims)
            return pl.BlockSpec(
                blk, lambda b, t, _nd=nd: (0,) * _nd + (b, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            stage_spec(nx), stage_spec(nu), stage_spec(m), stage_spec(m),
            stage_spec(nu), stage_spec(nu, nx), stage_spec(nx),
            stage_spec(nx, nx), stage_spec(nx), stage_spec(m),
            stage_spec(m, nx), stage_spec(m), stage_spec(m, nx),
            const_spec(nx), const_spec(1), const_spec(1), const_spec(1),
            const_spec(1), const_spec(1), const_spec(max(n_mp, 1)),
            const_spec(max(n_cp, 1)), stage_spec(max(n_sp, 1)),
            const_spec(nb), const_spec(nb), const_spec(n_items),
        ]
        out_specs = (
            stage_spec(nx), stage_spec(nu), stage_spec(m), stage_spec(m),
            stage_spec(m), stage_spec(nx), const_spec(1), const_spec(1),
        )
        out_shape = (
            jax.ShapeDtypeStruct((N, nx, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, nu, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, m, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, m, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, m, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, nx, rows, 128), dtype),
            jax.ShapeDtypeStruct((1, rows, 128), dtype),
            jax.ShapeDtypeStruct((1, rows, 128), dtype),
        )
        args = [fold(v) for v in (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky,
                                  Ky, ks, Ks, x0, a_pr, a_du, tau, soc_on,
                                  dtv, mp, cp, cps, lo, hi, sf)]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((n_carry, tbs, 128), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)
            ),
            interpret=interpret,
        )(*args)
        return tuple(o.reshape(*o.shape[:-2], Btot) for o in outs)

    return call


# --- op construction (scan primal + kernel vmap rule) -------------------------


def _scan_ip_forward_single(nx, nu, m, model_f, model_discrete, integrator,
                            cost_f, slack_soc, box_layout,
                            Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky,
                            ks, Ks, x0, a_pr, a_du, tau, soc_on, dtv, mp, cp,
                            cps, lo, hi, sf):
    """Unbatched reference path: identical math to the kernel as a scan
    (and to ipddp._forward_pass's inline step for this problem family)."""
    N = Xb.shape[0]
    dtype = Xb.dtype

    def step(carry, inp):
        x, J, feas = carry
        Xb_t, Ub_t, y, s, ku_t, Ku_t, klam_t, Klam_t, lam_t, ky_t, Ky_t, \
            ks_t, Ks_t, cps_t, kk = inp
        dx = x - Xb_t
        lam_new = lam_t + a_pr * klam_t + Klam_t @ dx
        s_new = s + a_pr * ks_t + Ks_t @ dx
        y_new = y + a_du * ky_t + Ky_t @ dx
        u = Ub_t + a_pr * ku_t + Ku_t @ dx
        xs = [x[i] for i in range(nx)]
        us = [u[i] for i in range(nu)]
        ps = [cp[i] for i in range(cp.shape[0])]
        sps = [cps_t[i] for i in range(cps.shape[-1])]
        J = J + cost_f(xs, us, ps, sps, kk)
        parts = []
        off = 0
        for it, kind in enumerate(box_layout):
            var, n = (u, nu) if kind == "control" else (x, nx)
            parts.append((lo[off:off + n] - var) * sf[it])
            parts.append((var - hi[off:off + n]) * sf[it])
            off += n
        g = jnp.concatenate(parts)
        if slack_soc:
            s_soc = -g
            ok_soc = base.ftb_ok(s_soc, s, tau) & (soc_on > 0.5)
            s_new = jnp.where(ok_soc, s_soc, s_new)
        ok_ftb = jnp.all(base.ftb_ok(s_new, s, tau)) & jnp.all(
            base.ftb_ok(y_new, y, tau)
        )
        ok_fin = jnp.all(jnp.isfinite(s_new)) & jnp.all(jnp.isfinite(y_new))
        mps = [mp[i] for i in range(mp.shape[0])]
        if model_discrete:
            x_next = jnp.stack(model_f(xs, us, mps, dtv))
        else:
            x_next = jnp.stack(_integrate_lane(model_f, integrator, xs, us,
                                               mps, dtv))
        ok_traj = (
            jnp.all(jnp.isfinite(x_next))
            & jnp.all(jnp.isfinite(u))
            & jnp.all(jnp.isfinite(lam_new))
        )
        feas = feas & ok_ftb & ok_fin & ok_traj
        return (x_next, J, feas), (x_next, u, s_new, y_new, g, lam_new)

    ks_idx = jnp.arange(N)
    inputs = (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky, ks, Ks, cps,
              ks_idx)
    # unroll=4: the per-step body is tiny (nx<=13 matvecs), so loop
    # overhead dominates on TPU; unrolling changes no math (each step's
    # ops are unchanged — goldens stay bit-identical) and shaves
    # single-solve latency.
    (x_last, J, feas), outs = jax.lax.scan(
        step, (x0, jnp.zeros((), dtype), jnp.asarray(True)), inputs,
        unroll=4,
    )
    return (x_last, J, feas) + outs


_OP_CACHE = {}


def _get_ip_forward_op(model_key, cost_key, nx, nu, m, n_mp, n_cp, n_sp,
                       model_f, model_discrete, integrator, cost_f,
                       slack_soc, box_layout):
    """Memoized custom_vmap op per static structure. The cache key must pin
    everything the lane closures depend on besides traced params."""
    key = (model_key, cost_key, nx, nu, m, n_mp, n_cp, n_sp, model_discrete,
           integrator, slack_soc, box_layout)
    op = _OP_CACHE.get(key)
    if op is not None:
        return op

    scan_single = functools.partial(
        _scan_ip_forward_single, nx, nu, m, model_f, model_discrete,
        integrator, cost_f, slack_soc, box_layout,
    )
    fused = functools.partial(
        _ip_forward_fused_impl, model_key=model_key, cost_key=cost_key,
        slack_soc=slack_soc, box_layout=box_layout, interpret=False,
    )
    name = getattr(model_key, "__name__", str(model_key))
    op = make_batched_op(
        scan_single, fused, f"{name} IPDDP forward rollout",
        min_batch=MIN_KERNEL_BATCH,
    )
    _OP_CACHE[key] = op
    return op


_IMPL_CACHE = {}


def _ip_forward_fused_impl(Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky,
                           ks, Ks, x0, a_pr, a_du, tau, soc_on, dtv, mp, cp,
                           cps, lo, hi, sf, *, model_key, cost_key, slack_soc,
                           box_layout, interpret, tile_b=DEFAULT_TILE_B):
    """Batch-first -> lane-folded kernel invocation (pads batch to tile_b)."""
    B0, N, nx = Xb.shape[0], Xb.shape[1], Xb.shape[2]
    nu, m = Ub.shape[2], Y.shape[2]
    n_mp, n_cp, n_sp = mp.shape[1], cp.shape[1], cps.shape[2]
    key = (model_key, cost_key, nx, nu, m, N, n_mp, n_cp, n_sp, slack_soc,
           box_layout, tile_b, interpret)
    call = _IMPL_CACHE.get(key)
    if call is None:
        # Lane closures are recovered from the op cache's creation site —
        # the impl is only reachable through _get_ip_forward_op, which
        # guarantees a one-to-one (model_key, cost_key) -> lane mapping.
        entry = _LANES_BY_KEY[(model_key, cost_key)]
        call = _make_ip_forward_kernel(
            nx, nu, m, N, max(n_mp, 1), max(n_cp, 1), max(n_sp, 1),
            entry["model_f"], entry["model_discrete"], entry["integrator"],
            entry["cost_f"], slack_soc, box_layout, tile_b,
        )
        _IMPL_CACHE[key] = call

    pad = (-B0) % tile_b

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        return jnp.moveaxis(x, 0, -1)

    def prep_scalar(x):
        return prep(x[:, None])

    args = [prep(v) for v in (Xb, Ub, Y, S, ku, Ku, klam, Klam, lam, ky, Ky,
                              ks, Ks, x0)]
    args += [prep_scalar(v) for v in (a_pr, a_du, tau, soc_on, dtv)]
    args += [prep(v if v.shape[1] else jnp.zeros((v.shape[0], 1), v.dtype))
             for v in (mp, cp)]
    args += [prep(cps if cps.shape[2] else
                  jnp.zeros((cps.shape[0], N, 1), cps.dtype))]
    args += [prep(lo), prep(hi), prep(sf)]
    outs = call(*args, interpret=interpret)
    unprep = lambda x: jnp.moveaxis(x, -1, 0)[:B0]
    Xt, U, Sn, Yn, G, Lam = (unprep(o) for o in outs[:6])
    J = unprep(outs[6])[:, 0]
    F = unprep(outs[7])[:, 0] > 0.5
    x_last = Xt[:, -1]
    return (x_last, J, F, Xt, U, Sn, Yn, G, Lam)


# (model_key, cost_key) -> lane closures; populated when the op is resolved.
_LANES_BY_KEY = {}


# --- fused open-loop rollout --------------------------------------------------
# The init path of every solver (and warm-start reseeding) rolls X from U
# with models.base.rollout — another N-step scan of tiny ops that costs
# ~170 us/step at fleet batch sizes. Same lane-registry fusion, applied to
# the plain open-loop map. models.base.rollout dispatches here when the
# model has a lane function (time-invariant dynamics; all registered models
# are).


def _make_ol_kernel(nx, nu, N, n_mp, model_f, model_discrete, integrator,
                    tile_b):
    def kernel(U_ref, x0_ref, dt_ref, mp_ref, Xo_ref, carry_ref):
        tt = pl.program_id(1)
        dt = dt_ref[0]
        mp = [mp_ref[i] for i in range(n_mp)]

        @pl.when(tt == 0)
        def _init():
            for i in range(nx):
                carry_ref[i] = x0_ref[i]

        x = [carry_ref[i] for i in range(nx)]
        u = [U_ref[0, i] for i in range(nu)]
        if model_discrete:
            x_next = model_f(x, u, mp, dt)
        else:
            x_next = _integrate_lane(model_f, integrator, x, u, mp, dt)
        for i in range(nx):
            Xo_ref[0, i] = x_next[i]
            carry_ref[i] = x_next[i]

    tbs = tile_b // 128

    def call(U, x0, dtv, mp, interpret=False):
        Btot = U.shape[-1]
        assert Btot % tile_b == 0
        grid = (Btot // tile_b, N)
        dtype = U.dtype
        rows = Btot // 128

        def fold(x):
            return x.reshape(*x.shape[:-1], rows, 128)

        def stage_spec(*dims):
            blk = (1,) + tuple(dims) + (tbs, 128)
            nd = len(dims)
            return pl.BlockSpec(
                blk, lambda b, t, _nd=nd: (t,) + (0,) * _nd + (b, 0),
                memory_space=pltpu.VMEM,
            )

        def const_spec(*dims):
            blk = tuple(dims) + (tbs, 128)
            nd = len(dims)
            return pl.BlockSpec(
                blk, lambda b, t, _nd=nd: (0,) * _nd + (b, 0),
                memory_space=pltpu.VMEM,
            )

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[stage_spec(nu), const_spec(nx), const_spec(1),
                      const_spec(n_mp)],
            out_specs=stage_spec(nx),
            out_shape=jax.ShapeDtypeStruct((N, nx, rows, 128), dtype),
            scratch_shapes=[pltpu.VMEM((nx, tbs, 128), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)
            ),
            interpret=interpret,
        )(fold(U), fold(x0), fold(dtv), fold(mp))
        return outs.reshape(*outs.shape[:-2], Btot)

    return call


_OL_OP_CACHE = {}
_OL_IMPL_CACHE = {}


def _ol_scan_single(nx, nu, model_f, model_discrete, integrator, U, x0, dtv,
                    mp):
    def step(x, u):
        xs = [x[i] for i in range(nx)]
        us = [u[i] for i in range(nu)]
        ps = [mp[i] for i in range(mp.shape[0])]
        if model_discrete:
            x_next = jnp.stack(model_f(xs, us, ps, dtv))
        else:
            x_next = jnp.stack(
                _integrate_lane(model_f, integrator, xs, us, ps, dtv)
            )
        return x_next, x_next

    _, X_tail = jax.lax.scan(step, x0, U)
    return X_tail


def _ol_fused_impl(U, x0, dtv, mp, *, lane_key, interpret,
                   tile_b=DEFAULT_TILE_B):
    B0, N, nu = U.shape
    nx = x0.shape[1]
    n_mp = mp.shape[1]
    key = lane_key + (nx, nu, N, n_mp, tile_b, interpret)
    call = _OL_IMPL_CACHE.get(key)
    if call is None:
        entry = _OL_LANES_BY_KEY[lane_key]
        call = _make_ol_kernel(nx, nu, N, n_mp, entry["model_f"],
                               entry["model_discrete"], entry["integrator"],
                               tile_b)
        _OL_IMPL_CACHE[key] = call
    pad = (-B0) % tile_b

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        return jnp.moveaxis(x, 0, -1)

    out = call(prep(U), prep(x0), prep(dtv[:, None]), prep(mp),
               interpret=interpret)
    return jnp.moveaxis(out, -1, 0)[:B0]


_OL_LANES_BY_KEY = {}


def _get_ol_op(model_key, nx, nu, model_f, model_discrete, integrator):
    lane_key = (model_key, model_discrete, integrator)
    key = lane_key + (nx, nu)
    op = _OL_OP_CACHE.get(key)
    if op is not None:
        return op

    scan_single = functools.partial(_ol_scan_single, nx, nu, model_f,
                                    model_discrete, integrator)

    name = getattr(model_key, "__name__", str(model_key))
    op_core = make_batched_op(
        scan_single,
        functools.partial(_ol_fused_impl, lane_key=lane_key, interpret=False),
        f"{name} open-loop rollout", min_batch=MIN_KERNEL_BATCH,
    )

    # custom_vmap ops reject reverse-mode AD on the unbatched path, and
    # diff.py vjp's the rollout for the X* cotangent pull-back
    # (diff.py:288). A custom_jvp shell restores both AD modes. The rule
    # runs BOTH primal and tangent through the lane scan (calling op_core
    # here breaks jit'd linearization: the custom_vmap primitive has no
    # partial-eval rule, so vjp-under-jit dies with "Linearization failed").
    # Non-AD callers never enter the rule and keep the kernel.
    @jax.custom_jvp
    def op(U, x0, dtv, mp):
        return op_core(U, x0, dtv, mp)

    @op.defjvp
    def _jvp(primals, tangents):
        return jax.jvp(scan_single, primals, tangents)

    _OL_OP_CACHE[key] = op
    return op


def open_loop_rollout_op(model, x0, U, dt):
    """Batch-aware open-loop rollout for lane-registered models, or None if
    the model has no lane function. Returns (N+1, nx) like
    models.base.rollout."""
    entry = model_lane(model)
    if entry is None:
        return None
    n_mp, mp_fn, model_f, model_discrete = entry
    if not model_discrete and model.integration_type not in (
        "euler", "heun", "rk3", "rk4"
    ):
        return None
    dtype = jnp.asarray(x0).dtype
    model_key = type(model)
    lane_key = (model_key, model_discrete, model.integration_type)
    _OL_LANES_BY_KEY[lane_key] = dict(
        model_f=model_f, model_discrete=model_discrete,
        integrator=model.integration_type,
    )
    op = _get_ol_op(model_key, x0.shape[-1], U.shape[-1], model_f,
                    model_discrete, model.integration_type)
    mp = jnp.asarray(mp_fn(model), dtype).reshape(-1)
    if mp.shape[0] == 0:
        mp = jnp.zeros((1,), dtype)
    X_tail = op(U, x0, jnp.asarray(dt, dtype), mp)
    return jnp.concatenate([x0[None], X_tail], axis=0)


def resolve_ip_forward(problem, options, stk):
    """Returns a callable replacing ipddp._forward_pass's scan, or None.

    The callable signature is
    ``fn(c, bp, alpha_pr, alpha_du, tau) ->
       ((x_last, J, feasible), (X_tail, U, S, Y, G, Lam_head))``
    matching the scan's carry/outs contract exactly.
    """
    resolved = _resolve_lanes(problem, options, stk)
    if resolved is None:
        return None
    m_entry, c_entry, boxes = resolved
    n_mp, mp_fn, model_f, model_discrete = m_entry
    cost_static, cparams, cstage, cost_f = c_entry
    box_layout = tuple(kind for kind, _ in boxes)
    # Class OBJECTS key the caches (names could collide across modules).
    model_key = type(problem.model)
    cost_key = (type(problem.objective),) + (
        cost_static if isinstance(cost_static, tuple) else (cost_static,)
    )
    integrator = problem.model.integration_type
    _LANES_BY_KEY[(model_key, cost_key)] = dict(
        model_f=model_f, model_discrete=model_discrete, integrator=integrator,
        cost_f=cost_f,
    )
    m = stk.total_dim
    nx, nu = problem.state_dim, problem.control_dim
    # Lane stacks are control/state boxes only (affine), so the "auto"
    # SOC mode resolves to off here (solvers/ipddp.py soc_traced); only an
    # explicit True traces the re-closure into the kernel.
    slack_soc = options.ipddp.slack_soc is True
    n_sp = 0 if cstage is None else cstage.shape[1]
    op = _get_ip_forward_op(
        model_key, cost_key, nx, nu, m, max(n_mp, 1), max(cparams.shape[0], 1),
        max(n_sp, 1), model_f, model_discrete, integrator, cost_f, slack_soc,
        box_layout,
    )

    def run(c, bp, alpha_pr, alpha_du, tau):
        dtype = c.X.dtype
        mp = jnp.asarray(mp_fn(problem.model), dtype).reshape(-1)
        if mp.shape[0] == 0:
            mp = jnp.zeros((1,), dtype)
        cp = jnp.asarray(cparams, dtype).reshape(-1)
        if cp.shape[0] == 0:
            cp = jnp.zeros((1,), dtype)
        if cstage is None:
            cps = jnp.zeros((c.U.shape[0], 1), dtype)
        else:
            # (N, n_sp) or (N+1, n_sp): the running cost only consumes
            # rows 0..N-1 (terminal row belongs to the terminal cost).
            cps = jnp.asarray(cstage, dtype)[: c.U.shape[0]]
        soc_flag = jnp.where(c.soc_on & c.soc_armed, 1.0, 0.0).astype(dtype)
        outs = op(
            c.X[:-1], c.U, c.Y, c.S, bp.k_u, bp.K_u, bp.k_lambda[:-1],
            bp.K_lambda[:-1], c.Lambda[:-1], bp.k_y, bp.K_y, bp.k_s, bp.K_s,
            jnp.asarray(problem.x0, dtype),
            jnp.asarray(alpha_pr, dtype), jnp.asarray(alpha_du, dtype),
            jnp.asarray(tau, dtype), soc_flag,
            jnp.asarray(problem.timestep, dtype), mp, cp, cps,
            jnp.concatenate(
                [jnp.asarray(cb.lower, dtype).reshape(-1) for _, cb in boxes]
            ),
            jnp.concatenate(
                [jnp.asarray(cb.upper, dtype).reshape(-1) for _, cb in boxes]
            ),
            jnp.stack(
                [jnp.asarray(cb.scale_factor, dtype) for _, cb in boxes]
            ),
        )
        x_last, J, feasible, Xt, U, Sn, Yn, G, Lam = outs
        return (x_last, J, feasible), (Xt, U, Sn, Yn, G, Lam)

    return run
