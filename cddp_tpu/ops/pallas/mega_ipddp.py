"""Whole-solve fused IPDDP kernel: the complete batched interior-point
solve as ONE ``pallas_call``.

The batched IPDDP iteration previously ran as several XLA program stages per
iteration — a vmapped-AD derivative sweep materializing (B, N, ...) stage
tensors in HBM, the condensed backward scan (or the streamed kernel in
ops/pallas/ipddp_riccati.py), the fused interior-point forward kernel
(ops/pallas/ip_rollout.py), and XLA glue for the filter line-search /
barrier / regularization driver (solvers/ipddp.py:_drive). This kernel runs
the *entire* solve — initial cost/merit/residuals, per-iteration dynamics
Jacobians + quadratic-cost derivatives, the interior-point condensed
Riccati recursion with its regularization-retry loop, the
fraction-to-boundary maximum step sizes, the sequential first-success
filter line search with the IPOPT-style acceptance cases, the barrier-mu
schedule (adaptive or monotone) and the fixed-size filter maintenance —
inside one kernel, with trajectories, duals, slacks, gains, costates and
value-function sequences resident in VMEM for the whole solve. HBM traffic
collapses to (seed state, consts) in and (solution) out.

Semantics mirror ``solvers/ipddp.py:_drive`` for the path-constraint regime
(ipddp_solver.cpp:1355-1568 backward, :1571-1876 forward, :2548-2660
barrier update) exactly, scoped to:

- box-only path constraint stacks (ControlConstraint / StateConstraint —
  the same family as the fused forward kernel, constant +-scale Jacobians);
- QuadraticObjective (goal or per-step ``reference_states`` tracking);
- iLQR Hessians (``use_ilqr=True``), sequential condensed backward,
  sequential first-success line search, no terminal constraints;
- both barrier strategies (ADAPTIVE tiered factors and the MONOTONIC/IPOPT
  kappa rule) and both theta norms.

The per-step backward block is the shared
:func:`cddp_tpu.ops.pallas.ipddp_riccati.ipddp_condensed_step_lanes`; the
forward pass re-derives the dual/slack gains from the stored control gains
via the shared :func:`ipddp_path_gain_lanes` closed forms instead of
storing four (N, m(, nx)) gain tensors — that recomputation is what keeps
the whole solve inside VMEM.

Dispatch: :func:`ipddp_solve_op` builds a batch-aware op (scan = the XLA
``_drive`` driver per instance) so IPDDP solves route here automatically
for vmapped TPU float32 batches when :func:`mega_eligible` holds. Parity
with the XLA driver is pinned in tests/test_mega_ipddp.py (interpret mode).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cddp_tpu.ops.pallas.batched_dispatch import make_batched_op
from cddp_tpu.ops.pallas.ipddp_riccati import (
    _lclip,
    ipddp_condense_lanes,
    ipddp_condensed_step_lanes,
    ipddp_path_gain_lanes,
)
from cddp_tpu.ops.pallas.riccati import (
    _inv,
    _leading_minors_pd,
    _matmul,
    _matvec,
    _transpose,
)
from cddp_tpu.ops.pallas.mega_clddp import _i32, deriv_lane_fn
from cddp_tpu.ops.pallas.rollout import (
    MIN_KERNEL_BATCH,
    _integrate_lane,
    _is_discrete,
    _registry_key,
    _REGISTRY,
)

DEFAULT_TILE_B = 1024

# Scalar lane slots in the `sc` scratch.
(_DONE, _STATUS, _IT, _COST, _MERIT, _FTHETA, _THETA, _MU, _REG,
 _INFPR, _INFDU, _INFCOMP, _STEPN, _APR, _ADU, _DV0, _DV1,
 _BP_DONE, _BP_LIMIT, _APRMAX, _ADUMAX, _LS_FOUND, _LS_OK, _ALPHA_CUR,
 _EARLY, _TJ, _TMERIT, _TTHETA, _TINFPR, _TMAXYS, _TMINYS, _TSUMLOG,
 _TAPR, _TADU, _SOC_ON, _SOC_ARMED, _STALLCNT, _BESTPR,
 _TLAMH) = range(39)
_F_CAP = 7  # max_filter_size (5) + 2, interior_point_utils.cpp:114-139
_F_M0 = 39
_F_V0 = _F_M0 + _F_CAP
_F_OK0 = _F_V0 + _F_CAP
_N_SCALARS = _F_OK0 + _F_CAP

# Status codes (cddp_tpu.solution.Status) as kernel floats.
_ST_MAX_ITER = 0.0
_ST_OPTIMAL = 1.0
_ST_ACCEPTABLE = 2.0
_ST_REG_LIMIT = 3.0

_EPS_SLACK = 1e-10  # ipddp.EPS_SLACK


# --- Gauss-Newton (residual) cost lanes ---------------------------------------
# The whole-solve kernel's cost interface is pluggable: QuadraticObjective
# problems use the built-in quadratic lanes (Q/R/Qf/goal inputs), and any
# ResidualObjective subclass with a registered GN lane runs the same kernel
# with cost = sum(r^2) and Gauss-Newton derivatives (2 J^T r / 2 J^T J —
# costs/objective.py ResidualObjective semantics, the reference's
# NONLINEAR_LS pattern from examples/ipddp_mpcc_rc.py:333-436). Residual
# Jacobian lanes come from jax.jvp of the residual lane function (one
# directional derivative per state/control column, the mega_clddp
# _jvp_deriv pattern), so a registered cost needs only the residual values.


class GnCostSpec(NamedTuple):
    """Static residual-cost structure baked into the kernel trace.

    ``res_f(x_list, u_list, cp_list, t_idx) -> [n_res] lane scalars`` are
    the running residuals (cost = sum of squares); ``tres_f(x_list,
    cp_list) -> [n_tres]`` the terminal residuals; ``textra_f(x_list,
    cp_list) -> lane scalar`` an optional AFFINE terminal extra term (its
    gradient is folded via jvp; its Hessian is treated as zero, so
    register only affine extras — ResidualObjective.terminal_cost_extra
    like MPCC's progress bonus). Running extras are not supported; a
    factory for an objective with one must decline (return None)."""

    n_cp: int
    n_res: int
    n_tres: int
    res_f: object
    tres_f: object
    textra_f: object


class GnCostEntry(NamedTuple):
    """Resolved GN cost lane for one objective instance. ``static_key``
    must capture everything the lane closures depend on besides the traced
    ``cp_fn(objective)`` parameter vector (it keys the compiled-op cache);
    ``cp_fn`` maps the objective pytree to its ``(n_cp,)`` traced
    parameters and is vmapped over leaf-batched objectives."""

    static_key: tuple
    cp_fn: object
    spec: GnCostSpec


# Exact objective class -> factory(objective) -> GnCostEntry | None.
_GN_COST_LANES = {}
# static_key -> GnCostSpec (recovered inside the jitted impl, where only
# the hashable key travels as a static argument).
_GN_BY_KEY = {}


def register_gn_cost_lane(cls, factory):
    """Register a Gauss-Newton residual-lane factory for an Objective
    subclass so whole-solve fleet dispatch can fold its cost into the
    kernel. ``factory(objective)`` returns a :class:`GnCostEntry` or None
    to decline (e.g. a track representation the lane cannot evaluate)."""
    _GN_COST_LANES[cls] = factory


def gn_cost_lane(objective):
    """Resolved :class:`GnCostEntry` for the objective, else None."""
    factory = _GN_COST_LANES.get(type(objective))
    if factory is None:
        return None
    entry = factory(objective)
    if entry is not None:
        _GN_BY_KEY.setdefault(entry.static_key, entry.spec)
    return entry


def _model_entry(model):
    """(static key, n_params, param_fn, lane_f, discrete) for a model with
    a lane function: built-in rollout._REGISTRY models (key = class name)
    or user models registered via ip_rollout.register_model_lane (key =
    the exact class, which is hashable and travels as a jit static arg)."""
    kind = _registry_key(model)
    if kind is not None:
        e = _REGISTRY[kind]
        return kind, e[0], e[1], e[2], _is_discrete(e)
    from cddp_tpu.ops.pallas.ip_rollout import _MODEL_LANES

    e = _MODEL_LANES.get(type(model))
    if e is None:
        return None
    return type(model), e[0], e[1], e[2], e[3]


def _model_lanes_by_key(kind):
    """(n_params, lane_f) for a _model_entry static key."""
    if isinstance(kind, str):
        e = _REGISTRY[kind]
        return e[0], e[2]
    from cddp_tpu.ops.pallas.ip_rollout import _MODEL_LANES

    e = _MODEL_LANES[kind]
    return e[0], e[2]


class _Cfg(NamedTuple):
    """Static (trace-time) solver configuration baked into the kernel."""

    max_iterations: int
    tolerance: float
    acceptable_tolerance: float
    reg0: float
    reg_uf: float
    reg_max: float
    reg_min: float
    a0: float
    a_r: float
    a_min: float
    n_alpha: int
    bp_bound: int
    # barrier
    adaptive: bool
    mu_update_factor: float
    mu_update_power: float
    mu_min_value: float
    min_ftb: float
    btm: float  # barrier_tol_mult
    dual_weight: float  # barrier_update_dual_weight (monotone)
    kappa_eps: float  # mu_kappa_epsilon (monotone)
    # filter acceptance (options.filter)
    armijo: float
    mat: float  # merit_acceptance_threshold
    vat: float  # violation_acceptance_threshold
    max_viol: float  # max_violation_threshold
    mvfac: float  # min_violation_for_armijo_check
    theta_l2: bool
    theta0_floor: float
    f_max: int  # max_filter_size
    # "auto" stall latch (solvers/ipddp.py soc_armed semantics), traced
    # only for curved stacks (ball rows): soc_auto gates the slack-SOC
    # re-closure, chess_auto the armed constraint-Hessian fold.
    soc_auto: bool = False
    chess_auto: bool = False
    soc_stall: int = 8
    # Terminal-equality reduced-LQR regime (ipddp.jacobian_regularization_*,
    # used by the tiny least-squares ladder for the multiplier step).
    jac_reg_val: float = 1e-8
    jac_reg_exp: float = 0.25


def _make_cfg(options, soc_auto: bool = False,
              chess_auto: bool = False) -> _Cfg:
    from cddp_tpu.options import BarrierStrategy, line_search_alphas

    reg = options.regularization
    reg_floor = max(min(reg.initial_value, reg.min_value), 1e-300)
    bp_bound = (
        int(math.ceil(math.log(reg.max_value / reg_floor)
                      / math.log(reg.update_factor))) + 2
        if reg.update_factor > 1.0
        else 4
    )
    ls = options.line_search
    ip = options.ipddp
    b = ip.barrier
    return _Cfg(
        max_iterations=int(options.max_iterations),
        tolerance=float(options.tolerance),
        acceptable_tolerance=float(options.acceptable_tolerance),
        reg0=float(reg.initial_value),
        reg_uf=float(reg.update_factor),
        reg_max=float(reg.max_value),
        reg_min=float(reg.min_value),
        a0=float(ls.initial_step_size),
        a_r=float(ls.step_reduction_factor),
        a_min=float(ls.min_step_size),
        n_alpha=len(line_search_alphas(ls)),
        bp_bound=bp_bound,
        adaptive=b.strategy == BarrierStrategy.ADAPTIVE,
        mu_update_factor=float(b.mu_update_factor),
        mu_update_power=float(b.mu_update_power),
        mu_min_value=float(b.mu_min_value),
        min_ftb=float(b.min_fraction_to_boundary),
        btm=float(ip.barrier_tol_mult),
        dual_weight=float(ip.barrier_update_dual_weight),
        kappa_eps=float(ip.mu_kappa_epsilon),
        armijo=float(options.filter.armijo_constant),
        mat=float(options.filter.merit_acceptance_threshold),
        vat=float(options.filter.violation_acceptance_threshold),
        max_viol=float(options.filter.max_violation_threshold),
        mvfac=float(options.filter.min_violation_for_armijo_check),
        theta_l2=ip.theta_norm == "l2",
        theta0_floor=max(float(ip.theta_0_floor), 1e-8),
        f_max=int(ip.max_filter_size),
        soc_auto=bool(soc_auto),
        chess_auto=bool(chess_auto),
        soc_stall=int(ip.soc_stall_iterations),
        jac_reg_val=float(ip.jacobian_regularization_value),
        jac_reg_exp=float(ip.jacobian_regularization_exponent),
    )


# --- in-kernel fixed-size filter over scalar lanes ---------------------------
# Replicates cddp_tpu.solvers.filter (itself interior_point_utils.cpp:79-139)
# over _F_CAP lane slots. Entries are always a valid prefix (every producer
# below preserves that), so back() = last valid slot in ascending order.


def _filter_back(fm, fv, fval, zeros):
    mf, cv, ne = zeros, zeros, zeros
    for i in range(_F_CAP):
        live = fval[i] > 0.5
        mf = jnp.where(live, fm[i], mf)
        cv = jnp.where(live, fv[i], cv)
        ne = jnp.maximum(ne, fval[i])
    return mf, cv, ne > 0.5


def _filter_accept(fm, fv, fval, mf, cv, zeros, ones):
    """accept_entry: reject if dominated; else drop dominated points
    (stable compaction) and append the candidate."""
    inf = zeros + jnp.inf
    dominated = zeros > ones  # False lane
    for i in range(_F_CAP):
        dominated = dominated | (
            (fval[i] > 0.5) & (fm[i] <= mf) & (fv[i] <= cv)
        )
    keep = [
        (fval[i] > 0.5) & ~((mf <= fm[i]) & (cv <= fv[i]))
        for i in range(_F_CAP)
    ]
    pos = []
    cnt = zeros
    for i in range(_F_CAP):
        pos.append(cnt)
        cnt = cnt + jnp.where(keep[i], ones, zeros)
    n_kept = cnt
    nm, nv, nval = [], [], []
    for j in range(_F_CAP):
        mj, vj = inf, inf
        for i in range(_F_CAP):
            sel = keep[i] & (pos[i] == float(j))
            mj = jnp.where(sel, fm[i], mj)
            vj = jnp.where(sel, fv[i], vj)
        is_cand = n_kept == float(j)
        mj = jnp.where(is_cand, mf, mj)
        vj = jnp.where(is_cand, cv, vj)
        valid_j = (zeros + float(j)) <= n_kept
        nm.append(jnp.where(dominated, fm[j], mj))
        nv.append(jnp.where(dominated, fv[j], vj))
        nval.append(
            jnp.where(dominated, fval[j], jnp.where(valid_j, ones, zeros))
        )
    return nm, nv, nval


def _filter_prune(fm, fv, fval, zeros, ones):
    """prune_to_best: min-violation point + min-merit point if distinct."""
    inf = zeros + jnp.inf
    nonempty = zeros > ones
    bv_v, bv_m = inf, inf
    bm_v, bm_m = inf, inf
    for i in range(_F_CAP):
        live = fval[i] > 0.5
        nonempty = nonempty | live
        vm = jnp.where(live, fv[i], inf)
        mm = jnp.where(live, fm[i], inf)
        bv_better = vm < bv_v  # strict: first-min wins (argmin parity)
        bv_v = jnp.where(bv_better, vm, bv_v)
        bv_m = jnp.where(bv_better, fm[i], bv_m)
        bm_better = mm < bm_m
        bm_m = jnp.where(bm_better, mm, bm_m)
        bm_v = jnp.where(bm_better, fv[i], bm_v)
    distinct = (jnp.abs(bm_v - bv_v) > 1e-12) | (jnp.abs(bm_m - bv_m) > 1e-12)
    nm, nv, nval = [], [], []
    for j in range(_F_CAP):
        if j == 0:
            mj, vj, okj = bv_m, bv_v, ones
        elif j == 1:
            mj = jnp.where(distinct, bm_m, inf)
            vj = jnp.where(distinct, bm_v, inf)
            okj = jnp.where(distinct, ones, zeros)
        else:
            mj, vj, okj = inf, inf, zeros
        nm.append(jnp.where(nonempty, mj, fm[j]))
        nv.append(jnp.where(nonempty, vj, fv[j]))
        nval.append(jnp.where(nonempty, okj, fval[j]))
    return nm, nv, nval


# --- terminal-equality lane linalg -------------------------------------------
# The p+1 reduced-LQR regime (_backward_terminal_eq, ipddp_solver.cpp:478-639)
# needs a tiny PD solve (the 5-scale least-squares ladder — the driver uses
# cho_solve) and the extreme singular values of the p x p sensitivity product
# (the driver uses jnp.linalg.svd for the SVD floor). Both are static-p
# unrolled lane code.


def _chol_solve_lanes(A, b, p, zeros, ones):
    """Cholesky solve of the (p, p) lane-matrix system ``A x = b``.
    Returns ``(x, ok)`` where ``ok`` is the all-pivots-positive lane mask
    (the driver's NaN-Cholesky check). Failed lanes solve against the
    identity factor, mirroring the driver's ``chol_safe`` fallback."""
    L = [[zeros for _ in range(p)] for _ in range(p)]
    ok = ones > 0.5
    for i in range(p):
        for j in range(i + 1):
            s = A[i][j]
            for k2 in range(j):
                s = s - L[i][k2] * L[j][k2]
            if i == j:
                ok = ok & (s > 0.0)
                d = jnp.sqrt(jnp.maximum(s, 1e-300))
                L[i][i] = jnp.where(ok, d, ones)
            else:
                L[i][j] = jnp.where(ok, s / L[j][j], zeros)
    # forward substitution L z = b, then back substitution L^T x = z
    z = [zeros] * p
    for i in range(p):
        s = b[i]
        for j in range(i):
            s = s - L[i][j] * z[j]
        z[i] = s / L[i][i]
    x = [zeros] * p
    for i in reversed(range(p)):
        s = z[i]
        for j in range(i + 1, p):
            s = s - L[j][i] * x[j]
        x[i] = s / L[i][i]
    return x, ok


def _jacobi_sv_minmax(A, p, zeros, ones, sweeps=8):
    """(max, min) singular values of the (near-)symmetric (p, p) lane
    matrix via cyclic Jacobi on sym(A): singular values are |eigenvalues|.
    Trig-free rotations (tau/t/c/s algebra); fixed ``sweeps`` for static
    control flow. Stands in for the driver's jnp.linalg.svd in the SVD
    regularization floor — identical (zero floor) whenever
    min_sv >= 1e-8 * max_sv, approximate only near rank-deficiency."""
    B = [[0.5 * (A[i][j] + A[j][i]) for j in range(p)] for i in range(p)]
    if p == 1:
        sv = jnp.abs(B[0][0])
        return sv, sv
    for _ in range(sweeps):
        for i in range(p - 1):
            for j in range(i + 1, p):
                apq = B[i][j]
                small = jnp.abs(apq) < 1e-300
                apq_s = jnp.where(small, ones, apq)
                tau = (B[j][j] - B[i][i]) / (2.0 * apq_s)
                sgn = jnp.where(tau >= 0.0, ones, -ones)
                t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(small, zeros, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                for k2 in range(p):
                    bik, bjk = B[i][k2], B[j][k2]
                    B[i][k2] = c * bik - s * bjk
                    B[j][k2] = s * bik + c * bjk
                for k2 in range(p):
                    bki, bkj = B[k2][i], B[k2][j]
                    B[k2][i] = c * bki - s * bkj
                    B[k2][j] = s * bki + c * bkj
    mx = jnp.abs(B[0][0])
    mn = jnp.abs(B[0][0])
    for i in range(1, p):
        d = jnp.abs(B[i][i])
        mx = jnp.maximum(mx, d)
        mn = jnp.minimum(mn, d)
    return mx, mn


def ipddp_te_stage_lanes(lx, lu, lxx, luu, lux, y, s, g, Gx, Gu, mu, reg,
                         nx, nu, m, cap):
    """Stagewise LQR data of the terminal-equality regime
    (_backward_terminal_eq stage build, ipddp_solver.cpp:1143-1258): path
    constraints condensed into (Qs, qs, Rs, rs, Ms) with the barrier sigma
    weights; ``reg`` lands on Rs (the driver adds reg*I to Rs before the
    LQR). Also returns the per-row primal/complementarity residuals for the
    caller's inf-norm bookkeeping."""
    zeros = jnp.zeros_like(mu)
    Qs = [[0.5 * (lxx[i][j] + lxx[j][i]) for j in range(nx)]
          for i in range(nx)]
    qs = list(lx)
    Rs = [[0.5 * (luu[i][j] + luu[j][i]) + (reg if i == j else zeros)
           for j in range(nu)] for i in range(nu)]
    rs = list(lu)
    # Ms is (nx, nu): lux^T.
    Ms = [[lux[j][i] for j in range(nu)] for i in range(nx)]
    pr = [zeros] * m
    comp = [zeros] * m
    if m:
        s_safe, sigma, pr, comp, rhat, sir = ipddp_condense_lanes(
            y, s, g, mu, m, cap
        )
        y_sir = [y[i] + sir[i] for i in range(m)]
        Gxt = _transpose(Gx, m, nx)
        Gut = _transpose(Gu, m, nu)
        gq = _matvec(Gxt, y_sir, nx, m)
        gr = _matvec(Gut, y_sir, nu, m)
        qs = [qs[i] + gq[i] for i in range(nx)]
        rs = [rs[i] + gr[i] for i in range(nu)]
        sGx = [[sigma[i] * Gx[i][j] for j in range(nx)] for i in range(m)]
        sGu = [[sigma[i] * Gu[i][j] for j in range(nu)] for i in range(m)]
        GtSGx = _matmul(Gxt, sGx, nx, m, nx)
        GtSGu_u = _matmul(Gut, sGu, nu, m, nu)
        GtSGu_x = _matmul(Gxt, sGu, nx, m, nu)
        Qs = [[0.5 * (Qs[i][j] + GtSGx[i][j] + Qs[j][i] + GtSGx[j][i])
               for j in range(nx)] for i in range(nx)]
        Rs = [[0.5 * (Rs[i][j] + GtSGu_u[i][j] + Rs[j][i] + GtSGu_u[j][i])
               for j in range(nu)] for i in range(nu)]
        Ms = [[Ms[i][j] + GtSGu_x[i][j] for j in range(nu)]
              for i in range(nx)]
    return Qs, qs, Rs, rs, Ms, pr, comp


def ipddp_te_lqr_step_lanes(A, Bm, Qs, qs, Rs, rs, Ms, Vx, Vxx, nx, nu):
    """One sequential-LQR backward step over lane lists
    (_solve_sequential_lqr, ipddp_solver.cpp:413-476): returns
    ``(k, K, Vx_new, Vxx_new, Qu, Hinv, pd_ok)``. ``Hinv`` is the
    regularized Quu inverse (reg already folded into Rs by the stage
    build), reused by the whole-solve kernel's sensitivity Gramian."""
    zeros = jnp.zeros_like(qs[0])
    At = _transpose(A, nx, nx)
    Bt = _transpose(Bm, nx, nu)
    PB = _matmul(Vxx, Bm, nx, nx, nu)
    PA = _matmul(Vxx, A, nx, nx, nx)
    BtPB = _matmul(Bt, PB, nu, nx, nu)
    Quu = [[0.5 * (Rs[i][j] + BtPB[i][j] + Rs[j][i] + BtPB[j][i])
            for j in range(nu)] for i in range(nu)]
    BtPA = _matmul(Bt, PA, nu, nx, nx)
    Qux = [[BtPA[i][j] + Ms[j][i] for j in range(nx)] for i in range(nu)]
    Atp = _matvec(At, Vx, nx, nx)
    Qx = [qs[i] + Atp[i] for i in range(nx)]
    Btp = _matvec(Bt, Vx, nu, nx)
    Qu = [rs[i] + Btp[i] for i in range(nu)]
    Hinv, _ = _inv(Quu, nu)
    pd_ok = _leading_minors_pd(Quu, nu)
    k = [jnp.where(pd_ok, -v, zeros) for v in _matvec(Hinv, Qu, nu, nu)]
    K = [[jnp.where(pd_ok, -v, zeros) for v in row]
         for row in _matmul(Hinv, Qux, nu, nu, nx)]
    AtPA = _matmul(At, PA, nx, nx, nx)
    Kt = _transpose(K, nu, nx)
    QuxtK = _matmul(_transpose(Qux, nu, nx), K, nx, nu, nx)
    QuuK = _matmul(Quu, K, nu, nu, nx)
    KtQuuK = _matmul(Kt, QuuK, nx, nu, nx)
    P = [[Qs[i][j] + AtPA[i][j] + QuxtK[i][j] + QuxtK[j][i] + KtQuuK[i][j]
          for j in range(nx)] for i in range(nx)]
    P = [[0.5 * (P[i][j] + P[j][i]) for j in range(nx)] for i in range(nx)]
    Quuk = _matvec(Quu, k, nu, nu)
    p_new = [
        Qx[i]
        + sum(Qux[l][i] * k[l] for l in range(nu))
        + sum(Kt[i][l] * (Qu[l] + Quuk[l]) for l in range(nu))
        for i in range(nx)
    ]
    return k, K, p_new, P, Qu, Hinv, pd_ok


def make_solve_kernel(nx, nu, m, N, n_params, lane_f, deriv_f, integrator,
                      box_layout, cfg: _Cfg, cap, tracking: bool = False,
                      mT: int = 0, tile_b: int = DEFAULT_TILE_B,
                      gn: GnCostSpec = None, track_costates: bool = True,
                      pT: int = 0):
    """Build the whole-solve pallas_call for static problem structure.

    Inputs (batch-last, lane-folded): X0 (N+1,nx,B), U0 (N,nu,B),
    Y0/S0 (N,m,B), ku0 (N,nu,B), Ku0 (N,nu,nx,B), [L0 (N+1,nx,B)],
    mu0 (1,B), dt (1,B), params (max(n_params,1),B), then the cost inputs —
    quadratic mode: Q/Qf (nx,nx,B) [dt-prescaled Q], R (nu,nu,B),
    goal (nx,B), [refs (N,nx,B)]; GN mode (``gn`` set): cp (n_cp,B) —
    then lo/hi (nb,B), sf (n_items,B), and for mT > 0 the linear
    terminal-inequality regime (ipddp_solver.cpp:999-1031 V-fold):
    ST0/YT0 (mT,B), A_T (mT,nx,B), b_T (mT,B).

    Outputs: X (N+1,nx,B), U (N,nu,B), k (N,nu,B), K (N,nu,nx,B),
    Y (N,m,B), S (N,m,B), [Lambda (N+1,nx,B)], stats (9,B) =
    [cost, inf_pr, inf_du, inf_comp, mu, reg, alpha_pr, iterations, status],
    and for mT > 0 additionally S_T (mT,B), Y_T (mT,B).

    ``track_costates=False`` drops the costate bookkeeping (the L0 input,
    the Lambda output, and the whole Vx/Vxx VMEM sequences whose only
    consumer is the per-step costate update) — a large VMEM saving that
    makes bigger (nx, N) problems kernel-eligible. The costates are
    write-only state in the iLQR condensed regime, so iterates match the
    XLA driver except in the pathological case where a non-finite costate
    alone would have rejected a line-search trial.
    """
    def _item_rows(kind):
        """(param rows in lo/hi, constraint rows in the stack) per item."""
        if kind == "control":
            return nu, 2 * nu
        if kind == "state":
            return nx, 2 * nx
        return kind[1], 1  # ("ball", d): lo rows=center, hi row 0=radius

    n_items = len(box_layout)
    nb = sum(_item_rows(kind)[0] for kind in box_layout)
    has_ball = any(isinstance(kind, tuple) for kind in box_layout)
    latch_traced = has_ball and (cfg.soc_auto or cfg.chess_auto)

    def kernel(X0_ref, U0_ref, Y0_ref, S0_ref, ku0_ref, Ku0_ref, *rest):
        if track_costates:
            L0_ref, rest = rest[0], rest[1:]
        mu0_ref, dt_ref, p_ref = rest[:3]
        rest = rest[3:]
        refs_ref = None
        if gn is not None:
            cp_ref, rest = rest[0], rest[1:]
        else:
            Q_ref, R_ref, Qf_ref, goal_ref = rest[:4]
            rest = rest[4:]
            if tracking:
                refs_ref, rest = rest[0], rest[1:]
        lo_ref, hi_ref, sf_ref = rest[:3]
        rest = rest[3:]
        if mT:
            st0_ref, yt0_ref, at_ref, bt_ref = rest[:4]
            rest = rest[4:]
        if pT:
            ht_ref, hb_ref, lte0_ref = rest[:3]
            rest = rest[3:]
        Xo, Uo, ko, Ko, Yo, So = rest[:6]
        rest = rest[6:]
        if track_costates:
            Lo, rest = rest[0], rest[1:]
        st_ref, rest = rest[0], rest[1:]
        if mT:
            STo, YTo = rest[:2]
            rest = rest[2:]
        if pT:
            LteO, rest = rest[0], rest[1:]
        if track_costates:
            Vxs, Vxxs = rest[:2]
            rest = rest[2:]
        Xc, Uc, Yc, Sc = rest[:4]
        rest = rest[4:]
        if track_costates:
            Lc, rest = rest[0], rest[1:]
        if mT:
            STc, YTc = rest[:2]
            rest = rest[2:]
        if pT:
            dLamS, rest = rest[0], rest[1:]
        (sc,) = rest
        dt = dt_ref[0]
        zeros = jnp.zeros_like(dt)
        ones = zeros + 1.0
        p = [p_ref[i] for i in range(n_params)]
        sf = [sf_ref[i] for i in range(n_items)]

        if gn is not None:
            cp = [cp_ref[i] for i in range(gn.n_cp)]

            def run_cost(x, u, t):
                r = gn.res_f(x, u, cp, t)
                c = zeros
                for ri in r:
                    c = c + ri * ri
                return c

            def term_cost(x):
                r = gn.tres_f(x, cp)
                c = zeros
                for ri in r:
                    c = c + ri * ri
                if gn.textra_f is not None:
                    c = c + gn.textra_f(x, cp)
                return c

            def run_derivs(x, u, t):
                """Gauss-Newton stage derivatives (ResidualObjective
                running_cost_gradients/_hessians): gradient 2 J^T r,
                Hessians 2 J^T J, residual Jacobian columns via jax.jvp
                of the residual lanes (mega_clddp._jvp_deriv pattern)."""
                r0 = gn.res_f(x, u, cp, t)
                nr = gn.n_res
                Jx = []
                for j in range(nx):
                    tx = [ones if i == j else zeros for i in range(nx)]
                    _, dr = jax.jvp(
                        lambda xx: gn.res_f(xx, u, cp, t), (x,), (tx,)
                    )
                    Jx.append(dr)
                Ju = []
                for j in range(nu):
                    tu = [ones if i == j else zeros for i in range(nu)]
                    _, dr = jax.jvp(
                        lambda uu: gn.res_f(x, uu, cp, t), (u,), (tu,)
                    )
                    Ju.append(dr)
                lx = [2.0 * sum(Jx[i][k] * r0[k] for k in range(nr))
                      for i in range(nx)]
                lu = [2.0 * sum(Ju[i][k] * r0[k] for k in range(nr))
                      for i in range(nu)]
                lxx = [[2.0 * sum(Jx[i][k] * Jx[j][k] for k in range(nr))
                        for j in range(nx)] for i in range(nx)]
                luu = [[2.0 * sum(Ju[i][k] * Ju[j][k] for k in range(nr))
                        for j in range(nu)] for i in range(nu)]
                lux = [[2.0 * sum(Ju[i][k] * Jx[j][k] for k in range(nr))
                        for j in range(nx)] for i in range(nu)]
                return lx, lu, lxx, luu, lux

            def term_value(x):
                """GN terminal fold: Vx = 2 J_T^T r_T + grad(extra),
                Vxx = 2 J_T^T J_T (extra affine by the registry contract,
                so its Hessian is zero)."""
                rT = gn.tres_f(x, cp)
                ntr = gn.n_tres
                JT = []
                for j in range(nx):
                    tx = [ones if i == j else zeros for i in range(nx)]
                    _, dr = jax.jvp(
                        lambda xx: gn.tres_f(xx, cp), (x,), (tx,)
                    )
                    JT.append(dr)
                Vx = [2.0 * sum(JT[i][k] * rT[k] for k in range(ntr))
                      for i in range(nx)]
                if gn.textra_f is not None:
                    for j in range(nx):
                        tx = [ones if i == j else zeros for i in range(nx)]
                        _, de = jax.jvp(
                            lambda xx: gn.textra_f(xx, cp), (x,), (tx,)
                        )
                        Vx[j] = Vx[j] + de
                Vxx = [[2.0 * sum(JT[i][k] * JT[j][k] for k in range(ntr))
                        for j in range(nx)] for i in range(nx)]
                return Vx, Vxx
        else:
            Q = [[Q_ref[i, j] for j in range(nx)] for i in range(nx)]
            R = [[R_ref[i, j] for j in range(nu)] for i in range(nu)]
            Qf = [[Qf_ref[i, j] for j in range(nx)] for i in range(nx)]
            goal = [goal_ref[i] for i in range(nx)]

            def ref_row(t):
                if tracking:
                    return [refs_ref[t, i] for i in range(nx)]
                return goal

            def run_cost(x, u, t):
                ref = ref_row(t)
                e = [x[i] - ref[i] for i in range(nx)]
                c = zeros
                for i in range(nx):
                    for j in range(nx):
                        c = c + e[i] * Q[i][j] * e[j]
                for i in range(nu):
                    for j in range(nu):
                        c = c + u[i] * R[i][j] * u[j]
                return c

            def term_cost(x):
                e = [x[i] - goal[i] for i in range(nx)]
                c = zeros
                for i in range(nx):
                    for j in range(nx):
                        c = c + e[i] * Qf[i][j] * e[j]
                return c

            def run_derivs(x, u, t):
                ref = ref_row(t)
                e = [x[i] - ref[i] for i in range(nx)]
                lx = [
                    2.0 * sum(Q[i][j] * e[j] for j in range(nx))
                    for i in range(nx)
                ]
                lu = [
                    2.0 * sum(R[i][j] * u[j] for j in range(nu))
                    for i in range(nu)
                ]
                lxx = [[2.0 * Q[i][j] for j in range(nx)]
                       for i in range(nx)]
                luu = [[2.0 * R[i][j] for j in range(nu)]
                       for i in range(nu)]
                lux = [[zeros] * nx for _ in range(nu)]
                return lx, lu, lxx, luu, lux

            def term_value(x):
                eN = [x[i] - goal[i] for i in range(nx)]
                Vx = [
                    2.0 * sum(Qf[i][j] * eN[j] for j in range(nx))
                    for i in range(nx)
                ]
                Vxx = [[2.0 * Qf[i][j] for j in range(nx)]
                       for i in range(nx)]
                return Vx, Vxx

        def box_g(x, u):
            """Shifted stack g (stack order): box items contribute
            [(lo - var); (var - hi)] * scale (constraints/path.py
            _BoxConstraint); a ball item contributes one row
            scale * (r^2 - ||x_d - c||^2) (BallConstraint.evaluate - ub;
            center in the item's lo rows, radius in its first hi row)."""
            g = []
            off = 0
            for it, kind in enumerate(box_layout):
                if isinstance(kind, tuple):  # ("ball", d)
                    d = kind[1]
                    r = hi_ref[off]
                    q = zeros
                    for i in range(d):
                        diff = x[i] - lo_ref[off + i]
                        q = q + diff * diff
                    g.append(sf[it] * (r * r - q))
                    off += d
                    continue
                var, n = (u, nu) if kind == "control" else (x, nx)
                g += [(lo_ref[off + i] - var[i]) * sf[it] for i in range(n)]
                g += [(var[i] - hi_ref[off + i]) * sf[it] for i in range(n)]
                off += n
            return g

        # Constant control-Jacobian lanes (box rows: -+scale; ball rows 0).
        Gu_c = [[zeros for _ in range(nu)] for _ in range(m)]
        row = 0
        for it, kind in enumerate(box_layout):
            if isinstance(kind, tuple):
                row += 1
                continue
            n = nu if kind == "control" else nx
            if kind == "control":
                for i in range(n):
                    Gu_c[row + i][i] = zeros - sf[it]
                    Gu_c[row + n + i][i] = zeros + sf[it]
            row += 2 * n

        def stack_Gx(x):
            """State-Jacobian lanes at the nominal x: box rows constant,
            ball row -2*scale*(x_d - c) (BallConstraint.state_jacobian).
            Box-only layouts are x-independent — identical lowering to the
            old constant Gx_c."""
            Gx = [[zeros for _ in range(nx)] for _ in range(m)]
            row = 0
            off = 0
            for it, kind in enumerate(box_layout):
                if isinstance(kind, tuple):
                    d = kind[1]
                    for i in range(d):
                        Gx[row][i] = -2.0 * sf[it] * (x[i] - lo_ref[off + i])
                    row += 1
                    off += d
                    continue
                n = nu if kind == "control" else nx
                if kind == "state":
                    for i in range(n):
                        Gx[row + i][i] = zeros - sf[it]
                        Gx[row + n + i][i] = zeros + sf[it]
                row += 2 * n
                off += n
            return Gx

        if mT:
            AT = [[at_ref[i, j] for j in range(nx)] for i in range(mT)]
            bTl = [bt_ref[i] for i in range(mT)]

            def gT_of(x):
                """Linear terminal inequalities g_T = A_T x_N - b_T
                (TerminalInequalityConstraint, terminal_constraint.hpp:160)."""
                return [
                    sum(AT[i][j] * x[j] for j in range(nx)) - bTl[i]
                    for i in range(mT)
                ]

        if pT:
            HTl = [[ht_ref[i, j] for j in range(nx)] for i in range(pT)]
            hbl = [hb_ref[i] for i in range(pT)]

            def h_of(x):
                """Linear terminal equalities h_T = H x_N - b
                (TerminalEqualityConstraint: H = I, b = target)."""
                return [
                    sum(HTl[i][j] * x[j] for j in range(nx)) - hbl[i]
                    for i in range(pT)
                ]

        def fin(v):
            return jnp.where(jnp.isfinite(v), ones, zeros)

        # --- init: seed live state (outputs double as state) --------------
        Xo[...] = X0_ref[...]
        Uo[...] = U0_ref[...]
        ko[...] = ku0_ref[...]
        Ko[...] = Ku0_ref[...]
        Yo[...] = Y0_ref[...]
        So[...] = S0_ref[...]
        Xc[...] = X0_ref[...]
        Uc[...] = U0_ref[...]
        Yc[...] = Y0_ref[...]
        Sc[...] = S0_ref[...]
        if track_costates:
            Lo[...] = L0_ref[...]
            Lc[...] = L0_ref[...]
        if mT:
            STo[...] = st0_ref[...]
            YTo[...] = yt0_ref[...]
            STc[...] = st0_ref[...]
            YTc[...] = yt0_ref[...]
        if pT:
            LteO[...] = lte0_ref[...]
            dLamS[...] = jnp.zeros_like(lte0_ref[...])

        mu0 = mu0_ref[0]

        # Initial cost / merit / residuals / theta (resetFilter,
        # ipddp_solver.cpp:2484-2524). Every index-using loop carries its
        # own int32 counter (see mega_clddp on the Mosaic x64 pitfall).
        def init_body(_s, carry):
            J, sumlog, th, infpr, maxys, minys, t = carry
            x = [Xo[t, i] for i in range(nx)]
            u = [Uo[t, i] for i in range(nu)]
            J = J + run_cost(x, u, t)
            g = box_g(x, u)
            for i in range(m):
                s_i = So[t, i]
                y_i = Yo[t, i]
                sumlog = sumlog + jnp.log(jnp.maximum(s_i, _EPS_SLACK))
                r = g[i] + s_i
                th = th + (r * r if cfg.theta_l2 else jnp.abs(r))
                infpr = jnp.maximum(infpr, jnp.abs(r))
                maxys = jnp.maximum(maxys, y_i * s_i)
                minys = jnp.minimum(minys, y_i * s_i)
            return (J, sumlog, th, infpr, maxys, minys, t + _i32(1))

        J0, sumlog0, th0, infpr0, maxys0, minys0, _ = jax.lax.fori_loop(
            _i32(0), _i32(N), init_body,
            (zeros, zeros, zeros, zeros, zeros - jnp.inf, zeros + jnp.inf,
             jnp.asarray(0, jnp.int32)),
        )
        xN0 = [Xo[N, i] for i in range(nx)]
        J0 = J0 + term_cost(xN0)
        if mT:
            gT0i = gT_of(xN0)
            for i in range(mT):
                sTi = STo[i]
                yTi = YTo[i]
                sumlog0 = sumlog0 + jnp.log(jnp.maximum(sTi, _EPS_SLACK))
                r = gT0i[i] + sTi
                th0 = th0 + (r * r if cfg.theta_l2 else jnp.abs(r))
                infpr0 = jnp.maximum(infpr0, jnp.abs(r))
                maxys0 = jnp.maximum(maxys0, yTi * sTi)
                minys0 = jnp.minimum(minys0, yTi * sTi)
        lam_h0 = zeros
        if pT:
            hT0i = h_of(xN0)
            for i in range(pT):
                r = hT0i[i]
                th0 = th0 + (r * r if cfg.theta_l2 else jnp.abs(r))
                infpr0 = jnp.maximum(infpr0, jnp.abs(r))
                lam_h0 = lam_h0 + lte0_ref[i] * r
        theta0_raw = jnp.maximum(
            jnp.sqrt(th0) if cfg.theta_l2 else th0, infpr0
        )
        ftheta0 = jnp.maximum(theta0_raw, 1e-8)

        sc[_DONE] = zeros
        sc[_STATUS] = zeros + _ST_MAX_ITER
        sc[_IT] = zeros
        sc[_COST] = J0
        sc[_MERIT] = J0 - mu0 * sumlog0 + lam_h0
        sc[_FTHETA] = ftheta0
        sc[_THETA] = jnp.maximum(ftheta0, cfg.theta0_floor)
        sc[_MU] = mu0
        sc[_REG] = zeros + cfg.reg0
        sc[_INFPR] = infpr0
        sc[_INFDU] = zeros
        sc[_INFCOMP] = jnp.maximum(maxys0 - mu0, mu0 - minys0)
        sc[_STEPN] = zeros
        sc[_APR] = ones
        sc[_ADU] = ones
        sc[_TLAMH] = zeros
        # "auto" stall latch state (solvers/ipddp.py _Carry soc_on /
        # soc_armed / stall_count): drop-latch on, armed off, count 0.
        sc[_SOC_ON] = ones
        sc[_SOC_ARMED] = zeros
        sc[_STALLCNT] = zeros
        # +inf, not infpr0 (solvers/ipddp.py best_inf_pr init note).
        sc[_BESTPR] = zeros + jnp.inf
        # resetFilter: the initial filter is EMPTY in the path-only regime
        # and seeded with (merit0, ftheta0) when terminal constraints
        # exist (_drive:1484-1485).
        for i in range(_F_CAP):
            sc[_F_M0 + i] = zeros + jnp.inf
            sc[_F_V0 + i] = zeros + jnp.inf
            sc[_F_OK0 + i] = zeros
        if mT or pT:
            sc[_F_M0] = sc[_MERIT]
            sc[_F_V0] = ftheta0
            sc[_F_OK0] = ones

        # --- one driver iteration ------------------------------------------
        def outer(_itn, carry):
            done = sc[_DONE]
            any_active = jnp.max(ones - done) > 0.5

            @pl.when(any_active)
            def _iteration():
                active = sc[_DONE] < 0.5
                sc[_IT] = jnp.where(active, sc[_IT] + 1.0, sc[_IT])
                mu = sc[_MU]

                # ---- backward pass with regularization retry ----
                sc[_BP_DONE] = sc[_DONE]
                sc[_BP_LIMIT] = zeros

                def bp_attempt(_a, c2):
                    retry_any = jnp.max(ones - sc[_BP_DONE]) > 0.5

                    @pl.when(retry_any)
                    def _bp():
                        mrt = sc[_BP_DONE] < 0.5
                        regl = sc[_REG]

                        # Terminal value fold: terminal-cost derivatives,
                        # plus the terminal-inequality barrier fold when
                        # present (_terminal_value_fold,
                        # ipddp_solver.cpp:999-1031).
                        xN = [Xo[N, i] for i in range(nx)]
                        VxT, VxxT = term_value(xN)
                        infpr_T = zeros
                        infcomp_T = zeros
                        if mT:
                            gTb = gT_of(xN)
                            mu_floor_T = jnp.maximum(mu * 1e-3, _EPS_SLACK)
                            for i in range(mT):
                                sT = STo[i]
                                yT = jnp.maximum(YTo[i], _EPS_SLACK)
                                s_safe_T = jnp.maximum(sT, mu_floor_T)
                                sigma_T = _lclip(yT / s_safe_T, 0.0, cap)
                                bg_T = yT + _lclip(
                                    (yT * gTb[i] + mu) / s_safe_T, -cap, cap
                                )
                                for j in range(nx):
                                    VxT[j] = VxT[j] + AT[i][j] * bg_T
                                    for kx in range(nx):
                                        VxxT[j][kx] = VxxT[j][kx] + (
                                            AT[i][j] * sigma_T * AT[i][kx]
                                        )
                                infpr_T = jnp.maximum(
                                    infpr_T, jnp.abs(gTb[i] + STo[i])
                                )
                                infcomp_T = jnp.maximum(
                                    infcomp_T, jnp.abs(YTo[i] * STo[i] - mu)
                                )
                        if track_costates and pT == 0:
                            for i in range(nx):
                                Vxs[N, i] = jnp.where(
                                    mrt, VxT[i], Vxs[N, i]
                                )
                                for j in range(nx):
                                    Vxxs[N, i, j] = jnp.where(
                                        mrt, VxxT[i][j], Vxxs[N, i, j]
                                    )

                        def bstep(_s, carry):
                            t = carry[-1]
                            Vx = list(carry[0])
                            Vxx = [list(r) for r in carry[1]]
                            (dv0, dv1, infdu, infpr, infcomp, stepn,
                             okl) = carry[2:-1]

                            x = [Xo[t, i] for i in range(nx)]
                            u = [Uo[t, i] for i in range(nu)]
                            Fx, Fu = deriv_f(x, u, p)
                            A = [
                                [
                                    (ones if i == j else zeros)
                                    + dt * Fx[i][j]
                                    for j in range(nx)
                                ]
                                for i in range(nx)
                            ]
                            Bm = [[dt * Fu[i][j] for j in range(nu)]
                                  for i in range(nx)]
                            lx, lu, lxx, luu, lux = run_derivs(x, u, t)
                            y = [Yo[t, i] for i in range(m)]
                            s = [So[t, i] for i in range(m)]
                            g = box_g(x, u)
                            if latch_traced and cfg.chess_auto:
                                # Armed constraint-Hessian fold: ball rows
                                # have the constant Hessian -2*scale*I on
                                # the head dims (BallConstraint
                                # .state_hessian); exact no-op until the
                                # stall latch arms (solvers/ipddp.py
                                # _backward_condensed "latched" mode).
                                armed_w = jnp.where(
                                    sc[_SOC_ARMED] > 0.5, ones, zeros
                                )
                                rowb = 0
                                for itb, kindb in enumerate(box_layout):
                                    if isinstance(kindb, tuple):
                                        for i in range(kindb[1]):
                                            lxx[i][i] = lxx[i][i] + (
                                                armed_w * y[rowb]
                                                * (-2.0 * sf[itb])
                                            )
                                        rowb += 1
                                    else:
                                        rowb += 2 * (
                                            nu if kindb == "control" else nx
                                        )

                            (k_u, K_u, _k_y, _K_y, _k_s, _K_s, Vx_new,
                             Vxx_new, dv0s, dv1s, Qu_c, pr, comp,
                             pd_ok) = ipddp_condensed_step_lanes(
                                A, Bm, lx, lu, lxx, luu, lux, y, s, g,
                                stack_Gx(x), Gu_c, Vx, Vxx, mu, regl,
                                nx, nu, m, cap=cap,
                            )

                            for i in range(nu):
                                ko[t, i] = jnp.where(mrt, k_u[i], ko[t, i])
                                for j in range(nx):
                                    Ko[t, i, j] = jnp.where(
                                        mrt, K_u[i][j], Ko[t, i, j]
                                    )
                            if track_costates:
                                for i in range(nx):
                                    Vxs[t, i] = jnp.where(
                                        mrt, Vx_new[i], Vxs[t, i]
                                    )
                                    for j in range(nx):
                                        Vxxs[t, i, j] = jnp.where(
                                            mrt, Vxx_new[i][j],
                                            Vxxs[t, i, j],
                                        )

                            for i in range(nu):
                                infdu = jnp.maximum(infdu, jnp.abs(Qu_c[i]))
                                stepn = jnp.maximum(stepn, jnp.abs(k_u[i]))
                            for i in range(m):
                                infpr = jnp.maximum(infpr, jnp.abs(pr[i]))
                                infcomp = jnp.maximum(
                                    infcomp, jnp.abs(comp[i])
                                )

                            return (
                                tuple(Vx_new),
                                tuple(tuple(r) for r in Vxx_new),
                                dv0 + dv0s,
                                dv1 + dv1s,
                                infdu, infpr, infcomp, stepn,
                                okl * jnp.where(pd_ok, ones, zeros),
                                t - _i32(1),
                            )

                        if pT == 0:
                            init = (
                                tuple(VxT),
                                tuple(tuple(r) for r in VxxT),
                                zeros, zeros, zeros, infpr_T, infcomp_T,
                                zeros, ones, jnp.asarray(N - 1, jnp.int32),
                            )
                            out = jax.lax.fori_loop(
                                _i32(0), _i32(N), bstep, init
                            )
                            (dv0, dv1, infdu, infpr, infcomp, stepn,
                             okl) = out[2:-1]
                        else:
                            # ---- terminal-equality reduced-LQR regime ----
                            # (_backward_terminal_eq, ipddp_solver.cpp:
                            # 478-639 + 1121-1351). The driver runs p+1
                            # perturbed-q LQR variants; K and P are shared
                            # across variants (identical quadratic data),
                            # so the kernel runs ONE base sweep that also
                            # accumulates the closed-loop sensitivity
                            # Gramian W = sum_t Phi(N,t+1) B Quu^{-1} B^T
                            # Phi(N,t+1)^T — the variant linear terms obey
                            # the adjoint recursion dp(t) = A_cl^T dp(t+1),
                            # so the sensitivity matrix is S = dx_N/dlam =
                            # -W H^T — then solves the driver's SVD-floored
                            # 5-scale least-squares ladder for the
                            # multiplier step and re-runs the sweep once
                            # with the combined terminal linear term.
                            hTb = h_of(xN)
                            for i in range(pT):
                                infpr_T = jnp.maximum(
                                    infpr_T, jnp.abs(hTb[i])
                                )
                            q_base = [
                                VxT[i]
                                + sum(HTl[r][i] * LteO[r] for r in range(pT))
                                for i in range(nx)
                            ]

                            def te_stage(t):
                                x = [Xo[t, i] for i in range(nx)]
                                u = [Uo[t, i] for i in range(nu)]
                                Fx, Fu = deriv_f(x, u, p)
                                A = [
                                    [
                                        (ones if i == j else zeros)
                                        + dt * Fx[i][j]
                                        for j in range(nx)
                                    ]
                                    for i in range(nx)
                                ]
                                Bm = [[dt * Fu[i][j] for j in range(nu)]
                                      for i in range(nx)]
                                lx, lu, lxx, luu, lux = run_derivs(x, u, t)
                                y = [Yo[t, i] for i in range(m)]
                                s = [So[t, i] for i in range(m)]
                                g = box_g(x, u)
                                Qs, qs, Rs, rs, Ms, pr, comp = (
                                    ipddp_te_stage_lanes(
                                        lx, lu, lxx, luu, lux, y, s, g,
                                        stack_Gx(x), Gu_c, mu, regl,
                                        nx, nu, m, cap,
                                    )
                                )
                                return A, Bm, Qs, qs, Rs, rs, Ms, pr, comp

                            def sweep1(_s, carry):
                                t = carry[-1]
                                Vx = list(carry[0])
                                Vxx = [list(r) for r in carry[1]]
                                Phi = [list(r) for r in carry[2]]
                                W = [list(r) for r in carry[3]]
                                infpr, infcomp, okl = carry[4:-1]
                                (A, Bm, Qs, qs, Rs, rs, Ms, pr,
                                 comp) = te_stage(t)
                                (k, K, p_new, P, Qu, Hinv, pd_ok) = (
                                    ipddp_te_lqr_step_lanes(
                                        A, Bm, Qs, qs, Rs, rs, Ms, Vx, Vxx,
                                        nx, nu,
                                    )
                                )
                                for i in range(nu):
                                    ko[t, i] = jnp.where(mrt, k[i], ko[t, i])
                                    for j in range(nx):
                                        Ko[t, i, j] = jnp.where(
                                            mrt, K[i][j], Ko[t, i, j]
                                        )
                                FB = _matmul(Phi, Bm, nx, nx, nu)
                                FBH = _matmul(FB, Hinv, nx, nu, nu)
                                Wc = _matmul(
                                    FBH, _transpose(FB, nx, nu), nx, nu, nx
                                )
                                W_new = [
                                    [W[i][j] + Wc[i][j] for j in range(nx)]
                                    for i in range(nx)
                                ]
                                BK = _matmul(Bm, K, nx, nu, nx)
                                Acl = [
                                    [A[i][j] + BK[i][j] for j in range(nx)]
                                    for i in range(nx)
                                ]
                                Phi_new = _matmul(Phi, Acl, nx, nx, nx)
                                for i in range(m):
                                    infpr = jnp.maximum(
                                        infpr, jnp.abs(pr[i])
                                    )
                                    infcomp = jnp.maximum(
                                        infcomp, jnp.abs(comp[i])
                                    )
                                # _solve_sequential_lqr's ok includes
                                # finiteness of K/k/P/p, not just PD.
                                okl = okl * jnp.where(pd_ok, ones, zeros)
                                for i in range(nu):
                                    okl = okl * fin(k[i])
                                    for j in range(nx):
                                        okl = okl * fin(K[i][j])
                                for i in range(nx):
                                    okl = okl * fin(p_new[i])
                                    for j in range(nx):
                                        okl = okl * fin(P[i][j])
                                return (
                                    tuple(p_new),
                                    tuple(tuple(r) for r in P),
                                    tuple(tuple(r) for r in Phi_new),
                                    tuple(tuple(r) for r in W_new),
                                    infpr, infcomp, okl,
                                    t - _i32(1),
                                )

                            eye_l = tuple(
                                tuple(ones if i == j else zeros
                                      for j in range(nx))
                                for i in range(nx)
                            )
                            zero_m = tuple(
                                tuple(zeros for _ in range(nx))
                                for _ in range(nx)
                            )
                            out1 = jax.lax.fori_loop(
                                _i32(0), _i32(N), sweep1,
                                (tuple(q_base),
                                 tuple(tuple(r) for r in VxxT),
                                 eye_l, zero_m, infpr_T, infcomp_T, ones,
                                 jnp.asarray(N - 1, jnp.int32)),
                            )
                            W_fin = [list(r) for r in out1[3]]
                            infpr, infcomp, okl = out1[4:-1]

                            # Base-variant linear rollout -> dx_N
                            # (_rollout_linear with the base gains).
                            def base_roll(_s, carry):
                                dx = list(carry[0])
                                t = carry[1]
                                x = [Xo[t, i] for i in range(nx)]
                                u = [Uo[t, i] for i in range(nu)]
                                Fx, Fu = deriv_f(x, u, p)
                                du = [
                                    ko[t, i]
                                    + sum(Ko[t, i, j] * dx[j]
                                          for j in range(nx))
                                    for i in range(nu)
                                ]
                                dx_next = [
                                    dx[i]
                                    + dt * sum(Fx[i][j] * dx[j]
                                               for j in range(nx))
                                    + sum(dt * Fu[i][j] * du[j]
                                          for j in range(nu))
                                    for i in range(nx)
                                ]
                                return (tuple(dx_next), t + _i32(1))

                            outr = jax.lax.fori_loop(
                                _i32(0), _i32(N), base_roll,
                                (tuple(zeros for _ in range(nx)),
                                 jnp.asarray(0, jnp.int32)),
                            )
                            xT0 = list(outr[0])

                            # Tiny least squares for the multiplier step
                            # (ipddp_solver.cpp:556-617): S = -W H^T,
                            # A_small = H S, SVD floor + 5-scale ladder.
                            WHt = [
                                [sum(W_fin[a][b] * HTl[r][b]
                                     for b in range(nx))
                                 for r in range(pT)]
                                for a in range(nx)
                            ]
                            Asm = [
                                [-sum(HTl[i][a] * WHt[a][r]
                                      for a in range(nx))
                                 for r in range(pT)]
                                for i in range(pT)
                            ]
                            rhs = [
                                -hTb[i]
                                - sum(HTl[i][j] * xT0[j] for j in range(nx))
                                for i in range(pT)
                            ]
                            AtA = [
                                [sum(Asm[k2][i] * Asm[k2][j]
                                     for k2 in range(pT))
                                 for j in range(pT)]
                                for i in range(pT)
                            ]
                            Atb = [
                                sum(Asm[k2][i] * rhs[k2] for k2 in range(pT))
                                for i in range(pT)
                            ]
                            trace = zeros
                            for i in range(pT):
                                trace = trace + AtA[i][i]
                            trace_term = jnp.where(
                                trace > 1.0, trace / float(pT), ones
                            )
                            mu_pow = jnp.exp(
                                cfg.jac_reg_exp
                                * jnp.log(jnp.maximum(mu, 1e-300))
                            )
                            base_floor = jnp.maximum(
                                zeros + 1e-10, cfg.jac_reg_val * mu_pow
                            )
                            reg0_l = jnp.maximum(
                                base_floor, 1e-6 * trace_term
                            )
                            max_sv, min_sv = _jacobi_sv_minmax(
                                Asm, pT, zeros, ones
                            )
                            svd_reg = jnp.maximum(
                                1e-8 * max_sv - min_sv, 0.0
                            )
                            reg_base_l = jnp.maximum(reg0_l, svd_reg)
                            rhs_norm = jnp.sqrt(
                                sum(r * r for r in rhs)
                            )
                            lambda_cap = 100.0 * (1.0 + rhs_norm)
                            best_lam = [zeros] * pT
                            best_res = zeros + jnp.inf
                            for scale in (1.0, 10.0, 100.0, 1e3, 1e4):
                                reg_i = jnp.maximum(
                                    reg_base_l * scale, 1e-12
                                )
                                shifted = [
                                    [AtA[i][j] + (reg_i if i == j else zeros)
                                     for j in range(pT)]
                                    for i in range(pT)
                                ]
                                lam, chol_ok = _chol_solve_lanes(
                                    shifted, Atb, pT, zeros, ones
                                )
                                norm = jnp.sqrt(
                                    sum(l * l for l in lam)
                                )
                                shrink = lambda_cap / jnp.maximum(
                                    norm, 1e-12
                                )
                                lam = [
                                    jnp.where(norm > lambda_cap,
                                              l * shrink, l)
                                    for l in lam
                                ]
                                res_v = [
                                    sum(Asm[i][j] * lam[j]
                                        for j in range(pT)) - rhs[i]
                                    for i in range(pT)
                                ]
                                residual = jnp.sqrt(
                                    sum(r * r for r in res_v)
                                )
                                okf = jnp.where(chol_ok, ones, zeros)
                                for l in lam:
                                    okf = okf * fin(l)
                                okf = okf * fin(residual)
                                residual = jnp.where(
                                    okf > 0.5, residual, zeros + jnp.inf
                                )
                                # strict <: first-min wins (argmin parity)
                                better = residual < best_res
                                best_res = jnp.where(
                                    better, residual, best_res
                                )
                                best_lam = [
                                    jnp.where(better, lam[i], best_lam[i])
                                    for i in range(pT)
                                ]
                            best_lam = [
                                jnp.where(jnp.isfinite(best_res),
                                          best_lam[i], zeros)
                                for i in range(pT)
                            ]
                            for i in range(pT):
                                dLamS[i] = jnp.where(
                                    mrt, best_lam[i], dLamS[i]
                                )

                            # Combined sweep: terminal linear term
                            # q_comb = q_base + H^T best_lambda
                            # (gain recombination :619-634 — linear in the
                            # terminal q, so one re-run replaces the
                            # combination).
                            q_comb = [
                                q_base[i]
                                + sum(HTl[r][i] * best_lam[r]
                                      for r in range(pT))
                                for i in range(nx)
                            ]
                            if track_costates:
                                for i in range(nx):
                                    Vxs[N, i] = jnp.where(
                                        mrt, q_comb[i], Vxs[N, i]
                                    )
                                    for j in range(nx):
                                        Vxxs[N, i, j] = jnp.where(
                                            mrt, VxxT[i][j], Vxxs[N, i, j]
                                        )

                            def sweep2(_s, carry):
                                t = carry[-1]
                                Vx = list(carry[0])
                                Vxx = [list(r) for r in carry[1]]
                                infdu, stepn, okl2 = carry[2:-1]
                                (A, Bm, Qs, qs, Rs, rs, Ms, _pr,
                                 _comp) = te_stage(t)
                                (k, K, p_new, P, Qu, _Hinv, pd_ok) = (
                                    ipddp_te_lqr_step_lanes(
                                        A, Bm, Qs, qs, Rs, rs, Ms, Vx, Vxx,
                                        nx, nu,
                                    )
                                )
                                for i in range(nu):
                                    ko[t, i] = jnp.where(mrt, k[i], ko[t, i])
                                    for j in range(nx):
                                        Ko[t, i, j] = jnp.where(
                                            mrt, K[i][j], Ko[t, i, j]
                                        )
                                if track_costates:
                                    for i in range(nx):
                                        Vxs[t, i] = jnp.where(
                                            mrt, p_new[i], Vxs[t, i]
                                        )
                                        for j in range(nx):
                                            Vxxs[t, i, j] = jnp.where(
                                                mrt, P[i][j], Vxxs[t, i, j]
                                            )
                                for i in range(nu):
                                    infdu = jnp.maximum(
                                        infdu, jnp.abs(Qu[i])
                                    )
                                    stepn = jnp.maximum(
                                        stepn, jnp.abs(k[i])
                                    )
                                okl2 = okl2 * jnp.where(pd_ok, ones, zeros)
                                for i in range(nu):
                                    okl2 = okl2 * fin(k[i])
                                    for j in range(nx):
                                        okl2 = okl2 * fin(K[i][j])
                                for i in range(nx):
                                    okl2 = okl2 * fin(p_new[i])
                                    for j in range(nx):
                                        okl2 = okl2 * fin(P[i][j])
                                return (
                                    tuple(p_new),
                                    tuple(tuple(r) for r in P),
                                    infdu, stepn, okl2,
                                    t - _i32(1),
                                )

                            out2 = jax.lax.fori_loop(
                                _i32(0), _i32(N), sweep2,
                                (tuple(q_comb),
                                 tuple(tuple(r) for r in VxxT),
                                 zeros, zeros, ones,
                                 jnp.asarray(N - 1, jnp.int32)),
                            )
                            infdu, stepn, okl2 = out2[2:-1]
                            okl = okl * okl2
                            # The te regime reports dV = 0
                            # (_backward_terminal_eq returns zeros(2)).
                            dv0 = zeros
                            dv1 = zeros

                        okb = okl > 0.5
                        reg_next = jnp.where(
                            okb, regl,
                            jnp.minimum(regl * cfg.reg_uf, cfg.reg_max),
                        )
                        limit = (~okb) & (reg_next >= cfg.reg_max)

                        sc[_REG] = jnp.where(mrt, reg_next, sc[_REG])
                        sc[_DV0] = jnp.where(mrt, dv0, sc[_DV0])
                        sc[_DV1] = jnp.where(mrt, dv1, sc[_DV1])
                        sc[_INFDU] = jnp.where(mrt, infdu, sc[_INFDU])
                        sc[_INFPR] = jnp.where(mrt, infpr, sc[_INFPR])
                        sc[_INFCOMP] = jnp.where(mrt, infcomp, sc[_INFCOMP])
                        sc[_STEPN] = jnp.where(mrt, stepn, sc[_STEPN])
                        sc[_BP_LIMIT] = jnp.where(
                            mrt, jnp.where(limit, ones, zeros), sc[_BP_LIMIT]
                        )
                        sc[_BP_DONE] = jnp.where(
                            mrt, jnp.where(okb | limit, ones, zeros),
                            sc[_BP_DONE],
                        )

                    return c2

                jax.lax.fori_loop(_i32(0), _i32(cfg.bp_bound), bp_attempt, 0)

                bpl = sc[_BP_LIMIT] > 0.5
                mab = active & (~bpl)

                # ---- early convergence (checkEarlyConvergence) ----
                tol_e = jnp.maximum(zeros + cfg.tolerance, cfg.btm * mu)
                accepted_step = jnp.abs(sc[_APR]) * sc[_STEPN]
                early = (
                    (sc[_INFPR] < tol_e)
                    & (sc[_INFDU] < tol_e)
                    & (sc[_INFCOMP] < tol_e)
                    & (accepted_step < cfg.tolerance * 10.0)
                )
                sc[_EARLY] = jnp.where(early, ones, zeros)

                # ---- fraction-to-boundary max step sizes ----
                # (computeMaxStepSizes via the Newton-step rollout,
                # ipddp_solver.cpp:1511-1566 + :2939-2988). Gains for the
                # dual/slack rows are re-derived from the stored control
                # gains via the shared closed forms.
                tau = jnp.maximum(zeros + cfg.min_ftb, 1.0 - mu)

                def ms_body(_s, carry):
                    dx = list(carry[0])
                    a_pr, a_du, t = carry[1], carry[2], carry[3]
                    x = [Xo[t, i] for i in range(nx)]
                    u = [Uo[t, i] for i in range(nu)]
                    y = [Yo[t, i] for i in range(m)]
                    s = [So[t, i] for i in range(m)]
                    g = box_g(x, u)
                    s_safe, sigma, pr, comp, rhat, sir = ipddp_condense_lanes(
                        y, s, g, mu, m, cap
                    )
                    k_u = [ko[t, i] for i in range(nu)]
                    K_u = [[Ko[t, i, j] for j in range(nx)]
                           for i in range(nu)]
                    k_y, K_y, k_s, K_s = ipddp_path_gain_lanes(
                        y, s_safe, sigma, pr, rhat, stack_Gx(x), Gu_c,
                        k_u, K_u, nx, nu, m, cap,
                    )
                    for i in range(m):
                        dS_i = k_s[i] + sum(
                            K_s[i][j] * dx[j] for j in range(nx)
                        )
                        dY_i = _lclip(
                            k_y[i] + sum(K_y[i][j] * dx[j] for j in range(nx)),
                            -cap, cap,
                        )
                        r_pr = -tau * s[i] / jnp.where(dS_i < 0.0, dS_i, -ones)
                        a_pr = jnp.minimum(
                            a_pr, jnp.where(dS_i < 0.0, r_pr, zeros + jnp.inf)
                        )
                        r_du = -tau * y[i] / jnp.where(dY_i < 0.0, dY_i, -ones)
                        a_du = jnp.minimum(
                            a_du, jnp.where(dY_i < 0.0, r_du, zeros + jnp.inf)
                        )
                    du = [
                        k_u[i] + sum(K_u[i][j] * dx[j] for j in range(nx))
                        for i in range(nu)
                    ]
                    Fx, Fu = deriv_f(x, u, p)
                    dx_next = [
                        dx[i] + dt * sum(Fx[i][j] * dx[j] for j in range(nx))
                        + sum(
                            (dt * Fu[i][j]) * du[j] for j in range(nu)
                        )
                        for i in range(nx)
                    ]
                    return (tuple(dx_next), a_pr, a_du, t + _i32(1))

                dx_last_t, a_pr_m, a_du_m, _ = jax.lax.fori_loop(
                    _i32(0), _i32(N), ms_body,
                    ((zeros,) * nx, ones, ones, jnp.asarray(0, jnp.int32)),
                )
                if mT:
                    # Terminal slack/dual Newton steps from the linear
                    # rollout's dx_N (_terminal_ineq_steps,
                    # ipddp_solver.cpp:1315-1345), folded into the
                    # fraction-to-boundary caps.
                    xNm = [Xo[N, i] for i in range(nx)]
                    gTm = gT_of(xNm)
                    mu_floor_T = jnp.maximum(mu * 1e-3, _EPS_SLACK)
                    for i in range(mT):
                        sT = STo[i]
                        yT = YTo[i]
                        dS_T = -(gTm[i] + sT) - sum(
                            AT[i][j] * dx_last_t[j] for j in range(nx)
                        )
                        s_safe_T = jnp.maximum(sT, mu_floor_T)
                        ratio_T = _lclip(yT / s_safe_T, 0.0, cap)
                        affine_T = _lclip(
                            -(sT * yT - mu) / s_safe_T, -cap, cap
                        )
                        dY_T = _lclip(affine_T - ratio_T * dS_T, -cap, cap)
                        r_pr = -tau * sT / jnp.where(
                            dS_T < 0.0, dS_T, -ones
                        )
                        a_pr_m = jnp.minimum(
                            a_pr_m,
                            jnp.where(dS_T < 0.0, r_pr, zeros + jnp.inf),
                        )
                        r_du = -tau * yT / jnp.where(
                            dY_T < 0.0, dY_T, -ones
                        )
                        a_du_m = jnp.minimum(
                            a_du_m,
                            jnp.where(dY_T < 0.0, r_du, zeros + jnp.inf),
                        )
                sc[_APRMAX] = _lclip(a_pr_m, 0.0, 1.0)
                sc[_ADUMAX] = _lclip(a_du_m, 0.0, 1.0)

                # ---- sequential first-success filter line search ----
                participate = mab & (~early)
                sc[_LS_FOUND] = jnp.where(participate, zeros, ones)
                sc[_LS_OK] = zeros
                sc[_ALPHA_CUR] = zeros + cfg.a0

                def ls_iter(_i, c3):
                    pending_any = jnp.max(ones - sc[_LS_FOUND]) > 0.5

                    @pl.when(pending_any)
                    def _rollout():
                        alpha = sc[_ALPHA_CUR]
                        mnf = sc[_LS_FOUND] < 0.5
                        a_pr = jnp.minimum(alpha, sc[_APRMAX])
                        a_du = jnp.minimum(alpha, sc[_ADUMAX])

                        def fstep(_s, carry):
                            x = list(carry[0])
                            (J, sumlog, th, infpr, maxys, minys,
                             feas) = carry[1:-1]
                            t = carry[-1]
                            tp1 = t + _i32(1)
                            dx = [x[i] - Xo[t, i] for i in range(nx)]
                            if track_costates:
                                lam_new = [
                                    Lo[t, i] + a_pr * Vxs[t, i]
                                    + sum(Vxxs[t, i, j] * dx[j]
                                          for j in range(nx))
                                    for i in range(nx)
                                ]
                            y = [Yo[t, i] for i in range(m)]
                            s = [So[t, i] for i in range(m)]
                            g_nom = box_g(
                                [Xo[t, i] for i in range(nx)],
                                [Uo[t, i] for i in range(nu)],
                            )
                            (s_safe, sigma, pr, comp, rhat,
                             sir) = ipddp_condense_lanes(y, s, g_nom, mu, m,
                                                         cap)
                            k_u = [ko[t, i] for i in range(nu)]
                            K_u = [[Ko[t, i, j] for j in range(nx)]
                                   for i in range(nu)]
                            x_nom = [Xo[t, i] for i in range(nx)]
                            k_y, K_y, k_s, K_s = ipddp_path_gain_lanes(
                                y, s_safe, sigma, pr, rhat,
                                stack_Gx(x_nom), Gu_c,
                                k_u, K_u, nx, nu, m, cap,
                            )
                            s_new = [
                                s[i] + a_pr * k_s[i]
                                + sum(K_s[i][j] * dx[j] for j in range(nx))
                                for i in range(m)
                            ]
                            y_new = [
                                y[i] + a_du * k_y[i]
                                + sum(K_y[i][j] * dx[j] for j in range(nx))
                                for i in range(m)
                            ]
                            u = [
                                Uo[t, i] + a_pr * k_u[i]
                                + sum(K_u[i][j] * dx[j] for j in range(nx))
                                for i in range(nu)
                            ]
                            J = J + run_cost(x, u, t)
                            g_new = box_g(x, u)
                            # Fraction-to-boundary re-check with the
                            # knife-edge slop (solvers/base.py ftb_ok — the
                            # lane form must match it exactly so kernel and
                            # driver resolve boundary ties identically).
                            omt = 1.0 - tau
                            eps = jnp.finfo(tau.dtype).eps
                            if latch_traced and cfg.soc_auto:
                                # Armed slack SOC re-closure (ipddp
                                # _forward_pass): s := -g at the trial
                                # point where fraction-to-boundary allows,
                                # BEFORE the feasibility re-check.
                                soc_act = (
                                    (sc[_SOC_ON] > 0.5)
                                    & (sc[_SOC_ARMED] > 0.5)
                                )
                                for i in range(m):
                                    s_soc = zeros - g_new[i]
                                    slop = 16.0 * eps * (
                                        1.0 + jnp.abs(s[i]) + jnp.abs(s_soc)
                                    )
                                    okc = (
                                        (s_soc > 0.0)
                                        & (s_soc >= omt * s[i] - slop)
                                        & soc_act
                                    )
                                    s_new[i] = jnp.where(
                                        okc, s_soc, s_new[i]
                                    )
                            for i in range(m):
                                slop_s = 16.0 * eps * (
                                    1.0 + jnp.abs(s[i]) + jnp.abs(s_new[i])
                                )
                                feas = feas * jnp.where(
                                    (s_new[i] > 0.0)
                                    & (s_new[i] >= omt * s[i] - slop_s),
                                    ones, zeros,
                                )
                                slop_y = 16.0 * eps * (
                                    1.0 + jnp.abs(y[i]) + jnp.abs(y_new[i])
                                )
                                feas = feas * jnp.where(
                                    (y_new[i] > 0.0)
                                    & (y_new[i] >= omt * y[i] - slop_y),
                                    ones, zeros,
                                )
                                feas = feas * fin(s_new[i]) * fin(y_new[i])
                                sumlog = sumlog + jnp.log(
                                    jnp.maximum(s_new[i], _EPS_SLACK)
                                )
                                r = g_new[i] + s_new[i]
                                th = th + (
                                    r * r if cfg.theta_l2 else jnp.abs(r)
                                )
                                infpr = jnp.maximum(infpr, jnp.abs(r))
                                ys = y_new[i] * s_new[i]
                                maxys = jnp.maximum(maxys, ys)
                                minys = jnp.minimum(minys, ys)
                            x_next = _integrate_lane(
                                lane_f, integrator, x, u, p, dt
                            )
                            for i in range(nx):
                                feas = feas * fin(x_next[i])
                                if track_costates:
                                    feas = feas * fin(lam_new[i])
                                    Lc[t, i] = jnp.where(
                                        mnf, lam_new[i], Lc[t, i]
                                    )
                                Xc[tp1, i] = jnp.where(
                                    mnf, x_next[i], Xc[tp1, i]
                                )
                            for i in range(nu):
                                feas = feas * fin(u[i])
                                Uc[t, i] = jnp.where(mnf, u[i], Uc[t, i])
                            for i in range(m):
                                Yc[t, i] = jnp.where(mnf, y_new[i], Yc[t, i])
                                Sc[t, i] = jnp.where(mnf, s_new[i], Sc[t, i])
                            return (tuple(x_next), J, sumlog, th, infpr,
                                    maxys, minys, feas, tp1)

                        x0l = tuple(Xo[0, i] for i in range(nx))
                        out = jax.lax.fori_loop(
                            _i32(0), _i32(N), fstep,
                            (x0l, zeros, zeros, zeros, zeros,
                             zeros - jnp.inf, zeros + jnp.inf, ones,
                             jnp.asarray(0, jnp.int32)),
                        )
                        xN = list(out[0])
                        (J, sumlog, th, infpr, maxys, minys,
                         feas) = out[1:-1]
                        J = J + term_cost(xN)
                        dxN = [xN[i] - Xo[N, i] for i in range(nx)]
                        if track_costates:
                            lamN = [
                                Lo[N, i] + a_pr * Vxs[N, i]
                                + sum(Vxxs[N, i, j] * dxN[j]
                                      for j in range(nx))
                                for i in range(nx)
                            ]
                            for i in range(nx):
                                feas = feas * fin(lamN[i])
                                Lc[N, i] = jnp.where(mnf, lamN[i], Lc[N, i])

                        if mT:
                            # Terminal-inequality slack/dual trial updates
                            # (ipddp_solver.cpp:1667-1725 and the XLA
                            # driver's _forward_pass): gains built at the
                            # OLD terminal state, applied with the real
                            # dx_N.
                            xN_old = [Xo[N, i] for i in range(nx)]
                            gT0l = gT_of(xN_old)
                            gTn = gT_of(xN)
                            mu_floor_T = jnp.maximum(mu * 1e-3, _EPS_SLACK)
                            eps_T = jnp.finfo(tau.dtype).eps
                            omt_T = 1.0 - tau
                            for i in range(mT):
                                sT = STo[i]
                                yT = YTo[i]
                                k_s_T = -(gT0l[i] + sT)
                                # K_s_T = -A_T, so K_s_T @ dxN = -A dxN.
                                AdxN = sum(
                                    AT[i][j] * dxN[j] for j in range(nx)
                                )
                                sT_new = sT + a_pr * k_s_T - AdxN
                                s_safe_T = jnp.maximum(sT, mu_floor_T)
                                r_d = yT * sT - mu
                                dual_ratio = _lclip(
                                    yT / s_safe_T, 0.0, cap
                                )
                                k_y_T = _lclip(
                                    (-r_d - yT * k_s_T) / s_safe_T,
                                    -cap, cap,
                                )
                                # K_y_T = -dual_ratio * K_s_T =
                                # dual_ratio * A_T.
                                yT_new = (
                                    yT + a_du * k_y_T + dual_ratio * AdxN
                                )
                                s_floor = jnp.maximum(
                                    omt_T * sT, mu_floor_T
                                )
                                slop_sT = 16.0 * eps_T * (
                                    1.0 + jnp.abs(sT) + jnp.abs(sT_new)
                                )
                                feas = feas * jnp.where(
                                    (sT_new > 0.0)
                                    & (sT_new >= s_floor - slop_sT),
                                    ones, zeros,
                                )
                                slop_yT = 16.0 * eps_T * (
                                    1.0 + jnp.abs(yT) + jnp.abs(yT_new)
                                )
                                feas = feas * jnp.where(
                                    (yT_new > 0.0)
                                    & (yT_new >= omt_T * yT - slop_yT),
                                    ones, zeros,
                                )
                                feas = feas * fin(sT_new) * fin(yT_new)
                                sumlog = sumlog + jnp.log(
                                    jnp.maximum(sT_new, _EPS_SLACK)
                                )
                                r = gTn[i] + sT_new
                                th = th + (
                                    r * r if cfg.theta_l2 else jnp.abs(r)
                                )
                                infpr = jnp.maximum(infpr, jnp.abs(r))
                                ysT = yT_new * sT_new
                                maxys = jnp.maximum(maxys, ysT)
                                minys = jnp.minimum(minys, ysT)
                                STc[i] = jnp.where(mnf, sT_new, STc[i])
                                YTc[i] = jnp.where(mnf, yT_new, YTc[i])

                        lam_h = zeros
                        if pT:
                            # Terminal-equality trial: multiplier step
                            # lam += a_pr * dLambda, |h_T| rows into
                            # theta/inf_pr, lam.h_T into the merit
                            # (_forward_pass has_te + _barrier_merit).
                            hTn = h_of(xN)
                            for i in range(pT):
                                lte_n = LteO[i] + a_pr * dLamS[i]
                                feas = feas * fin(lte_n)
                                r = hTn[i]
                                th = th + (
                                    r * r if cfg.theta_l2 else jnp.abs(r)
                                )
                                infpr = jnp.maximum(infpr, jnp.abs(r))
                                lam_h = lam_h + lte_n * r

                        phi = J - mu * sumlog + lam_h
                        theta_new = jnp.maximum(
                            jnp.sqrt(th) if cfg.theta_l2 else th, infpr
                        )
                        infcomp = jnp.maximum(maxys - mu, mu - minys)
                        feas = (
                            feas * fin(phi) * fin(theta_new) * fin(infpr)
                            * fin(infcomp)
                        )

                        # Filter acceptance (ipddp_solver.cpp:1784-1839).
                        fm = [sc[_F_M0 + i] for i in range(_F_CAP)]
                        fv = [sc[_F_V0 + i] for i in range(_F_CAP)]
                        fval = [sc[_F_OK0 + i] for i in range(_F_CAP)]
                        f_mf, f_cv, f_ne = _filter_back(fm, fv, fval, zeros)
                        cv_old = jnp.where(f_ne, f_cv, zeros)
                        hvr = jnp.where(f_ne, f_cv, sc[_FTHETA])
                        merit_old = sc[_MERIT]
                        expected = a_pr * sc[_DV0]

                        br1 = theta_new > cfg.max_viol
                        acc1 = theta_new < (1.0 - cfg.vat) * hvr
                        br2 = (
                            jnp.maximum(theta_new, cv_old) < cfg.mvfac
                        ) & (expected < 0.0)
                        acc2 = phi < merit_old + cfg.armijo * expected
                        acc3 = (
                            phi < merit_old - cfg.mat * theta_new
                        ) | (theta_new < (1.0 - cfg.vat) * cv_old)
                        # Select with FLOAT operands, not bool: a select of
                        # i1 vectors lowers to an i8 select + an
                        # arith.trunci i8->i1 that the Mosaic TPU backend
                        # rejects ("Unsupported target bitwidth for
                        # truncation") — caught on hardware; the
                        # export-based lowering test only runs the MLIR
                        # verifier, not the backend.
                        accept = jnp.where(
                            br1, jnp.where(acc1, ones, zeros),
                            jnp.where(br2, jnp.where(acc2, ones, zeros),
                                      jnp.where(acc3, ones, zeros)))
                        take = (feas > 0.5) & (accept > 0.5) & mnf

                        sc[_TJ] = jnp.where(take, J, sc[_TJ])
                        sc[_TMERIT] = jnp.where(take, phi, sc[_TMERIT])
                        sc[_TTHETA] = jnp.where(take, theta_new, sc[_TTHETA])
                        sc[_TINFPR] = jnp.where(take, infpr, sc[_TINFPR])
                        sc[_TMAXYS] = jnp.where(take, maxys, sc[_TMAXYS])
                        sc[_TMINYS] = jnp.where(take, minys, sc[_TMINYS])
                        sc[_TSUMLOG] = jnp.where(take, sumlog, sc[_TSUMLOG])
                        sc[_TLAMH] = jnp.where(take, lam_h, sc[_TLAMH])
                        sc[_TAPR] = jnp.where(take, a_pr, sc[_TAPR])
                        sc[_TADU] = jnp.where(take, a_du, sc[_TADU])
                        sc[_LS_OK] = jnp.where(take, ones, sc[_LS_OK])
                        sc[_LS_FOUND] = jnp.where(take, ones, sc[_LS_FOUND])
                        a_next = alpha * cfg.a_r
                        sc[_ALPHA_CUR] = jnp.where(
                            a_next < cfg.a_min, zeros + cfg.a_min, a_next
                        )

                    return c3

                jax.lax.fori_loop(_i32(0), _i32(cfg.n_alpha), ls_iter, 0)

                # ---- commit / fail / early / bp-limit ----
                early_m = sc[_EARLY] > 0.5
                participate2 = mab & (~early_m)
                fp_ok = sc[_LS_OK] > 0.5
                commit_m = participate2 & fp_ok
                fail_m = participate2 & (~fp_ok)

                def copy_body(_s, t):
                    tp1 = t + _i32(1)
                    for i in range(nx):
                        Xo[tp1, i] = jnp.where(commit_m, Xc[tp1, i],
                                               Xo[tp1, i])
                        if track_costates:
                            Lo[t, i] = jnp.where(
                                commit_m, Lc[t, i], Lo[t, i]
                            )
                    for i in range(nu):
                        Uo[t, i] = jnp.where(commit_m, Uc[t, i], Uo[t, i])
                    for i in range(m):
                        Yo[t, i] = jnp.where(commit_m, Yc[t, i], Yo[t, i])
                        So[t, i] = jnp.where(commit_m, Sc[t, i], So[t, i])
                    return tp1

                jax.lax.fori_loop(_i32(0), _i32(N), copy_body,
                                  jnp.asarray(0, jnp.int32))
                if track_costates:
                    for i in range(nx):
                        Lo[N, i] = jnp.where(commit_m, Lc[N, i], Lo[N, i])
                if mT:
                    for i in range(mT):
                        STo[i] = jnp.where(commit_m, STc[i], STo[i])
                        YTo[i] = jnp.where(commit_m, YTc[i], YTo[i])
                if pT:
                    for i in range(pT):
                        LteO[i] = jnp.where(
                            commit_m, LteO[i] + sc[_TAPR] * dLamS[i],
                            LteO[i],
                        )

                # Barrier schedule (updateBarrierParameters,
                # ipddp_solver.cpp:2548-2660) on committed lanes.
                mu_old = mu
                infcomp_trial = jnp.maximum(
                    sc[_TMAXYS] - mu_old, mu_old - sc[_TMINYS]
                )
                if cfg.adaptive:
                    kkt = jnp.maximum(
                        jnp.maximum(sc[_TINFPR], sc[_INFDU]), infcomp_trial
                    )
                    threshold = jnp.maximum(
                        cfg.mu_update_factor * mu_old, 2.0 * mu_old
                    )
                    ratio = kkt / jnp.maximum(mu_old, 1e-20)
                    factor = jnp.where(
                        ratio < 0.01,
                        zeros + 0.1 * cfg.mu_update_factor,
                        jnp.where(
                            ratio < 0.1,
                            zeros + 0.3 * cfg.mu_update_factor,
                            jnp.where(
                                ratio < 0.5,
                                zeros + 0.6 * cfg.mu_update_factor,
                                zeros + cfg.mu_update_factor,
                            ),
                        ),
                    )
                    factor = jnp.where(
                        mu_old > 1e-20, factor, zeros + cfg.mu_update_factor
                    )
                    linear = factor * mu_old
                    superlinear = jnp.exp(
                        cfg.mu_update_power * jnp.log(mu_old)
                    )
                    mu_cand = jnp.maximum(
                        jnp.minimum(linear, superlinear),
                        zeros + max(cfg.mu_min_value, cfg.tolerance / 100.0),
                    )
                    mu_new = jnp.where(kkt <= threshold, mu_cand, mu_old)
                else:
                    weighted_du = sc[_INFDU] * cfg.dual_weight
                    kkt = jnp.maximum(
                        jnp.maximum(sc[_TINFPR], weighted_du), infcomp_trial
                    )
                    linear = cfg.mu_update_factor * mu_old
                    superlinear = jnp.exp(
                        cfg.mu_update_power * jnp.log(mu_old)
                    )
                    mu_cand = jnp.maximum(
                        zeros + cfg.mu_min_value,
                        jnp.minimum(linear, superlinear),
                    )
                    mu_new = jnp.where(
                        kkt <= cfg.kappa_eps * mu_old, mu_cand, mu_old
                    )

                # Filter maintenance: insert (old-mu merit, committed theta),
                # prune past max size, reset (clear) on a mu decrease.
                ft_c = jnp.maximum(sc[_TTHETA], 1e-8)
                fm = [sc[_F_M0 + i] for i in range(_F_CAP)]
                fv = [sc[_F_V0 + i] for i in range(_F_CAP)]
                fval = [sc[_F_OK0 + i] for i in range(_F_CAP)]
                km, kv, kval = _filter_accept(
                    fm, fv, fval, sc[_TMERIT], ft_c, zeros, ones
                )
                size_kept = zeros
                for i in range(_F_CAP):
                    size_kept = size_kept + kval[i]
                pm, pv, pval = _filter_prune(km, kv, kval, zeros, ones)
                do_prune = size_kept > float(cfg.f_max)
                reset = (mu_new < mu_old) & (mu_new > 0.0)
                for i in range(_F_CAP):
                    mi = jnp.where(do_prune, pm[i], km[i])
                    vi = jnp.where(do_prune, pv[i], kv[i])
                    oki = jnp.where(do_prune, pval[i], kval[i])
                    if (mT or pT) and i == 0:
                        # With terminal constraints the mu-decrease reset
                        # re-seeds the cleared filter with the committed
                        # point (_update_barrier_and_filter: cleared gets
                        # (phi, filter_theta) when has_ti/has_te).
                        mi = jnp.where(reset, sc[_TMERIT], mi)
                        vi = jnp.where(reset, ft_c, vi)
                        oki = jnp.where(reset, ones, oki)
                    else:
                        mi = jnp.where(reset, zeros + jnp.inf, mi)
                        vi = jnp.where(reset, zeros + jnp.inf, vi)
                        oki = jnp.where(reset, zeros, oki)
                    sc[_F_M0 + i] = jnp.where(commit_m, mi, sc[_F_M0 + i])
                    sc[_F_V0 + i] = jnp.where(commit_m, vi, sc[_F_V0 + i])
                    sc[_F_OK0 + i] = jnp.where(commit_m, oki, sc[_F_OK0 + i])

                dJ = sc[_COST] - sc[_TJ]
                infcomp_new = jnp.maximum(
                    sc[_TMAXYS] - mu_new, mu_new - sc[_TMINYS]
                )
                merit_new = sc[_TJ] - mu_new * sc[_TSUMLOG] + sc[_TLAMH]
                reg_dec = jnp.maximum(sc[_REG] / cfg.reg_uf, cfg.reg_min)

                if latch_traced:
                    # Stall detector (solvers/ipddp.py commit path —
                    # stall_detector_update semantics): mu stuck OR no new
                    # best committed inf_pr, while inf_pr stays far from
                    # tolerance, counted consecutively on committed
                    # iterations; arm the latch (one-way) at the threshold.
                    far_c = sc[_TINFPR] > 100.0 * cfg.tolerance
                    mu_stuck = mu_new >= mu_old * (1.0 - 1e-12)
                    improved = sc[_TINFPR] < sc[_BESTPR] * (1.0 - 1e-3)
                    stalled = (
                        far_c & (mu_stuck | ~improved)
                        & (sc[_SOC_ARMED] < 0.5)
                    )
                    cnt_new = jnp.where(
                        stalled, sc[_STALLCNT] + 1.0, zeros
                    )
                    armed_new = jnp.where(
                        (sc[_SOC_ARMED] > 0.5)
                        | (cnt_new >= float(cfg.soc_stall)),
                        ones, zeros,
                    )
                    sc[_STALLCNT] = jnp.where(
                        commit_m, cnt_new, sc[_STALLCNT]
                    )
                    sc[_SOC_ARMED] = jnp.where(
                        commit_m, armed_new, sc[_SOC_ARMED]
                    )
                    sc[_BESTPR] = jnp.where(
                        commit_m,
                        jnp.minimum(sc[_BESTPR], sc[_TINFPR]),
                        sc[_BESTPR],
                    )

                # Convergence (checkConvergence, :1953-2025), barrier regime.
                tol2 = jnp.maximum(zeros + cfg.tolerance, cfg.btm * mu_new)
                conv_opt = (
                    (sc[_TINFPR] < tol2)
                    & (sc[_INFDU] < tol2)
                    & (infcomp_new < tol2)
                    & (sc[_STEPN] < cfg.tolerance * 10.0)
                )
                if cfg.acceptable_tolerance > 0:
                    sqrt_atol = math.sqrt(cfg.acceptable_tolerance)
                    bat = max(
                        cfg.mu_min_value * 100.0, cfg.tolerance / 10.0
                    )
                    acc_kkt = (
                        (sc[_TINFPR] < sqrt_atol)
                        & (sc[_INFDU] < sqrt_atol)
                        & (infcomp_new < sqrt_atol)
                    )
                    barrier_done = mu_new <= bat
                    it = sc[_IT]
                    conv_acc = acc_kkt & barrier_done & (
                        (
                            (it > 10.0)
                            & (jnp.abs(dJ) < cfg.acceptable_tolerance)
                        )
                        | (
                            (it >= 1.0)
                            & (sc[_STEPN] < cfg.tolerance * 10.0)
                            & (sc[_TINFPR] < 1e-4)
                        )
                    )
                else:
                    conv_acc = zeros > ones

                status_c = jnp.where(
                    conv_opt, zeros + _ST_OPTIMAL,
                    jnp.where(conv_acc, zeros + _ST_ACCEPTABLE, sc[_STATUS]),
                )
                done_c = conv_opt | conv_acc

                # Fail branch (handleForwardPassFailure, :2037-2082).
                # Terminal equalities escalate the regularization TWICE per
                # failure (_drive fail(): "(not no_barrier) and has_te").
                fail_uf = cfg.reg_uf * cfg.reg_uf if pT else cfg.reg_uf
                reg_fail = jnp.minimum(sc[_REG] * fail_uf, cfg.reg_max)
                limit_f = reg_fail >= cfg.reg_max
                if cfg.acceptable_tolerance > 0:
                    at_f = jnp.maximum(
                        zeros + math.sqrt(
                            max(cfg.acceptable_tolerance, cfg.tolerance)
                        ),
                        cfg.btm * mu_old,
                    )
                    acceptable_f = (
                        (sc[_INFPR] < at_f)
                        & (sc[_INFDU] < at_f)
                        & (sc[_INFCOMP] < at_f)
                    )
                else:
                    acceptable_f = zeros > ones
                status_f = jnp.where(
                    limit_f & acceptable_f, zeros + _ST_ACCEPTABLE,
                    jnp.where(limit_f, zeros + _ST_REG_LIMIT, sc[_STATUS]),
                )

                if latch_traced:
                    # solvers/ipddp.py fail path: an ARMED latch drops the
                    # SOC when the line search fails near-feasible (keep
                    # reg/status, retry); reg-limit far from feasibility
                    # with an un-armed latch arms it and retries from the
                    # initial regularization (restoration fallback).
                    drop_m = (
                        fail_m
                        & (sc[_SOC_ON] > 0.5)
                        & (sc[_SOC_ARMED] > 0.5)
                        & (sc[_INFPR] < 10.0 * cfg.tolerance)
                    ) if cfg.soc_auto else (fail_m & (ones < zeros))
                    arm_m = (
                        fail_m
                        & limit_f
                        & (sc[_SOC_ARMED] < 0.5)
                        & (sc[_INFPR] > 100.0 * cfg.tolerance)
                    )
                    sc[_SOC_ON] = jnp.where(drop_m, zeros, sc[_SOC_ON])
                    sc[_SOC_ARMED] = jnp.where(arm_m, ones, sc[_SOC_ARMED])
                    fail_keep = drop_m | arm_m
                else:
                    arm_m = fail_m & (ones < zeros)
                    fail_keep = arm_m

                # Scalar write-back, masked per branch.
                sc[_COST] = jnp.where(commit_m, sc[_TJ], sc[_COST])
                sc[_MERIT] = jnp.where(commit_m, merit_new, sc[_MERIT])
                sc[_FTHETA] = jnp.where(commit_m, ft_c, sc[_FTHETA])
                sc[_THETA] = jnp.where(
                    commit_m, jnp.maximum(ft_c, cfg.theta0_floor), sc[_THETA]
                )
                sc[_MU] = jnp.where(commit_m, mu_new, sc[_MU])
                sc[_INFPR] = jnp.where(commit_m, sc[_TINFPR], sc[_INFPR])
                sc[_INFCOMP] = jnp.where(commit_m, infcomp_new, sc[_INFCOMP])
                sc[_APR] = jnp.where(commit_m, sc[_TAPR], sc[_APR])
                sc[_ADU] = jnp.where(commit_m, sc[_TADU], sc[_ADU])
                sc[_REG] = jnp.where(
                    commit_m, reg_dec,
                    jnp.where(
                        arm_m, zeros + cfg.reg0,
                        jnp.where(
                            fail_m & (~fail_keep), reg_fail, sc[_REG]
                        ),
                    ),
                )

                mbpl = active & bpl
                mearly = mab & early_m
                fail_out = fail_m & (~fail_keep)
                sc[_STATUS] = jnp.where(
                    mbpl, zeros + _ST_REG_LIMIT,
                    jnp.where(
                        mearly, zeros + _ST_OPTIMAL,
                        jnp.where(
                            commit_m, status_c,
                            jnp.where(fail_out, status_f, sc[_STATUS]),
                        ),
                    ),
                )
                sc[_DONE] = jnp.where(
                    mbpl | mearly, ones,
                    jnp.where(
                        commit_m, jnp.where(done_c, ones, zeros),
                        jnp.where(
                            fail_out, jnp.where(limit_f, ones, zeros),
                            sc[_DONE],
                        ),
                    ),
                )

            return carry

        jax.lax.fori_loop(_i32(0), _i32(cfg.max_iterations), outer, 0)

        # --- emit stats (trajectories/duals/gains already live in outputs)
        st_ref[0] = sc[_COST]
        st_ref[1] = sc[_INFPR]
        st_ref[2] = sc[_INFDU]
        st_ref[3] = sc[_INFCOMP]
        st_ref[4] = sc[_MU]
        st_ref[5] = sc[_REG]
        st_ref[6] = sc[_APR]
        st_ref[7] = sc[_IT]
        st_ref[8] = sc[_STATUS]

    assert tile_b % 1024 == 0, tile_b
    tbs = tile_b // 128
    np_eff = max(n_params, 1)

    def call(X0, U0, Y0, S0, ku0, Ku0, L0, mu0, dtv, params, Q, R, Qf,
             goal, refs, lo, hi, sfv, st0=None, yt0=None, atm=None,
             btm=None, cp=None, ht=None, hbt=None, lte0=None,
             interpret=False):
        """Outputs: (X, U, k, K, Y, S, [Lambda], stats, [S_T, Y_T],
        [Lte]) — Lambda only with ``track_costates``; in GN mode
        Q/R/Qf/goal/refs are ignored and ``cp`` carries the cost
        parameters; ``ht/hbt/lte0`` are the linear terminal-equality rows,
        targets and initial multipliers when ``pT > 0``."""
        Btot = X0.shape[-1]
        assert Btot % tile_b == 0, (Btot, tile_b)
        grid = (Btot // tile_b,)
        dtype = X0.dtype
        rows = Btot // 128

        def fold(v):
            return v.reshape(*v.shape[:-1], rows, 128)

        def spec(*dims):
            blk = tuple(dims) + (tbs, 128)
            nd = len(dims)
            return pl.BlockSpec(
                blk, lambda b, _nd=nd: (0,) * _nd + (b, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            spec(N + 1, nx), spec(N, nu), spec(N, m), spec(N, m),
            spec(N, nu), spec(N, nu, nx),
        ] + ([spec(N + 1, nx)] if track_costates else []) + [
            spec(1), spec(1), spec(np_eff),
        ] + (
            [spec(gn.n_cp)] if gn is not None else
            [spec(nx, nx), spec(nu, nu), spec(nx, nx), spec(nx)]
            + ([spec(N, nx)] if tracking else [])
        ) + [
            spec(nb), spec(nb), spec(n_items),
        ] + ([spec(mT), spec(mT), spec(mT, nx), spec(mT)] if mT else []) + (
            [spec(pT, nx), spec(pT), spec(pT)] if pT else []
        )
        out_specs = (
            spec(N + 1, nx), spec(N, nu), spec(N, nu), spec(N, nu, nx),
            spec(N, m), spec(N, m),
        ) + ((spec(N + 1, nx),) if track_costates else ()) + (
            spec(9),
        ) + ((spec(mT), spec(mT)) if mT else ()) + (
            (spec(pT),) if pT else ()
        )
        out_shape = (
            jax.ShapeDtypeStruct((N + 1, nx, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, nu, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, nu, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, nu, nx, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, m, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, m, rows, 128), dtype),
        ) + ((
            jax.ShapeDtypeStruct((N + 1, nx, rows, 128), dtype),
        ) if track_costates else ()) + (
            jax.ShapeDtypeStruct((9, rows, 128), dtype),
        ) + ((
            jax.ShapeDtypeStruct((mT, rows, 128), dtype),
            jax.ShapeDtypeStruct((mT, rows, 128), dtype),
        ) if mT else ()) + ((
            jax.ShapeDtypeStruct((pT, rows, 128), dtype),
        ) if pT else ())
        scratch = ([
            pltpu.VMEM((N + 1, nx, tbs, 128), dtype),      # Vx sequence
            pltpu.VMEM((N + 1, nx, nx, tbs, 128), dtype),  # Vxx sequence
        ] if track_costates else []) + [
            pltpu.VMEM((N + 1, nx, tbs, 128), dtype),      # Xc
            pltpu.VMEM((N, nu, tbs, 128), dtype),          # Uc
            pltpu.VMEM((N, m, tbs, 128), dtype),           # Yc
            pltpu.VMEM((N, m, tbs, 128), dtype),           # Sc
        ] + ([
            pltpu.VMEM((N + 1, nx, tbs, 128), dtype),      # Lc
        ] if track_costates else []) + ([
            pltpu.VMEM((mT, tbs, 128), dtype),             # STc
            pltpu.VMEM((mT, tbs, 128), dtype),             # YTc
        ] if mT else []) + ([
            pltpu.VMEM((pT, tbs, 128), dtype),             # dLamS
        ] if pT else []) + [
            pltpu.VMEM((_N_SCALARS, tbs, 128), dtype),     # sc
        ]
        ins = (X0, U0, Y0, S0, ku0, Ku0)
        if track_costates:
            ins = ins + (L0,)
        ins = ins + (mu0, dtv, params)
        if gn is not None:
            ins = ins + (cp,)
        else:
            ins = ins + (Q, R, Qf, goal)
            if tracking:
                ins = ins + (refs,)
        ins = ins + (lo, hi, sfv)
        if mT:
            ins = ins + (st0, yt0, atm, btm)
        if pT:
            ins = ins + (ht, hbt, lte0)
        args = [fold(v) for v in ins]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(pltpu.PARALLEL,)
            ),
            interpret=interpret,
        )(*args)
        return tuple(o.reshape(*o.shape[:-2], Btot) for o in outs)

    return call


# --- eligibility --------------------------------------------------------------

# Whole horizon VMEM-resident (trajectories, duals, slacks, gains, costates,
# value sequences, candidates). v5e/v4 cores have ~16 MiB of VMEM; leave
# headroom for Mosaic temporaries. Long horizons / large state dims must
# keep the streamed per-pass engines.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# The terminal-equality variant carries two backward sweeps with the
# sensitivity-Gramian temporaries (Phi/W/FB live ranges), so its Mosaic
# stack overhead is larger relative to the block-buffer estimate.
# Calibrated on a v5e: the HCW rendezvous fleet at a 9.6 MB estimate
# compiles and runs; at 11.3 MB the AOT compiler reports a 19.3 MB scoped
# allocation against the 16 MB cap.
_VMEM_BUDGET_TE_BYTES = int(9.7 * 1024 * 1024)


def _lane_stack(stk):
    """The path stack as lane-layout items: box constraints
    (ControlConstraint / StateConstraint, exact types) map to
    "control"/"state" kinds, keep-out balls to ("ball", head_dim), in
    stack (name-sorted) order. Returns a non-empty tuple of (kind,
    constraint) pairs, or None if any other constraint type is present.
    Supersedes ip_rollout._box_stack for the whole-solve kernel (VERDICT
    r3 item 5: the unicycle-obstacle fleet, BASELINE config 3)."""
    from cddp_tpu.constraints.path import (
        BallConstraint,
        ControlConstraint,
        StateConstraint,
    )

    if not stk.items:
        return None
    out = []
    for _, c in stk.items:
        if type(c) is ControlConstraint:
            out.append(("control", c))
        elif type(c) is StateConstraint:
            out.append(("state", c))
        elif type(c) is BallConstraint:
            out.append((("ball", int(c.dim)), c))
        else:
            return None
    return tuple(out)


def _lane_stack_dims(stack, nx, nu):
    """(lo/hi param rows, layout tuple) for a _lane_stack result."""
    layout = tuple(k for k, _ in stack)
    nb = sum(
        (k[1] if isinstance(k, tuple) else (nu if k == "control" else nx))
        for k in layout
    )
    return nb, layout


def _vmem_estimate_bytes(problem, options=None,
                         tile_b: int = DEFAULT_TILE_B,
                         track_costates: bool = True) -> int:
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker
    from cddp_tpu.costs.objective import QuadraticObjective

    nx, nu, N = problem.state_dim, problem.control_dim, problem.horizon
    stk = PathStacker(problem)
    m = stk.total_dim
    entry = _model_entry(problem.model)
    np_eff = max(entry[1], 1) if entry is not None else 1
    if isinstance(problem.objective, QuadraticObjective):
        tracking = problem.objective.reference_states is not None
        cost_in = 2 * nx * nx + nu * nu + nx + (N * nx if tracking else 0)
    else:
        gn_entry = gn_cost_lane(problem.objective)
        cost_in = gn_entry.spec.n_cp if gn_entry is not None else 0
    stack = _lane_stack(stk)
    if stack is not None:
        nb, _ = _lane_stack_dims(stack, nx, nu)
    else:
        nb = m // 2  # box rows come in lower/upper pairs
    n_items = len(stk.items)
    tstk = TerminalStacker(problem)
    mT = tstk.ineq_dim
    pT = tstk.eq_dim
    lam_rows = (N + 1) * nx if track_costates else 0
    ins = (
        (N + 1) * nx + N * nu + 2 * N * m + N * nu + N * nu * nx
        + lam_rows + 2 + np_eff + cost_in + 2 * nb + n_items
        + (3 * mT + mT * nx) + (2 * pT + pT * nx)
    )
    outs = (
        (N + 1) * nx + 2 * N * nu + N * nu * nx + 2 * N * m
        + lam_rows + 9 + 2 * mT + pT
    )
    scratch = (
        ((N + 1) * nx * (2 + nx) if track_costates else 0)  # Vx, Vxx, Lc
        + (N + 1) * nx + N * nu + 2 * N * m                 # Xc, Uc, Yc, Sc
        + 2 * mT + pT + _N_SCALARS
    )
    return (ins + outs + scratch) * tile_b * 4


def _costate_mode(problem, options=None):
    """(vmem_eligible, track_costates) for the whole-solve kernel: costates
    are tracked whenever the full footprint fits the VMEM budget; if only
    the costate-free footprint fits, the kernel runs with
    ``track_costates=False`` (Lambda returned as zeros — write-only state
    in the iLQR condensed regime, see :func:`make_solve_kernel`)."""
    from cddp_tpu.constraints.stack import TerminalStacker

    budget = (
        _VMEM_BUDGET_TE_BYTES
        if TerminalStacker(problem).eq_dim > 0
        else _VMEM_BUDGET_BYTES
    )
    if _vmem_estimate_bytes(problem, options) <= budget:
        return True, True
    fits = (
        _vmem_estimate_bytes(problem, options, track_costates=False)
        <= budget
    )
    return fits, False


def mega_eligible(problem, options) -> bool:
    """Static dispatch predicate for the whole-solve IPDDP kernel.

    Requires: a continuous-dynamics lane model (built-in registry or
    ip_rollout.register_model_lane), a kernel-capable objective —
    QuadraticObjective (goal or reference_states tracking) or any
    objective with a registered Gauss-Newton residual lane
    (:func:`register_gn_cost_lane`, e.g. the MPCC racing cost) — a lane
    path-constraint stack (ControlConstraint / StateConstraint boxes
    and/or BallConstraint keep-out balls), no terminal equalities, the
    iLQR sequential condensed backward, the sequential first-success line
    search, and none of the driver features the kernel doesn't model
    (history/verbose/debug/cpu-time, explicit always-on slack SOC or
    constraint Hessians, state-stationarity KKT term). The default "auto"
    SOC/Hessian stall latch IS modeled in-kernel for ball stacks."""
    import os

    from cddp_tpu.costs.objective import QuadraticObjective
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker

    if os.environ.get("CDDP_TPU_NO_MEGA"):  # emergency kill switch
        return False
    entry = _model_entry(problem.model)
    if entry is None or entry[4]:  # unknown model or exact discrete map
        return False
    if not isinstance(problem.objective, QuadraticObjective):
        if gn_cost_lane(problem.objective) is None:
            return False
    from cddp_tpu.constraints.terminal import TerminalEqualityConstraint

    stk = PathStacker(problem)
    tstk = TerminalStacker(problem)
    if _lane_stack(stk) is None or stk.total_dim == 0:
        return False
    # Linear terminal inequalities fold into the kernel's terminal value
    # (ipddp_solver.cpp:999-1031); terminal equalities run the in-kernel
    # p+1 reduced-LQR regime (linear rows only — the one reference type,
    # TerminalEqualityConstraint x_N = target, qualifies).
    if tstk.eq_dim > 0 and any(
        type(c) is not TerminalEqualityConstraint for _, c in tstk.eq_items
    ):
        return False
    ip = options.ipddp
    return (
        problem.model.integration_type in ("euler", "heun", "rk3", "rk4")
        and options.use_ilqr
        and not options.enable_parallel
        # Box stacks are affine, so "auto" resolves to off (soc_traced);
        # only explicit True opts the problem out of the fused kernel.
        and ip.slack_soc is not True
        and ip.use_constraint_hessians is not True
        and not ip.check_state_stationarity
        and ip.lqr_backend == "sequential"
        and options.backward_engine == "auto"
        and options.solve_engine != "xla"
        and not options.return_iteration_info
        and not options.verbose
        and not options.debug
        and options.max_cpu_time <= 0
        and options.max_iterations >= 1
        and options.regularization.update_factor > 1.0
        and _costate_mode(problem, options)[0]
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "kind", "integrator", "box_layout", "gn_key",
                     "track_costates", "tile_b", "interpret"),
)
def _mega_impl(X0, U0, Y0, S0, ku0, Ku0, L0, mu0, dtv, params, Q, R, Qf,
               goal, refs, lo, hi, sfv, st0, yt0, atm, btm, cp, lte0, ht,
               hbt, cfg: _Cfg,
               kind, integrator: str, box_layout, gn_key=None,
               track_costates: bool = True, tile_b: int = DEFAULT_TILE_B,
               interpret: bool = False):
    """Batch-first wrapper: pad to a tile multiple, transpose to batch-last,
    run the kernel, trim. ``refs`` is None for goal-form objectives;
    ``st0/yt0/atm/btm`` are None without terminal inequalities;
    ``lte0/ht/hbt`` are None without terminal equalities; in GN mode
    (``gn_key`` set) Q/R/Qf/goal/refs are None and ``cp`` carries the cost
    parameters. ``kind`` is the model static key (class name or class)."""
    B0 = X0.shape[0]
    nx, nu, N, m = X0.shape[2], U0.shape[2], U0.shape[1], Y0.shape[2]
    pad = (-B0) % tile_b
    tracking = refs is not None
    dtype = X0.dtype
    cap = 1e12 if dtype == jnp.float64 else 1e6  # ipddp._max_ratio

    def prep(v):
        if pad:
            v = jnp.concatenate([v, jnp.repeat(v[-1:], pad, 0)], 0)
        return jnp.moveaxis(v, 0, -1)

    n_params, lane_f = _model_lanes_by_key(kind)
    deriv_f = deriv_lane_fn(kind, lane_f, nx, nu)
    gn = _GN_BY_KEY[gn_key] if gn_key is not None else None
    mT = 0 if st0 is None else st0.shape[1]
    pT = 0 if lte0 is None else lte0.shape[1]
    call = make_solve_kernel(
        nx, nu, m, N, n_params, lane_f, deriv_f, integrator, box_layout,
        cfg, cap, tracking, mT=mT, tile_b=tile_b, gn=gn,
        track_costates=track_costates, pT=pT,
    )
    args = [
        prep(v) if v is not None else None
        for v in (X0, U0, Y0, S0, ku0, Ku0, L0, mu0[:, None], dtv[:, None],
                  params, Q, R, Qf, goal, refs, lo, hi, sfv, st0, yt0, atm,
                  btm, cp, ht, hbt, lte0)
    ]
    outs = call(*args, interpret=interpret)
    unprep = lambda v: jnp.moveaxis(v, -1, 0)[:B0]
    return tuple(unprep(o) for o in outs)


def build_fused_solve(problem, options, interpret: bool = False,
                      obj_treedef=None):
    """Batch-first fused whole-solve for a concrete (problem, options):
    ``fused(x0, X0, U0, Y0, S0, L0, mu0, ku0, Ku0, S_T0, Y_T0, Lte0,
    *obj_leaves) -> (X, U, k, K, Y, S, Lambda, cost, inf_pr, inf_du,
    inf_comp, mu, reg, alpha_pr, iterations(int32), status(int32), S_T,
    Y_T, Lte)``. ``S_T0/Y_T0`` are ``(B, mT)`` (``mT = 0`` without
    terminal inequalities); ``Lte0`` is ``(B, pT)`` (``pT = 0`` without
    terminal equalities). Also the test entry for interpret-mode parity
    runs.

    With ``obj_treedef`` set, the objective travels as trailing
    ``*obj_leaves`` op arguments, every leaf carrying the leading batch
    dimension — per-instance cost parameters (e.g. a fleet of per-car
    track windows) batch through vmap instead of being closed over.
    Without it, the closed-over ``problem.objective`` must be concrete."""
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker
    from cddp_tpu.costs.objective import QuadraticObjective

    kind = _model_entry(problem.model)[0]
    integrator = problem.model.integration_type
    obj0 = problem.objective
    quad = isinstance(obj0, QuadraticObjective)
    gn_entry = None if quad else gn_cost_lane(obj0)
    if not quad:
        assert gn_entry is not None, (
            "build_fused_solve: objective has no registered GN cost lane"
        )
    track_costates = _costate_mode(problem, options)[1]
    stk = PathStacker(problem)
    tstk = TerminalStacker(problem)
    mT = tstk.ineq_dim
    pT = tstk.eq_dim
    boxes = _lane_stack(stk)
    _, box_layout = _lane_stack_dims(boxes, problem.state_dim,
                                     problem.control_dim)
    # The "auto" stall latch is traced only for curved (ball) stacks,
    # mirroring solvers/ipddp.py soc_traced / chess_mode.
    has_ball = any(isinstance(k, tuple) for k in box_layout)
    cfg = _make_cfg(
        options,
        soc_auto=has_ball and options.ipddp.slack_soc == "auto",
        chess_auto=has_ball
        and options.ipddp.use_constraint_hessians == "auto",
    )
    n_params, param_fn = _model_entry(problem.model)[1:3]

    def fused_impl(x0, X0, U0, Y0, S0, L0, mu0, ku0, Ku0, S_T0, Y_T0,
                   Lte0, *obj_leaves):
        B = x0.shape[0]
        N = U0.shape[1]
        dtype = x0.dtype

        def bc(a):
            a = jnp.asarray(a, dtype)
            return jnp.broadcast_to(a, (B,) + a.shape)

        if obj_leaves:
            # Leaf-batched objective: every leaf arrives (B, ...) (the
            # batched-op rule broadcasts unbatched ones).
            obj = jax.tree_util.tree_unflatten(obj_treedef, obj_leaves)
            batched_obj = True
        else:
            obj = obj0
            batched_obj = False

        params = bc(jnp.asarray(param_fn(problem.model), dtype))
        if n_params == 0:
            params = jnp.zeros((B, 1), dtype)
        if gn_entry is not None:
            if batched_obj:
                cp = jnp.asarray(jax.vmap(gn_entry.cp_fn)(obj), dtype)
            else:
                cp = bc(gn_entry.cp_fn(obj))
            Qb = Rb = Qfb = goalb = refs = None
        else:
            cp = None
            if batched_obj:
                Qb = jnp.asarray(obj.Q, dtype)
                Rb = jnp.asarray(obj.R, dtype)
                Qfb = jnp.asarray(obj.Qf, dtype)
                goalb = jnp.asarray(obj.reference_state, dtype)
                refs = (
                    jnp.asarray(obj.reference_states, dtype)[:, :N]
                    if obj.reference_states is not None else None
                )
            else:
                Qb, Rb, Qfb = bc(obj.Q), bc(obj.R), bc(obj.Qf)
                goalb = bc(obj.reference_state)
                refs = (
                    bc(jnp.asarray(obj.reference_states)[:N])
                    if obj.reference_states is not None else None
                )
        # lo/hi parameter rows per item: box bounds, or for a ball item
        # its center in lo and [radius, 0...] in hi (same row count).
        lo_parts, hi_parts = [], []
        for kindk, cb in boxes:
            if isinstance(kindk, tuple):
                d = kindk[1]
                lo_parts.append(jnp.asarray(cb.center, dtype).reshape(-1))
                hi_parts.append(jnp.concatenate([
                    jnp.asarray(cb.radius, dtype).reshape(1),
                    jnp.zeros((d - 1,), dtype),
                ]))
            else:
                lo_parts.append(jnp.asarray(cb.lower, dtype).reshape(-1))
                hi_parts.append(jnp.asarray(cb.upper, dtype).reshape(-1))
        lo = bc(jnp.concatenate(lo_parts))
        hi = bc(jnp.concatenate(hi_parts))
        sfv = bc(jnp.stack(
            [jnp.asarray(cb.scale_factor, dtype) for _, cb in boxes]
        ))
        if mT:
            atm = bc(jnp.concatenate(
                [jnp.asarray(c.A, dtype) for _, c in tstk.ineq_items]
            ))
            btm = bc(jnp.concatenate(
                [jnp.asarray(c.b, dtype) for _, c in tstk.ineq_items]
            ))
            st0, yt0 = S_T0, Y_T0
        else:
            atm = btm = st0 = yt0 = None
        if pT:
            # Linear terminal-equality rows: the one reference type is
            # x_N - target (H = I, b = target), stacked in eq-item order.
            ht = bc(jnp.concatenate([
                jnp.eye(problem.state_dim, dtype=dtype)
                for _ in tstk.eq_items
            ]))
            hbt = bc(jnp.concatenate([
                jnp.asarray(c.target_state, dtype)
                for _, c in tstk.eq_items
            ]))
            lte0 = Lte0
        else:
            ht = hbt = lte0 = None
        outs = _mega_impl(
            X0, U0, Y0, S0, ku0, Ku0, L0 if track_costates else None,
            jnp.broadcast_to(jnp.asarray(mu0, dtype), (B,)),
            jnp.broadcast_to(jnp.asarray(problem.timestep, dtype), (B,)),
            params, Qb, Rb, Qfb, goalb, refs, lo, hi, sfv, st0, yt0, atm,
            btm, cp, lte0, ht, hbt,
            cfg=cfg, kind=kind, integrator=integrator,
            box_layout=box_layout,
            gn_key=gn_entry.static_key if gn_entry is not None else None,
            track_costates=track_costates, tile_b=DEFAULT_TILE_B,
            interpret=interpret,
        )
        X, U, k, K, Y, S = outs[:6]
        outs = outs[6:]
        if track_costates:
            Lam, outs = outs[0], outs[1:]
        else:
            Lam = jnp.zeros_like(X)
        st, outs = outs[0], outs[1:]
        if mT:
            S_T, Y_T = outs[:2]
            outs = outs[2:]
        else:
            S_T = jnp.zeros((B, 0), dtype)
            Y_T = jnp.zeros((B, 0), dtype)
        if pT:
            (Lte,) = outs
        else:
            Lte = jnp.zeros((B, 0), dtype)
        return (
            X, U, k, K, Y, S, Lam,
            st[:, 0], st[:, 1], st[:, 2], st[:, 3], st[:, 4], st[:, 5],
            st[:, 6], st[:, 7].astype(jnp.int32),
            st[:, 8].astype(jnp.int32), S_T, Y_T, Lte,
        )

    return fused_impl


def problem_consts_concrete(problem) -> bool:
    """True when every problem leaf the whole-solve op closes over is safe
    to close over. The objective's leaves are op ARGUMENTS (so per-instance
    cost parameters — a fleet of per-car MPCC track windows, per-instance
    goals — batch through vmap); model, path-constraint,
    terminal-constraint and timestep leaves are closed over.

    Only *batch* tracers are disqualifying: a vmap-mapped leaf closed over
    as if shared would silently drop its batch axis. Plain jit tracers are
    fine — under ``jit(vmap(solve))`` even constants built inside the trace
    (``jnp.asarray([...])`` binds device_put when tracing) appear as
    unbatched jit tracers, and closing over same-trace values is ordinary
    capture."""
    from jax._src.interpreters.batching import BatchTracer

    leaves = jax.tree_util.tree_leaves(
        (problem.constraints, problem.terminal_constraints, problem.model,
         problem.timestep)
    )
    return not any(isinstance(l, BatchTracer) for l in leaves)


def ipddp_solve_op(problem, options, interpret: bool = False):
    """Batch-aware whole-solve op for this (problem, options) pair.

    ``op(x0, X0, U0, Y0, S0, L0, mu0, ku0, Ku0, S_T0, Y_T0, Lte0) -> (X,
    U, k, K, Y, S, Lambda, cost, inf_pr, inf_du, inf_comp, mu, reg,
    alpha_pr, iterations(int32), status(int32), S_T, Y_T, Lte)``.
    Unbatched / CPU /
    non-f32 calls run the XLA ``_drive`` driver per instance; vmapped TPU
    float32 batches >= MIN_KERNEL_BATCH run the fused kernel. The
    objective's pytree leaves ride as trailing op arguments so vmapping
    over per-instance cost parameters reaches the kernel."""
    from cddp_tpu.solvers import ipddp as _ipddp
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker

    kind = _model_entry(problem.model)[0]
    obj_leaves0, obj_def = jax.tree_util.tree_flatten(problem.objective)
    fused_impl = build_fused_solve(problem, options, interpret,
                                   obj_treedef=obj_def)

    def scan_single(x0, X0, U0, Y0, S0, L0, mu0, ku0, Ku0, S_T0, Y_T0,
                    Lte0, *obj_leaves):
        obj = jax.tree_util.tree_unflatten(obj_def, obj_leaves)
        p = problem.replace(x0=x0, objective=obj)
        stk = PathStacker(p)
        tstk = TerminalStacker(p)
        G = _ipddp._eval_path(p, stk, X0, U0)
        G_T = tstk.ineq_evaluate(X0[-1])
        sol, st = _ipddp._drive(
            p, options, X0, U0, Y0, S0, G, G_T, S_T0, Y_T0, L0, Lte0,
            mu0, ku0, Ku0,
        )
        return (
            sol.state_trajectory, sol.control_trajectory, st.k_u, st.K_u,
            st.Y, st.S, st.Lambda, sol.final_objective, sol.inf_pr,
            sol.inf_du, sol.inf_comp, sol.barrier_mu,
            sol.final_regularization, sol.final_step_length,
            sol.iterations_completed, sol.status_code, st.S_T, st.Y_T,
            st.Lambda_T_eq,
        )

    op = make_batched_op(
        scan_single, fused_impl, "IPDDP solve",
        min_batch=MIN_KERNEL_BATCH,
        log_detail=lambda x0, *rest: dict(model=kind),
    )

    def call_op(x0, X0, U0, Y0, S0, L0, mu0, ku0, Ku0, S_T0, Y_T0, Lte0):
        # The objective leaves (possibly tracers of an enclosing vmap over
        # per-instance cost parameters) ride as trailing op arguments.
        return op(x0, X0, U0, Y0, S0, L0, mu0, ku0, Ku0, S_T0, Y_T0, Lte0,
                  *obj_leaves0)

    return call_op
