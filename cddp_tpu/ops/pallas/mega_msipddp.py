"""Whole-solve fused MSIPDDP kernel: the complete batched multiple-shooting
interior-point solve as ONE ``pallas_call``.

The round-4 verdict (item 5) measured the per-pass ceiling for MSIPDDP
fleets at 13.4k solves/s while the same problem through the IPDDP
whole-solve kernel ran 112.8k — this kernel closes that gap for the
multiple-shooting solver. Semantics mirror ``solvers/msipddp.py:_drive``
(msipddp_solver.cpp:1086-1878) exactly, scoped to:

- box-only path constraint stacks (ControlConstraint / StateConstraint,
  constant +-scale Jacobians) with ``m > 0`` (the no-path Armijo branch
  stays on the XLA driver);
- QuadraticObjective (goal or per-step ``reference_states`` tracking);
- iLQR Hessians, the sequential defect-aware condensed backward
  (``msipddp.lqr_backend == "sequential"``), sequential first-success
  line search;
- all three barrier strategies and all three gap-closing rollout types
  (nonlinear / hybrid / dense).

MSIPDDP specifics folded in-kernel (everything the IPDDP kernel lacks):

- the defect drift ``Vx + Vxx d`` with ``d = F - X[1:]`` through the
  backward (msipddp_solver.cpp:1260-1420; UNCLIPPED y/s ratios,
  :1330-1345),
- costate gains ``k_lam = -lam + drift`` / ``K_lam = sym(Vxx_next)`` and
  the costate trajectory as live solver state (the forward updates feed
  the next backward's ``k_lam`` — unlike IPDDP's write-only costates),
- segment gap-closing at static boundary steps (``(t+1) % seg == 0``)
  in all three rollout types (:1443-1517),
- the separate dual step-size ladder: per-alpha_y fraction-to-boundary
  feasibility masks accumulated during the single rollout pass, first
  feasible alpha_y selected (:1618-1676),
- the MSIPDDP filter acceptance (best-violation reference point, tiny-cv
  branch; :789-827), filter restoration before regularization on
  line-search failure (:829-862), and the every-iteration barrier update
  with the full filter reset (:1766-1878),
- the IPOPT sd-scaled dual infeasibility in the convergence metric
  (:1886-1931), with l1 defect violation in the filter entries.

Dispatch: :func:`msipddp_solve_op` + ``solvers/msipddp.py`` route vmapped
TPU float32 fleets here when :func:`mega_ms_eligible` holds; parity with
the XLA driver is pinned in tests/test_mega_msipddp.py (interpret mode,
exact statuses and iteration counts).
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
from cddp_tpu.ops.pallas.mega_clddp import _i32, deriv_lane_fn
from cddp_tpu.ops.pallas.mega_ipddp import (
    _filter_accept,
    _filter_prune,
    _model_entry,
    _model_lanes_by_key,
)
from cddp_tpu.ops.pallas.riccati import _matmul, _matvec, _transpose, _inv, \
    _leading_minors_pd
from cddp_tpu.ops.pallas.rollout import MIN_KERNEL_BATCH, _integrate_lane

DEFAULT_TILE_B = 1024

# Scalar lane slots.
(_DONE, _STATUS, _IT, _COST, _MERIT, _MU, _REG, _INFPR, _INFDU, _INFCOMP,
 _STEPN, _APR, _ADU, _DV0, _DV1, _BP_DONE, _BP_LIMIT, _LS_FOUND, _LS_OK,
 _TJ, _TMERIT, _TCV, _TSUMLOG, _TAPR, _TADU) = range(25)
_F_CAP = 7
_F_M0 = 25
_F_V0 = _F_M0 + _F_CAP
_F_OK0 = _F_V0 + _F_CAP
_N_SCALARS = _F_OK0 + _F_CAP

_ST_MAX_ITER = 0.0
_ST_OPTIMAL = 1.0
_ST_ACCEPTABLE = 2.0
_ST_REG_LIMIT = 3.0


class _MsCfg(NamedTuple):
    """Static solver configuration baked into the kernel trace."""

    max_iterations: int
    tolerance: float
    acceptable_tolerance: float
    reg0: float
    reg_uf: float
    reg_max: float
    reg_min: float
    alphas: tuple  # the exact line_search_alphas ladder
    bp_bound: int
    # barrier (msipddp.barrier)
    strategy: str  # "adaptive" | "monotonic" | "ipopt"
    mu_update_factor: float
    mu_update_power: float
    mu_min_value: float
    min_ftb: float
    # filter (options.filter)
    armijo: float
    mat: float
    vat: float
    mvfac: float
    f_max: int
    # multiple shooting
    seg: int
    rollout_type: str


def _make_cfg(options) -> _MsCfg:
    from cddp_tpu.options import BarrierStrategy, line_search_alphas

    reg = options.regularization
    reg_floor = max(min(reg.initial_value, reg.min_value), 1e-300)
    bp_bound = (
        int(math.ceil(math.log(reg.max_value / reg_floor)
                      / math.log(reg.update_factor))) + 2
        if reg.update_factor > 1.0
        else 4
    )
    ms = options.msipddp
    b = ms.barrier
    strategy = {
        BarrierStrategy.ADAPTIVE: "adaptive",
        BarrierStrategy.MONOTONIC: "monotonic",
        BarrierStrategy.IPOPT: "ipopt",
    }[b.strategy]
    return _MsCfg(
        max_iterations=int(options.max_iterations),
        tolerance=float(options.tolerance),
        acceptable_tolerance=float(options.acceptable_tolerance),
        reg0=float(reg.initial_value),
        reg_uf=float(reg.update_factor),
        reg_max=float(reg.max_value),
        reg_min=float(reg.min_value),
        alphas=tuple(float(a) for a in line_search_alphas(options.line_search)),
        bp_bound=bp_bound,
        strategy=strategy,
        mu_update_factor=float(b.mu_update_factor),
        mu_update_power=float(b.mu_update_power),
        mu_min_value=float(b.mu_min_value),
        min_ftb=float(b.min_fraction_to_boundary),
        armijo=float(options.filter.armijo_constant),
        mat=float(options.filter.merit_acceptance_threshold),
        vat=float(options.filter.violation_acceptance_threshold),
        mvfac=float(options.filter.min_violation_for_armijo_check),
        f_max=int(options.ipddp.max_filter_size),
        seg=int(ms.segment_length),
        rollout_type=str(ms.rollout_type),
    )


def msipddp_step_lanes(A, Bm, lx, lu, lxx, luu, lux, y, s, g, Gx, Gu, d,
                       lam, Vx, Vxx, mu, reg, nx, nu, m):
    """One defect-aware condensed step over lane lists
    (msipddp._backward_pass step_math, msipddp_solver.cpp:1260-1420):
    y/s ratios UNCLIPPED, drift = Vx + Vxx d, costate gains. Returns
    ``(k_u, K_u, k_lam, Vx_new, Vxx_new, dv0, dv1, Qu_c, pr, comp,
    pd_ok)``."""
    zeros = jnp.zeros_like(mu)
    At = _transpose(A, nx, nx)
    Bt = _transpose(Bm, nx, nu)
    Gxt = _transpose(Gx, m, nx)
    Gut = _transpose(Gu, m, nu)

    Vd = _matvec(Vxx, d, nx, nx)
    drift = [Vx[i] + Vd[i] for i in range(nx)]
    Gty = _matvec(Gxt, y, nx, m)
    Atd = _matvec(At, drift, nx, nx)
    Qx = [lx[i] + Gty[i] + Atd[i] for i in range(nx)]
    Guy = _matvec(Gut, y, nu, m)
    Btd = _matvec(Bt, drift, nu, nx)
    Qu = [lu[i] + Guy[i] + Btd[i] for i in range(nu)]
    VA = _matmul(Vxx, A, nx, nx, nx)
    Qxx = [[lxx[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(At, VA, nx, nx, nx))]
    Qux = [[lux[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VA, nu, nx, nx))]
    VB = _matmul(Vxx, Bm, nx, nx, nu)
    Quu = [[luu[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VB, nu, nx, nu))]

    # Unclipped condensation (msipddp_solver.cpp:1330-1345).
    ys_inv = [y[i] / s[i] for i in range(m)]
    pr = [g[i] + s[i] for i in range(m)]
    comp = [y[i] * s[i] - mu for i in range(m)]
    rhat = [y[i] * pr[i] - comp[i] for i in range(m)]
    s_inv_rhat = [rhat[i] / s[i] for i in range(m)]

    sGu = [[ys_inv[i] * Gu[i][j] for j in range(nu)] for i in range(m)]
    sGx = [[ys_inv[i] * Gx[i][j] for j in range(nx)] for i in range(m)]
    GtSGu = _matmul(Gut, sGu, nu, m, nu)
    GtSGx_u = _matmul(Gut, sGx, nu, m, nx)

    Quu_sym = [[0.5 * (Quu[i][j] + Quu[j][i]) for j in range(nu)]
               for i in range(nu)]
    Quu_reg = [[Quu_sym[i][j] + GtSGu[i][j] + (reg if i == j else zeros)
                for j in range(nu)] for i in range(nu)]
    Gt_sir = _matvec(Gut, s_inv_rhat, nu, m)
    rhs_k = [Qu[i] + Gt_sir[i] for i in range(nu)]
    rhs_K = [[Qux[i][j] + GtSGx_u[i][j] for j in range(nx)]
             for i in range(nu)]

    Hinv, _ = _inv(Quu_reg, nu)
    pd_ok = _leading_minors_pd(Quu_reg, nu)
    k_u = [jnp.where(pd_ok, -v, zeros) for v in _matvec(Hinv, rhs_k, nu, nu)]
    K_u = [[jnp.where(pd_ok, -v, zeros) for v in row]
           for row in _matmul(Hinv, rhs_K, nu, nu, nx)]

    k_lam = [-lam[i] + drift[i] for i in range(nx)]

    Gx_sir = _matvec(Gxt, s_inv_rhat, nx, m)
    GtSGx_x = _matmul(Gxt, sGx, nx, m, nx)
    Qu_c = rhs_k
    Qx_c = [Qx[i] + Gx_sir[i] for i in range(nx)]
    Qxx_c = [[Qxx[i][j] + GtSGx_x[i][j] for j in range(nx)]
             for i in range(nx)]
    Qux_c = rhs_K
    Quu_c = [[Quu[i][j] + GtSGu[i][j] for j in range(nu)]
             for i in range(nu)]

    dv0 = sum(k_u[i] * Qu_c[i] for i in range(nu))
    dv1 = 0.5 * sum(k_u[i] * Quu_c[i][j] * k_u[j]
                    for i in range(nu) for j in range(nu))

    Kut = _transpose(K_u, nu, nx)
    Quuc_k = _matvec(Quu_c, k_u, nu, nu)
    Vx_new = [
        Qx_c[i]
        + sum(Kut[i][l] * Qu_c[l] for l in range(nu))
        + sum(Qux_c[l][i] * k_u[l] for l in range(nu))
        + sum(Kut[i][l] * Quuc_k[l] for l in range(nu))
        for i in range(nx)
    ]
    QuucK = _matmul(Quu_c, K_u, nu, nu, nx)
    KtQK = _matmul(Kut, QuucK, nx, nu, nx)
    QuxtK = _matmul(_transpose(Qux_c, nu, nx), K_u, nx, nu, nx)
    Vxx_new = [[Qxx_c[i][j] + KtQK[i][j] + QuxtK[i][j] + QuxtK[j][i]
                for j in range(nx)] for i in range(nx)]
    Vxx_new = [[0.5 * (Vxx_new[i][j] + Vxx_new[j][i]) for j in range(nx)]
               for i in range(nx)]
    return (k_u, K_u, k_lam, Vx_new, Vxx_new, dv0, dv1, Qu_c, pr, comp,
            pd_ok)


def msipddp_gain_lanes(y, s, g, Gx, Gu, k_u, K_u, mu, nx, nu, m):
    """Dual/slack gains (msipddp step_math closed forms, UNCLIPPED):
    returns ``(k_y, K_y, k_s, K_s)`` lane lists."""
    ys_inv = [y[i] / s[i] for i in range(m)]
    pr = [g[i] + s[i] for i in range(m)]
    comp = [y[i] * s[i] - mu for i in range(m)]
    rhat = [y[i] * pr[i] - comp[i] for i in range(m)]
    temp = _matvec(Gu, k_u, m, nu)
    GuKu = _matmul(Gu, K_u, m, nu, nx)
    k_y = [(rhat[i] + y[i] * temp[i]) / s[i] for i in range(m)]
    K_y = [[ys_inv[i] * (Gx[i][j] + GuKu[i][j]) for j in range(nx)]
           for i in range(m)]
    k_s = [-pr[i] - temp[i] for i in range(m)]
    K_s = [[-Gx[i][j] - GuKu[i][j] for j in range(nx)] for i in range(m)]
    return k_y, K_y, k_s, K_s


def _ms_filter_acceptable(fm, fv, fok, mf, cv, expected, cfg, zeros, ones):
    """MSIPDDPSolver::isFilterAcceptable (msipddp_solver.cpp:789-827) over
    lane slots: empty-accept, dominance rejection, best-violation reference
    point with merit/violation improvement, Armijo branch, tiny-cv pass."""
    size = zeros
    for i in range(_F_CAP):
        size = size + fok[i]
    empty = size < 0.5
    dominated = zeros > ones
    for i in range(_F_CAP):
        dominated = dominated | (
            (fok[i] > 0.5) & (fm[i] <= mf) & (fv[i] <= cv)
        )
    inf = zeros + jnp.inf
    bv_v, bv_m = inf, inf
    for i in range(_F_CAP):
        vm = jnp.where(fok[i] > 0.5, fv[i], inf)
        better = vm < bv_v  # strict: first-min wins (argmin parity)
        bv_v = jnp.where(better, vm, bv_v)
        bv_m = jnp.where(better, fm[i], bv_m)
    viol_imp = cv < bv_v * (1.0 - cfg.vat)
    merit_imp = mf < bv_m - cfg.mat * cv
    armijo_branch = (cv < cfg.mvfac) & (expected < 0.0)
    armijo_ok = mf < bv_m + cfg.armijo * expected
    tiny_ok = (cv < 1e-6) & (mf <= bv_m * (1.0 + 1e-8))
    verdict = jnp.where(
        armijo_branch,
        jnp.where(armijo_ok, ones, zeros),
        jnp.where(tiny_ok | viol_imp | merit_imp, ones, zeros),
    )
    return jnp.where(empty | (~dominated & (verdict > 0.5)), ones, zeros)


def make_ms_solve_kernel(nx, nu, m, N, n_params, lane_f, deriv_f,
                         integrator, box_layout, cfg: _MsCfg,
                         tracking: bool = False,
                         tile_b: int = DEFAULT_TILE_B):
    """Build the whole-solve MSIPDDP pallas_call for static problem
    structure. Inputs (batch-last, lane-folded): X0 (N+1,nx,B),
    U0 (N,nu,B), Y0/S0 (N,m,B), F0 (N,nx,B), L0 (N,nx,B), ku0 (N,nu,B),
    Ku0 (N,nu,nx,B), mu0 (1,B), dt (1,B), params, Q/R/Qf (dt-prescaled
    Q), goal, [refs], lo/hi (nb,B), sf (n_items,B). Outputs: X, U, k, K,
    Y, S, F, Lambda, stats (9,B) = [cost, inf_pr, inf_du, inf_comp, mu,
    reg, alpha_pr, iterations, status]."""
    n_items = len(box_layout)
    nb = sum((nu if k == "control" else nx) for k in box_layout)
    n_alpha = len(cfg.alphas)

    def kernel(X0_ref, U0_ref, Y0_ref, S0_ref, F0_ref, L0_ref, ku0_ref,
               Ku0_ref, mu0_ref, dt_ref, p_ref, *rest):
        Q_ref, R_ref, Qf_ref, goal_ref = rest[:4]
        rest = rest[4:]
        refs_ref = None
        if tracking:
            refs_ref, rest = rest[0], rest[1:]
        lo_ref, hi_ref, sf_ref = rest[:3]
        rest = rest[3:]
        (Xo, Uo, ko, Ko, Yo, So, Fo, Lo, st_ref) = rest[:9]
        rest = rest[9:]
        (Vxs, Vxxs, klamS, Xc, Uc, Sc, Fc, Lc, sc) = rest

        dt = dt_ref[0]
        zeros = jnp.zeros_like(dt)
        ones = zeros + 1.0
        p = [p_ref[i] for i in range(n_params)]
        sf = [sf_ref[i] for i in range(n_items)]
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
            lx = [2.0 * sum(Q[i][j] * e[j] for j in range(nx))
                  for i in range(nx)]
            lu = [2.0 * sum(R[i][j] * u[j] for j in range(nu))
                  for i in range(nu)]
            lxx = [[2.0 * Q[i][j] for j in range(nx)] for i in range(nx)]
            luu = [[2.0 * R[i][j] for j in range(nu)] for i in range(nu)]
            lux = [[zeros] * nx for _ in range(nu)]
            return lx, lu, lxx, luu, lux

        def term_value(x):
            eN = [x[i] - goal[i] for i in range(nx)]
            Vx = [2.0 * sum(Qf[i][j] * eN[j] for j in range(nx))
                  for i in range(nx)]
            Vxx = [[Qf[i][j] + Qf[j][i] for j in range(nx)]
                   for i in range(nx)]
            return Vx, Vxx

        def box_g(x, u):
            g = []
            off = 0
            for it, kind in enumerate(box_layout):
                var, n = (u, nu) if kind == "control" else (x, nx)
                g += [(lo_ref[off + i] - var[i]) * sf[it] for i in range(n)]
                g += [(var[i] - hi_ref[off + i]) * sf[it] for i in range(n)]
                off += n
            return g

        Gu_c = [[zeros for _ in range(nu)] for _ in range(m)]
        Gx_c = [[zeros for _ in range(nx)] for _ in range(m)]
        row = 0
        for it, kind in enumerate(box_layout):
            n = nu if kind == "control" else nx
            tgt = Gu_c if kind == "control" else Gx_c
            for i in range(n):
                tgt[row + i][i] = zeros - sf[it]
                tgt[row + n + i][i] = zeros + sf[it]
            row += 2 * n

        def fin(v):
            return jnp.where(jnp.isfinite(v), ones, zeros)

        # --- init -----------------------------------------------------------
        Xo[...] = X0_ref[...]
        Uo[...] = U0_ref[...]
        Yo[...] = Y0_ref[...]
        So[...] = S0_ref[...]
        Fo[...] = F0_ref[...]
        Lo[...] = L0_ref[...]
        ko[...] = ku0_ref[...]
        Ko[...] = Ku0_ref[...]
        Xc[...] = X0_ref[...]
        Uc[...] = U0_ref[...]
        Sc[...] = S0_ref[...]
        Fc[...] = F0_ref[...]
        Lc[...] = L0_ref[...]
        mu0 = mu0_ref[0]

        # Initial cost / merit / cv (resetBarrierFilter on the seed).
        def init_body(_s, carry):
            J, sumlog, cv, infpr, t = carry
            x = [Xo[t, i] for i in range(nx)]
            u = [Uo[t, i] for i in range(nu)]
            J = J + run_cost(x, u, t)
            g = box_g(x, u)
            for i in range(m):
                sumlog = sumlog + jnp.log(So[t, i])
                r = g[i] + So[t, i]
                cv = cv + jnp.abs(r)
                infpr = jnp.maximum(infpr, jnp.abs(r))
            for i in range(nx):
                di = Fo[t, i] - Xo[t + 1, i]
                cv = cv + jnp.abs(di)
                infpr = jnp.maximum(infpr, jnp.abs(di))
            return (J, sumlog, cv, infpr, t + _i32(1))

        J0, sumlog0, cv0, infpr0, _ = jax.lax.fori_loop(
            _i32(0), _i32(N), init_body,
            (zeros, zeros, zeros, zeros, jnp.asarray(0, jnp.int32)),
        )
        xN0 = [Xo[N, i] for i in range(nx)]
        J0 = J0 + term_cost(xN0)
        merit0 = J0 - mu0 * sumlog0

        sc[_DONE] = zeros
        sc[_STATUS] = zeros + _ST_MAX_ITER
        sc[_IT] = zeros
        sc[_COST] = J0
        sc[_MERIT] = merit0
        sc[_MU] = mu0
        sc[_REG] = zeros + cfg.reg0
        sc[_INFPR] = infpr0
        sc[_INFDU] = zeros
        sc[_INFCOMP] = zeros
        sc[_STEPN] = zeros
        sc[_APR] = ones
        sc[_ADU] = ones
        sc[_DV0] = zeros
        sc[_DV1] = zeros
        # Filter seeded with the initial entry (msipddp _drive filt0).
        for i in range(_F_CAP):
            sc[_F_M0 + i] = zeros + jnp.inf
            sc[_F_V0 + i] = zeros + jnp.inf
            sc[_F_OK0 + i] = zeros
        sc[_F_M0] = merit0
        sc[_F_V0] = cv0
        sc[_F_OK0] = ones

        # --- one driver iteration --------------------------------------------
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
                        xN = [Xo[N, i] for i in range(nx)]
                        VxT, VxxT = term_value(xN)
                        for i in range(nx):
                            Vxs[N, i] = jnp.where(mrt, VxT[i], Vxs[N, i])
                            for j in range(nx):
                                Vxxs[N, i, j] = jnp.where(
                                    mrt, VxxT[i][j], Vxxs[N, i, j]
                                )

                        def bstep(_s, carry):
                            t = carry[-1]
                            Vx = list(carry[0])
                            Vxx = [list(r) for r in carry[1]]
                            (dv0, dv1, infdu, infpr, infcomp, infdef,
                             stepn, okl) = carry[2:-1]
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
                            d = [Fo[t, i] - Xo[t + 1, i] for i in range(nx)]
                            lam = [Lo[t, i] for i in range(nx)]
                            (k_u, K_u, k_lam, Vx_new, Vxx_new, dv0s, dv1s,
                             Qu_c, pr, comp, pd_ok) = msipddp_step_lanes(
                                A, Bm, lx, lu, lxx, luu, lux, y, s, g,
                                Gx_c, Gu_c, d, lam, Vx, Vxx, mu, regl,
                                nx, nu, m,
                            )
                            for i in range(nu):
                                ko[t, i] = jnp.where(mrt, k_u[i], ko[t, i])
                                for j in range(nx):
                                    Ko[t, i, j] = jnp.where(
                                        mrt, K_u[i][j], Ko[t, i, j]
                                    )
                            for i in range(nx):
                                klamS[t, i] = jnp.where(
                                    mrt, k_lam[i], klamS[t, i]
                                )
                                Vxs[t, i] = jnp.where(
                                    mrt, Vx_new[i], Vxs[t, i]
                                )
                                for j in range(nx):
                                    Vxxs[t, i, j] = jnp.where(
                                        mrt, Vxx_new[i][j], Vxxs[t, i, j]
                                    )
                            # ok gates on PD only (msipddp._backward_pass
                            # step: `ok & ~fail` — no finiteness checks,
                            # unlike IPDDP; the forward rejects non-finite
                            # trajectories instead).
                            okl = okl * jnp.where(pd_ok, ones, zeros)
                            for i in range(nu):
                                infdu = jnp.maximum(infdu, jnp.abs(Qu_c[i]))
                                stepn = jnp.maximum(stepn, jnp.abs(k_u[i]))
                            for i in range(m):
                                infpr = jnp.maximum(infpr, jnp.abs(pr[i]))
                                infcomp = jnp.maximum(
                                    infcomp, jnp.abs(comp[i])
                                )
                            for i in range(nx):
                                infdef = jnp.maximum(infdef, jnp.abs(d[i]))
                            return (
                                tuple(Vx_new),
                                tuple(tuple(r) for r in Vxx_new),
                                dv0 + dv0s, dv1 + dv1s,
                                infdu, infpr, infcomp, infdef, stepn, okl,
                                t - _i32(1),
                            )

                        init = (
                            tuple(VxT),
                            tuple(tuple(r) for r in VxxT),
                            zeros, zeros, zeros, zeros, zeros, zeros,
                            zeros, ones, jnp.asarray(N - 1, jnp.int32),
                        )
                        out = jax.lax.fori_loop(
                            _i32(0), _i32(N), bstep, init
                        )
                        (dv0, dv1, infdu, infpr, infcomp, infdef, stepn,
                         okl) = out[2:-1]

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
                        sc[_INFPR] = jnp.where(
                            mrt, jnp.maximum(infpr, infdef), sc[_INFPR]
                        )
                        sc[_INFCOMP] = jnp.where(mrt, infcomp, sc[_INFCOMP])
                        sc[_STEPN] = jnp.where(mrt, stepn, sc[_STEPN])
                        sc[_BP_LIMIT] = jnp.where(
                            mrt, jnp.where(limit, ones, zeros),
                            sc[_BP_LIMIT],
                        )
                        sc[_BP_DONE] = jnp.where(
                            mrt, jnp.where(okb | limit, ones, zeros),
                            sc[_BP_DONE],
                        )

                    return c2

                jax.lax.fori_loop(_i32(0), _i32(cfg.bp_bound), bp_attempt, 0)
                bpl = sc[_BP_LIMIT] > 0.5
                mab = active & (~bpl)

                # ---- sequential first-success line search ----
                tau = jnp.maximum(zeros + cfg.min_ftb, 1.0 - mu)
                sc[_LS_FOUND] = jnp.where(mab, zeros, ones)
                sc[_LS_OK] = zeros

                def ls_iter(_i, li):
                    # Own int32 counter (the Mosaic x64 fori-var pitfall).
                    pending_any = jnp.max(ones - sc[_LS_FOUND]) > 0.5

                    @pl.when(pending_any)
                    def _rollout():
                        # Exact ladder entry (line_search_alphas), selected
                        # by the static-unrolled counter compare.
                        alpha = zeros + cfg.alphas[0]
                        for jx, av in enumerate(cfg.alphas):
                            alpha = jnp.where(
                                li == _i32(jx), zeros + av, alpha
                            )
                        mnf = sc[_LS_FOUND] < 0.5

                        def fstep(_s, carry):
                            x = list(carry[0])
                            (J, sumlog, cvp, cvd, sfeas, finx) = carry[1:7]
                            yfeas = list(carry[7])
                            t = carry[-1]
                            tp1 = t + _i32(1)
                            xb = [Xo[t, i] for i in range(nx)]
                            ub = [Uo[t, i] for i in range(nu)]
                            dx = [x[i] - xb[i] for i in range(nx)]
                            y = [Yo[t, i] for i in range(m)]
                            s = [So[t, i] for i in range(m)]
                            g_nom = box_g(xb, ub)
                            k_u = [ko[t, i] for i in range(nu)]
                            K_u = [[Ko[t, i, j] for j in range(nx)]
                                   for i in range(nu)]
                            k_y, K_y, k_s, K_s = msipddp_gain_lanes(
                                y, s, g_nom, Gx_c, Gu_c, k_u, K_u, mu,
                                nx, nu, m,
                            )
                            eps = jnp.finfo(tau.dtype).eps
                            omt = 1.0 - tau
                            u = [
                                ub[i] + alpha * k_u[i]
                                + sum(K_u[i][j] * dx[j] for j in range(nx))
                                for i in range(nu)
                            ]
                            g_new = box_g(x, u)
                            for i in range(m):
                                Kdx = sum(K_s[i][j] * dx[j]
                                          for j in range(nx))
                                s_new_i = s[i] + alpha * k_s[i] + Kdx
                                slop = 16.0 * eps * (
                                    1.0 + jnp.abs(s[i]) + jnp.abs(s_new_i)
                                )
                                sfeas = sfeas * jnp.where(
                                    (s_new_i > 0.0)
                                    & (s_new_i >= omt * s[i] - slop),
                                    ones, zeros,
                                )
                                sumlog = sumlog + jnp.log(s_new_i)
                                cvp = cvp + jnp.abs(g_new[i] + s_new_i)
                                Sc[t, i] = jnp.where(mnf, s_new_i, Sc[t, i])
                            # Per-alpha_y dual feasibility masks
                            # (separate dual ladder, :1618-1676).
                            for i in range(m):
                                Kydx = sum(K_y[i][j] * dx[j]
                                           for j in range(nx))
                                for jx, ay in enumerate(cfg.alphas):
                                    y_new_i = y[i] + ay * k_y[i] + Kydx
                                    slop_y = 16.0 * eps * (
                                        1.0 + jnp.abs(y[i])
                                        + jnp.abs(y_new_i)
                                    )
                                    yfeas[jx] = yfeas[jx] * jnp.where(
                                        (y_new_i > 0.0)
                                        & (y_new_i >= omt * y[i] - slop_y),
                                        ones, zeros,
                                    )
                            J = J + run_cost(x, u, t)
                            f_new = _integrate_lane(
                                lane_f, integrator, x, u, p, dt
                            )
                            if cfg.seg > 1:
                                # Dynamic boundary mask ((t+1) % seg == 0
                                # and t+1 < N) — the static per-t pattern
                                # selected by the traced counter, like the
                                # driver's boundary scan input.
                                q = tp1 - (tp1 // _i32(cfg.seg)) * _i32(
                                    cfg.seg
                                )
                                # Lane-broadcast bool (scalar-i1 selects
                                # over vectors are a Mosaic hazard; OR
                                # with a lane-shaped False broadcasts).
                                is_bl = (
                                    (q == _i32(0)) & (tp1 < _i32(N))
                                ) | (zeros > ones)
                                f_old = [Fo[t, i] for i in range(nx)]
                                xb_next = [Xo[tp1, i] for i in range(nx)]
                                if cfg.rollout_type == "nonlinear":
                                    gap_x = [
                                        xb_next[i]
                                        + (f_new[i] - f_old[i])
                                        + alpha * (f_old[i] - xb_next[i])
                                        for i in range(nx)
                                    ]
                                elif cfg.rollout_type == "hybrid":
                                    Fx, Fu = deriv_f(xb, ub, p)
                                    # (A + B K) dx + alpha (B k + f_old -
                                    # xb_next), A = I + dt Fx, B = dt Fu.
                                    Bk = [
                                        dt * sum(Fu[i][j] * k_u[j]
                                                 for j in range(nu))
                                        for i in range(nx)
                                    ]
                                    BKdx = [
                                        dt * sum(
                                            Fu[i][j] * sum(
                                                K_u[j][l] * dx[l]
                                                for l in range(nx)
                                            )
                                            for j in range(nu)
                                        )
                                        for i in range(nx)
                                    ]
                                    Adx = [
                                        dx[i] + dt * sum(
                                            Fx[i][j] * dx[j]
                                            for j in range(nx)
                                        )
                                        for i in range(nx)
                                    ]
                                    gap_x = [
                                        xb_next[i] + Adx[i] + BKdx[i]
                                        + alpha * (
                                            Bk[i] + f_old[i] - xb_next[i]
                                        )
                                        for i in range(nx)
                                    ]
                                else:  # dense
                                    gap_x = f_new
                                x_next = [
                                    jnp.where(is_bl, gap_x[i], f_new[i])
                                    for i in range(nx)
                                ]
                            else:
                                x_next = f_new
                            lam = [Lo[t, i] for i in range(nx)]
                            lam_new = [
                                lam[i] + alpha * klamS[t, i]
                                + sum(Vxxs[tp1, i, j] * dx[j]
                                      for j in range(nx))
                                for i in range(nx)
                            ]
                            # cv defect term: |f_new - x_next| (zero off
                            # boundary; F_new = f_new is the new shooting
                            # state).
                            for i in range(nx):
                                cvd = cvd + jnp.abs(f_new[i] - x_next[i])
                                finx = finx * fin(x_next[i])
                                Fc[t, i] = jnp.where(mnf, f_new[i], Fc[t, i])
                                Lc[t, i] = jnp.where(
                                    mnf, lam_new[i], Lc[t, i]
                                )
                                Xc[tp1, i] = jnp.where(
                                    mnf, x_next[i], Xc[tp1, i]
                                )
                            for i in range(nu):
                                finx = finx * fin(u[i])
                                Uc[t, i] = jnp.where(mnf, u[i], Uc[t, i])
                            return (
                                tuple(x_next), J, sumlog, cvp, cvd, sfeas,
                                finx, tuple(yfeas), tp1,
                            )

                        x0l = tuple(Xo[0, i] for i in range(nx))
                        out = jax.lax.fori_loop(
                            _i32(0), _i32(N), fstep,
                            (x0l, zeros, zeros, zeros, zeros, ones, ones,
                             tuple(ones for _ in range(n_alpha)),
                             jnp.asarray(0, jnp.int32)),
                        )
                        xN = list(out[0])
                        J, sumlog, cvp, cvd, sfeas, finx = out[1:7]
                        yfeas = list(out[7])
                        J = J + term_cost(xN)

                        any_y = zeros
                        a_du = zeros + cfg.alphas[0]
                        for jx in reversed(range(n_alpha)):
                            take_j = yfeas[jx] > 0.5
                            a_du = jnp.where(
                                take_j, zeros + cfg.alphas[jx], a_du
                            )
                            any_y = jnp.maximum(
                                any_y, jnp.where(take_j, ones, zeros)
                            )

                        merit = J - mu * sumlog
                        cv = cvp + cvd
                        expected = alpha * sc[_DV0]
                        fm = [sc[_F_M0 + i] for i in range(_F_CAP)]
                        fv = [sc[_F_V0 + i] for i in range(_F_CAP)]
                        fok = [sc[_F_OK0 + i] for i in range(_F_CAP)]
                        accept = _ms_filter_acceptable(
                            fm, fv, fok, merit, cv, expected, cfg,
                            zeros, ones,
                        )
                        take = (
                            (sfeas > 0.5) & (any_y > 0.5) & (finx > 0.5)
                            & (accept > 0.5) & mnf
                        )
                        sc[_TJ] = jnp.where(take, J, sc[_TJ])
                        sc[_TMERIT] = jnp.where(take, merit, sc[_TMERIT])
                        sc[_TCV] = jnp.where(take, cv, sc[_TCV])
                        sc[_TSUMLOG] = jnp.where(take, sumlog, sc[_TSUMLOG])
                        sc[_TAPR] = jnp.where(take, alpha, sc[_TAPR])
                        sc[_TADU] = jnp.where(take, a_du, sc[_TADU])
                        sc[_LS_OK] = jnp.where(take, ones, sc[_LS_OK])
                        sc[_LS_FOUND] = jnp.where(take, ones, sc[_LS_FOUND])

                    return li + _i32(1)

                jax.lax.fori_loop(_i32(0), _i32(n_alpha), ls_iter,
                                  jnp.asarray(0, jnp.int32))

                fp_ok = sc[_LS_OK] > 0.5
                commit_m = mab & fp_ok
                fail_m = mab & (~fp_ok)

                # ---- commit pass 1: dual update at the NOMINAL state
                # (reads Xo/Uo, so it must run before the state copy) ----
                def commit_y_body(_s, t):
                    xb = [Xo[t, i] for i in range(nx)]
                    ub = [Uo[t, i] for i in range(nu)]
                    dx = [Xc[t, i] - Xo[t, i] for i in range(nx)]
                    y = [Yo[t, i] for i in range(m)]
                    s = [So[t, i] for i in range(m)]
                    g_nom = box_g(xb, ub)
                    k_u = [ko[t, i] for i in range(nu)]
                    K_u = [[Ko[t, i, j] for j in range(nx)]
                           for i in range(nu)]
                    k_y, K_y, _k_s, _K_s = msipddp_gain_lanes(
                        y, s, g_nom, Gx_c, Gu_c, k_u, K_u, mu, nx, nu, m
                    )
                    for i in range(m):
                        y_new_i = y[i] + sc[_TADU] * k_y[i] + sum(
                            K_y[i][j] * dx[j] for j in range(nx)
                        )
                        Yo[t, i] = jnp.where(commit_m, y_new_i, Yo[t, i])
                    return t + _i32(1)

                jax.lax.fori_loop(_i32(0), _i32(N), commit_y_body,
                                  jnp.asarray(0, jnp.int32))

                # ---- commit pass 2: state copy ----
                def commit_body(_s, t):
                    tp1 = t + _i32(1)
                    for i in range(m):
                        So[t, i] = jnp.where(commit_m, Sc[t, i], So[t, i])
                    for i in range(nx):
                        Xo[tp1, i] = jnp.where(
                            commit_m, Xc[tp1, i], Xo[tp1, i]
                        )
                        Fo[t, i] = jnp.where(commit_m, Fc[t, i], Fo[t, i])
                        Lo[t, i] = jnp.where(commit_m, Lc[t, i], Lo[t, i])
                    for i in range(nu):
                        Uo[t, i] = jnp.where(commit_m, Uc[t, i], Uo[t, i])
                    return tp1

                jax.lax.fori_loop(_i32(0), _i32(N), commit_body,
                                  jnp.asarray(0, jnp.int32))

                # ---- post-state accumulation (serves the commit path's
                # convergence/sdu AND the fail path's barrier reset — the
                # live state is committed for commit lanes, unchanged for
                # fail lanes) ----
                def post_body(_s, carry):
                    (sumlog, cvp, cvd, infpr, infdef, maxys, minys,
                     ysl1, t) = carry
                    x = [Xo[t, i] for i in range(nx)]
                    u = [Uo[t, i] for i in range(nu)]
                    g = box_g(x, u)
                    for i in range(m):
                        s_i = So[t, i]
                        y_i = Yo[t, i]
                        sumlog = sumlog + jnp.log(s_i)
                        r = g[i] + s_i
                        cvp = cvp + jnp.abs(r)
                        infpr = jnp.maximum(infpr, jnp.abs(r))
                        ys = y_i * s_i
                        maxys = jnp.maximum(maxys, ys)
                        minys = jnp.minimum(minys, ys)
                        ysl1 = ysl1 + jnp.abs(y_i) + jnp.abs(s_i)
                    for i in range(nx):
                        di = Fo[t, i] - Xo[t + 1, i]
                        cvd = cvd + jnp.abs(di)
                        infdef = jnp.maximum(infdef, jnp.abs(di))
                    return (sumlog, cvp, cvd, infpr, infdef, maxys, minys,
                            ysl1, t + _i32(1))

                (sumlogP, cvpP, cvdP, infprP, infdefP, maxysP, minysP,
                 ysl1P, _) = jax.lax.fori_loop(
                    _i32(0), _i32(N), post_body,
                    (zeros, zeros, zeros, zeros, zeros, zeros - jnp.inf,
                     zeros + jnp.inf, zeros, jnp.asarray(0, jnp.int32)),
                )
                inf_pr_post = jnp.maximum(infprP, infdefP)
                cv_post = cvpP + cvdP
                infcomp_post = jnp.maximum(maxysP - mu, mu - minysP)

                # ---- commit bookkeeping ----
                dJ = sc[_COST] - sc[_TJ]
                # filter accept (no prune on commit — msipddp commit()).
                fm = [sc[_F_M0 + i] for i in range(_F_CAP)]
                fv = [sc[_F_V0 + i] for i in range(_F_CAP)]
                fok = [sc[_F_OK0 + i] for i in range(_F_CAP)]
                am, av, aok = _filter_accept(
                    fm, fv, fok, sc[_TMERIT], sc[_TCV], zeros, ones
                )
                for i in range(_F_CAP):
                    sc[_F_M0 + i] = jnp.where(commit_m, am[i],
                                              sc[_F_M0 + i])
                    sc[_F_V0 + i] = jnp.where(commit_m, av[i],
                                              sc[_F_V0 + i])
                    sc[_F_OK0 + i] = jnp.where(commit_m, aok[i],
                                               sc[_F_OK0 + i])
                reg_dec = jnp.maximum(sc[_REG] / cfg.reg_uf, cfg.reg_min)

                # Convergence (msipddp_solver.cpp:311-364): sd-scaled
                # inf_du in the metric.
                smax = 100.0
                n_du = float(m * N + nu * N)
                sd = jnp.maximum(zeros + smax, ysl1P / n_du) / smax
                sdu = sc[_INFDU] / sd
                metric = jnp.maximum(
                    jnp.maximum(sdu, inf_pr_post), infcomp_post
                )
                conv_opt = metric <= cfg.tolerance
                sqrt_atol = math.sqrt(max(cfg.acceptable_tolerance, 0.0))
                it = sc[_IT]
                conv_acc = (
                    (jnp.abs(dJ) < cfg.acceptable_tolerance)
                    & (it > 10.0)
                    & (inf_pr_post < sqrt_atol)
                    & (infcomp_post < sqrt_atol)
                ) | (
                    (it >= 1.0)
                    & (sc[_STEPN] < cfg.tolerance * 10.0)
                    & (inf_pr_post < 1e-4)
                )
                status_c = jnp.where(
                    conv_opt, zeros + _ST_OPTIMAL,
                    jnp.where(conv_acc, zeros + _ST_ACCEPTABLE,
                              sc[_STATUS]),
                )
                done_c = conv_opt | conv_acc

                # ---- fail path: filter restoration, reg, limit ----
                fsize = zeros
                finv = zeros > ones
                for i in range(_F_CAP):
                    fsize = fsize + sc[_F_OK0 + i]
                    finv = finv | (
                        (sc[_F_OK0 + i] > 0.5)
                        & ~(jnp.isfinite(sc[_F_M0 + i])
                            & jnp.isfinite(sc[_F_V0 + i]))
                    )
                needs_restore = (fsize > 5.0) | finv
                pm, pv, pok = _filter_prune(
                    [sc[_F_M0 + i] for i in range(_F_CAP)],
                    [sc[_F_V0 + i] for i in range(_F_CAP)],
                    [sc[_F_OK0 + i] for i in range(_F_CAP)],
                    zeros, ones,
                )
                restore_m = fail_m & needs_restore
                for i in range(_F_CAP):
                    sc[_F_M0 + i] = jnp.where(restore_m, pm[i],
                                              sc[_F_M0 + i])
                    sc[_F_V0 + i] = jnp.where(restore_m, pv[i],
                                              sc[_F_V0 + i])
                    sc[_F_OK0 + i] = jnp.where(restore_m, pok[i],
                                               sc[_F_OK0 + i])
                reg_fail = jnp.minimum(sc[_REG] * cfg.reg_uf, cfg.reg_max)
                limit_f = (~needs_restore) & (reg_fail >= cfg.reg_max)
                status_f = jnp.where(
                    limit_f, zeros + _ST_REG_LIMIT, sc[_STATUS]
                )

                # ---- scalar write-back ----
                sc[_COST] = jnp.where(commit_m, sc[_TJ], sc[_COST])
                sc[_MERIT] = jnp.where(commit_m, sc[_TMERIT], sc[_MERIT])
                sc[_INFPR] = jnp.where(commit_m, inf_pr_post, sc[_INFPR])
                sc[_INFCOMP] = jnp.where(
                    commit_m, infcomp_post, sc[_INFCOMP]
                )
                sc[_APR] = jnp.where(commit_m, sc[_TAPR], sc[_APR])
                sc[_ADU] = jnp.where(commit_m, sc[_TADU], sc[_ADU])
                sc[_REG] = jnp.where(
                    commit_m, reg_dec,
                    jnp.where(
                        fail_m & (~needs_restore), reg_fail, sc[_REG]
                    ),
                )
                mbpl = active & bpl
                sc[_STATUS] = jnp.where(
                    mbpl, zeros + _ST_REG_LIMIT,
                    jnp.where(
                        commit_m, status_c,
                        jnp.where(fail_m & limit_f, status_f, sc[_STATUS]),
                    ),
                )
                sc[_DONE] = jnp.where(
                    mbpl, ones,
                    jnp.where(
                        commit_m, jnp.where(done_c, ones, zeros),
                        jnp.where(
                            fail_m, jnp.where(limit_f, ones, zeros),
                            sc[_DONE],
                        ),
                    ),
                )

                # ---- barrier update (every non-terminal iteration;
                # commit path with fp_success=True, fail path False) ----
                upd_m = (commit_m & ~done_c) | (fail_m & ~limit_f)
                mu_old = mu
                if cfg.strategy == "monotonic":
                    mu_new = jnp.maximum(
                        zeros + cfg.mu_min_value,
                        cfg.mu_update_factor * mu_old,
                    )
                    changed = ones > zeros
                elif cfg.strategy == "ipopt":
                    linear = cfg.mu_update_factor * mu_old
                    superlinear = jnp.exp(
                        cfg.mu_update_power * jnp.log(mu_old)
                    )
                    cand = jnp.maximum(
                        zeros + cfg.tolerance / 10.0,
                        jnp.minimum(linear, superlinear),
                    )
                    changed = metric <= 10.0 * mu_old
                    mu_new = jnp.where(changed, cand, mu_old)
                else:  # adaptive
                    threshold = jnp.where(
                        mu_old < 1e-5,
                        jnp.maximum(metric * 10.0, mu_old * 100.0),
                        jnp.maximum(
                            cfg.mu_update_factor * mu_old, mu_old * 2.0
                        ),
                    )
                    slow = (
                        commit_m & (sc[_APR] > 0.0) & (metric < 1e-3)
                    )
                    ratio = metric / mu_old
                    factor = jnp.where(
                        ratio < 0.01,
                        zeros + cfg.mu_update_factor * 0.1,
                        jnp.where(
                            ratio < 0.1,
                            zeros + cfg.mu_update_factor * 0.3,
                            jnp.where(
                                ratio < 0.5,
                                zeros + cfg.mu_update_factor * 0.6,
                                zeros + cfg.mu_update_factor,
                            ),
                        ),
                    )
                    factor = jnp.where(
                        mu_old > 1e-12, factor,
                        zeros + cfg.mu_update_factor,
                    )
                    linear = factor * mu_old
                    superlinear = jnp.exp(
                        cfg.mu_update_power * jnp.log(mu_old)
                    )
                    minls = jnp.minimum(linear, superlinear)
                    cand = jnp.where(
                        slow & (mu_old > cfg.tolerance),
                        minls,
                        jnp.maximum(zeros + cfg.tolerance / 100.0, minls),
                    )
                    changed = (metric <= threshold) | slow
                    mu_new = jnp.where(changed, cand, mu_old)

                apply_m = upd_m & changed
                # resetBarrierFilter quantities at the live state, mu_new.
                merit2 = sc[_COST] - mu_new * sumlogP
                infcomp2 = jnp.maximum(maxysP - mu_new, mu_new - minysP)
                sc[_MU] = jnp.where(apply_m, mu_new, sc[_MU])
                sc[_MERIT] = jnp.where(apply_m, merit2, sc[_MERIT])
                sc[_INFPR] = jnp.where(apply_m, inf_pr_post, sc[_INFPR])
                sc[_INFCOMP] = jnp.where(apply_m, infcomp2, sc[_INFCOMP])
                for i in range(_F_CAP):
                    if i == 0:
                        sc[_F_M0] = jnp.where(apply_m, merit2, sc[_F_M0])
                        sc[_F_V0] = jnp.where(apply_m, cv_post, sc[_F_V0])
                        sc[_F_OK0] = jnp.where(apply_m, ones, sc[_F_OK0])
                    else:
                        sc[_F_M0 + i] = jnp.where(
                            apply_m, zeros + jnp.inf, sc[_F_M0 + i]
                        )
                        sc[_F_V0 + i] = jnp.where(
                            apply_m, zeros + jnp.inf, sc[_F_V0 + i]
                        )
                        sc[_F_OK0 + i] = jnp.where(
                            apply_m, zeros, sc[_F_OK0 + i]
                        )

            return carry

        jax.lax.fori_loop(_i32(0), _i32(cfg.max_iterations), outer, 0)

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

    def call(X0, U0, Y0, S0, F0, L0, ku0, Ku0, mu0, dtv, params, Q, R, Qf,
             goal, refs, lo, hi, sfv, interpret=False):
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
            spec(N, nx), spec(N, nx), spec(N, nu), spec(N, nu, nx),
            spec(1), spec(1), spec(np_eff),
            spec(nx, nx), spec(nu, nu), spec(nx, nx), spec(nx),
        ] + ([spec(N, nx)] if tracking else []) + [
            spec(nb), spec(nb), spec(n_items),
        ]
        out_specs = (
            spec(N + 1, nx), spec(N, nu), spec(N, nu), spec(N, nu, nx),
            spec(N, m), spec(N, m), spec(N, nx), spec(N, nx), spec(9),
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct(s + (rows, 128), dtype)
            for s in (
                (N + 1, nx), (N, nu), (N, nu), (N, nu, nx), (N, m),
                (N, m), (N, nx), (N, nx), (9,),
            )
        )
        scratch = [
            pltpu.VMEM((N + 1, nx, tbs, 128), dtype),      # Vxs
            pltpu.VMEM((N + 1, nx, nx, tbs, 128), dtype),  # Vxxs
            pltpu.VMEM((N, nx, tbs, 128), dtype),          # klamS
            pltpu.VMEM((N + 1, nx, tbs, 128), dtype),      # Xc
            pltpu.VMEM((N, nu, tbs, 128), dtype),          # Uc
            pltpu.VMEM((N, m, tbs, 128), dtype),           # Sc
            pltpu.VMEM((N, nx, tbs, 128), dtype),          # Fc
            pltpu.VMEM((N, nx, tbs, 128), dtype),          # Lc
            pltpu.VMEM((_N_SCALARS, tbs, 128), dtype),     # sc
        ]
        ins = (X0, U0, Y0, S0, F0, L0, ku0, Ku0, mu0, dtv, params,
               Q, R, Qf, goal)
        if tracking:
            ins = ins + (refs,)
        ins = ins + (lo, hi, sfv)
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

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _box_stack(stk):
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


def _vmem_estimate_bytes(problem, tile_b: int = DEFAULT_TILE_B) -> int:
    from cddp_tpu.constraints.stack import PathStacker

    nx, nu, N = problem.state_dim, problem.control_dim, problem.horizon
    stk = PathStacker(problem)
    m = stk.total_dim
    entry = _model_entry(problem.model)
    np_eff = max(entry[1], 1) if entry is not None else 1
    tracking = getattr(problem.objective, "reference_states", None) is not None
    cost_in = 2 * nx * nx + nu * nu + nx + (N * nx if tracking else 0)
    nb = m // 2
    ins = (
        (N + 1) * nx + N * nu + 2 * N * m + 2 * N * nx + N * nu
        + N * nu * nx + 2 + np_eff + cost_in + 2 * nb + len(stk.items)
    )
    outs = (
        (N + 1) * nx + 2 * N * nu + N * nu * nx + 2 * N * m + 2 * N * nx
        + 9
    )
    scratch = (
        (N + 1) * nx * (2 + nx) + N * nx          # Vxs, Vxxs, klamS
        + (N + 1) * nx + N * nu + N * m + 2 * N * nx  # Xc, Uc, Sc, Fc, Lc
        + _N_SCALARS
    )
    return (ins + outs + scratch) * tile_b * 4


def mega_ms_eligible(problem, options) -> bool:
    """Static dispatch predicate for the whole-solve MSIPDDP kernel."""
    import os

    from cddp_tpu.costs.objective import QuadraticObjective
    from cddp_tpu.constraints.stack import PathStacker, TerminalStacker

    if os.environ.get("CDDP_TPU_NO_MEGA"):
        return False
    entry = _model_entry(problem.model)
    if entry is None or entry[4]:
        return False
    if not isinstance(problem.objective, QuadraticObjective):
        return False
    stk = PathStacker(problem)
    tstk = TerminalStacker(problem)
    if _box_stack(stk) is None or stk.total_dim == 0:
        return False
    if tstk.ineq_dim > 0 or tstk.eq_dim > 0:
        return False
    ms = options.msipddp
    return (
        problem.model.integration_type in ("euler", "heun", "rk3", "rk4")
        and options.use_ilqr
        and not options.enable_parallel
        and ms.lqr_backend == "sequential"
        and ms.rollout_type in ("nonlinear", "hybrid", "dense")
        and options.backward_engine == "auto"
        and options.solve_engine != "xla"
        and not options.return_iteration_info
        and not options.verbose
        and not options.debug
        and options.max_cpu_time <= 0
        and options.max_iterations >= 1
        and options.regularization.update_factor > 1.0
        and _vmem_estimate_bytes(problem) <= _VMEM_BUDGET_BYTES
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "kind", "integrator", "box_layout", "tile_b",
                     "interpret"),
)
def _mega_ms_impl(X0, U0, Y0, S0, F0, L0, ku0, Ku0, mu0, dtv, params, Q, R,
                  Qf, goal, refs, lo, hi, sfv, cfg: _MsCfg, kind,
                  integrator: str, box_layout,
                  tile_b: int = DEFAULT_TILE_B, interpret: bool = False):
    """Batch-first wrapper: pad to a tile multiple, transpose to
    batch-last, run the kernel, trim."""
    B0 = X0.shape[0]
    nx, nu, N, m = X0.shape[2], U0.shape[2], U0.shape[1], Y0.shape[2]
    pad = (-B0) % tile_b
    tracking = refs is not None

    def prep(v):
        if pad:
            v = jnp.concatenate([v, jnp.repeat(v[-1:], pad, 0)], 0)
        return jnp.moveaxis(v, 0, -1)

    n_params, lane_f = _model_lanes_by_key(kind)
    deriv_f = deriv_lane_fn(kind, lane_f, nx, nu)
    call = make_ms_solve_kernel(
        nx, nu, m, N, n_params, lane_f, deriv_f, integrator, box_layout,
        cfg, tracking, tile_b=tile_b,
    )
    args = [
        prep(v) if v is not None else None
        for v in (X0, U0, Y0, S0, F0, L0, ku0, Ku0, mu0[:, None],
                  dtv[:, None], params, Q, R, Qf, goal, refs, lo, hi, sfv)
    ]
    outs = call(*args, interpret=interpret)
    unprep = lambda v: jnp.moveaxis(v, -1, 0)[:B0]
    return tuple(unprep(o) for o in outs)


def build_fused_ms_solve(problem, options, interpret: bool = False,
                         obj_treedef=None):
    """Batch-first fused whole-solve for a concrete (problem, options):
    ``fused(x0, X0, U0, Y0, S0, F0, L0, mu0, ku0, Ku0, *obj_leaves) ->
    (X, U, k, K, Y, S, F, Lambda, cost, inf_pr, inf_du, inf_comp, mu,
    reg, alpha_pr, iterations(int32), status(int32))``. Also the test
    entry for interpret-mode parity runs."""
    kind = _model_entry(problem.model)[0]
    integrator = problem.model.integration_type
    obj0 = problem.objective
    from cddp_tpu.constraints.stack import PathStacker

    stk = PathStacker(problem)
    boxes = _box_stack(stk)
    box_layout = tuple(k for k, _ in boxes)
    cfg = _make_cfg(options)
    n_params, param_fn = _model_entry(problem.model)[1:3]

    def fused_impl(x0, X0, U0, Y0, S0, F0, L0, mu0, ku0, Ku0, *obj_leaves):
        B = x0.shape[0]
        N = U0.shape[1]
        dtype = x0.dtype

        def bc(a):
            a = jnp.asarray(a, dtype)
            return jnp.broadcast_to(a, (B,) + a.shape)

        if obj_leaves:
            obj = jax.tree_util.tree_unflatten(obj_treedef, obj_leaves)
            batched_obj = True
        else:
            obj = obj0
            batched_obj = False

        params = bc(jnp.asarray(param_fn(problem.model), dtype))
        if n_params == 0:
            params = jnp.zeros((B, 1), dtype)
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
        lo = bc(jnp.concatenate(
            [jnp.asarray(cb.lower, dtype).reshape(-1) for _, cb in boxes]
        ))
        hi = bc(jnp.concatenate(
            [jnp.asarray(cb.upper, dtype).reshape(-1) for _, cb in boxes]
        ))
        sfv = bc(jnp.stack(
            [jnp.asarray(cb.scale_factor, dtype) for _, cb in boxes]
        ))
        outs = _mega_ms_impl(
            X0, U0, Y0, S0, F0, L0, ku0, Ku0,
            jnp.broadcast_to(jnp.asarray(mu0, dtype), (B,)),
            jnp.broadcast_to(jnp.asarray(problem.timestep, dtype), (B,)),
            params, Qb, Rb, Qfb, goalb, refs, lo, hi, sfv,
            cfg=cfg, kind=kind, integrator=integrator,
            box_layout=box_layout, tile_b=DEFAULT_TILE_B,
            interpret=interpret,
        )
        X, U, k, K, Y, S, F, Lam, st = outs
        return (
            X, U, k, K, Y, S, F, Lam,
            st[:, 0], st[:, 1], st[:, 2], st[:, 3], st[:, 4], st[:, 5],
            st[:, 6], st[:, 7].astype(jnp.int32),
            st[:, 8].astype(jnp.int32),
        )

    return fused_impl


def msipddp_solve_op(problem, options, interpret: bool = False):
    """Batch-aware whole-solve op: XLA ``_drive`` per unbatched instance,
    the fused kernel for vmapped TPU f32 batches >= MIN_KERNEL_BATCH."""
    from cddp_tpu.solvers import msipddp as _ms

    kind = _model_entry(problem.model)[0]
    obj_leaves0, obj_def = jax.tree_util.tree_flatten(problem.objective)
    fused_impl = build_fused_ms_solve(problem, options, interpret,
                                      obj_treedef=obj_def)

    def scan_single(x0, X0, U0, Y0, S0, F0, L0, mu0, ku0, Ku0,
                    *obj_leaves):
        obj = jax.tree_util.tree_unflatten(obj_def, obj_leaves)
        p = problem.replace(x0=x0, objective=obj)
        from cddp_tpu.constraints.stack import PathStacker

        stk = PathStacker(p)
        G = jax.vmap(stk.evaluate_shifted)(
            X0[:-1], U0, jnp.arange(p.horizon)
        )
        sol, st = _ms._drive(
            p, options, X0, U0, Y0, S0, G, F0, L0, mu0, ku0, Ku0
        )
        return (
            sol.state_trajectory, sol.control_trajectory, st.k_u, st.K_u,
            st.Y, st.S, st.F, st.Lambda, sol.final_objective, sol.inf_pr,
            sol.inf_du, sol.inf_comp, sol.barrier_mu,
            sol.final_regularization, sol.final_step_length,
            sol.iterations_completed, sol.status_code,
        )

    op = make_batched_op(
        scan_single, fused_impl, "MSIPDDP solve",
        min_batch=MIN_KERNEL_BATCH,
        log_detail=lambda x0, *rest: dict(model=kind),
    )

    def call_op(x0, X0, U0, Y0, S0, F0, L0, mu0, ku0, Ku0):
        return op(x0, X0, U0, Y0, S0, F0, L0, mu0, ku0, Ku0, *obj_leaves0)

    return call_op
