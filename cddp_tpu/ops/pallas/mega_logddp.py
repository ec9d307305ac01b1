"""Whole-solve fused LogDDP kernel: the complete batched relaxed
log-barrier solve as ONE ``pallas_call``.

Completes the whole-solve quartet (CLDDP/IPDDP/MSIPDDP/LogDDP — the
round-4 verdict's weak list named LogDDP as one of the two solvers still
capped at the per-pass engines). Semantics mirror
``solvers/logddp.py:_solve`` (logddp_solver.cpp) exactly, scoped to:

- box-only path constraint stacks with ``m > 0`` (doubled one-sided rows;
  the relaxed log-barrier acts on the upper-side distances z = U - g,
  which for the doubled form are exactly the negated shifted residuals),
- QuadraticObjective (goal or per-step ``reference_states`` tracking),
- iLQR Hessians, sequential backward (``log_barrier.lqr_backend ==
  "sequential"``), sequential first-success line search.

LogDDP specifics in-kernel: the relaxed log-barrier beta/beta'/beta''
branch (z > delta log / quadratic extension, with the 1e-12 log guard)
folded into the Q-expansions; the per-iteration refresh of the nominal
merit/violation under the CURRENT barrier coefficient (preIterationSetup);
the (merit, violation) 4-branch acceptance against the refreshed nominal
(no filter array — LogDDP compares to the nominal point only); barrier
decay on success / x5 growth on failure capped at mu_initial; and the
regularization-exhaustion-as-CONVERGED quirk (status 4,
logddp_solver.cpp:216-222).

Dispatch: :func:`logddp_solve_op` + ``solvers/logddp.py`` route vmapped
TPU float32 fleets here when :func:`mega_log_eligible` holds; parity with
the XLA driver is pinned in tests/test_mega_logddp.py (interpret mode,
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
from cddp_tpu.ops.pallas.mega_ipddp import _model_entry, _model_lanes_by_key
from cddp_tpu.ops.pallas.mega_msipddp import _box_stack
from cddp_tpu.ops.pallas.riccati import (
    _inv,
    _leading_minors_pd,
    _matmul,
    _matvec,
    _transpose,
)
from cddp_tpu.ops.pallas.rollout import MIN_KERNEL_BATCH, _integrate_lane

DEFAULT_TILE_B = 1024

(_DONE, _STATUS, _IT, _COST, _MERIT, _CV, _MU, _REG, _INFDU, _APR,
 _DV0, _DV1, _BP_DONE, _BP_LIMIT, _LS_FOUND, _LS_OK,
 _TJ, _TMERIT, _TCV, _TA) = range(20)
_N_SCALARS = 20

_ST_MAX_ITER = 0.0
_ST_OPTIMAL = 1.0
_ST_ACCEPTABLE = 2.0
_ST_REG_LIMIT_NC = 3.0
_ST_REG_LIMIT_CONV = 4.0  # the LogDDP quirk


class _LogCfg(NamedTuple):
    max_iterations: int
    tolerance: float
    acceptable_tolerance: float
    reg0: float
    reg_uf: float
    reg_max: float
    reg_min: float
    alphas: tuple
    bp_bound: int
    mu_initial: float
    mu_update_factor: float
    mu_min_value: float
    delta: float  # relaxed_log_barrier_delta
    # filter thresholds (options.filter — LogDDP reuses the struct)
    armijo: float
    mat: float
    vat: float
    mvfac: float
    max_viol: float


def _make_cfg(options) -> _LogCfg:
    from cddp_tpu.options import line_search_alphas

    reg = options.regularization
    reg_floor = max(min(reg.initial_value, reg.min_value), 1e-300)
    bp_bound = (
        int(math.ceil(math.log(reg.max_value / reg_floor)
                      / math.log(reg.update_factor))) + 2
        if reg.update_factor > 1.0
        else 4
    )
    lb = options.log_barrier
    return _LogCfg(
        max_iterations=int(options.max_iterations),
        tolerance=float(options.tolerance),
        acceptable_tolerance=float(options.acceptable_tolerance),
        reg0=float(reg.initial_value),
        reg_uf=float(reg.update_factor),
        reg_max=float(reg.max_value),
        reg_min=float(reg.min_value),
        alphas=tuple(float(a) for a in line_search_alphas(options.line_search)),
        bp_bound=bp_bound,
        mu_initial=float(lb.barrier.mu_initial),
        mu_update_factor=float(lb.barrier.mu_update_factor),
        mu_min_value=float(lb.barrier.mu_min_value),
        delta=float(lb.relaxed_log_barrier_delta),
        armijo=float(options.filter.armijo_constant),
        mat=float(options.filter.merit_acceptance_threshold),
        vat=float(options.filter.violation_acceptance_threshold),
        mvfac=float(options.filter.min_violation_for_armijo_check),
        max_viol=float(options.filter.max_violation_threshold),
    )


def beta3_lanes(z, delta):
    """(beta, beta', beta'') of the relaxed log-barrier over a lane value
    (constraints/barrier.py beta_derivatives, incl. the 1e-12 log guard)."""
    z_log = jnp.maximum(z, 1e-12)
    log_val = -jnp.log(z_log)
    log_p = -1.0 / z_log
    log_pp = 1.0 / (z_log * z_log)
    term = (z - 2.0 * delta) / delta
    quad_val = 0.5 * (term * term - 1.0) - math.log(delta)
    quad_p = term / delta
    quad_pp = jnp.full_like(z, 1.0 / (delta * delta))
    use_log = z > delta
    return (
        jnp.where(use_log, log_val, quad_val),
        jnp.where(use_log, log_p, quad_p),
        jnp.where(use_log, log_pp, quad_pp),
    )


def logddp_step_lanes(A, Bm, lx, lu, lxx, luu, lux, bx, bu, bxx, buu, bux,
                      Vx, Vxx, reg, nx, nu):
    """One barrier-folded Riccati step over lane lists
    (logddp._backward_pass step_math): returns
    ``(k, K, Vx_new, Vxx_new, dv0, dv1, Qu, pd_ok)``."""
    zeros = jnp.zeros_like(reg)
    At = _transpose(A, nx, nx)
    Bt = _transpose(Bm, nx, nu)
    Atv = _matvec(At, Vx, nx, nx)
    Qx = [lx[i] + Atv[i] + bx[i] for i in range(nx)]
    Btv = _matvec(Bt, Vx, nu, nx)
    Qu = [lu[i] + Btv[i] + bu[i] for i in range(nu)]
    VA = _matmul(Vxx, A, nx, nx, nx)
    Qxx = [[lxx[i][j] + v + bxx[i][j] for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(At, VA, nx, nx, nx))]
    Qux = [[lux[i][j] + v + bux[i][j] for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VA, nu, nx, nx))]
    VB = _matmul(Vxx, Bm, nx, nx, nu)
    Quu = [[luu[i][j] + v + buu[i][j] for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VB, nu, nx, nu))]
    Quu_reg = [[0.5 * (Quu[i][j] + Quu[j][i]) + (reg if i == j else zeros)
                for j in range(nu)] for i in range(nu)]
    Hinv, _ = _inv(Quu_reg, nu)
    pd_ok = _leading_minors_pd(Quu_reg, nu)
    k = [jnp.where(pd_ok, -v, zeros) for v in _matvec(Hinv, Qu, nu, nu)]
    K = [[jnp.where(pd_ok, -v, zeros) for v in row]
         for row in _matmul(Hinv, Qux, nu, nu, nx)]
    dv0 = sum(Qu[i] * k[i] for i in range(nu))
    Quuk = _matvec(Quu, k, nu, nu)
    dv1 = 0.5 * sum(k[i] * Quuk[i] for i in range(nu))
    Kt = _transpose(K, nu, nx)
    Vx_new = [
        Qx[i]
        + sum(Kt[i][l] * (Quuk[l] + Qu[l]) for l in range(nu))
        + sum(Qux[l][i] * k[l] for l in range(nu))
        for i in range(nx)
    ]
    QuuK = _matmul(Quu, K, nu, nu, nx)
    KtQK = _matmul(Kt, QuuK, nx, nu, nx)
    QuxtK = _matmul(_transpose(Qux, nu, nx), K, nx, nu, nx)
    Vxx_new = [[Qxx[i][j] + KtQK[i][j] + QuxtK[i][j] + QuxtK[j][i]
                for j in range(nx)] for i in range(nx)]
    Vxx_new = [[0.5 * (Vxx_new[i][j] + Vxx_new[j][i]) for j in range(nx)]
               for i in range(nx)]
    return k, K, Vx_new, Vxx_new, dv0, dv1, Qu, pd_ok


def make_log_solve_kernel(nx, nu, m, N, n_params, lane_f, deriv_f,
                          integrator, box_layout, cfg: _LogCfg,
                          tracking: bool = False,
                          tile_b: int = DEFAULT_TILE_B):
    """Build the whole-solve LogDDP pallas_call for static problem
    structure. Inputs (batch-last, lane-folded): X0 (N+1,nx,B),
    U0 (N,nu,B), ku0 (N,nu,B), Ku0 (N,nu,nx,B), dt (1,B), params,
    Q/R/Qf (dt-prescaled Q), goal, [refs], lo/hi (nb,B), sf (n_items,B).
    Outputs: X, U, k, K, stats (8,B) = [cost, cv, inf_du, mu, reg,
    alpha_pr, iterations, status]."""
    n_items = len(box_layout)
    nb = sum((nu if k == "control" else nx) for k in box_layout)
    n_alpha = len(cfg.alphas)

    def kernel(X0_ref, U0_ref, ku0_ref, Ku0_ref, dt_ref, p_ref, *rest):
        Q_ref, R_ref, Qf_ref, goal_ref = rest[:4]
        rest = rest[4:]
        refs_ref = None
        if tracking:
            refs_ref, rest = rest[0], rest[1:]
        lo_ref, hi_ref, sf_ref = rest[:3]
        rest = rest[3:]
        (Xo, Uo, ko, Ko, st_ref) = rest[:5]
        rest = rest[5:]
        (Xc, Uc, sc) = rest

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

        def shifted_g(x, u):
            """The doubled one-sided residuals g - U = shifted stack rows
            [(lo - var); (var - hi)] * scale — the barrier distances are
            z = U - g = -(these)."""
            g = []
            off = 0
            for it, kind in enumerate(box_layout):
                var, n = (u, nu) if kind == "control" else (x, nx)
                g += [(lo_ref[off + i] - var[i]) * sf[it] for i in range(n)]
                g += [(var[i] - hi_ref[off + i]) * sf[it] for i in range(n)]
                off += n
            return g

        # Constant raw-jacobian lanes of g = scale*[-var; var] (equal to
        # the shifted stack's jacobians).
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

        def barrier_rows(gshift, mu):
            """(barrier cost, dcost_dg rows, beta'' rows, violation) at a
            step: z = -gshift, dcost_dg = -beta'(z) (upper side only in
            the doubled form), violation = sum(max(gshift, 0))."""
            bc = zeros
            viol = zeros
            d1 = []
            d2 = []
            for i in range(m):
                z = -gshift[i]
                b, bp_, bpp = beta3_lanes(z, cfg.delta)
                bc = bc + mu * b
                d1.append(-bp_)
                d2.append(bpp)
                viol = viol + jnp.maximum(gshift[i], 0.0)
            return bc, d1, d2, viol

        def fin(v):
            return jnp.where(jnp.isfinite(v), ones, zeros)

        # --- init -----------------------------------------------------------
        Xo[...] = X0_ref[...]
        Uo[...] = U0_ref[...]
        ko[...] = ku0_ref[...]
        Ko[...] = Ku0_ref[...]
        Xc[...] = X0_ref[...]
        Uc[...] = U0_ref[...]

        def cost_body(_s, carry):
            J, t = carry
            x = [Xo[t, i] for i in range(nx)]
            u = [Uo[t, i] for i in range(nu)]
            return (J + run_cost(x, u, t), t + _i32(1))

        J0, _ = jax.lax.fori_loop(
            _i32(0), _i32(N), cost_body, (zeros, jnp.asarray(0, jnp.int32))
        )
        J0 = J0 + term_cost([Xo[N, i] for i in range(nx)])

        sc[_DONE] = zeros
        sc[_STATUS] = zeros + _ST_MAX_ITER
        sc[_IT] = zeros
        sc[_COST] = J0
        sc[_MU] = zeros + cfg.mu_initial
        sc[_REG] = zeros + cfg.reg0
        sc[_INFDU] = zeros + jnp.inf
        sc[_APR] = ones

        def outer(_itn, carry):
            done = sc[_DONE]
            any_active = jnp.max(ones - done) > 0.5

            @pl.when(any_active)
            def _iteration():
                active = sc[_DONE] < 0.5
                sc[_IT] = jnp.where(active, sc[_IT] + 1.0, sc[_IT])
                mu = sc[_MU]

                # preIterationSetup: refresh the nominal merit/violation
                # under the CURRENT barrier coefficient.
                def nominal_body(_s, carry):
                    bc, viol, t = carry
                    x = [Xo[t, i] for i in range(nx)]
                    u = [Uo[t, i] for i in range(nu)]
                    bci, _, _, violi = barrier_rows(shifted_g(x, u), mu)
                    return (bc + bci, viol + violi, t + _i32(1))

                bc_old, cv_old, _ = jax.lax.fori_loop(
                    _i32(0), _i32(N), nominal_body,
                    (zeros, zeros, jnp.asarray(0, jnp.int32)),
                )
                merit_old = sc[_COST] + bc_old
                sc[_MERIT] = jnp.where(active, merit_old, sc[_MERIT])
                sc[_CV] = jnp.where(active, cv_old, sc[_CV])

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

                        def bstep(_s, carry):
                            t = carry[-1]
                            Vx = list(carry[0])
                            Vxx = [list(r) for r in carry[1]]
                            dv0, dv1, quer, okl = carry[2:-1]
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
                            _bc, d1, d2, _v = barrier_rows(
                                shifted_g(x, u), mu
                            )
                            # bx = mu * Gx' d1; bxx = mu * Gx'(d2*Gx) etc.
                            bx = [
                                mu * sum(Gx_c[r][i] * d1[r]
                                         for r in range(m))
                                for i in range(nx)
                            ]
                            bu = [
                                mu * sum(Gu_c[r][i] * d1[r]
                                         for r in range(m))
                                for i in range(nu)
                            ]
                            bxx = [[
                                mu * sum(Gx_c[r][i] * d2[r] * Gx_c[r][j]
                                         for r in range(m))
                                for j in range(nx)] for i in range(nx)]
                            buu = [[
                                mu * sum(Gu_c[r][i] * d2[r] * Gu_c[r][j]
                                         for r in range(m))
                                for j in range(nu)] for i in range(nu)]
                            bux = [[
                                mu * sum(Gu_c[r][i] * d2[r] * Gx_c[r][j]
                                         for r in range(m))
                                for j in range(nx)] for i in range(nu)]
                            (k, K, Vx_new, Vxx_new, dv0s, dv1s, Qu,
                             pd_ok) = logddp_step_lanes(
                                A, Bm, lx, lu, lxx, luu, lux, bx, bu,
                                bxx, buu, bux, Vx, Vxx, regl, nx, nu,
                            )
                            for i in range(nu):
                                ko[t, i] = jnp.where(mrt, k[i], ko[t, i])
                                for j in range(nx):
                                    Ko[t, i, j] = jnp.where(
                                        mrt, K[i][j], Ko[t, i, j]
                                    )
                            # ok gates on PD only (logddp step: ok & ~fail;
                            # the parallel backend adds finiteness, the
                            # sequential scan does not).
                            okl = okl * jnp.where(pd_ok, ones, zeros)
                            for i in range(nu):
                                quer = jnp.maximum(quer, jnp.abs(Qu[i]))
                            return (
                                tuple(Vx_new),
                                tuple(tuple(r) for r in Vxx_new),
                                dv0 + dv0s, dv1 + dv1s, quer, okl,
                                t - _i32(1),
                            )

                        out = jax.lax.fori_loop(
                            _i32(0), _i32(N), bstep,
                            (tuple(VxT), tuple(tuple(r) for r in VxxT),
                             zeros, zeros, zeros, ones,
                             jnp.asarray(N - 1, jnp.int32)),
                        )
                        dv0, dv1, quer, okl = out[2:-1]
                        okb = okl > 0.5
                        reg_next = jnp.where(
                            okb, regl,
                            jnp.minimum(regl * cfg.reg_uf, cfg.reg_max),
                        )
                        limit = (~okb) & (reg_next >= cfg.reg_max)
                        sc[_REG] = jnp.where(mrt, reg_next, sc[_REG])
                        sc[_DV0] = jnp.where(mrt, dv0, sc[_DV0])
                        sc[_DV1] = jnp.where(mrt, dv1, sc[_DV1])
                        sc[_INFDU] = jnp.where(mrt, quer, sc[_INFDU])
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
                sc[_LS_FOUND] = jnp.where(mab, zeros, ones)
                sc[_LS_OK] = zeros

                def ls_iter(_i, li):
                    pending_any = jnp.max(ones - sc[_LS_FOUND]) > 0.5

                    @pl.when(pending_any)
                    def _rollout():
                        alpha = zeros + cfg.alphas[0]
                        for jx, av in enumerate(cfg.alphas):
                            alpha = jnp.where(
                                li == _i32(jx), zeros + av, alpha
                            )
                        mnf = sc[_LS_FOUND] < 0.5

                        def fstep(_s, carry):
                            x = list(carry[0])
                            J, bc, viol, okr = carry[1:-1]
                            t = carry[-1]
                            tp1 = t + _i32(1)
                            xb = [Xo[t, i] for i in range(nx)]
                            ub = [Uo[t, i] for i in range(nu)]
                            dx = [x[i] - xb[i] for i in range(nx)]
                            u = [
                                ub[i] + alpha * ko[t, i]
                                + sum(Ko[t, i, j] * dx[j]
                                      for j in range(nx))
                                for i in range(nu)
                            ]
                            J = J + run_cost(x, u, t)
                            bci, _, _, violi = barrier_rows(
                                shifted_g(x, u), mu
                            )
                            bc = bc + bci
                            viol = viol + violi
                            x_next = _integrate_lane(
                                lane_f, integrator, x, u, p, dt
                            )
                            for i in range(nx):
                                okr = okr * fin(x_next[i])
                                Xc[tp1, i] = jnp.where(
                                    mnf, x_next[i], Xc[tp1, i]
                                )
                            for i in range(nu):
                                okr = okr * fin(u[i])
                                Uc[t, i] = jnp.where(mnf, u[i], Uc[t, i])
                            return (tuple(x_next), J, bc, viol, okr, tp1)

                        x0l = tuple(Xo[0, i] for i in range(nx))
                        out = jax.lax.fori_loop(
                            _i32(0), _i32(N), fstep,
                            (x0l, zeros, zeros, zeros, ones,
                             jnp.asarray(0, jnp.int32)),
                        )
                        xN = list(out[0])
                        J, bc, viol, okr = out[1:-1]
                        J = J + term_cost(xN)
                        merit = J + bc
                        cv = viol
                        merit_old = sc[_MERIT]
                        cv_old_l = sc[_CV]
                        expected = alpha * sc[_DV0]
                        # 4-branch acceptance vs the refreshed nominal
                        # (logddp_solver.cpp:666-698; no filter array).
                        br1 = cv > cfg.max_viol
                        acc1 = cv < (1.0 - cfg.vat) * cv_old_l
                        br2 = (
                            jnp.maximum(cv, cv_old_l) < cfg.mvfac
                        ) & (expected < 0.0)
                        acc2 = merit < merit_old + cfg.armijo * expected
                        acc3 = (
                            merit < merit_old - cfg.mat * cv_old_l
                        ) | (cv < (1.0 - cfg.vat) * cv_old_l)
                        accept = jnp.where(
                            br1, jnp.where(acc1, ones, zeros),
                            jnp.where(br2, jnp.where(acc2, ones, zeros),
                                      jnp.where(acc3, ones, zeros)))
                        take = (okr > 0.5) & (accept > 0.5) & mnf
                        sc[_TJ] = jnp.where(take, J, sc[_TJ])
                        sc[_TMERIT] = jnp.where(take, merit, sc[_TMERIT])
                        sc[_TCV] = jnp.where(take, cv, sc[_TCV])
                        sc[_TA] = jnp.where(take, alpha, sc[_TA])
                        sc[_LS_OK] = jnp.where(take, ones, sc[_LS_OK])
                        sc[_LS_FOUND] = jnp.where(
                            take, ones, sc[_LS_FOUND]
                        )

                    return li + _i32(1)

                jax.lax.fori_loop(_i32(0), _i32(n_alpha), ls_iter,
                                  jnp.asarray(0, jnp.int32))

                fp_ok = sc[_LS_OK] > 0.5
                commit_m = mab & fp_ok
                fail_m = mab & (~fp_ok)

                def copy_body(_s, t):
                    tp1 = t + _i32(1)
                    for i in range(nx):
                        Xo[tp1, i] = jnp.where(
                            commit_m, Xc[tp1, i], Xo[tp1, i]
                        )
                    for i in range(nu):
                        Uo[t, i] = jnp.where(commit_m, Uc[t, i], Uo[t, i])
                    return tp1

                jax.lax.fori_loop(_i32(0), _i32(N), copy_body,
                                  jnp.asarray(0, jnp.int32))

                dJ = sc[_COST] - sc[_TJ]
                dL = sc[_MERIT] - sc[_TMERIT]
                reg_new = jnp.where(
                    commit_m,
                    jnp.maximum(sc[_REG] / cfg.reg_uf, cfg.reg_min),
                    jnp.minimum(sc[_REG] * cfg.reg_uf, cfg.reg_max),
                )
                fp_limit = fail_m & (reg_new >= cfg.reg_max)

                # Convergence: metric = max(inf_du, cv_new), success only.
                cv_conv = sc[_TCV]
                metric = jnp.maximum(sc[_INFDU], cv_conv)
                conv_opt = commit_m & (metric <= cfg.tolerance)
                conv_acc = commit_m & (
                    (jnp.abs(dJ) < cfg.acceptable_tolerance)
                    & (jnp.abs(dL) < cfg.acceptable_tolerance)
                )

                # Barrier update: decay on success, x5 growth on failure.
                mu_new = jnp.where(
                    commit_m,
                    jnp.maximum(
                        zeros + cfg.mu_min_value,
                        mu * cfg.mu_update_factor,
                    ),
                    jnp.minimum(zeros + cfg.mu_initial, mu * 5.0),
                )

                upd = commit_m | fail_m
                sc[_COST] = jnp.where(commit_m, sc[_TJ], sc[_COST])
                sc[_MERIT] = jnp.where(commit_m, sc[_TMERIT], sc[_MERIT])
                sc[_CV] = jnp.where(commit_m, sc[_TCV], sc[_CV])
                sc[_APR] = jnp.where(commit_m, sc[_TA], sc[_APR])
                sc[_MU] = jnp.where(upd, mu_new, sc[_MU])
                sc[_REG] = jnp.where(upd, reg_new, sc[_REG])

                mbpl = active & bpl
                sc[_STATUS] = jnp.where(
                    mbpl, zeros + _ST_REG_LIMIT_CONV,
                    jnp.where(
                        conv_opt, zeros + _ST_OPTIMAL,
                        jnp.where(
                            conv_acc, zeros + _ST_ACCEPTABLE,
                            jnp.where(
                                fp_limit, zeros + _ST_REG_LIMIT_NC,
                                sc[_STATUS],
                            ),
                        ),
                    ),
                )
                sc[_DONE] = jnp.where(
                    mbpl | conv_opt | conv_acc | fp_limit, ones, sc[_DONE]
                )

            return carry

        jax.lax.fori_loop(_i32(0), _i32(cfg.max_iterations), outer, 0)

        st_ref[0] = sc[_COST]
        st_ref[1] = sc[_CV]
        st_ref[2] = sc[_INFDU]
        st_ref[3] = sc[_MU]
        st_ref[4] = sc[_REG]
        st_ref[5] = sc[_APR]
        st_ref[6] = sc[_IT]
        st_ref[7] = sc[_STATUS]

    assert tile_b % 1024 == 0, tile_b
    tbs = tile_b // 128
    np_eff = max(n_params, 1)

    def call(X0, U0, ku0, Ku0, dtv, params, Q, R, Qf, goal, refs, lo, hi,
             sfv, interpret=False):
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
            spec(N + 1, nx), spec(N, nu), spec(N, nu), spec(N, nu, nx),
            spec(1), spec(np_eff),
            spec(nx, nx), spec(nu, nu), spec(nx, nx), spec(nx),
        ] + ([spec(N, nx)] if tracking else []) + [
            spec(nb), spec(nb), spec(n_items),
        ]
        out_specs = (
            spec(N + 1, nx), spec(N, nu), spec(N, nu), spec(N, nu, nx),
            spec(8),
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct(s + (rows, 128), dtype)
            for s in ((N + 1, nx), (N, nu), (N, nu), (N, nu, nx), (8,))
        )
        scratch = [
            pltpu.VMEM((N + 1, nx, tbs, 128), dtype),      # Xc
            pltpu.VMEM((N, nu, tbs, 128), dtype),          # Uc
            pltpu.VMEM((_N_SCALARS, tbs, 128), dtype),     # sc
        ]
        ins = (X0, U0, ku0, Ku0, dtv, params, Q, R, Qf, goal)
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
        (N + 1) * nx + 2 * N * nu + N * nu * nx + 1 + np_eff + cost_in
        + 2 * nb + len(stk.items)
    )
    outs = (N + 1) * nx + 2 * N * nu + N * nu * nx + 8
    scratch = 1 + (N + 1) * nx + N * nu + _N_SCALARS
    return (ins + outs + scratch) * tile_b * 4


def mega_log_eligible(problem, options) -> bool:
    """Static dispatch predicate for the whole-solve LogDDP kernel."""
    import os

    from cddp_tpu.costs.objective import QuadraticObjective
    from cddp_tpu.constraints.stack import PathStacker

    if os.environ.get("CDDP_TPU_NO_MEGA"):
        return False
    entry = _model_entry(problem.model)
    if entry is None or entry[4]:
        return False
    if not isinstance(problem.objective, QuadraticObjective):
        return False
    stk = PathStacker(problem)
    if _box_stack(stk) is None or stk.total_dim == 0:
        return False
    if problem.terminal_constraints:
        return False
    return (
        problem.model.integration_type in ("euler", "heun", "rk3", "rk4")
        and options.use_ilqr
        and not options.enable_parallel
        and options.log_barrier.lqr_backend == "sequential"
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
def _mega_log_impl(X0, U0, ku0, Ku0, dtv, params, Q, R, Qf, goal, refs,
                   lo, hi, sfv, cfg: _LogCfg, kind, integrator: str,
                   box_layout, tile_b: int = DEFAULT_TILE_B,
                   interpret: bool = False):
    B0 = X0.shape[0]
    nx, nu, N = X0.shape[2], U0.shape[2], U0.shape[1]
    pad = (-B0) % tile_b
    tracking = refs is not None

    def prep(v):
        if pad:
            v = jnp.concatenate([v, jnp.repeat(v[-1:], pad, 0)], 0)
        return jnp.moveaxis(v, 0, -1)

    n_params, lane_f = _model_lanes_by_key(kind)
    deriv_f = deriv_lane_fn(kind, lane_f, nx, nu)
    m = 0
    for k in box_layout:
        m += 2 * (nu if k == "control" else nx)
    call = make_log_solve_kernel(
        nx, nu, m, N, n_params, lane_f, deriv_f, integrator, box_layout,
        cfg, tracking, tile_b=tile_b,
    )
    args = [
        prep(v) if v is not None else None
        for v in (X0, U0, ku0, Ku0, dtv[:, None], params, Q, R, Qf, goal,
                  refs, lo, hi, sfv)
    ]
    outs = call(*args, interpret=interpret)
    unprep = lambda v: jnp.moveaxis(v, -1, 0)[:B0]
    return tuple(unprep(o) for o in outs)


def build_fused_log_solve(problem, options, interpret: bool = False,
                          obj_treedef=None):
    """Batch-first fused whole-solve for a concrete (problem, options):
    ``fused(x0, X0, U0, ku0, Ku0, *obj_leaves) -> (X, U, k, K, cost, cv,
    inf_du, mu, reg, alpha_pr, iterations(int32), status(int32))``. The
    X0 seed is re-rolled from U inside logddp's driver; here the caller
    passes the already-rolled seed (the op's scan path re-rolls
    identically)."""
    kind = _model_entry(problem.model)[0]
    integrator = problem.model.integration_type
    obj0 = problem.objective
    from cddp_tpu.constraints.stack import PathStacker

    stk = PathStacker(problem)
    boxes = _box_stack(stk)
    box_layout = tuple(k for k, _ in boxes)
    cfg = _make_cfg(options)
    n_params, param_fn = _model_entry(problem.model)[1:3]

    def fused_impl(x0, X0, U0, ku0, Ku0, *obj_leaves):
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
        outs = _mega_log_impl(
            X0, U0, ku0, Ku0,
            jnp.broadcast_to(jnp.asarray(problem.timestep, dtype), (B,)),
            params, Qb, Rb, Qfb, goalb, refs, lo, hi, sfv,
            cfg=cfg, kind=kind, integrator=integrator,
            box_layout=box_layout, tile_b=DEFAULT_TILE_B,
            interpret=interpret,
        )
        X, U, k, K, st = outs
        return (
            X, U, k, K,
            st[:, 0], st[:, 1], st[:, 2], st[:, 3], st[:, 4], st[:, 5],
            st[:, 6].astype(jnp.int32), st[:, 7].astype(jnp.int32),
        )

    return fused_impl


def logddp_solve_op(problem, options, interpret: bool = False):
    """Batch-aware whole-solve op: the XLA driver per unbatched instance,
    the fused kernel for vmapped TPU f32 batches >= MIN_KERNEL_BATCH."""
    from cddp_tpu.solvers import logddp as _log

    kind = _model_entry(problem.model)[0]
    obj_leaves0, obj_def = jax.tree_util.tree_flatten(problem.objective)
    fused_impl = build_fused_log_solve(problem, options, interpret,
                                       obj_treedef=obj_def)

    def scan_single(x0, X0, U0, ku0, Ku0, *obj_leaves):
        obj = jax.tree_util.tree_unflatten(obj_def, obj_leaves)
        p = problem.replace(x0=x0, objective=obj)
        sol = _log._drive(p, options, X0, U0, ku0, Ku0)
        return (
            sol.state_trajectory, sol.control_trajectory,
            sol.feedforward_gains, sol.feedback_gains,
            sol.final_objective, sol.inf_pr, sol.inf_du, sol.barrier_mu,
            sol.final_regularization, sol.final_step_length,
            sol.iterations_completed, sol.status_code,
        )

    op = make_batched_op(
        scan_single, fused_impl, "LogDDP solve",
        min_batch=MIN_KERNEL_BATCH,
        log_detail=lambda x0, *rest: dict(model=kind),
    )

    def call_op(x0, X0, U0, ku0, Ku0):
        return op(x0, X0, U0, ku0, Ku0, *obj_leaves0)

    return call_op
