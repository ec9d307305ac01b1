"""Pallas-fused IPDDP condensed Riccati backward pass.

Fuses the per-step interior-point condensation + gain solve of
ipddp_solver.cpp:1355-1509 (path-constraint regime, iLQR Hessians) into one
TPU kernel, the same batch-on-lanes layout as :mod:`.riccati` — every small
matrix/vector op becomes an elementwise op over (8, 128) VMEM tiles, unrolled
at trace time over the static (nx, nu, m) indices.

Unlike the CLDDP kernel (whole time axis resident in VMEM), the stage data
here (nx=7, m=6 for the MPCC stack) is too large for VMEM at useful horizons,
so the grid is (batch_tile, time) with the time dimension marked ARBITRARY
(sequential): Pallas streams one timestep's blocks from HBM per grid step
while the value-function carry lives in a VMEM scratch that persists across
the sequential dimension. This is the canonical long-recursion TPU pattern
and also keeps VMEM flat in the horizon.

Numerical conventions replicated exactly from cddp_tpu.solvers.ipddp
(_condense_path/_path_gains): s_safe = max(s, max(mu*1e-3, 1e-10)),
Sigma = clip(y/s_safe, 0, 1e6), signed clips at +-1e6.

STATUS: opt-in (``CDDPOptions.backward_engine="fused"``), not auto like the
CLDDP kernel. Measured on v5e at MPCC-fleet shapes (B=1024, N=20, nx=7,
nu=3, m=6): the kernel wins in isolation (61us vs 73us for the scan) but
the condensed backward is <1% of an IPDDP iteration there — a single
closed-form solve per step, no 3^nu enum like CLDDP — and the custom-call
boundary inside the solver loop costs more than it saves (fleet throughput
1.6k vs 2.2k ticks/s). Fleets use the whole-solve kernel instead
(mega_ipddp.py).

The workload where this backward DOES dominate turned out to be
SINGLE-SOLVE LATENCY (round 5): at quadrotor N=100 shapes the
associative-scan parallel backward costs 1.34 of the 1.80 ms/iteration
slope, and this kernel — dispatched as a 128-lane singleton batch
(``tile_b=128``, see ``condensed_backward_op``) — replaces it at ~0.3 ms,
cutting the certified tol=1e-4 solve from 98.4 to 54.8 ms steady-state
(2.16x the native-oracle single-thread CPU proxy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cddp_tpu.ops.pallas.riccati import (
    DEFAULT_TILE_B,
    _inv,
    _leading_minors_pd,
    _matmul,
    _matvec,
    _transpose,
)

_EPS_SLACK = 1e-10
_MAX_RATIO = 1e6


def _lclip(v, lo, hi):
    """``jnp.clip`` with bounds pre-cast to ``v.dtype``. Under x64,
    jnp.clip's jitted-ufunc wrapper binds Python-float bounds as weak f64
    scalar literals and inserts an f64->f32 convert_element_type inside the
    call — which the Mosaic TPU lowering rejects ("Unsupported cast:
    float64 -> float32"). Kernel lane code must clip through this helper."""
    import numpy as np

    dt = v.dtype
    return jnp.minimum(jnp.maximum(v, np.asarray(lo, dt)), np.asarray(hi, dt))


def ipddp_condense_lanes(y, s, g, mu, m, cap=_MAX_RATIO):
    """``ipddp._condense_path`` over lane vectors: per-row interior-point
    condensation quantities (ipddp_solver.cpp:1404-1453). Returns
    ``(s_safe, sigma, pr, comp, rhat, sir)`` lane lists."""
    mu_floor = jnp.maximum(mu * 1e-3, _EPS_SLACK)
    s_safe = [jnp.maximum(s[i], mu_floor) for i in range(m)]
    sigma = [_lclip(y[i] / s_safe[i], 0.0, cap) for i in range(m)]
    pr = [g[i] + s[i] for i in range(m)]
    comp = [y[i] * s[i] - mu for i in range(m)]
    rhat = [y[i] * pr[i] - comp[i] for i in range(m)]
    sir = [_lclip(rhat[i] / s_safe[i], -cap, cap) for i in range(m)]
    return s_safe, sigma, pr, comp, rhat, sir


def ipddp_path_gain_lanes(y, s_safe, sigma, pr, rhat, Gx, Gu, k_u, K_u,
                          nx, nu, m, cap=_MAX_RATIO):
    """``ipddp._path_gains`` over lane vectors: closed-form dual/slack
    feedforward + feedback given the control gains
    (ipddp_solver.cpp:1458-1486). Shared between the streamed backward
    kernel, the whole-solve kernel's forward/max-step recomputation
    (ops/pallas/mega_ipddp.py) and :func:`ipddp_condensed_step_lanes`."""
    temp = _matvec(Gu, k_u, m, nu)
    GuKu = _matmul(Gu, K_u, m, nu, nx)
    k_y = [_lclip((rhat[i] + y[i] * temp[i]) / s_safe[i], -cap, cap)
           for i in range(m)]
    K_y = [[_lclip(sigma[i] * (Gx[i][j] + GuKu[i][j]), -cap, cap)
            for j in range(nx)] for i in range(m)]
    k_s = [-pr[i] - temp[i] for i in range(m)]
    K_s = [[-Gx[i][j] - GuKu[i][j] for j in range(nx)] for i in range(m)]
    return k_y, K_y, k_s, K_s


def ipddp_condensed_step_lanes(A, Bm, lx, lu, lxx, luu, lux, y, s, g, Gx, Gu,
                               Vx, Vxx, mu, reg, nx, nu, m, cap=_MAX_RATIO):
    """One interior-point condensed Riccati step over lists of lane vectors.

    The Q-expansion + condensation + closed-form gain solve + value update of
    ipddp_solver.cpp:1380-1509 (iLQR Hessians), shared between the streamed
    backward kernel below and the whole-solve kernel
    (ops/pallas/mega_ipddp.py). Mirrors
    ``cddp_tpu.solvers.ipddp._condensed_step_math`` exactly; ``cap`` is the
    barrier-ratio clip (``ipddp._max_ratio``: 1e6 in f32, 1e12 in f64).

    Returns ``(k_u, K_u, k_y, K_y, k_s, K_s, Vx_new, Vxx_new, dv0_step,
    dv1_step, Qu_c, pr, comp, pd_ok)`` where the gain/value entries are
    nested lane lists, ``Qu_c``/``pr``/``comp`` are the per-row condensed
    gradient / primal / complementarity residual lists for the caller's
    inf-norm bookkeeping, and ``pd_ok`` is a boolean lane (leading-minors
    positive-definiteness of the regularized condensed Quu).
    """
    zeros = jnp.zeros_like(mu)

    At = _transpose(A, nx, nx)
    Bt = _transpose(Bm, nx, nu)
    Gxt = _transpose(Gx, m, nx)
    Gut = _transpose(Gu, m, nu)

    # Q-expansions with the dual term (ipddp_solver.cpp:1380-1395)
    Gty = _matvec(Gxt, y, nx, m)
    Qx = [lx[i] + Gty[i] + v for i, v in enumerate(_matvec(At, Vx, nx, nx))]
    Guy = _matvec(Gut, y, nu, m)
    Qu = [lu[i] + Guy[i] + v for i, v in enumerate(_matvec(Bt, Vx, nu, nx))]
    VA = _matmul(Vxx, A, nx, nx, nx)
    Qxx = [[lxx[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(At, VA, nx, nx, nx))]
    Qux = [[lux[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VA, nu, nx, nx))]
    VB = _matmul(Vxx, Bm, nx, nx, nu)
    Quu = [[luu[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VB, nu, nx, nu))]

    # Interior-point condensation (_condense_path)
    s_safe, sigma, pr, comp, rhat, sir = ipddp_condense_lanes(
        y, s, g, mu, m, cap
    )

    # sGu/sGx = diag(sigma) @ Gu/Gx
    sGu = [[sigma[i] * Gu[i][j] for j in range(nu)] for i in range(m)]
    sGx = [[sigma[i] * Gx[i][j] for j in range(nx)] for i in range(m)]
    GtSGu = _matmul(Gut, sGu, nu, m, nu)
    GtSGx_u = _matmul(Gut, sGx, nu, m, nx)

    Quu_sym = [[0.5 * (Quu[i][j] + Quu[j][i]) for j in range(nu)]
               for i in range(nu)]
    Quu_reg = [[Quu_sym[i][j] + GtSGu[i][j] + (reg if i == j else zeros)
                for j in range(nu)] for i in range(nu)]
    Gt_sir = _matvec(Gut, sir, nu, m)
    rhs_k = [Qu[i] + Gt_sir[i] for i in range(nu)]
    rhs_K = [[Qux[i][j] + GtSGx_u[i][j] for j in range(nx)]
             for i in range(nu)]

    Hinv, _ = _inv(Quu_reg, nu)
    pd_ok = _leading_minors_pd(Quu_reg, nu)
    # linalg.solve_and_check zeroes the solution on PD failure; mirror that
    # so the failed-attempt gains (and everything derived from them: dual/
    # slack gains, dV, value updates) match the XLA driver bit-for-bit on
    # the regularization-retry path.
    k_u = [jnp.where(pd_ok, -v, zeros) for v in _matvec(Hinv, rhs_k, nu, nu)]
    K_u = [[jnp.where(pd_ok, -v, zeros) for v in row]
           for row in _matmul(Hinv, rhs_K, nu, nu, nx)]

    # _path_gains: dual/slack feedforward + feedback
    k_y, K_y, k_s, K_s = ipddp_path_gain_lanes(
        y, s_safe, sigma, pr, rhat, Gx, Gu, k_u, K_u, nx, nu, m, cap
    )

    # Condensed expansions folded back (ipddp_solver.cpp:1488-1509)
    Gx_sir = _matvec(Gxt, sir, nx, m)
    GtSGx_x = _matmul(Gxt, sGx, nx, m, nx)
    Qu_c = rhs_k
    Qx_c = [Qx[i] + Gx_sir[i] for i in range(nx)]
    Qxx_c = [[Qxx[i][j] + GtSGx_x[i][j] for j in range(nx)]
             for i in range(nx)]
    Qux_c = rhs_K
    Quu_c = [[Quu[i][j] + GtSGu[i][j] for j in range(nu)]
             for i in range(nu)]

    dv0_step = sum(k_u[i] * Qu_c[i] for i in range(nu))
    dv1_step = 0.5 * sum(k_u[i] * Quu_c[i][j] * k_u[j]
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

    return (k_u, K_u, k_y, K_y, k_s, K_s, Vx_new, Vxx_new, dv0_step,
            dv1_step, Qu_c, pr, comp, pd_ok)


def make_ipddp_backward_kernel(nx: int, nu: int, m: int, N: int,
                               tile_b: int = DEFAULT_TILE_B):
    """Build the fused condensed-backward pallas_call for static
    (nx, nu, m, N). All inputs batch-last; see :func:`ipddp_backward_fused`
    for shapes. Outputs per step: control/dual/slack gains plus the post-step
    (Vx, Vxx) sequence (costate gain heads), and a (7,) stats vector
    [dV0, dV1, inf_du, inf_pr, inf_comp, step_norm, ok]."""
    n_carry = nx + nx * nx + 7

    def kernel(A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
               y_ref, s_ref, g_ref, Gx_ref, Gu_ref,
               VxT_ref, VxxT_ref, mu_ref, reg_ref,
               ku_ref, Ku_ref, ky_ref, Ky_ref, ks_ref, Ks_ref,
               Vx_ref, Vxx_ref, stats_ref, carry_ref):
        tt = pl.program_id(1)
        mu = mu_ref[0]
        reg = reg_ref[0]
        zeros = jnp.zeros_like(reg)

        @pl.when(tt == 0)
        def _init():
            for i in range(nx):
                carry_ref[i] = VxT_ref[i]
            for i in range(nx):
                for j in range(nx):
                    carry_ref[nx + i * nx + j] = VxxT_ref[i, j]
            for c in range(6):  # dV0,dV1,inf_du,inf_pr,inf_comp,step_norm
                carry_ref[nx + nx * nx + c] = zeros
            carry_ref[nx + nx * nx + 6] = zeros + 1.0  # ok (float mask)

        Vx = [carry_ref[i] for i in range(nx)]
        Vxx = [[carry_ref[nx + i * nx + j] for j in range(nx)]
               for i in range(nx)]
        o = nx + nx * nx
        dV0, dV1 = carry_ref[o], carry_ref[o + 1]
        inf_du, inf_pr = carry_ref[o + 2], carry_ref[o + 3]
        inf_comp, step_norm = carry_ref[o + 4], carry_ref[o + 5]
        ok = carry_ref[o + 6]

        A = [[A_ref[0, i, j] for j in range(nx)] for i in range(nx)]
        Bm = [[B_ref[0, i, j] for j in range(nu)] for i in range(nx)]
        lx = [lx_ref[0, i] for i in range(nx)]
        lu = [lu_ref[0, i] for i in range(nu)]
        lxx = [[lxx_ref[0, i, j] for j in range(nx)] for i in range(nx)]
        luu = [[luu_ref[0, i, j] for j in range(nu)] for i in range(nu)]
        lux = [[lux_ref[0, i, j] for j in range(nx)] for i in range(nu)]
        y = [y_ref[0, i] for i in range(m)]
        s = [s_ref[0, i] for i in range(m)]
        g = [g_ref[0, i] for i in range(m)]
        Gx = [[Gx_ref[0, i, j] for j in range(nx)] for i in range(m)]
        Gu = [[Gu_ref[0, i, j] for j in range(nu)] for i in range(m)]

        (k_u, K_u, k_y, K_y, k_s, K_s, Vx_new, Vxx_new, dv0_step, dv1_step,
         Qu_c, pr, comp, pd_ok) = ipddp_condensed_step_lanes(
            A, Bm, lx, lu, lxx, luu, lux, y, s, g, Gx, Gu, Vx, Vxx, mu, reg,
            nx, nu, m, cap=_MAX_RATIO,
        )
        ok = ok * jnp.where(pd_ok, 1.0, 0.0)
        dV0 = dV0 + dv0_step
        dV1 = dV1 + dv1_step

        for i in range(nu):
            inf_du = jnp.maximum(inf_du, jnp.abs(Qu_c[i]))
            step_norm = jnp.maximum(step_norm, jnp.abs(k_u[i]))
        for i in range(m):
            inf_pr = jnp.maximum(inf_pr, jnp.abs(pr[i]))
            inf_comp = jnp.maximum(inf_comp, jnp.abs(comp[i]))

        # Per-step outputs (block index = this timestep)
        for i in range(nu):
            ku_ref[0, i] = k_u[i]
            for j in range(nx):
                Ku_ref[0, i, j] = K_u[i][j]
        for i in range(m):
            ky_ref[0, i] = k_y[i]
            ks_ref[0, i] = k_s[i]
            for j in range(nx):
                Ky_ref[0, i, j] = K_y[i][j]
                Ks_ref[0, i, j] = K_s[i][j]
        for i in range(nx):
            Vx_ref[0, i] = Vx_new[i]
            for j in range(nx):
                Vxx_ref[0, i, j] = Vxx_new[i][j]

        # Carry write-back
        for i in range(nx):
            carry_ref[i] = Vx_new[i]
        for i in range(nx):
            for j in range(nx):
                carry_ref[nx + i * nx + j] = Vxx_new[i][j]
        for c, v in enumerate((dV0, dV1, inf_du, inf_pr, inf_comp,
                               step_norm, ok)):
            carry_ref[o + c] = v

        stats_ref[0] = dV0
        stats_ref[1] = dV1
        stats_ref[2] = inf_du
        stats_ref[3] = inf_pr
        stats_ref[4] = inf_comp
        stats_ref[5] = step_norm
        stats_ref[6] = ok

    # tile_b = 128 (tbs=1) is the single-solve latency variant: one
    # 128-lane row per grid step (Mosaic pads the sublane dim), so the
    # B=1 broadcast costs 128 lanes of HBM traffic instead of 1024.
    assert tile_b % 128 == 0, tile_b
    tbs = tile_b // 128

    def call(A, Bm, lx, lu, lxx, luu, lux, y, s, g, Gx, Gu,
             VxT, VxxT, mu, reg, interpret=False):
        Btot = A.shape[-1]
        assert Btot % tile_b == 0, (Btot, tile_b)
        grid = (Btot // tile_b, N)
        dtype = A.dtype
        rows = Btot // 128

        def fold(x):
            return x.reshape(*x.shape[:-1], rows, 128)

        def stage_spec(*dims):
            # One timestep per grid step, walked in reverse time.
            blk = (1,) + tuple(dims) + (tbs, 128)
            nd = len(dims)
            return pl.BlockSpec(
                blk,
                lambda b, t, _nd=nd: (N - 1 - t,) + (0,) * _nd + (b, 0),
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
            stage_spec(nx, nx), stage_spec(nx, nu), stage_spec(nx),
            stage_spec(nu), stage_spec(nx, nx), stage_spec(nu, nu),
            stage_spec(nu, nx), stage_spec(m), stage_spec(m), stage_spec(m),
            stage_spec(m, nx), stage_spec(m, nu),
            const_spec(nx), const_spec(nx, nx), const_spec(1), const_spec(1),
        ]
        out_specs = (
            stage_spec(nu), stage_spec(nu, nx), stage_spec(m),
            stage_spec(m, nx), stage_spec(m), stage_spec(m, nx),
            stage_spec(nx), stage_spec(nx, nx), const_spec(7),
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct(shp + (rows, 128), dtype)
            for shp in ((N, nu), (N, nu, nx), (N, m), (N, m, nx), (N, m),
                        (N, m, nx), (N, nx), (N, nx, nx), (7,))
        )
        args = [fold(v) for v in (A, Bm, lx, lu, lxx, luu, lux, y, s, g,
                                  Gx, Gu, VxT, VxxT, mu, reg)]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((nx + nx * nx + 7, tbs, 128), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)
            ),
            interpret=interpret,
        )(*args)
        return tuple(o.reshape(*o.shape[:-2], Btot) for o in outs)

    return call


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def ipddp_backward_fused(A, Bm, lx, lu, lxx, luu, lux, y, s, g, Gx, Gu,
                         VxT, VxxT, mu, reg,
                         tile_b: int = DEFAULT_TILE_B,
                         interpret: bool = False):
    """Batched fused condensed backward. Batch-FIRST inputs (B, N, ...) /
    (B, ...) terminals and (B,) mu/reg; pads the batch to a tile multiple,
    transposes to batch-last and trims outputs.

    Returns (k_u (B,N,nu), K_u (B,N,nu,nx), k_y (B,N,m), K_y (B,N,m,nx),
    k_s (B,N,m), K_s (B,N,m,nx), Vx_seq (B,N,nx), Vxx_seq (B,N,nx,nx),
    stats (B,7) = [dV0, dV1, inf_du, inf_pr, inf_comp, step_norm, ok])."""
    B0, N = A.shape[0], A.shape[1]
    nx, nu, m = A.shape[2], Bm.shape[3], y.shape[2]
    pad = (-B0) % tile_b

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        return jnp.moveaxis(x, 0, -1)

    args = [prep(v) for v in (A, Bm, lx, lu, lxx, luu, lux, y, s, g, Gx, Gu,
                              VxT, VxxT)]
    args.append(prep(mu[:, None]))
    args.append(prep(reg[:, None]))
    call = make_ipddp_backward_kernel(nx, nu, m, N, tile_b)
    outs = call(*args, interpret=interpret)
    unprep = lambda x: jnp.moveaxis(x, -1, 0)[:B0]
    return tuple(unprep(o) for o in outs)
