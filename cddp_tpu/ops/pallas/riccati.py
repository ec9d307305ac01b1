"""Pallas-fused control-limited Riccati backward pass.

SURVEY.md §7 step 9: fuse the per-step backward block (Q-expansion +
regularization + exact box-QP gain solve) into ONE TPU kernel. The XLA
version runs the time recursion as a ``lax.scan`` whose body compiles into
several fusions per step; this kernel runs the whole recursion inside one
``pallas_call`` with the batch axis on the vector lanes, so every small-
matrix operation is an elementwise op over a (TILE_B,) vector held in VMEM.

Layout: all stagewise tensors are transposed host-side to batch-last and the
batch axis is folded to native (sublane, lane) = (TILE_B/128, 128) tiles
(Mosaic requires >=2-D values for vector loop carries); matrices live as
Python lists of (TILE_B/128, 128) tiles inside the kernel — matrix algebra
is unrolled at trace time over the static (nx, nu) indices. The box-QP is the
same exact 3^nu active-set enumeration as :func:`cddp_tpu.ops.boxqp.
boxqp_solve_enum`, unrolled per config.

This mirrors clddp_solver.cpp:96-203 exactly (same Q-expansions, dV, V
updates, Qu_err/norm_Vx bookkeeping); parity with the lax.scan
implementation is asserted in tests (1e-9 in f64, interpreter mode).

STATUS: production path. Numerically verified in interpreter mode (1e-9,
f64) and live on TPU: compiles in under a second (the earlier Mosaic
``scf.for`` legalization failure was a boolean loop carry — all carries are
now float) and runs the B=4096, N=20 backward in 1.37 ms vs 9.7 ms for the
lax.scan (7.1x). CLDDP routes batched solves here automatically via the
:func:`riccati_boxqp_backward` custom_vmap op below
(``CDDPOptions.backward_engine="auto"``); end-to-end batched MPC throughput
is ~17x the scan engine (bench.py: ~300k solves/s vs ~17k).
"""

from __future__ import annotations

import functools
from itertools import permutations, product

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cddp_tpu.ops.pallas.batched_dispatch import make_batched_op

DEFAULT_TILE_B = 1024


# --- unrolled small-matrix algebra over lists of lane vectors --------------


def _matmul(A, B, n, k, m):
    """(n,k) @ (k,m), entries are vectors."""
    return [
        [sum(A[i][l] * B[l][j] for l in range(k)) for j in range(m)]
        for i in range(n)
    ]


def _matvec(A, x, n, k):
    return [sum(A[i][l] * x[l] for l in range(k)) for i in range(n)]


def _transpose(A, n, m):
    return [[A[i][j] for i in range(n)] for j in range(m)]


def _det(A, idx_r, idx_c):
    n = len(idx_r)
    if n == 0:
        return 1.0
    total = None
    for perm in permutations(range(n)):
        inv = sum(
            1 for a in range(n) for b in range(a + 1, n) if perm[a] > perm[b]
        )
        term = A[idx_r[0]][idx_c[perm[0]]]
        for a in range(1, n):
            term = term * A[idx_r[a]][idx_c[perm[a]]]
        total = (total - term) if (total is not None and inv % 2) else (
            (total + term) if total is not None else (-term if inv % 2 else term)
        )
    return total


def _inv(A, n):
    """Adjugate inverse of an (n, n) list-matrix of vectors."""
    det = _det(A, tuple(range(n)), tuple(range(n)))
    inv_det = 1.0 / det
    rows = list(range(n))
    out = [[None] * n for _ in range(n)]
    for j in range(n):
        for i in range(n):
            rs = tuple(r for r in rows if r != i)
            cs = tuple(c for c in rows if c != j)
            sign = (-1.0) ** (i + j)
            out[j][i] = sign * _det(A, rs, cs) * inv_det
    return out, det


def _leading_minors_pd(A, n):
    ok = A[0][0] > 0
    for k in range(2, n + 1):
        ok = ok & (_det(A, tuple(range(k)), tuple(range(k))) > 0)
    return ok


def clddp_backward_step_lanes(A, Bm, lx, lu, lxx, luu, lux, lb, ub, Vx, Vxx,
                              reg, zeros, nx, nu, configs):
    """One control-limited Riccati step over lists of lane vectors.

    The Q-expansion + exact 3^nu enum BoxQP + masked-free feedback + value
    update of clddp_solver.cpp:96-203, shared between the streamed backward
    kernel below and the whole-solve kernel (ops/pallas/mega_clddp.py).

    Returns ``(k_sel, K_t, Vx_new, Vxx_new, dv0, dv1, fail, qu_absmax)``
    where ``fail`` is a boolean lane mask and ``qu_absmax = max_i |Qu_i|``.
    """
    At = _transpose(A, nx, nx)
    Bt = _transpose(Bm, nx, nu)

    Qx = [lx[i] + v for i, v in enumerate(_matvec(At, Vx, nx, nx))]
    Qu = [lu[i] + v for i, v in enumerate(_matvec(Bt, Vx, nu, nx))]
    VA = _matmul(Vxx, A, nx, nx, nx)
    Qxx = [[lxx[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(At, VA, nx, nx, nx))]
    Qux = [[lux[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VA, nu, nx, nx))]
    VB = _matmul(Vxx, Bm, nx, nx, nu)
    Quu = [[luu[i][j] + v for j, v in enumerate(row)]
           for i, row in enumerate(_matmul(Bt, VB, nu, nx, nu))]

    Quu_reg = [[Quu[i][j] + (reg if i == j else zeros)
                for j in range(nu)] for i in range(nu)]

    # --- exact enum BoxQP (boxqp_solve_enum, unrolled) -------------
    pd_all = _leading_minors_pd(Quu_reg, nu)
    k_sel = [zeros] * nu
    Hinv_free_sel = [[zeros] * nu for _ in range(nu)]
    taken = zeros > 1.0  # all-false

    for cfg in configs:
        free_idx = [i for i in range(nu) if cfg[i] == 0]
        x_cfg = [
            zeros if cfg[i] == 0 else (lb[i] if cfg[i] == 1 else ub[i])
            for i in range(nu)
        ]
        if free_idx:
            # Solve free block: Hff xf = -(Qu_f + H_fc x_c)
            Hff = [[Quu_reg[a][b] for b in free_idx] for a in free_idx]
            rhs = [
                -(Qu[a] + sum(Quu_reg[a][b] * x_cfg[b]
                              for b in range(nu) if cfg[b] != 0))
                for a in free_idx
            ]
            nf = len(free_idx)
            Hinv, det = _inv(Hff, nf)
            pd = _leading_minors_pd(Hff, nf)
            xf = _matvec(Hinv, rhs, nf, nf)
            x_full = list(x_cfg)
            for a, fi in enumerate(free_idx):
                x_full[fi] = xf[a]
        else:
            pd = zeros == zeros  # true
            x_full = x_cfg

        grad = [Qu[i] + sum(Quu_reg[i][j] * x_full[j] for j in range(nu))
                for i in range(nu)]
        valid = pd
        for i in range(nu):
            if cfg[i] == 0:
                valid = valid & (x_full[i] >= lb[i]) & (x_full[i] <= ub[i])
            elif cfg[i] == 1:
                valid = valid & (grad[i] >= 0.0)
            else:
                valid = valid & (grad[i] <= 0.0)
        take = valid & (~taken)
        taken = taken | valid
        for i in range(nu):
            k_sel[i] = jnp.where(take, x_full[i], k_sel[i])
        if free_idx:
            for a, fi in enumerate(free_idx):
                for b, fj in enumerate(free_idx):
                    Hinv_free_sel[fi][fj] = jnp.where(
                        take, Hinv[a][b], Hinv_free_sel[fi][fj]
                    )

    fail = (~pd_all) | (~taken)

    # K = -Hfree^-1 Qux on free rows (zero on clamped rows/cols mix)
    K_t = [
        [
            -sum(Hinv_free_sel[i][l] * Qux[l][j] for l in range(nu))
            for j in range(nx)
        ]
        for i in range(nu)
    ]

    # dV += [Qu.k, 0.5 k'Quu k]
    dv0 = sum(Qu[i] * k_sel[i] for i in range(nu))
    dv1 = 0.5 * sum(
        k_sel[i] * Quu[i][j] * k_sel[j]
        for i in range(nu) for j in range(nu)
    )

    # V updates (clddp_solver.cpp:186-193)
    Quu_k = _matvec(Quu, k_sel, nu, nu)
    Kt = _transpose(K_t, nu, nx)
    Vx_new = [
        Qx[i]
        + sum(Kt[i][l] * Quu_k[l] for l in range(nu))
        + sum(Qux[l][i] * k_sel[l] for l in range(nu))
        + sum(Kt[i][l] * Qu[l] for l in range(nu))
        for i in range(nx)
    ]
    QuuK = _matmul(Quu, K_t, nu, nu, nx)
    KtQuuK = _matmul(Kt, QuuK, nx, nu, nx)
    QuxtK = _matmul(_transpose(Qux, nu, nx), K_t, nx, nu, nx)
    Vxx_new = [
        [
            Qxx[i][j] + KtQuuK[i][j] + QuxtK[i][j] + QuxtK[j][i]
            for j in range(nx)
        ]
        for i in range(nx)
    ]
    Vxx_new = [
        [0.5 * (Vxx_new[i][j] + Vxx_new[j][i]) for j in range(nx)]
        for i in range(nx)
    ]

    qu_absmax = jnp.abs(Qu[0])
    for i in range(1, nu):
        qu_absmax = jnp.maximum(qu_absmax, jnp.abs(Qu[i]))

    return k_sel, K_t, Vx_new, Vxx_new, dv0, dv1, fail, qu_absmax


def make_backward_kernel(nx: int, nu: int, N: int, tile_b: int = DEFAULT_TILE_B):
    """Build the fused backward-pass pallas_call for static (nx, nu, N).

    Inputs (batch-last): A (N,nx,nx,B), Bm (N,nx,nu,B), lx (N,nx,B),
    lu (N,nu,B), lxx (N,nx,nx,B), luu (N,nu,nu,B), lux (N,nu,nx,B),
    lb/ub (N,nu,B) (bounds already shifted by -u), VxT (nx,B), VxxT (nx,nx,B),
    reg (1,B).

    Outputs: k (N,nu,B), K (N,nu,nx,B), dV (2,B), stats (3,B) =
    [Qu_err, norm_Vx_accum (excl. terminal), ok].
    """
    configs = list(product(range(3), repeat=nu))  # 0 free, 1 lower, 2 upper
    n_carry = nx + nx * nx + 5  # Vx, Vxx, dV0, dV1, qerr, nvx, ok

    # The grid is (batch_tile, time) with time marked ARBITRARY (sequential):
    # each grid step streams ONE timestep's blocks from HBM while the value-
    # function carry persists in a VMEM scratch, so VMEM use is flat in the
    # horizon (an all-resident layout OOMs scoped VMEM beyond N~25 at
    # tile_b=1024).
    def kernel(A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
               lb_ref, ub_ref, VxT_ref, VxxT_ref, reg_ref,
               k_ref, K_ref, dV_ref, stats_ref, carry_ref):
        tt = pl.program_id(1)
        reg = reg_ref[0]
        zeros = jnp.zeros_like(reg)

        @pl.when(tt == 0)
        def _init():
            for i in range(nx):
                carry_ref[i] = VxT_ref[i]
            for i in range(nx):
                for j in range(nx):
                    carry_ref[nx + i * nx + j] = VxxT_ref[i, j]
            for c in range(4):  # dV0, dV1, qerr, nvx
                carry_ref[nx + nx * nx + c] = zeros
            # NOTE: the carry is all-float — boolean (i1) vector carries fail
            # to legalize in Mosaic's scf.for lowering, so `ok` travels as a
            # {0,1} float mask.
            carry_ref[nx + nx * nx + 4] = zeros + 1.0  # ok

        Vx = [carry_ref[i] for i in range(nx)]
        Vxx = [[carry_ref[nx + i * nx + j] for j in range(nx)]
               for i in range(nx)]
        o = nx + nx * nx
        dV = [carry_ref[o], carry_ref[o + 1]]
        qerr, nvx, ok = carry_ref[o + 2], carry_ref[o + 3], carry_ref[o + 4]

        A = [[A_ref[0, i, j] for j in range(nx)] for i in range(nx)]
        Bm = [[B_ref[0, i, j] for j in range(nu)] for i in range(nx)]
        lx = [lx_ref[0, i] for i in range(nx)]
        lu = [lu_ref[0, i] for i in range(nu)]
        lxx = [[lxx_ref[0, i, j] for j in range(nx)] for i in range(nx)]
        luu = [[luu_ref[0, i, j] for j in range(nu)] for i in range(nu)]
        lux = [[lux_ref[0, i, j] for j in range(nx)] for i in range(nu)]
        lb = [lb_ref[0, i] for i in range(nu)]
        ub = [ub_ref[0, i] for i in range(nu)]

        (k_sel, K_t, Vx_new, Vxx_new, dv0, dv1, fail, qu_absmax) = (
            clddp_backward_step_lanes(
                A, Bm, lx, lu, lxx, luu, lux, lb, ub, Vx, Vxx, reg, zeros,
                nx, nu, configs,
            )
        )
        # zeros-lane where, not python scalars: a scalar where() is f64
        # under x64 and Mosaic rejects the f64->f32 cast at export time.
        ok = ok * jnp.where(fail, zeros, zeros + 1.0)

        for i in range(nu):
            k_ref[0, i] = k_sel[i]
            for j in range(nx):
                K_ref[0, i, j] = K_t[i][j]

        qerr_new = jnp.maximum(qerr, qu_absmax)
        nvx_new = nvx + sum(jnp.abs(Vx_new[i]) for i in range(nx))

        for i in range(nx):
            carry_ref[i] = Vx_new[i]
        for i in range(nx):
            for j in range(nx):
                carry_ref[nx + i * nx + j] = Vxx_new[i][j]
        carry_ref[o] = dV[0] + dv0
        carry_ref[o + 1] = dV[1] + dv1
        carry_ref[o + 2] = qerr_new
        carry_ref[o + 3] = nvx_new
        carry_ref[o + 4] = ok

        dV_ref[0] = dV[0] + dv0
        dV_ref[1] = dV[1] + dv1
        stats_ref[0] = qerr_new
        stats_ref[1] = nvx_new
        stats_ref[2] = ok

    # Mosaic requires the (sublane, lane) block dims divisible by (8, 128).
    assert tile_b % 1024 == 0, tile_b
    tbs = tile_b // 128  # sublane rows per tile

    def call(A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT, reg,
             interpret=False):
        Btot = A.shape[-1]
        assert Btot % tile_b == 0, (Btot, tile_b)
        grid = (Btot // tile_b, N)
        dtype = A.dtype
        rows = Btot // 128

        def fold(x):
            return x.reshape(*x.shape[:-1], rows, 128)

        def stage_spec(*dims):
            # one timestep per grid step, walked in reverse time
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
            stage_spec(nu, nx), stage_spec(nu), stage_spec(nu),
            const_spec(nx), const_spec(nx, nx), const_spec(1),
        ]
        out_specs = (stage_spec(nu), stage_spec(nu, nx), const_spec(2),
                     const_spec(3))
        out_shape = (
            jax.ShapeDtypeStruct((N, nu, rows, 128), dtype),
            jax.ShapeDtypeStruct((N, nu, nx, rows, 128), dtype),
            jax.ShapeDtypeStruct((2, rows, 128), dtype),
            jax.ShapeDtypeStruct((3, rows, 128), dtype),
        )
        args = [fold(v) for v in (A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT,
                                  VxxT, reg)]
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


@functools.partial(
    jax.jit, static_argnames=("tile_b", "interpret")
)
def clddp_backward_fused(A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT, reg,
                         tile_b: int = DEFAULT_TILE_B, interpret: bool = False):
    """Batched fused backward pass.

    Batch-FIRST inputs (B, N, ...) as produced by vmapped precompute; this
    wrapper transposes to the kernel's batch-last layout, pads the batch to a
    tile multiple and trims the outputs.

    Returns (k (B,N,nu), K (B,N,nu,nx), dV (B,2), Qu_err (B,), norm_Vx_acc
    (B,), ok (B,)).
    """
    B0, N = A.shape[0], A.shape[1]
    nx, nu = A.shape[2], Bm.shape[3]
    pad = (-B0) % tile_b
    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        # (B, ...) -> (..., B)
        return jnp.moveaxis(x, 0, -1)

    args = [prep(v) for v in (A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT)]
    regv = prep(reg[:, None])  # (B,) -> (1, B)
    call = make_backward_kernel(nx, nu, N, tile_b)
    k, K, dV, stats = call(*args, regv, interpret=interpret)
    unprep = lambda x: jnp.moveaxis(x, -1, 0)[:B0]
    k = unprep(k)
    K = unprep(K)
    dV = unprep(dV)
    stats = unprep(stats)
    return k, K, dV, stats[:, 0], stats[:, 1], stats[:, 2] > 0.5


# ---------------------------------------------------------------------------
# custom_vmap op: scan for single instances, fused kernel for batches
# ---------------------------------------------------------------------------


def _scan_backward_single(A, Bm, lx, lu, lxx, luu, lux, lb, ub, VxT, VxxT, reg):
    """Single-instance reference path (identical math to the kernel): reverse
    lax.scan with the exact enum BoxQP. Returns (k, K, dV, qerr, nvx, ok)."""
    from cddp_tpu.ops.boxqp import (
        BoxQPStatus,
        boxqp_solve_enum,
        solve_masked_free,
    )

    N, nx = A.shape[0], A.shape[1]
    nu = Bm.shape[2]
    dtype = A.dtype
    eye_u = jnp.eye(nu, dtype=dtype)

    def step(carry, inp):
        Vx, Vxx, dV, qerr, nvx, ok = carry
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t, lb_t, ub_t = inp
        Qx = lx_t + A_t.T @ Vx
        Qu = lu_t + B_t.T @ Vx
        Qxx = lxx_t + A_t.T @ Vxx @ A_t
        Qux = lux_t + B_t.T @ Vxx @ A_t
        Quu = luu_t + B_t.T @ Vxx @ B_t
        Quu_reg = Quu + reg * eye_u
        qp = boxqp_solve_enum(Quu_reg, Qu, lb_t, ub_t)
        fail = (qp.status == BoxQPStatus.HESSIAN_NOT_PD) | (
            qp.status == BoxQPStatus.NO_DESCENT
        )
        k_t = qp.x
        K_t = -solve_masked_free(qp.Hfree, Qux, qp.free)
        dV_step = jnp.stack([Qu @ k_t, 0.5 * k_t @ Quu @ k_t])
        Vx_new = Qx + K_t.T @ Quu @ k_t + Qux.T @ k_t + K_t.T @ Qu
        Vxx_new = Qxx + K_t.T @ Quu @ K_t + Qux.T @ K_t + K_t.T @ Qux
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (
            Vx_new, Vxx_new, dV + dV_step,
            jnp.maximum(qerr, jnp.max(jnp.abs(Qu))),
            nvx + jnp.sum(jnp.abs(Vx_new)),
            ok & ~fail,
        ), (k_t, K_t)

    init = (VxT, VxxT, jnp.zeros((2,), dtype), jnp.zeros((), dtype),
            jnp.zeros((), dtype), jnp.asarray(True))
    (_, _, dV, qerr, nvx, ok), (k, K) = jax.lax.scan(
        step, init, (A, Bm, lx, lu, lxx, luu, lux, lb, ub), reverse=True
    )
    return k, K, dV, qerr, nvx, ok


# Control-limited Riccati backward op with a batch-aware implementation:
#
# - unbatched: the reverse lax.scan (reference semantics, any dtype/backend);
# - under vmap: the Pallas fused kernel on TPU float32 (one kernel for the
#   whole batched recursion, ~7x the scan's throughput on v5e), falling
#   back to the vmapped scan elsewhere. Nested vmaps fold into one total
#   batch before the engine choice (batched_dispatch).
#
# Returns (k, K, dV, Qu_err, norm_Vx_partial (excl. terminal |Vx|_1), ok).
riccati_boxqp_backward = make_batched_op(
    _scan_backward_single,
    lambda *a: tuple(clddp_backward_fused(*a)),
    "CLDDP backward",
    gate=lambda A, Bm, *rest: Bm.shape[-1] <= 4,
    log_detail=lambda A, Bm, *rest: dict(nu=Bm.shape[-1]),
)
