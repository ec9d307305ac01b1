"""Whole-solve fused MSIPDDP kernel (ops/pallas/mega_msipddp.py) vs the
XLA ``_drive`` driver — interpret-mode parity at exact status/iteration
level, across segment lengths, gap-closing rollout types and barrier
strategies, plus dispatch gates and the Mosaic TPU lowering.

Reference bar: /root/reference/tests/cddp_core/test_msipddp_solver.cpp
(full solves asserting convergence status + cost) and the parity rigor of
tests/test_mega_ipddp.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.constraints.stack import PathStacker
from cddp_tpu.models import Unicycle
from cddp_tpu.options import BarrierStrategy
from cddp_tpu.ops.pallas import mega_msipddp
from cddp_tpu.solvers import msipddp

F64 = jnp.float64

SEEDS = np.array(
    [[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.5], [-0.3, 0.2, 0.0]]
)


def _unicycle_box(horizon=20, dtype=F64, state_box=False):
    dt = 0.05
    obj = ct.quadratic_objective(
        jnp.eye(3, dtype=dtype) * 0.1,
        jnp.eye(2, dtype=dtype) * 0.05,
        jnp.eye(3, dtype=dtype) * 100.0,
        jnp.asarray([2.0, 2.0, np.pi / 2], dtype),
        dt,
    )
    constraints = {
        "ControlConstraint": ct.ControlConstraint(
            lower=jnp.asarray([-2.0, -np.pi], dtype),
            upper=jnp.asarray([2.0, np.pi], dtype),
        )
    }
    if state_box:
        constraints["StateConstraint"] = ct.StateConstraint(
            lower=jnp.asarray([-5.0, -5.0, -2.0 * np.pi], dtype),
            upper=jnp.asarray([5.0, 5.0, 2.0 * np.pi], dtype),
        )
    return ct.problem(
        Unicycle(), obj, jnp.zeros(3, dtype), horizon, dt,
        constraints=constraints,
    )


def _opts(max_iterations=8, **ms_kw):
    return ct.CDDPOptions(
        max_iterations=max_iterations, tolerance=1e-4,
        msipddp=ct.MSIPDDPOptions(**ms_kw),
    )


def _run_both(problem, options, x0_batch):
    """Fused kernel (interpret, f64) and the vmapped XLA _drive on the
    same _initialize seed state."""
    dtype = x0_batch.dtype
    B = x0_batch.shape[0]
    N, nx, nu = problem.horizon, problem.state_dim, problem.control_dim

    def seed_one(x0):
        p = problem.replace(x0=x0)
        stk = PathStacker(p)
        # The solve() preamble: interpolated multiple-shooting seed.
        ref = p.objective.reference_state
        frac = jnp.linspace(0.0, 1.0, N + 1, dtype=dtype)[:, None]
        X0 = p.x0[None] * (1 - frac) + ref[None] * frac
        X0 = X0.at[0].set(p.x0)
        U0 = jnp.zeros((N, nu), dtype)
        X, U, Y, S, G, F, Lam, mu0 = msipddp._initialize(
            p, options, stk, X0, U0, None, dtype
        )
        return X, U, Y, S, G, F, Lam, jnp.asarray(mu0, dtype)

    Xb, Ub, Yb, Sb, Gb, Fb, Lb, mu0b = jax.vmap(seed_one)(x0_batch)
    ku0 = jnp.zeros((B, N, nu), dtype)
    Ku0 = jnp.zeros((B, N, nu, nx), dtype)

    fused = mega_msipddp.build_fused_ms_solve(problem, options,
                                              interpret=True)
    got = fused(x0_batch, Xb, Ub, Yb, Sb, Fb, Lb, mu0b, ku0, Ku0)

    def one(x0, Xi, Ui, Yi, Si, Gi, Fi, Li, mu0i, k0, K0):
        p = problem.replace(x0=x0)
        sol, st = msipddp._drive(
            p, options, Xi, Ui, Yi, Si, Gi, Fi, Li, mu0i, k0, K0
        )
        return (
            sol.state_trajectory, sol.control_trajectory, st.k_u, st.K_u,
            st.Y, st.S, st.F, st.Lambda, sol.final_objective, sol.inf_pr,
            sol.inf_du, sol.inf_comp, sol.barrier_mu,
            sol.final_regularization, sol.final_step_length,
            sol.iterations_completed, sol.status_code,
        )

    want = jax.vmap(one)(x0_batch, Xb, Ub, Yb, Sb, Gb, Fb, Lb, mu0b,
                         ku0, Ku0)
    return got, want


NAMES = ("X", "U", "k", "K", "Y", "S", "F", "Lambda", "cost", "inf_pr",
         "inf_du", "inf_comp", "mu", "reg", "alpha_pr", "iters", "status")


def _assert_match(got, want, atol=1e-8, rtol=1e-8):
    for name, g, w in zip(NAMES, got, want):
        if name in ("iters", "status"):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name
            )
        else:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
                err_msg=name,
            )


class TestMegaMsParity:
    @pytest.mark.parametrize("max_iterations", [4, 8])
    def test_segment5_parity(self, max_iterations):
        prob = _unicycle_box(horizon=20)
        opts = _opts(max_iterations=max_iterations, segment_length=5)
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        _assert_match(got, want)
        assert np.asarray(got[15]).max() >= 1

    def test_single_shooting_parity(self):
        # segment_length=1: no gap-closing boundaries.
        prob = _unicycle_box(horizon=12)
        opts = _opts(max_iterations=6, segment_length=1)
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        _assert_match(got, want)

    @pytest.mark.parametrize("rollout_type", ["hybrid", "dense"])
    def test_rollout_types(self, rollout_type):
        prob = _unicycle_box(horizon=12)
        opts = _opts(max_iterations=6, segment_length=4,
                     rollout_type=rollout_type)
        rng = np.random.default_rng(5)
        x0b = jnp.asarray(rng.uniform(-0.4, 0.4, size=(4, 3)), F64)
        got, want = _run_both(prob, opts, x0b)
        _assert_match(got, want)

    @pytest.mark.parametrize(
        "strategy", [BarrierStrategy.MONOTONIC, BarrierStrategy.IPOPT]
    )
    def test_barrier_strategies(self, strategy):
        prob = _unicycle_box(horizon=12)
        opts = _opts(max_iterations=6, segment_length=5)
        bar = dataclasses.replace(opts.msipddp.barrier, strategy=strategy)
        opts = opts.replace(
            msipddp=dataclasses.replace(opts.msipddp, barrier=bar)
        )
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        _assert_match(got, want)

    def test_state_box_stack(self):
        prob = _unicycle_box(horizon=10, state_box=True)
        opts = _opts(max_iterations=6, segment_length=5)
        rng = np.random.default_rng(9)
        x0b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(3, 3)), F64)
        got, want = _run_both(prob, opts, x0b)
        _assert_match(got, want)

    def test_warm_start_parity(self):
        # Warm seeds (Y/S/F/Lambda + gain carry-over via _initialize's
        # warm path, mu restart at 0.1*mu_initial) through the kernel ==
        # the driver — the MPC-tick resume path.
        prob = _unicycle_box(horizon=12)
        opts = _opts(max_iterations=5, segment_length=4)
        dtype = F64
        x0b = jnp.asarray(SEEDS[:3], F64)
        B = x0b.shape[0]
        N, nx, nu = prob.horizon, prob.state_dim, prob.control_dim

        def cold_then_warm_seed(x0):
            p = prob.replace(x0=x0)
            stk = PathStacker(p)
            ref = p.objective.reference_state
            frac = jnp.linspace(0.0, 1.0, N + 1, dtype=dtype)[:, None]
            X0 = (p.x0[None] * (1 - frac) + ref[None] * frac).at[0].set(
                p.x0
            )
            U0 = jnp.zeros((N, nu), dtype)
            Xc, Uc, Yc, Sc, Gc, Fc, Lc, mu0c = msipddp._initialize(
                p, opts, stk, X0, U0, None, dtype
            )
            sol, st = msipddp._drive(
                p, opts, Xc, Uc, Yc, Sc, Gc, Fc, Lc,
                jnp.asarray(mu0c, dtype),
                jnp.zeros((N, nu), dtype), jnp.zeros((N, nu, nx), dtype),
            )
            X, U, Y, S, G, F, Lam, mu0 = msipddp._initialize(
                p, opts, stk, sol.state_trajectory,
                sol.control_trajectory, st, dtype
            )
            return (X, U, Y, S, G, F, Lam, jnp.asarray(mu0, dtype),
                    st.k_u, st.K_u)

        (Xb, Ub, Yb, Sb, Gb, Fb, Lb, mu0b, ku0, Ku0) = jax.vmap(
            cold_then_warm_seed
        )(x0b)
        fused = mega_msipddp.build_fused_ms_solve(prob, opts,
                                                  interpret=True)
        got = fused(x0b, Xb, Ub, Yb, Sb, Fb, Lb, mu0b, ku0, Ku0)

        def one(x0, Xi, Ui, Yi, Si, Gi, Fi, Li, mu0i, k0, K0):
            p = prob.replace(x0=x0)
            sol, st = msipddp._drive(
                p, opts, Xi, Ui, Yi, Si, Gi, Fi, Li, mu0i, k0, K0
            )
            return (
                sol.state_trajectory, sol.control_trajectory, st.k_u,
                st.K_u, st.Y, st.S, st.F, st.Lambda, sol.final_objective,
                sol.inf_pr, sol.inf_du, sol.inf_comp, sol.barrier_mu,
                sol.final_regularization, sol.final_step_length,
                sol.iterations_completed, sol.status_code,
            )

        want = jax.vmap(one)(x0b, Xb, Ub, Yb, Sb, Gb, Fb, Lb, mu0b, ku0,
                             Ku0)
        _assert_match(got, want)

    @pytest.mark.slow
    def test_to_convergence_envelope(self):
        # Long budgets hit a driver-inherent knife edge: the MSIPDDP
        # filter's violation entries are raw L1 sums with NO theta floor
        # (unlike IPDDP's 1e-8, msipddp_solver.cpp resetBarrierFilter),
        # so on primal-feasible iterates they are pure roundoff (~1e-14)
        # and the filter-domination/best-violation comparisons are decided
        # by evaluation order — even in f64. Measured at iteration 9 on
        # seed [0.5,0,0]: the eagerly-executed driver accepts alpha=1.0
        # against filter {48.651, 48.434} while the jitted driver — same
        # seed, same formulas — resolves the tie differently and rejects;
        # the kernel's lane ordering forks the same way ~iteration 9-16.
        # No unique bit-parity target exists across differently-ordered
        # engines at long budgets (the 4/8-budget tests above pin
        # bit-level parity before the ties bite), so convergence is an
        # ENVELOPE: identical statuses, exact primal feasibility on both
        # engines, and equal-quality optima (measured gap ~1e-3 rel,
        # kernel at-or-below the driver's cost on every seed).
        prob = _unicycle_box(horizon=20)
        opts = _opts(max_iterations=120, segment_length=5)
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        np.testing.assert_array_equal(
            np.asarray(got[16]), np.asarray(want[16]), err_msg="status"
        )
        assert np.asarray(got[9]).max() <= 1e-8   # kernel inf_pr
        assert np.asarray(want[9]).max() <= 1e-8  # driver inf_pr
        ck = np.asarray(got[8])
        cd = np.asarray(want[8])
        rel = np.abs(ck - cd) / np.abs(cd)
        assert rel.max() <= 5e-3, (ck, cd)


class TestMegaMsDispatch:
    def test_eligibility(self):
        prob = _unicycle_box(horizon=20)
        opts = _opts()
        assert mega_msipddp.mega_ms_eligible(prob, opts)
        assert not mega_msipddp.mega_ms_eligible(
            prob, opts.replace(solve_engine="xla")
        )
        assert not mega_msipddp.mega_ms_eligible(
            prob, opts.replace(enable_parallel=True)
        )
        assert not mega_msipddp.mega_ms_eligible(
            prob, opts.replace(use_ilqr=False)
        )
        assert not mega_msipddp.mega_ms_eligible(
            prob, opts.replace(
                msipddp=ct.MSIPDDPOptions(lqr_backend="parallel")
            )
        )
        pt = prob.add_terminal_constraint(
            "TerminalEquality",
            ct.terminal_equality_constraint(jnp.zeros(3, F64)),
        )
        assert not mega_msipddp.mega_ms_eligible(pt, opts)
        bare = prob.replace(constraints={})
        assert not mega_msipddp.mega_ms_eligible(bare, opts)

    def test_auto_dispatch_matches_xla_engine(self):
        # Unbatched CPU solve through the auto path (op scan branch) ==
        # solve_engine='xla'.
        prob = _unicycle_box(horizon=12)
        opts = _opts(max_iterations=8, segment_length=5)
        sol_auto = ct.solve(prob, "MSIPDDP", opts)
        sol_xla = ct.solve(prob, "MSIPDDP",
                           opts.replace(solve_engine="xla"))
        assert int(sol_auto.iterations_completed) == int(
            sol_xla.iterations_completed
        )
        assert int(sol_auto.status_code) == int(sol_xla.status_code)
        np.testing.assert_allclose(
            np.asarray(sol_auto.final_objective),
            np.asarray(sol_xla.final_objective), rtol=1e-9,
        )


class TestMegaMsLowering:
    @pytest.mark.slow
    def test_export_for_tpu(self):
        N, B = 20, 1024
        f32 = jnp.float32
        prob = _unicycle_box(horizon=N, dtype=f32)
        opts = _opts(max_iterations=10, segment_length=5)
        fused = mega_msipddp.build_fused_ms_solve(prob, opts)
        m = PathStacker(prob).total_dim
        args = (
            jnp.zeros((B, 3), f32), jnp.zeros((B, N + 1, 3), f32),
            jnp.zeros((B, N, 2), f32), jnp.ones((B, N, m), f32),
            jnp.ones((B, N, m), f32), jnp.zeros((B, N, 3), f32),
            jnp.zeros((B, N, 3), f32), jnp.ones((B,), f32),
            jnp.zeros((B, N, 2), f32), jnp.zeros((B, N, 2, 3), f32),
        )
        exp = jax.export.export(jax.jit(fused), platforms=["tpu"])(*args)
        assert len(exp.mlir_module_serialized) > 0
