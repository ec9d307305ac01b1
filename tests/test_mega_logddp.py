"""Whole-solve fused LogDDP kernel (ops/pallas/mega_logddp.py) vs the XLA
``_drive`` driver — interpret-mode parity at exact status/iteration level,
the relaxed-barrier branch (log vs quadratic extension), the
reg-exhaustion-as-converged quirk, dispatch gates, and the Mosaic TPU
lowering. Completes the whole-solve quartet.

Reference bar: /root/reference/tests/cddp_core/test_logddp_solver.cpp and
the parity rigor of tests/test_mega_ipddp.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cddp_tpu as ct
from cddp_tpu.constraints.stack import PathStacker
from cddp_tpu.models import Unicycle
from cddp_tpu.ops.pallas import mega_logddp
from cddp_tpu.solvers import logddp

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


def _run_both(problem, options, x0_batch):
    dtype = x0_batch.dtype
    B = x0_batch.shape[0]
    N, nx, nu = problem.horizon, problem.state_dim, problem.control_dim
    from cddp_tpu.models.base import rollout as open_loop_rollout

    def seed_one(x0):
        p = problem.replace(x0=x0)
        U0 = jnp.zeros((N, nu), dtype)
        X = open_loop_rollout(p.model, p.x0, U0, p.timestep)
        return X, U0

    Xb, Ub = jax.vmap(seed_one)(x0_batch)
    ku0 = jnp.zeros((B, N, nu), dtype)
    Ku0 = jnp.zeros((B, N, nu, nx), dtype)
    fused = mega_logddp.build_fused_log_solve(problem, options,
                                              interpret=True)
    got = fused(x0_batch, Xb, Ub, ku0, Ku0)

    def one(x0, Xi, Ui, k0, K0):
        p = problem.replace(x0=x0)
        sol = logddp._drive(p, options, Xi, Ui, k0, K0)
        return (
            sol.state_trajectory, sol.control_trajectory,
            sol.feedforward_gains, sol.feedback_gains,
            sol.final_objective, sol.inf_pr, sol.inf_du, sol.barrier_mu,
            sol.final_regularization, sol.final_step_length,
            sol.iterations_completed, sol.status_code,
        )

    want = jax.vmap(one)(x0_batch, Xb, Ub, ku0, Ku0)
    return got, want


NAMES = ("X", "U", "k", "K", "cost", "cv", "inf_du", "mu", "reg",
         "alpha_pr", "iters", "status")


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


class TestMegaLogParity:
    @pytest.mark.parametrize("max_iterations", [4, 10])
    def test_box_parity(self, max_iterations):
        prob = _unicycle_box(horizon=20)
        opts = ct.CDDPOptions(max_iterations=max_iterations,
                              tolerance=1e-4)
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        _assert_match(got, want)
        assert np.asarray(got[10]).max() >= 1

    def test_state_box_parity(self):
        prob = _unicycle_box(horizon=12, state_box=True)
        opts = ct.CDDPOptions(max_iterations=6, tolerance=1e-4)
        rng = np.random.default_rng(3)
        x0b = jnp.asarray(rng.uniform(-0.4, 0.4, size=(4, 3)), F64)
        got, want = _run_both(prob, opts, x0b)
        _assert_match(got, want)

    def test_tight_delta_quadratic_branch(self):
        # A larger relaxation delta exercises the quadratic extension
        # branch of beta (z <= delta) on the early iterates.
        prob = _unicycle_box(horizon=12)
        opts = ct.CDDPOptions(
            max_iterations=6, tolerance=1e-4,
            log_barrier=ct.LogBarrierOptions(
                relaxed_log_barrier_delta=0.5
            ),
        )
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        _assert_match(got, want)

    @pytest.mark.slow
    def test_to_convergence(self):
        prob = _unicycle_box(horizon=20)
        opts = ct.CDDPOptions(max_iterations=120, tolerance=1e-4)
        got, want = _run_both(prob, opts, jnp.asarray(SEEDS, F64))
        _assert_match(got, want, atol=1e-6, rtol=1e-6)
        status = np.asarray(got[11])
        # LogDDP terminates through any of its exits; both engines agree.
        assert (status == np.asarray(want[11])).all()


class TestMegaLogDispatch:
    def test_eligibility(self):
        prob = _unicycle_box(horizon=20)
        opts = ct.CDDPOptions(max_iterations=8, tolerance=1e-4)
        assert mega_logddp.mega_log_eligible(prob, opts)
        assert not mega_logddp.mega_log_eligible(
            prob, opts.replace(solve_engine="xla")
        )
        assert not mega_logddp.mega_log_eligible(
            prob, opts.replace(enable_parallel=True)
        )
        assert not mega_logddp.mega_log_eligible(
            prob, opts.replace(use_ilqr=False)
        )
        bare = prob.replace(constraints={})
        assert not mega_logddp.mega_log_eligible(bare, opts)

    def test_auto_dispatch_matches_xla_engine(self):
        prob = _unicycle_box(horizon=12)
        opts = ct.CDDPOptions(max_iterations=8, tolerance=1e-4)
        sol_auto = ct.solve(prob, "LogDDP", opts)
        sol_xla = ct.solve(prob, "LogDDP",
                           opts.replace(solve_engine="xla"))
        assert int(sol_auto.iterations_completed) == int(
            sol_xla.iterations_completed
        )
        assert int(sol_auto.status_code) == int(sol_xla.status_code)
        np.testing.assert_allclose(
            np.asarray(sol_auto.final_objective),
            np.asarray(sol_xla.final_objective), rtol=1e-9,
        )


class TestMegaLogLowering:
    @pytest.mark.slow
    def test_export_for_tpu(self):
        N, B = 20, 1024
        f32 = jnp.float32
        prob = _unicycle_box(horizon=N, dtype=f32)
        opts = ct.CDDPOptions(max_iterations=10, tolerance=1e-4)
        fused = mega_logddp.build_fused_log_solve(prob, opts)
        args = (
            jnp.zeros((B, 3), f32), jnp.zeros((B, N + 1, 3), f32),
            jnp.zeros((B, N, 2), f32), jnp.zeros((B, N, 2), f32),
            jnp.zeros((B, N, 2, 3), f32),
        )
        exp = jax.export.export(jax.jit(fused), platforms=["tpu"])(*args)
        assert len(exp.mlir_module_serialized) > 0
