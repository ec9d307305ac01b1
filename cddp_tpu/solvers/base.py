"""Shared solver machinery.

TPU-native rebuild of ``CDDPSolverBase`` (``src/cddp_core/cddp_solver_base.cpp``).
The reference's template-method skeleton (timer, backward-with-retry loop,
multi-alpha line search, history recording) becomes a set of pure helpers used
by each solver's ``lax.while_loop`` driver:

- derivative precompute = one ``vmap`` over the horizon (replacing the
  std::async chunked threads, cddp_solver_base.cpp:359-393);
- the multi-alpha line search = one ``vmap`` over the alpha ladder (replacing
  the per-alpha std::async futures, cddp_solver_base.cpp:248-317), with a
  masked argmin/argmax select reproducing either the sequential
  first-success rule or the parallel best-merit rule.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cddp_tpu.options import CDDPOptions, line_search_alphas
from cddp_tpu.problem import Problem


def discrete_jacobians(problem: Problem, X: jax.Array, U: jax.Array):
    """A_t = I + dt*Fx, B_t = dt*Fu for all t in one vmap
    (cddp_solver_base.cpp:319-358 — note the reference linearizes the
    *continuous* dynamics with an Euler step regardless of which integrator
    rolls the trajectory; replicated for parity).

    Returns (A, B) with shapes (N, nx, nx), (N, nx, nu).
    """
    dt = problem.timestep
    N = problem.horizon
    ts = jnp.arange(N, dtype=X.dtype) * dt

    def one(x, u, t):
        Fx, Fu = problem.model.jacobians(x, u, t)
        A = dt * Fx + jnp.eye(problem.state_dim, dtype=X.dtype)
        B = dt * Fu
        return A, B

    return jax.vmap(one)(X[:-1], U, ts)


def discrete_hessians(problem: Problem, X: jax.Array, U: jax.Array):
    """dt-scaled dynamics Hessian tensors for full DDP (use_ilqr=False),
    shapes (N, nx, nx, nx), (N, nx, nu, nu), (N, nx, nu, nx)
    (cddp_solver_base.cpp:346-355)."""
    dt = problem.timestep
    ts = jnp.arange(problem.horizon, dtype=X.dtype) * dt

    def one(x, u, t):
        Fxx, Fuu, Fux = problem.model.hessians(x, u, t)
        return dt * Fxx, dt * Fuu, dt * Fux

    return jax.vmap(one)(X[:-1], U, ts)


def running_cost_derivatives(problem: Problem, X, U):
    """(lx, lu, lxx, luu, lux) stacked over the horizon."""
    ks = jnp.arange(problem.horizon)

    def one(x, u, k):
        lx, lu = problem.objective.running_cost_gradients(x, u, k)
        lxx, luu, lux = problem.objective.running_cost_hessians(x, u, k)
        return lx, lu, lxx, luu, lux

    return jax.vmap(one)(X[:-1], U, ks)


def compute_cost(problem: Problem, X, U):
    """Total objective (CDDPSolverBase::computeCost, cddp_solver_base.cpp:416-425)."""
    return problem.objective.evaluate(X, U)


def alphas_array(options: CDDPOptions, dtype=jnp.float64) -> jax.Array:
    return jnp.asarray(line_search_alphas(options.line_search), dtype=dtype)


def increase_regularization(reg, options: CDDPOptions):
    """cddp_core.cpp:308-316."""
    return jnp.minimum(
        reg * options.regularization.update_factor, options.regularization.max_value
    )


def decrease_regularization(reg, options: CDDPOptions):
    """cddp_core.cpp:318-326."""
    return jnp.maximum(
        reg / options.regularization.update_factor, options.regularization.min_value
    )


def regularization_limit_reached(reg, options: CDDPOptions):
    """cddp_core.cpp:328-331."""
    return reg >= options.regularization.max_value


class LineSearchSelection(NamedTuple):
    index: jax.Array  # selected alpha index
    success: jax.Array  # any alpha succeeded


def select_forward_result(
    success: jax.Array, merit: jax.Array, enable_parallel: bool
) -> LineSearchSelection:
    """Pick which alpha's rollout to commit.

    enable_parallel=False: first successful alpha in ladder order (the
    sequential early-exit of cddp_solver_base.cpp:256-263).
    enable_parallel=True: lowest merit among successes (:283-287).
    """
    any_success = jnp.any(success)
    if enable_parallel:
        masked = jnp.where(success, merit, jnp.inf)
        idx = jnp.argmin(masked)
    else:
        idx = jnp.argmax(success)  # first True
    return LineSearchSelection(index=idx, success=any_success)


def kkt_scaling(norm_Vx, horizon, state_dim, options: CDDPOptions):
    """Dual-infeasibility scaling (clddp_solver.cpp:197-201):
    s = max(s_max, |Vx|_1/(H*nx)) / s_max."""
    s_max = options.termination_scaling_max_factor
    return jnp.maximum(s_max, norm_Vx / (horizon * state_dim)) / s_max
