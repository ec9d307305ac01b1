"""Differentiable trajectory optimization — gradients THROUGH a solve.

A capability the C++ reference cannot offer: because :class:`Problem` is a
pytree (dynamics params, cost matrices, goal, x0 are all leaves), the
solution map ``problem -> (X*, U*)`` can be differentiated with respect to
ANY problem parameter. This enables inverse optimal control (fit cost
weights / goals to demonstrations), learned-dynamics MPC training, and
end-to-end control-aware perception — all running on TPU.

The gradient is computed by the implicit-function theorem at the converged
solution (Amos & Kolter, "Differentiable MPC for End-to-end Planning and
Control", NeurIPS 2018 — the method, not the code), NOT by unrolling solver
iterations (reverse-mode through ``lax.while_loop`` is impossible in JAX,
and unrolling is both memory-hungry and noisier):

    At a (locally) optimal U*, the stationarity condition holds:
        g(U*, theta) := d J(U, theta) / dU |_{U*} = 0
    IFT:  dU*/dtheta = -H^{-1} dg/dtheta,   H := d^2 J / dU^2 |_{U*}

    VJP with downstream cotangent Ubar:
        z = H^{-1} Ubar                (CG on Hessian-vector products)
        theta_bar = -(dg/dtheta)^T z   (one reverse-mode VJP of g)

H-vector products come from forward-over-reverse AD of the true total cost
(exact Hessian, including dynamics curvature — not the solver's
Gauss-Newton approximation), so the gradient is exact up to solver
tolerance and CG tolerance. Everything is jit/vmap-compatible; wrap your
training step in ``jax.jit`` as usual.

Scope and caveats:

- Control-box constraints (CLDDP clamping): dimensions strictly AT a bound
  at the solution are frozen (their sensitivity is zero almost everywhere);
  the Hessian solve is restricted to the free set. The active-set decision
  itself is non-differentiable — gradients are correct away from the
  boundary-activation measure-zero set.
- General path/terminal constraints (IPDDP/MSIPDDP): not differentiated in
  v1 — differentiate an equivalent penalized/soft formulation, or solve
  with CLDDP box limits.
- The IFT assumes g(U*) ~ 0: solve to a tight tolerance (f64 recommended
  for training loops; f32 gradients carry the certificate-floor noise).

Reference provenance: no counterpart — the closest the reference offers is
warm-started re-solves for finite-difference studies.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cddp_tpu.models.base import rollout
from cddp_tpu.options import CDDPOptions
from cddp_tpu.problem import Problem


def total_cost(problem: Problem, U: jax.Array) -> jax.Array:
    """The objective the solvers minimize, as a differentiable scalar of
    (problem, U): open-loop rollout from problem.x0 + objective evaluate
    (base.compute_cost semantics, cddp_solver_base.cpp:416-425)."""
    X = rollout(problem.model, problem.x0, U, problem.timestep)
    return problem.objective.evaluate(X, U)


def _control_bounds(problem: Problem):
    """(lb, ub) of a ControlConstraint box if one is attached, else None.
    Mirrors CLDDP's clamping source (clddp_solver.cpp:237-240)."""
    from cddp_tpu.constraints.path import ControlConstraint

    for _, c in problem.sorted_constraints():
        if isinstance(c, ControlConstraint):
            return jnp.asarray(c.lower), jnp.asarray(c.upper)
    return None


def _free_mask(problem: Problem, U: jax.Array) -> jax.Array:
    """1.0 where a control coordinate is strictly inside its box (or no box
    exists): the set over which the stationarity condition g=0 holds and
    IFT sensitivities are nonzero."""
    bounds = _control_bounds(problem)
    if bounds is None:
        return jnp.ones_like(U)
    lb, ub = bounds
    eps = jnp.asarray(1e-7, U.dtype) * (1.0 + jnp.abs(ub) + jnp.abs(lb))
    return ((U > lb + eps) & (U < ub - eps)).astype(U.dtype)


def make_differentiable_solve(
    solver: str = "CLDDP",
    options: CDDPOptions = CDDPOptions(),
    cg_tol: float = 1e-10,
    cg_maxiter: Optional[int] = None,
):
    """Build ``dsolve(problem, U0) -> (X*, U*)`` differentiable in
    ``problem`` (any pytree leaf: x0, cost matrices, goal, model params).

    ``U0`` seeds the inner solve; its cotangent is zero (at an isolated
    optimum the solution does not depend on the seed).

    Example — fit a goal to a demonstration (inverse optimal control)::

        dsolve = make_differentiable_solve("CLDDP", opts)

        def loss(goal):
            prob = base_problem.replace(
                objective=base_problem.objective.replace(
                    reference_state=goal))
            X, U = dsolve(prob, U0)
            return jnp.sum((X - X_demo) ** 2)

        g = jax.grad(loss)(goal)   # exact IFT gradient, jit/vmap-able
    """
    from cddp_tpu.solvers import get_solver

    solve_fn = get_solver(solver)

    @jax.custom_vjp
    def dsolve(problem: Problem, U0: jax.Array):
        # Seed X with the dynamics-consistent rollout of U0. The reference's
        # zero-fill seed (cddp_core.cpp:272-298) computes the initial merit on
        # an X inconsistent with the dynamics; when that fictitious cost is
        # below the true rollout cost, the line search can never accept a step
        # and the inner solve stalls at U0 — fatal for the IFT, which needs a
        # converged stationary point.
        X0 = rollout(problem.model, problem.x0, U0, problem.timestep)
        sol = solve_fn(problem, options, X0=X0, U0=U0)
        return sol.state_trajectory, sol.control_trajectory

    def fwd(problem, U0):
        X, U = dsolve(problem, U0)
        return (X, U), (problem, U)

    def bwd(res, cotangents):
        problem, U = res
        Xbar, Ubar_direct = cotangents

        # Pull the X* cotangent back through the rollout: X* is a function
        # of (problem, U*), so Xbar contributes both to the problem
        # cotangent (x0, dynamics params) and to the U cotangent.
        _, roll_vjp = jax.vjp(
            lambda p, u: rollout(p.model, p.x0, u, p.timestep), problem, U
        )
        pbar_roll, Ubar_roll = roll_vjp(Xbar)
        Ubar = Ubar_direct + Ubar_roll

        # Restrict to the free set (box-clamped coordinates are frozen).
        mask = _free_mask(problem, U)
        b = Ubar * mask

        # z = H^{-1} b by CG on exact Hessian-vector products
        # (forward-over-reverse through the total cost), H restricted to
        # the free-free block: Htilde = M H M + (I - M).
        grad_U = jax.grad(total_cost, argnums=1)

        def hvp(v):
            hv = jax.jvp(lambda u: grad_U(problem, u), (U,), (v * mask,))[1]
            return hv * mask + v * (1.0 - mask)

        z, _ = jax.scipy.sparse.linalg.cg(
            hvp, b, tol=cg_tol, maxiter=cg_maxiter
        )
        z = z * mask

        # theta_bar = -(dg/dtheta)^T z: reverse-mode VJP of the stationarity
        # residual with respect to the problem, evaluated at (U*, theta).
        _, g_vjp = jax.vjp(lambda p: grad_U(p, U), problem)
        (pbar_ift,) = g_vjp(z)

        pbar = jax.tree_util.tree_map(
            lambda a, c: a - c, pbar_roll, pbar_ift
        )
        return pbar, jnp.zeros_like(U)

    dsolve.defvjp(fwd, bwd)
    return dsolve
