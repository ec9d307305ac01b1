"""Constraint stacking.

The reference's IP solvers iterate a name-sorted std::map and concatenate each
constraint's block into one (total_dual_dim,) vector per step
(ipddp_solver.cpp:1365-1384). Here the same layout is built once at trace
time: all path constraints stack into static (m,) / (m, nx) / (m, nu) blocks
in sorted-name order, so the per-step interior-point algebra is dense
fixed-shape math that vmaps over the horizon and over problem batches.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from cddp_tpu.problem import Problem


def _split_blocks(names, dims, stacked):
    """Per-name blocks along the last axis — one layout rule shared by the
    path and terminal stackers (Solution dual/slack maps)."""
    out, off = {}, 0
    for name, d in zip(names, dims):
        out[name] = stacked[..., off : off + d]
        off += d
    return out


class PathStacker:
    """Stacked view of a problem's path constraints (static layout)."""

    def __init__(self, problem: Problem):
        self.items = problem.sorted_constraints()
        self.names: List[str] = [n for n, _ in self.items]
        self.dims: List[int] = [c.dual_dim for _, c in self.items]
        self.total_dim: int = sum(self.dims)
        self.offsets: List[int] = []
        off = 0
        for d in self.dims:
            self.offsets.append(off)
            off += d

    def __bool__(self):
        return self.total_dim > 0

    @property
    def has_curved(self) -> bool:
        """True when any stacked constraint is non-affine (nonzero
        constraint Hessians) — the trigger for IPDDPOptions "auto"
        slack_soc / use_constraint_hessians tracing."""
        return any(not c.is_affine for _, c in self.items)

    def evaluate_shifted(self, x, u, k=0) -> jax.Array:
        """Stacked G = g(x,u) - ub  (<= 0 feasible), the quantity the IP
        solvers store as G_ (evaluateTrajectory, ipddp_solver.cpp:2252-2290)."""
        parts = [c.evaluate(x, u, k) - c.upper_bound() for _, c in self.items]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)

    def jacobians(self, x, u, k=0) -> Tuple[jax.Array, jax.Array]:
        """Stacked (dG/dx, dG/du), shapes (m, nx), (m, nu)."""
        if not self.items:
            return (
                jnp.zeros((0, x.shape[0]), x.dtype),
                jnp.zeros((0, u.shape[0]), u.dtype),
            )
        gx = jnp.concatenate([c.state_jacobian(x, u, k) for _, c in self.items])
        gu = jnp.concatenate([c.control_jacobian(x, u, k) for _, c in self.items])
        return gx, gu

    def split(self, stacked: jax.Array) -> Dict[str, jax.Array]:
        """Per-name blocks along the last axis (for Solution maps)."""
        return _split_blocks(self.names, self.dims, stacked)


class TerminalStacker:
    """Stacked terminal constraints, split into inequality and equality groups
    (getTerminalInequalityLayout / getTerminalEqualityLayout,
    ipddp_solver.cpp:52-117). Rejects unsupported terminal constraint types
    exactly as the reference does (ipddp_solver.cpp:56-67)."""

    def __init__(self, problem: Problem):
        from cddp_tpu.constraints.terminal import (
            TerminalEqualityConstraint,
            TerminalInequalityConstraint,
        )

        self.ineq_items = []
        self.eq_items = []
        for name, c in problem.sorted_terminal_constraints():
            if isinstance(c, TerminalEqualityConstraint):
                self.eq_items.append((name, c))
            elif isinstance(c, TerminalInequalityConstraint):
                self.ineq_items.append((name, c))
            else:
                raise TypeError(
                    f"IPDDP: terminal constraint '{name}' has unsupported type. "
                    "Supported terminal constraints are TerminalEqualityConstraint "
                    "and TerminalInequalityConstraint."
                )
        self.ineq_names = [n for n, _ in self.ineq_items]
        self.ineq_dims = [c.dual_dim for _, c in self.ineq_items]
        self.ineq_dim = sum(self.ineq_dims)
        self.eq_names = [n for n, _ in self.eq_items]
        self.eq_dims = [c.dual_dim for _, c in self.eq_items]
        self.eq_dim = sum(self.eq_dims)

    # --- inequalities: g_T(x_N) <= 0 stacked ------------------------------
    def ineq_evaluate(self, x) -> jax.Array:
        parts = [c.evaluate(x) for _, c in self.ineq_items]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)

    def ineq_jacobian(self, x) -> jax.Array:
        if not self.ineq_items:
            return jnp.zeros((0, x.shape[0]), x.dtype)
        return jnp.concatenate([c.state_jacobian(x) for _, c in self.ineq_items])

    def split_ineq(self, stacked: jax.Array) -> Dict[str, jax.Array]:
        return _split_blocks(self.ineq_names, self.ineq_dims, stacked)

    # --- equalities: h_T(x_N) = 0 stacked ---------------------------------
    def eq_evaluate(self, x) -> jax.Array:
        parts = [c.evaluate(x) for _, c in self.eq_items]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)

    def eq_jacobian(self, x) -> jax.Array:
        if not self.eq_items:
            return jnp.zeros((0, x.shape[0]), x.dtype)
        return jnp.concatenate([c.state_jacobian(x) for _, c in self.eq_items])

    def split_eq(self, stacked: jax.Array) -> Dict[str, jax.Array]:
        return _split_blocks(self.eq_names, self.eq_dims, stacked)
