"""pycddp-style object-oriented compatibility layer.

The reference's Python API is an imperative builder
(``pycddp.CDDP(x0, xref, H, dt, opts)`` + ``set_dynamical_system`` /
``set_objective`` / ``add_constraint`` / ``set_initial_trajectory`` /
``solve``, bind_solver.cpp:565-663). The native cddp_tpu API is functional,
but reference users migrating their scripts get the same surface here:
every method name matches python/pycddp (snake_case, §2.5 of SURVEY.md).

Under the hood this builds an immutable :class:`~cddp_tpu.problem.Problem`
per solve, dispatches through the solver registry, and preserves solver
state across ``solve()`` calls for warm starting — the behavior the C++
context object provides by mutation.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from cddp_tpu.problem import problem as _make_problem
from cddp_tpu.options import CDDPOptions
from cddp_tpu.solution import Solution


class CDDP:
    """Mirror of ``pycddp.CDDP`` (bind_solver.cpp:565-663)."""

    def __init__(self, initial_state, reference_state, horizon: int,
                 timestep: float, options: Optional[CDDPOptions] = None):
        self.initial_state = jnp.asarray(initial_state)
        self.reference_state = jnp.asarray(reference_state)
        self.horizon = int(horizon)
        self.timestep = float(timestep)
        self.options = options or CDDPOptions()
        self._system = None
        self._objective = None
        self._constraints = {}
        self._terminal_constraints = {}
        self._X0 = None
        self._U0 = None
        self._solver_states = {}

    # --- builder methods (names match bind_solver.cpp:587-663) -------------
    def set_dynamical_system(self, system):
        # Abstract-base rejection (bind_solver.cpp isExactCoreType guard;
        # python/tests/test_solver_errors.py:76).
        from cddp_tpu.models.base import DynamicalSystem

        if type(system) is DynamicalSystem:
            raise TypeError(
                "DynamicalSystem is an abstract base; subclass it or use "
                "cddp_tpu.models.custom_system(f, nx, nu)."
            )
        self._system = system

    def set_objective(self, objective):
        from cddp_tpu.costs.objective import Objective

        if type(objective) is Objective:
            raise TypeError(
                "Objective is an abstract base; use QuadraticObjective, "
                "NonlinearObjective, or ResidualObjective."
            )
        self._objective = objective

    def set_options(self, options: CDDPOptions):
        self.options = options

    def add_constraint(self, name: str, constraint):
        self._constraints[name] = constraint

    def add_path_constraint(self, name: str, constraint):
        self._constraints[name] = constraint

    def remove_constraint(self, name: str):
        self._constraints.pop(name, None)

    def add_terminal_constraint(self, name: str, constraint):
        self._terminal_constraints[name] = constraint

    def set_initial_trajectory(self, X, U):
        # Validation mirrors pycddp's validateInitialTrajectory
        # (bind_solver.cpp:106-140; python/tests/test_solver_errors.py:67-121).
        if self._system is None:
            raise RuntimeError(
                "Dynamical system must be set before setting the initial "
                "trajectory."
            )
        X = jnp.asarray(X)
        U = jnp.asarray(U)
        if X.shape[0] != self.horizon + 1:
            raise ValueError(
                f"Initial state trajectory must have horizon+1 = "
                f"{self.horizon + 1} entries, got {X.shape[0]}."
            )
        if U.shape[0] != self.horizon:
            raise ValueError(
                f"Initial control trajectory must have horizon = "
                f"{self.horizon} entries, got {U.shape[0]}."
            )
        if X.ndim != 2 or X.shape[1] != self._system.state_dim:
            raise ValueError(
                f"Initial states must have dimension "
                f"{self._system.state_dim}, got {X.shape[1:]}."
            )
        if U.ndim != 2 or U.shape[1] != self._system.control_dim:
            raise ValueError(
                f"Initial controls must have dimension "
                f"{self._system.control_dim}, got {U.shape[1:]}."
            )
        self._X0, self._U0 = X, U
        # setInitialTrajectory syncs x0 to X[0] (cddp_core.cpp:126-141).
        self.initial_state = X[0]

    def get_state_dim(self) -> int:
        return self._system.state_dim

    def get_control_dim(self) -> int:
        return self._system.control_dim

    def get_horizon(self) -> int:
        return self.horizon

    def get_timestep(self) -> float:
        return self.timestep

    # --- solve --------------------------------------------------------------
    def solve(self, solver_type: str = "CLDDP") -> Solution:
        """Solve and return a Solution; errors mirror the reference
        (system/objective must be set, cddp_core.cpp:277-283). Solver state
        is preserved per solver name so warm_start options work across calls.
        Wall-clock is measured host-side into solve_time_ms."""
        from cddp_tpu.solvers import get_solver

        # Solver-name validation comes FIRST, like pycddp's solve_by_name
        # guard (bind_solver.cpp:638-651).
        fn = get_solver(solver_type)
        if self._system is None:
            raise RuntimeError("Dynamical system must be set before solving.")
        if self._objective is None:
            raise RuntimeError("Objective function must be set before solving.")

        prob = _make_problem(
            self._system, self._objective, self.initial_state, self.horizon,
            self.timestep, constraints=self._constraints,
            terminal_constraints=self._terminal_constraints,
        )
        kw = {}
        if self._X0 is not None:
            kw["X0"] = self._X0
        if self._U0 is not None:
            kw["U0"] = self._U0

        state = self._solver_states.get(solver_type)
        supports_state = solver_type in ("IPDDP", "MSIPDDP")
        t0 = time.perf_counter()
        if supports_state:
            sol, new_state = fn(prob, self.options, state=state,
                                return_state=True, **kw)
            self._solver_states[solver_type] = new_state
        else:
            # CLDDP/LogDDP preserve control gains across solves when warm
            # starting (clddp_solver.cpp:35-66).
            if self.options.warm_start and state is not None:
                kw["gains"] = state
            sol = fn(prob, self.options, **kw)
            self._solver_states[solver_type] = (
                sol.feedforward_gains, sol.feedback_gains,
            )
        sol = jax.block_until_ready(sol)
        elapsed_ms = (time.perf_counter() - t0) * 1000.0
        return sol.replace(solve_time_ms=elapsed_ms)

    def solve_by_name(self, solver_type: str) -> Solution:
        return self.solve(solver_type)


# ---------------------------------------------------------------------------
# Full pycddp export surface (python/pycddp/__init__.py:12-75): every name a
# reference user imports from pycddp resolves here with the same meaning.
# ---------------------------------------------------------------------------

from cddp_tpu.options import (  # noqa: E402,F401
    BarrierOptions,
    BarrierStrategy,
    BoxQPOptions,
    FilterOptions,
    InteriorPointOptions,
    IPDDPOptions,
    LineSearchOptions,
    LogBarrierOptions,
    MSIPDDPOptions,
    RegularizationOptions,
)
from cddp_tpu.solution import (  # noqa: E402,F401
    IterationHistory as SolutionHistory,
    Solution as CDDPSolution,
)
from cddp_tpu.costs.objective import (  # noqa: E402,F401
    NonlinearObjective,
    Objective,
    QuadraticObjective,
)
from cddp_tpu.constraints.path import (  # noqa: E402,F401
    BallConstraint,
    ControlConstraint,
    LinearConstraint,
    MaxThrustMagnitudeConstraint,
    PathConstraint as Constraint,
    PoleConstraint,
    SecondOrderConeConstraint,
    StateConstraint,
    ThrustMagnitudeConstraint,
)
from cddp_tpu.models import (  # noqa: E402,F401
    Acrobot,
    Bicycle,
    Car,
    CartPole,
    DreyfusRocket,
    DubinsCar,
    DynamicalSystem,
    EulerAttitude,
    Forklift,
    HCW,
    LTISystem,
    Manipulator,
    MrpAttitude,
    Pendulum,
    Quadrotor,
    QuadrotorRate,
    QuaternionAttitude,
    SpacecraftLanding2D,
    SpacecraftLinearFuel,
    SpacecraftNonlinear,
    SpacecraftTwobody,
    Unicycle,
    USV3DOF as Usv3Dof,
)


class SolverType:
    """pycddp.SolverType enum (bind_options.cpp:17-21); values are the
    registry strings accepted by :meth:`CDDP.solve`."""

    CLDDP = "CLDDP"
    LogDDP = "LogDDP"
    IPDDP = "IPDDP"
    MSIPDDP = "MSIPDDP"
