"""Solver registry.

Mirror of the reference's strategy factory + external-solver registry
(``CDDP::createSolver`` / ``CDDP::registerSolver``, cddp_core.cpp:213-233,
578-595): built-ins are consulted after user-registered solvers, and an
unknown name is an explicit error listing what's available.
"""

from __future__ import annotations

from typing import Callable, Dict

_EXTERNAL: Dict[str, Callable] = {}


def register_solver(name: str, solve_fn: Callable) -> None:
    if not callable(solve_fn):
        raise ValueError("solver must be callable")
    _EXTERNAL[name] = solve_fn


def registered_solvers():
    return sorted(_EXTERNAL)


def get_solver(name: str) -> Callable:
    if name in _EXTERNAL:
        return _EXTERNAL[name]
    if name in ("CLDDP", "CLCDDP", "CDDP", "iLQR"):
        from cddp_tpu.solvers import clddp

        return clddp.solve
    if name in ("LogDDP", "LOGDDP"):
        from cddp_tpu.solvers import logddp

        return logddp.solve
    if name == "IPDDP":
        from cddp_tpu.solvers import ipddp

        return ipddp.solve
    if name == "MSIPDDP":
        from cddp_tpu.solvers import msipddp

        return msipddp.solve
    raise ValueError(
        f"Unknown solver {name!r}. Available: "
        f"{registered_solvers() + ['CLDDP', 'LogDDP', 'IPDDP', 'MSIPDDP']}"
    )
