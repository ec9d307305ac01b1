"""Seidel-style randomized minimum-norm QP solver (SDQP).

Rebuild of ``src/cddp_core/qp_solver.cpp``: min 0.5 x'Qx + c'x subject to
A x + b <= 0, via a Cholesky problem transform to a minimum-norm problem
(:69-84), incremental Householder-reflection active-set updates (:155-169),
a randomized constraint permutation with a seeded RNG (default seed 42,
qp_solver.hpp:45-46), and a move-to-front heuristic (:191-205).

In the reference this solver is test-only (cross-checked against BoxQP,
tests/cddp_core/test_boxqp.cpp:46-123); the rebuild keeps that role. The
algorithm is inherently sequential host-style code, so it is implemented in
plain NumPy (not jitted) — the compute path uses :mod:`cddp_tpu.ops.boxqp`.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np


class QPStatus(enum.IntEnum):
    OPTIMAL = 0
    INFEASIBLE = 1
    MAX_ITER_REACHED = 2
    NUMERICAL_ERROR = 3


@dataclass
class QPSolverOptions:
    """qp_solver.hpp options (seed default 42)."""

    max_iterations: int = 100
    eps: float = 1e-10
    random_seed: int = 42
    verbose: bool = False


@dataclass
class QPResult:
    x: Optional[np.ndarray] = None
    objective_value: float = np.inf
    status: QPStatus = QPStatus.NUMERICAL_ERROR
    solve_time: float = 0.0


class QPSolver:
    """min 0.5 x'Qx + c'x  s.t.  A x + b <= 0 (qp_solver.cpp:54-105)."""

    def __init__(self, options: QPSolverOptions = QPSolverOptions()):
        self.options = options
        self.rng = np.random.RandomState(options.random_seed)
        self.num_vars = 0
        self.num_constraints = 0
        self.Q = None
        self.c = None
        self.A = None
        self.b = None

    def set_dimensions(self, num_vars: int, num_constraints: int):
        self.num_vars = num_vars
        self.num_constraints = num_constraints

    def set_hessian(self, Q):
        self.Q = np.asarray(Q, dtype=np.float64)

    def set_gradient(self, c):
        self.c = np.asarray(c, dtype=np.float64)

    def set_constraints(self, A, b):
        self.A = np.asarray(A, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)

    def solve(self) -> QPResult:
        result = QPResult()
        t0 = time.perf_counter()
        n, m = self.num_vars, self.num_constraints
        if n <= 0 or m <= 0:
            return result

        # Cholesky transform (qp_solver.cpp:69-84): with Q = U'U,
        # substitute z = U x + U^-T c so the problem becomes min ||z||.
        try:
            U = np.linalg.cholesky(self.Q).T  # upper-triangular factor
        except np.linalg.LinAlgError:
            return result
        As = np.linalg.solve(U.T, self.A.T).T  # A U^-1
        v = np.linalg.solve(self.Q, self.c)
        bs = self.A @ v + self.b

        scale = np.linalg.norm(As, axis=1)
        scale = np.where(scale > 0, scale, 1.0)
        halves = np.zeros((n + 1, m))
        halves[:n, :] = (As / scale[:, None]).T
        halves[n, :] = bs / scale

        x = np.zeros(n)
        status = self._solve_min_norm(x, halves)

        if status == QPStatus.OPTIMAL:
            x = np.linalg.solve(U, x)
            x -= v
            result.x = x
            result.objective_value = 0.5 * x @ self.Q @ x + self.c @ x
        result.status = status
        result.solve_time = time.perf_counter() - t0
        return result

    def solve_min_norm(self, halves) -> QPResult:
        """Directly solve min ||x|| s.t. halves[:n]'x + halves[n] <= 0."""
        n = halves.shape[0] - 1
        x = np.zeros(n)
        status = self._solve_min_norm(x, np.array(halves, dtype=np.float64))
        r = QPResult(x=x if status == QPStatus.OPTIMAL else None, status=status)
        if status == QPStatus.OPTIMAL:
            r.objective_value = 0.5 * float(x @ x)
        return r

    # --- Seidel-style incremental min-norm (qp_solver.cpp:107-170) ---------
    def _solve_min_norm(self, x: np.ndarray, halves: np.ndarray) -> QPStatus:
        n = self.num_vars if self.num_vars else halves.shape[0] - 1
        m = halves.shape[1]
        x[:] = 0.0
        if m < 1:
            return QPStatus.OPTIMAL

        # Randomized processing order via the linked-list construction
        # (qp_solver.cpp:116-135): constraint 0 first, then a random
        # permutation of the rest.
        nxt = np.zeros(m, dtype=int)
        prv = np.zeros(m + 1, dtype=int)
        if m > 1:
            perm = np.arange(m - 1)
            # Fisher-Yates with the seeded RNG (qp_solver.cpp:173-186)
            for i in range(m - 2, 0, -1):
                j = self.rng.randint(0, i + 1)
                perm[i], perm[j] = perm[j], perm[i]
            prv[0] = 0
            nxt[0] = perm[0] + 1
            prv[perm[0] + 1] = 0
            for i in range(m - 2):
                nxt[perm[i] + 1] = perm[i + 1] + 1
                prv[perm[i + 1] + 1] = perm[i] + 1
            nxt[perm[m - 2] + 1] = m
        else:
            prv[0] = 0
            nxt[0] = 1

        eps = self.options.eps
        i = 0
        while i != m:
            plane_i = halves[:n, i]
            bi = halves[n, i]
            if x @ plane_i + bi > (n + 1) * eps:
                s = plane_i @ plane_i
                if s < (n + 1) * eps * eps:
                    return QPStatus.INFEASIBLE
                x[:] = -bi * plane_i / s
                if i == 0:
                    i = nxt[i]
                    continue
                # Householder reflection with pivoting (qp_solver.cpp:155-169)
                idx = int(np.argmax(np.abs(x)))
                xnorm = np.linalg.norm(x)
                reflx = x.copy()
                reflx[idx] += -xnorm if x[idx] < 0.0 else xnorm
                h = -2.0 / (reflx @ reflx)
                j = 0
                while j != i:
                    coeff = h * (halves[:n, j] @ reflx)
                    halves[:n, j] += reflx * coeff
                    j = nxt[j]
                i = self._move_to_front(i, nxt, prv)
            i = nxt[i]
        return QPStatus.OPTIMAL

    @staticmethod
    def _move_to_front(i, nxt, prv):
        """qp_solver.cpp:188-205."""
        if i == 0 or i == nxt[0]:
            return i
        previ = prv[i]
        nxt[prv[i]] = nxt[i]
        prv[nxt[i]] = prv[i]
        nxt[i] = nxt[0]
        prv[i] = 0
        prv[nxt[i]] = i
        nxt[0] = i
        return previ
