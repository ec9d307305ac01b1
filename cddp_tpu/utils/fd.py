"""Central finite-difference oracles.

Rebuild of the reference FD templates
(``include/cddp-cpp/cddp_core/helper.hpp:33-198``). In the JAX rebuild these
are *test oracles* (AD replaces FD on the compute path); same default steps
as the reference (h ~ 1e-5, terminal-Hessian 2e-5 in NonlinearObjective).
"""

from __future__ import annotations

import numpy as np


def finite_difference_gradient(f, x, h: float = 1e-5) -> np.ndarray:
    """Central-difference gradient of scalar f (helper.hpp:33-60)."""
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp[i] += h
        xm[i] -= h
        g[i] = (float(f(xp)) - float(f(xm))) / (2 * h)
    return g


def finite_difference_jacobian(f, x, h: float = 1e-5) -> np.ndarray:
    """Central-difference Jacobian of vector f (helper.hpp:95-125)."""
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(f(x), dtype=np.float64)
    J = np.zeros((f0.size, x.size))
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp[i] += h
        xm[i] -= h
        J[:, i] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * h)
    return J


def finite_difference_hessian(f, x, h: float = 1e-4) -> np.ndarray:
    """Central-difference Hessian of scalar f (helper.hpp:157-198)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    H = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            xpp, xpm, xmp, xmm = x.copy(), x.copy(), x.copy(), x.copy()
            xpp[i] += h
            xpp[j] += h
            xpm[i] += h
            xpm[j] -= h
            xmp[i] -= h
            xmp[j] += h
            xmm[i] -= h
            xmm[j] -= h
            H[i, j] = (float(f(xpp)) - float(f(xpm)) - float(f(xmp)) + float(f(xmm))) / (
                4 * h * h
            )
    return H
