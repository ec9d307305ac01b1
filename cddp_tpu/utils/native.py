"""ctypes bridge to the native host runtime (native/cddp_host.cpp).

The native library is the framework's C++ layer: an independent
double-precision BoxQP and LQR Riccati oracle plus a std::thread batched
BoxQP driver. It is OPTIONAL — built on demand with g++ (no pybind11) and
every entry point degrades gracefully when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "cddp_host.cpp"
_SO = _NATIVE_DIR / "libcddp_host.so"

_lib = None


def build(force: bool = False) -> Path:
    """Compile the native library if needed. Raises on failure. A shipped
    .so without the C++ source is accepted as-is."""
    if _SO.exists() and not force:
        if not _SRC.exists() or _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(str(_SO))
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int)
    lib.cddp_boxqp_solve.restype = ctypes.c_int
    lib.cddp_boxqp_solve.argtypes = [d, d, d, d, d, ctypes.c_int, d, i,
                                     ctypes.c_int, ctypes.c_double,
                                     ctypes.c_double, ctypes.c_double,
                                     ctypes.c_double, ctypes.c_double]
    lib.cddp_boxqp_solve_batch.restype = None
    lib.cddp_boxqp_solve_batch.argtypes = [d, d, d, d, d, ctypes.c_int,
                                           ctypes.c_int, d, i, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_double,
                                           ctypes.c_double, ctypes.c_double,
                                           ctypes.c_double, ctypes.c_double]
    lib.cddp_lqr_backward.restype = ctypes.c_int
    lib.cddp_lqr_backward.argtypes = [d, d, d, d, d, d, d, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, d, d]
    _lib = lib
    return lib


def _cptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def boxqp_solve(H, g, lower, upper, x0=None, max_iterations=100,
                min_gradient_norm=1e-8, min_relative_improvement=1e-8,
                step_decrease_factor=0.6, min_step_size=1e-22,
                armijo_constant=0.1):
    """Native BoxQP. Returns (x, status, free_mask)."""
    lib = load()
    H = np.ascontiguousarray(H, dtype=np.float64)
    g = np.ascontiguousarray(g, dtype=np.float64)
    lower = np.ascontiguousarray(lower, dtype=np.float64)
    upper = np.ascontiguousarray(upper, dtype=np.float64)
    n = g.shape[0]
    x0 = np.ascontiguousarray(
        x0 if x0 is not None else np.zeros(n), dtype=np.float64
    )
    x = np.zeros(n)
    free = np.zeros(n, dtype=np.int32)
    status = lib.cddp_boxqp_solve(
        _cptr(H), _cptr(g), _cptr(lower), _cptr(upper), _cptr(x0), n, _cptr(x),
        free.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_iterations,
        min_gradient_norm, min_relative_improvement, step_decrease_factor,
        min_step_size, armijo_constant,
    )
    return x, int(status), free.astype(bool)


def boxqp_solve_batch(Hs, gs, lowers, uppers, x0s=None, threads: int = 0,
                      max_iterations=100):
    """Threaded batched BoxQP (the host-runtime analogue of the reference's
    std::async fan-out). Returns (xs, statuses)."""
    import os

    lib = load()
    Hs = np.ascontiguousarray(Hs, dtype=np.float64)
    gs = np.ascontiguousarray(gs, dtype=np.float64)
    B, n = gs.shape
    lowers = np.ascontiguousarray(np.broadcast_to(lowers, (B, n)), dtype=np.float64)
    uppers = np.ascontiguousarray(np.broadcast_to(uppers, (B, n)), dtype=np.float64)
    x0s = np.ascontiguousarray(
        x0s if x0s is not None else np.zeros((B, n)), dtype=np.float64
    )
    xs = np.zeros((B, n))
    statuses = np.zeros(B, dtype=np.int32)
    threads = threads or (os.cpu_count() or 1)
    lib.cddp_boxqp_solve_batch(
        _cptr(Hs), _cptr(gs), _cptr(lowers), _cptr(uppers), _cptr(x0s), B, n,
        _cptr(xs), statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads, max_iterations, 1e-8, 1e-8, 0.6, 1e-22, 0.1,
    )
    return xs, statuses


def lqr_backward(Q, q, R, r, M, A, B):
    """Native LQR backward sweep. Returns (K, k); raises if Quu not PD."""
    lib = load()
    Q = np.ascontiguousarray(Q, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    R = np.ascontiguousarray(R, dtype=np.float64)
    r = np.ascontiguousarray(r, dtype=np.float64)
    M = np.ascontiguousarray(M, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    N, m, _ = R.shape[0], R.shape[1], R.shape[2]
    n = Q.shape[-1]
    K = np.zeros((N, m, n))
    k = np.zeros((N, m))
    rc = lib.cddp_lqr_backward(
        _cptr(Q), _cptr(q), _cptr(R), _cptr(r), _cptr(M), _cptr(A), _cptr(B),
        N, n, m, _cptr(K), _cptr(k),
    )
    if rc != 0:
        raise RuntimeError("native LQR backward: Quu not positive definite")
    return K, k



# Base model ids (hundreds digit selects the integrator: 0 Euler, 1 RK4 —
# make_model in cddp_host.cpp). params per model:
#   0 unicycle: none; 1 pendulum: [l, m, b, g]; 2 car: [wheelbase, h];
#   3 cartpole: [mc, mp, l, g, damping]; 4 quadrotor: [mass, Ixx, Iyy, Izz,
#   arm, g]; 5 scalar LTI: [a, b, h] (discrete x+ = a x + b u).
_MODEL_DIMS = {0: (3, 2), 1: (2, 1), 2: (4, 2), 3: (4, 1), 4: (13, 4),
               5: (1, 1)}
_INTEGRATORS = {"euler": 0, "rk4": 1}


def _model_setup(model_id, params, integrator="euler"):
    """Validate model_id against the native registry (see _MODEL_DIMS),
    normalize params, and fold the integrator into the encoded id.
    Returns (nx, nu, params, encoded_model_id)."""
    if model_id not in _MODEL_DIMS:
        raise ValueError(
            f"native engines support model_id in {sorted(_MODEL_DIMS)}, "
            f"got {model_id}"
        )
    if integrator not in _INTEGRATORS:
        raise ValueError(
            f"native engines support integrator 'euler' or 'rk4', "
            f"got {integrator!r}"
        )
    nx, nu = _MODEL_DIMS[model_id]
    params = np.ascontiguousarray(
        params if params is not None else np.zeros(6), dtype=np.float64
    )
    if model_id == 1 and params.shape[0] == 3:
        # legacy [l, m, b] -> append default gravity
        params = np.concatenate([params, [9.81]])
    return nx, nu, params, model_id + 100 * _INTEGRATORS[integrator]


def model_eval(model_id, params, dt, x, u, integrator="euler"):
    """Probe the native model registry: effective rate f(x, u) and its
    Jacobians (cddp_model_eval). The discrete step is x + dt*f with
    Jacobian I + dt*Fx — for RK4-encoded models this IS the RK4 map and
    its exact (complex-step) Jacobian. Returns (xdot, Fx, Fu)."""
    lib = load()
    nx, nu, params, model_id = _model_setup(model_id, params, integrator)
    x = np.ascontiguousarray(x, dtype=np.float64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    xdot = np.zeros(nx)
    Fx = np.zeros((nx, nx))
    Fu = np.zeros((nx, nu))
    lib.cddp_model_eval.restype = ctypes.c_int
    rc = lib.cddp_model_eval(
        ctypes.c_int(model_id), _cptr(params), ctypes.c_double(dt),
        _cptr(x), _cptr(u), _cptr(xdot), _cptr(Fx), _cptr(Fu),
    )
    if rc != 0:
        raise ValueError(f"cddp_model_eval rejected model_id {model_id}")
    return xdot, Fx, Fu


def clddp_solve(model_id, params, N, dt, Qs, Rs, Qf, goal, x0,
                lower=None, upper=None, U0=None,
                max_iterations=100, tolerance=1e-5,
                acceptable_tolerance=1e-6, reg_init=1e-6, reg_min=1e-10,
                reg_max=1e7, reg_factor=10.0, armijo_constant=1e-4,
                scaling_max_factor=100.0, integrator="euler"):
    """Full native CLDDP solve (cddp_clddp_solve in cddp_host.cpp) — the
    C++ CPU execution engine with the exact semantics of
    cddp_tpu.solvers.clddp (dt-prescaled quadratic cost, Euler
    linearization, BoxQP feedforward, sequential Armijo-ratio ladder).

    model_id: 0 unicycle (nx=3, nu=2), 1 pendulum (nx=2, nu=1). Pass the
    ALREADY dt-scaled Qs/Rs (QuadraticObjective convention). Returns
    (status, X, U, cost, inf_du, iterations).
    """
    lib = load()
    nx, nu, params, model_id = _model_setup(model_id, params, integrator)
    Qs = np.ascontiguousarray(Qs, dtype=np.float64)
    Rs = np.ascontiguousarray(Rs, dtype=np.float64)
    Qf = np.ascontiguousarray(Qf, dtype=np.float64)
    goal = np.ascontiguousarray(goal, dtype=np.float64)
    x0 = np.ascontiguousarray(x0, dtype=np.float64)
    lower = np.ascontiguousarray(
        lower if lower is not None else np.full(nu, -1e20), dtype=np.float64
    )
    upper = np.ascontiguousarray(
        upper if upper is not None else np.full(nu, 1e20), dtype=np.float64
    )
    X = np.zeros((N + 1, nx))
    U = np.ascontiguousarray(
        U0 if U0 is not None else np.zeros((N, nu)), dtype=np.float64
    ).copy()
    stats = np.zeros(3)
    lib.cddp_clddp_solve.restype = ctypes.c_int
    status = lib.cddp_clddp_solve(
        ctypes.c_int(model_id), _cptr(params), ctypes.c_int(N),
        ctypes.c_double(dt), _cptr(Qs), _cptr(Rs), _cptr(Qf), _cptr(goal),
        _cptr(x0), _cptr(lower), _cptr(upper),
        ctypes.c_int(max_iterations), ctypes.c_double(tolerance),
        ctypes.c_double(acceptable_tolerance), ctypes.c_double(reg_init),
        ctypes.c_double(reg_min), ctypes.c_double(reg_max),
        ctypes.c_double(reg_factor), ctypes.c_double(armijo_constant),
        ctypes.c_double(scaling_max_factor), _cptr(X), _cptr(U), _cptr(stats),
    )
    return status, X, U, stats[0], stats[1], int(stats[2])


def ipddp_solve(model_id, params, N, dt, Qs, Rs, Qf, goal, x0,
                lower, upper, U0=None, ball_center=None, ball_radius=0.0,
                max_iterations=100, tolerance=1e-5,
                acceptable_tolerance=1e-6, reg_init=1e-6, reg_min=1e-10,
                reg_max=1e7, reg_factor=10.0,
                ls_max_iterations=11, ls_initial=1.0, ls_min=1e-8,
                ls_reduction=0.5,
                mu_initial=1.0, mu_min=1e-10, mu_update_factor=0.5,
                mu_update_power=1.2, min_fraction_to_boundary=0.99,
                filter_merit_acceptance=1e-6, filter_violation_acceptance=1e-6,
                filter_max_violation=1e4, filter_min_violation_armijo=1e-7,
                filter_armijo_constant=1e-4,
                dual_var_init_scale=1e-1, slack_var_init_scale=1e-2,
                barrier_tol_mult=0.1, theta_0_floor=1.0, max_filter_size=5,
                barrier_strategy=0, mu_kappa_epsilon=10.0,
                barrier_update_dual_weight=0.01, integrator="euler"):
    """Full native IPDDP solve (cddp_ipddp_solve in cddp_host.cpp) — the
    independent C++ oracle for the condensed path-constraint regime
    (ipddp_solver.cpp:1355-1568 semantics; cold start, iLQR, sequential
    filter line search, ADAPTIVE barrier by default; barrier_strategy=1
    selects the MONOTONIC/IPOPT kappa rule). Constraints: control box
    (mandatory) + optional keep-out ball on x[:2] (BallConstraint, stacked
    first per name-sorted order). Defaults mirror CDDPOptions.

    Returns (status, X, U, dict(cost, inf_pr, inf_du, inf_comp, mu, iters)).
    """
    lib = load()
    nx, nu, params, model_id = _model_setup(model_id, params, integrator)
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (Qs, Rs, Qf, goal, x0, lower, upper)]
    Qs, Rs, Qf, goal, x0, lower, upper = arrs
    has_ball = ball_center is not None
    bc = np.ascontiguousarray(
        ball_center if has_ball else np.zeros(2), dtype=np.float64
    )
    opts = np.asarray([
        max_iterations, tolerance, acceptable_tolerance,
        reg_init, reg_min, reg_max, reg_factor,
        ls_max_iterations, ls_initial, ls_min, ls_reduction,
        mu_initial, mu_min, mu_update_factor, mu_update_power,
        min_fraction_to_boundary,
        filter_merit_acceptance, filter_violation_acceptance,
        filter_max_violation, filter_min_violation_armijo,
        filter_armijo_constant,
        dual_var_init_scale, slack_var_init_scale,
        barrier_tol_mult, theta_0_floor, max_filter_size,
        barrier_strategy, mu_kappa_epsilon, barrier_update_dual_weight,
    ], dtype=np.float64)
    X = np.zeros((N + 1, nx))
    U0 = np.ascontiguousarray(
        U0 if U0 is not None else np.zeros((N, nu)), dtype=np.float64
    )
    U = np.zeros((N, nu))
    stats = np.zeros(6)
    lib.cddp_ipddp_solve.restype = ctypes.c_int
    status = lib.cddp_ipddp_solve(
        ctypes.c_int(model_id), _cptr(params), ctypes.c_int(N),
        ctypes.c_double(dt), _cptr(Qs), _cptr(Rs), _cptr(Qf), _cptr(goal),
        _cptr(x0), _cptr(lower), _cptr(upper),
        ctypes.c_int(1 if has_ball else 0), _cptr(bc),
        ctypes.c_double(ball_radius), _cptr(opts), _cptr(U0),
        _cptr(X), _cptr(U), _cptr(stats),
    )
    info = dict(cost=stats[0], inf_pr=stats[1], inf_du=stats[2],
                inf_comp=stats[3], mu=stats[4], iters=int(stats[5]))
    return status, X, U, info


def logddp_solve(model_id, params, N, dt, Qs, Rs, Qf, goal, x0,
                 lower, upper, U0=None,
                 max_iterations=100, tolerance=1e-5,
                 acceptable_tolerance=1e-6, reg_init=1e-6, reg_min=1e-10,
                 reg_max=1e7, reg_factor=10.0,
                 ls_max_iterations=11, ls_initial=1.0, ls_min=1e-8,
                 ls_reduction=0.5,
                 mu_initial=1.0, mu_min=1e-10, mu_update_factor=0.5,
                 relaxed_log_barrier_delta=1e-10,
                 filter_merit_acceptance=1e-6,
                 filter_violation_acceptance=1e-6,
                 filter_max_violation=1e4, filter_min_violation_armijo=1e-7,
                 filter_armijo_constant=1e-4, integrator="euler"):
    """Full native LogDDP solve (cddp_logddp_solve in cddp_host.cpp) — the
    relaxed log-barrier DDP oracle (logddp_solver.cpp semantics; control-box
    barrier, iLQR, sequential filter line search). Defaults mirror
    CDDPOptions. Returns (status, X, U, dict(cost, cv, inf_du, mu, iters))."""
    lib = load()
    nx, nu, params, model_id = _model_setup(model_id, params, integrator)
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (Qs, Rs, Qf, goal, x0, lower, upper)]
    Qs, Rs, Qf, goal, x0, lower, upper = arrs
    opts = np.asarray([
        max_iterations, tolerance, acceptable_tolerance,
        reg_init, reg_min, reg_max, reg_factor,
        ls_max_iterations, ls_initial, ls_min, ls_reduction,
        mu_initial, mu_min, mu_update_factor, relaxed_log_barrier_delta,
        filter_merit_acceptance, filter_violation_acceptance,
        filter_max_violation, filter_min_violation_armijo,
        filter_armijo_constant,
    ], dtype=np.float64)
    X = np.zeros((N + 1, nx))
    U0 = np.ascontiguousarray(
        U0 if U0 is not None else np.zeros((N, nu)), dtype=np.float64
    )
    U = np.zeros((N, nu))
    stats = np.zeros(5)
    lib.cddp_logddp_solve.restype = ctypes.c_int
    status = lib.cddp_logddp_solve(
        ctypes.c_int(model_id), _cptr(params), ctypes.c_int(N),
        ctypes.c_double(dt), _cptr(Qs), _cptr(Rs), _cptr(Qf), _cptr(goal),
        _cptr(x0), _cptr(lower), _cptr(upper), _cptr(opts), _cptr(U0),
        _cptr(X), _cptr(U), _cptr(stats),
    )
    info = dict(cost=stats[0], cv=stats[1], inf_du=stats[2], mu=stats[3],
                iters=int(stats[4]))
    return status, X, U, info


def msipddp_solve(model_id, params, N, dt, Qs, Rs, Qf, goal, x0,
                  lower, upper, U0=None,
                  max_iterations=100, tolerance=1e-5,
                  acceptable_tolerance=1e-6, reg_init=1e-6, reg_min=1e-10,
                  reg_max=1e7, reg_factor=10.0,
                  ls_max_iterations=11, ls_initial=1.0, ls_min=1e-8,
                  ls_reduction=0.5,
                  mu_initial=1.0, mu_min=1e-10, mu_update_factor=0.5,
                  mu_update_power=1.2, min_fraction_to_boundary=0.99,
                  filter_merit_acceptance=1e-6,
                  filter_violation_acceptance=1e-6,
                  filter_max_violation=1e4, filter_min_violation_armijo=1e-7,
                  filter_armijo_constant=1e-4,
                  dual_var_init_scale=1e-1, slack_var_init_scale=1e-2,
                  segment_length=5, costate_var_init_scale=1e-6, integrator="euler"):
    """Full native MSIPDDP solve (cddp_msipddp_solve in cddp_host.cpp) —
    multiple-shooting interior-point oracle (msipddp_solver.cpp semantics:
    defect-aware backward with costates, nonlinear segment gap-closing,
    separate dual alpha ladder, l1-defect filter, sd-scaled inf_du,
    ADAPTIVE barrier). Control box, iLQR, cold start. Returns
    (status, X, U, dict(cost, inf_pr, inf_du, inf_comp, mu, iters))."""
    lib = load()
    nx, nu, params, model_id = _model_setup(model_id, params, integrator)
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (Qs, Rs, Qf, goal, x0, lower, upper)]
    Qs, Rs, Qf, goal, x0, lower, upper = arrs
    opts = np.asarray([
        max_iterations, tolerance, acceptable_tolerance,
        reg_init, reg_min, reg_max, reg_factor,
        ls_max_iterations, ls_initial, ls_min, ls_reduction,
        mu_initial, mu_min, mu_update_factor, mu_update_power,
        min_fraction_to_boundary,
        filter_merit_acceptance, filter_violation_acceptance,
        filter_max_violation, filter_min_violation_armijo,
        filter_armijo_constant,
        dual_var_init_scale, slack_var_init_scale,
        segment_length, costate_var_init_scale,
    ], dtype=np.float64)
    X = np.zeros((N + 1, nx))
    U0 = np.ascontiguousarray(
        U0 if U0 is not None else np.zeros((N, nu)), dtype=np.float64
    )
    U = np.zeros((N, nu))
    stats = np.zeros(6)
    lib.cddp_msipddp_solve.restype = ctypes.c_int
    status = lib.cddp_msipddp_solve(
        ctypes.c_int(model_id), _cptr(params), ctypes.c_int(N),
        ctypes.c_double(dt), _cptr(Qs), _cptr(Rs), _cptr(Qf), _cptr(goal),
        _cptr(x0), _cptr(lower), _cptr(upper), _cptr(opts), _cptr(U0),
        _cptr(X), _cptr(U), _cptr(stats),
    )
    info = dict(cost=stats[0], inf_pr=stats[1], inf_du=stats[2],
                inf_comp=stats[3], mu=stats[4], iters=int(stats[5]))
    return status, X, U, info

def ipddp_terminal_eq_solve(model_id, params, N, dt, Qs, Rs, Qf, goal, x0,
                            target, lower=None, upper=None, U0=None,
                            max_iterations=100, tolerance=1e-5,
                            acceptable_tolerance=1e-6, reg_init=1e-6,
                            reg_min=1e-10, reg_max=1e7, reg_factor=10.0,
                            ls_max_iterations=11, ls_initial=1.0, ls_min=1e-8,
                            ls_reduction=0.5,
                            mu_initial=1.0, mu_min=1e-10,
                            mu_update_factor=0.5, mu_update_power=1.2,
                            min_fraction_to_boundary=0.99,
                            filter_merit_acceptance=1e-6,
                            filter_violation_acceptance=1e-6,
                            filter_max_violation=1e4,
                            filter_min_violation_armijo=1e-7,
                            filter_armijo_constant=1e-4,
                            dual_var_init_scale=1e-1,
                            slack_var_init_scale=1e-2,
                            barrier_tol_mult=0.1, theta_0_floor=1.0,
                            max_filter_size=5,
                            jacobian_regularization_value=1e-8,
                            jacobian_regularization_exponent=0.25, integrator="euler"):
    """Native IPDDP terminal-equality reduced-LQR solve
    (cddp_ipddp_terminal_eq_solve in cddp_host.cpp) — the independent C++
    oracle for the p+1-variant reduced-LQR regime
    (ipddp_solver.cpp:413-639): perturbed-q LQR sweeps, terminal-state
    sensitivity, SVD-floored regularized LS for dlambda with the 5-scale
    ladder, linear gain recombination, filter forward pass with costate +
    terminal-multiplier updates. Terminal equality is x_N = target; pass
    lower/upper for an optional control box (folds the interior-point
    condensation into the LQR stage data). Returns
    (status, X, U, lambda_T, dict(cost, inf_pr, inf_du, inf_comp, mu, iters)).
    """
    lib = load()
    nx, nu, params, model_id = _model_setup(model_id, params, integrator)
    has_box = lower is not None or upper is not None
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (Qs, Rs, Qf, goal, x0, target)]
    Qs, Rs, Qf, goal, x0, target = arrs
    lower = np.ascontiguousarray(
        lower if lower is not None else np.full(nu, -1e20), dtype=np.float64
    )
    upper = np.ascontiguousarray(
        upper if upper is not None else np.full(nu, 1e20), dtype=np.float64
    )
    opts = np.asarray([
        max_iterations, tolerance, acceptable_tolerance,
        reg_init, reg_min, reg_max, reg_factor,
        ls_max_iterations, ls_initial, ls_min, ls_reduction,
        mu_initial, mu_min, mu_update_factor, mu_update_power,
        min_fraction_to_boundary,
        filter_merit_acceptance, filter_violation_acceptance,
        filter_max_violation, filter_min_violation_armijo,
        filter_armijo_constant,
        dual_var_init_scale, slack_var_init_scale,
        barrier_tol_mult, theta_0_floor, max_filter_size,
        jacobian_regularization_value, jacobian_regularization_exponent,
    ], dtype=np.float64)
    X = np.zeros((N + 1, nx))
    U0 = np.ascontiguousarray(
        U0 if U0 is not None else np.zeros((N, nu)), dtype=np.float64
    )
    U = np.zeros((N, nu))
    lam_T = np.zeros(nx)
    stats = np.zeros(6)
    lib.cddp_ipddp_terminal_eq_solve.restype = ctypes.c_int
    status = lib.cddp_ipddp_terminal_eq_solve(
        ctypes.c_int(model_id), _cptr(params), ctypes.c_int(N),
        ctypes.c_double(dt), _cptr(Qs), _cptr(Rs), _cptr(Qf), _cptr(goal),
        _cptr(x0), ctypes.c_int(1 if has_box else 0), _cptr(lower),
        _cptr(upper), _cptr(target), _cptr(opts), _cptr(U0),
        _cptr(X), _cptr(U), _cptr(lam_T), _cptr(stats),
    )
    info = dict(cost=stats[0], inf_pr=stats[1], inf_du=stats[2],
                inf_comp=stats[3], mu=stats[4], iters=int(stats[5]))
    return status, X, U, lam_T, info
