"""CPU proxy re-measurement (native oracle) for the quadrotor latency bench,
both barrier strategies, bench_quadrotor config."""
import time
import numpy as np
from cddp_tpu.utils import native

dt, N = 0.02, 100
goal = np.zeros(13); goal[0], goal[2], goal[3] = 3.0, 2.0, 1.0
Q = np.zeros((13, 13)); Q[4, 4] = Q[5, 5] = Q[6, 6] = 0.1
R = 0.1 * np.eye(4)
Qf = np.diag([500.0, 500.0, 500.0, 1.0, 1.0, 1.0, 1.0,
              10.0, 10.0, 10.0, 0.0, 0.0, 0.0])
lo, hi = np.zeros(4), np.full(4, 5.0)
x0 = np.zeros(13); x0[3] = 1.0
U0 = np.full((N, 4), 9.81 / 4.0)
params = [1.0, 0.01, 0.01, 0.02, 0.2, 9.81]

def measure(name, **kw):
    args = (4, params, N, dt, Q * dt, R * dt, Qf, goal, x0)
    common = dict(lower=lo, upper=hi, U0=U0, max_iterations=150,
                  tolerance=1e-4, acceptable_tolerance=1e-4,
                  reg_init=1e-4, ls_max_iterations=15, integrator="rk4")
    common.update(kw)
    status, X, U, info = native.ipddp_solve(*args, **common)  # warm
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        status, X, U, info = native.ipddp_solve(*args, **common)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:32s} {ms:8.1f} ms  status={status} iters={info['iters']} "
          f"cost={info['cost']:.7f} inf_du={info['inf_du']:.2e}", flush=True)

measure("ADAPTIVE (proxy cfg)")
measure("ADAPTIVE acc=1e-9", acceptable_tolerance=1e-9)
measure("MONOTONIC", barrier_strategy=1)
measure("MONOTONIC acc=1e-9", barrier_strategy=1, acceptable_tolerance=1e-9)
