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
args = (4, params, N, dt, Q * dt, R * dt, Qf, goal, x0)

def once(**kw):
    common = dict(lower=lo, upper=hi, U0=U0, max_iterations=150,
                  tolerance=1e-4, acceptable_tolerance=1e-9,
                  reg_init=1e-4, ls_max_iterations=15, integrator="rk4")
    common.update(kw)
    t0 = time.perf_counter()
    status, X, U, info = native.ipddp_solve(*args, **common)
    return (time.perf_counter() - t0) * 1e3, status, info

for name, kw in [("ADAPTIVE strict", {}),
                 ("MONOTONIC strict", dict(barrier_strategy=1))]:
    once(**kw)  # warm
    ts = [once(**kw) for _ in range(8)]
    ms = [t[0] for t in ts]
    st, info = ts[0][1], ts[0][2]
    print(f"{name:18s} min={min(ms):7.1f} med={sorted(ms)[len(ms)//2]:7.1f} "
          f"max={max(ms):7.1f} ms  status={st} iters={info['iters']}", flush=True)
