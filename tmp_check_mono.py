import time, json, jax, jax.numpy as jnp
import bench_latency_ablate as bla
import cddp_tpu as ct
from cddp_tpu.solvers import ipddp

prob, goal, U0 = bla.build()
opts = ct.CDDPOptions(
    max_iterations=150, tolerance=1e-4, acceptable_tolerance=1e-9,
    line_search=ct.LineSearchOptions(max_iterations=15),
    regularization=ct.RegularizationOptions(initial_value=1e-4),
    enable_parallel=True,
    ipddp=ct.IPDDPOptions(lqr_backend="parallel",
                          barrier=ct.BarrierOptions(strategy=ct.BarrierStrategy.MONOTONIC)),
)
run = jax.jit(lambda u0: ipddp.solve(prob, opts, U0=u0))
sol = jax.block_until_ready(run(U0))
t0 = time.perf_counter()
for _ in range(5): sol = run(U0)
jax.block_until_ready(sol)
ms = (time.perf_counter()-t0)/5*1e3
print(json.dumps({"ms": round(ms,2), "status": sol.status_message,
                  "iters": int(sol.iterations_completed),
                  "cost": float(sol.final_objective),
                  "err": float(jnp.linalg.norm(sol.state_trajectory[-1][:3]-goal[:3]))}))
