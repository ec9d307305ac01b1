import time, jax, jax.numpy as jnp
import cddp_tpu.ops.pallas.ip_rollout as ipr
import cddp_tpu.ops.pallas.rollout as ro
# lower the kernel engagement gate so the 15-alpha ladder uses the fused kernel
ipr.MIN_KERNEL_BATCH = 8
ro.MIN_KERNEL_BATCH = 8
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
t0 = time.perf_counter(); reps = 5
for _ in range(reps): sol = run(U0)
jax.block_until_ready(sol)
ms = (time.perf_counter()-t0)/reps*1e3
print(f"kernel-forward MONO strict: {ms:.2f} ms iters={int(sol.iterations_completed)} "
      f"status={sol.status_message}")
