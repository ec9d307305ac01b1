import time, jax, jax.numpy as jnp
import bench_latency_ablate as bla
import cddp_tpu as ct
from cddp_tpu.solvers import ipddp

prob, goal, U0 = bla.build()

def timed(name, reg=1e-4, ls=15):
    opts = ct.CDDPOptions(
        max_iterations=150, tolerance=1e-4, acceptable_tolerance=1e-9,
        line_search=ct.LineSearchOptions(max_iterations=ls),
        regularization=ct.RegularizationOptions(initial_value=reg),
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
    print(f"{name:26s} {ms:8.2f} ms  iters={int(sol.iterations_completed)} "
          f"status={sol.status_message}", flush=True)

timed("reg=1e-4 (base)")
timed("reg=1e-5", reg=1e-5)
timed("reg=1e-6", reg=1e-6)
timed("reg=1e-6 ls=11", reg=1e-6, ls=11)
