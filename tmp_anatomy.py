"""Per-iteration anatomy probes for the quadrotor latency config (MONOTONIC)."""
import time, jax, jax.numpy as jnp
import bench_latency_ablate as bla
import cddp_tpu as ct
from cddp_tpu.solvers import ipddp

prob, goal, U0 = bla.build()

def timed(name, opts):
    run = jax.jit(lambda u0: ipddp.solve(prob, opts, U0=u0))
    sol = jax.block_until_ready(run(U0))
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps): sol = run(U0)
    jax.block_until_ready(sol)
    ms = (time.perf_counter()-t0)/reps*1e3
    print(f"{name:28s} {ms:8.2f} ms  iters={int(sol.iterations_completed)} "
          f"status={sol.status_message}", flush=True)
    return ms, int(sol.iterations_completed)

def mk(max_it, tol=1e-12, **ipkw):
    return ct.CDDPOptions(
        max_iterations=max_it, tolerance=tol, acceptable_tolerance=1e-15,
        line_search=ct.LineSearchOptions(max_iterations=15),
        regularization=ct.RegularizationOptions(initial_value=1e-4),
        enable_parallel=True,
        ipddp=ct.IPDDPOptions(lqr_backend="parallel",
            barrier=ct.BarrierOptions(strategy=ct.BarrierStrategy.MONOTONIC),
            **ipkw),
    )

m10, _ = timed("budget 10 (tol=0)", mk(10))
m40, _ = timed("budget 40 (tol=0)", mk(40))
print(f"slope = {(m40-m10)/30:.3f} ms/iter, intercept = {m10 - 10*(m40-m10)/30:.2f} ms")
