import time, jax, jax.numpy as jnp
import bench_latency_ablate as bla
import cddp_tpu as ct
from cddp_tpu.solvers import ipddp

prob, goal, U0 = bla.build()

def timed(name, ipkw=None, mu=None):
    bkw = dict(strategy=ct.BarrierStrategy.MONOTONIC)
    if mu: bkw.update(mu)
    opts = ct.CDDPOptions(
        max_iterations=150, tolerance=1e-4, acceptable_tolerance=1e-9,
        line_search=ct.LineSearchOptions(max_iterations=15),
        regularization=ct.RegularizationOptions(initial_value=1e-4),
        enable_parallel=True,
        ipddp=ct.IPDDPOptions(lqr_backend="parallel",
            barrier=ct.BarrierOptions(**bkw), **(ipkw or {})),
    )
    run = jax.jit(lambda u0: ipddp.solve(prob, opts, U0=u0))
    sol = jax.block_until_ready(run(U0))
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps): sol = run(U0)
    jax.block_until_ready(sol)
    ms = (time.perf_counter()-t0)/reps*1e3
    err = float(jnp.linalg.norm(sol.state_trajectory[-1][:3]-goal[:3]))
    print(f"{name:30s} {ms:8.2f} ms  iters={int(sol.iterations_completed)} "
          f"status={sol.status_message} err={err:.4f}", flush=True)

timed("MONO (base, strict)")
timed("MONO fac=0.2", mu=dict(mu_update_factor=0.2))
timed("MONO fac=0.1", mu=dict(mu_update_factor=0.1))
timed("MONO kappa=30", ipkw=dict(mu_kappa_epsilon=30.0))
timed("MONO mu0=0.1", mu=dict(mu_initial=0.1))
timed("MONO fac=0.2 kappa=30", mu=dict(mu_update_factor=0.2),
      ipkw=dict(mu_kappa_epsilon=30.0))
