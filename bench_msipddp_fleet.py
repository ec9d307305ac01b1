"""MSIPDDP fleet throughput (VERDICT r4 item 5): the multiple-shooting
interior-point solver vmap-batched over a fleet, on the per-pass engines
(MSIPDDP has no whole-solve kernel; this measures what that per-pass
ceiling IS, next to the IPDDP numbers on the same problem). Prints one
JSON line per configuration.

Run on the TPU: timeout 1700 python bench_msipddp_fleet.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import cddp_tpu as ct
    from cddp_tpu.parallel.batch import batched_solve

    dtype = jnp.float32
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    dt = 0.05
    from cddp_tpu.models import Unicycle

    prob = ct.problem(
        Unicycle(),
        ct.quadratic_objective(
            jnp.eye(3, dtype=dtype) * 0.1, jnp.eye(2, dtype=dtype) * 0.05,
            jnp.eye(3, dtype=dtype) * 100.0,
            jnp.asarray([2.0, 2.0, np.pi / 2], dtype), dt,
        ),
        jnp.zeros(3, dtype), 20, dt,
    ).add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.asarray([-2.0, -np.pi], dtype),
                              jnp.asarray([2.0, np.pi], dtype)),
    )
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (B, 3), dtype,
                            minval=-0.5, maxval=0.5)

    for name, opts in (
        ("msipddp_fleet", ct.CDDPOptions(
            max_iterations=10, tolerance=1e-4,
            msipddp=ct.MSIPDDPOptions(segment_length=5),
        )),
        ("ipddp_fleet_same_problem", ct.CDDPOptions(
            max_iterations=10, tolerance=1e-4,
        )),
    ):
        solver = "MSIPDDP" if name.startswith("msipddp") else "IPDDP"

        @jax.jit
        def run(x0b, _prob=prob, _opts=opts, _solver=solver):
            sol = batched_solve(_prob, x0b, solver=_solver, options=_opts)
            return (sol.final_objective, sol.iterations_completed,
                    sol.status_code)

        cost, iters, status = jax.block_until_ready(run(x0))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x0)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "metric": f"{name}_solves_per_sec",
            "value": round(B / t, 1),
            "unit": "solves/s",
            "fleet": B,
            "mean_iterations": round(float(np.asarray(iters).mean()), 1),
            "mean_cost": round(float(np.asarray(cost).mean()), 4),
        }))


if __name__ == "__main__":
    main()
