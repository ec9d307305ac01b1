"""LogDDP fleet A/B (round-5 whole-solve quartet completion): the
relaxed log-barrier solver vmap-batched over a fleet — whole-solve Pallas
kernel (ops/pallas/mega_logddp.py) vs the per-pass engines
(CDDP_TPU_NO_MEGA), with parity stats on the SAME batch.

Run on the TPU: timeout 1700 python bench_logddp_fleet.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _problem(ct, dtype):
    from cddp_tpu.models import Unicycle

    dt = 0.05
    return ct.problem(
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


def _bench(prob, x0, solver, opts, reps):
    from cddp_tpu.parallel.batch import batched_solve

    @jax.jit
    def run(x0b):
        sol = batched_solve(prob, x0b, solver=solver, options=opts)
        return (sol.final_objective, sol.iterations_completed,
                sol.status_code)

    costs, iters, status = jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, np.asarray(costs), np.asarray(iters), np.asarray(status)


def main():
    import cddp_tpu as ct

    dtype = jnp.float32
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    prob = _problem(ct, dtype)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (B, 3), dtype,
                            minval=-0.5, maxval=0.5)
    opts = ct.CDDPOptions(max_iterations=10, tolerance=1e-4)

    # One ENGINE per process fits the TPU compile window (BENCH_ENGINE=
    # kernel|perpass stages/compares like bench_ipddp_fleet.py); unset =
    # both in-process.
    engine = os.environ.get("BENCH_ENGINE")
    stage = f"/tmp/bench_logddp_fleet_{B}_kernel.npz"
    if engine != "perpass":
        os.environ.pop("CDDP_TPU_NO_MEGA", None)
        jax.clear_caches()
        t_k, c_k, i_k, s_k = _bench(prob, x0, "LogDDP", opts, reps)
        if engine == "kernel":
            np.savez(stage, t=t_k, c=c_k, i=i_k, s=s_k)
            print(json.dumps({
                "metric": "logddp_fleet_solves_per_sec",
                "value": round(B / t_k, 1), "unit": "solves/s",
                "staged": stage,
            }))
            return
    os.environ["CDDP_TPU_NO_MEGA"] = "1"
    jax.clear_caches()
    t_s, c_s, i_s, s_s = _bench(prob, x0, "LogDDP", opts, reps)
    os.environ.pop("CDDP_TPU_NO_MEGA", None)
    if engine == "perpass":
        if not os.path.exists(stage):
            print(json.dumps({
                "metric": "logddp_fleet_perpass_solves_per_sec",
                "value": round(B / t_s, 1), "unit": "solves/s",
            }))
            return
        d = np.load(stage)
        t_k, c_k, i_k, s_k = float(d["t"]), d["c"], d["i"], d["s"]

    rel = np.abs(c_k - c_s) / np.maximum(np.abs(c_s), 1e-9)
    print(json.dumps({
        "metric": "logddp_fleet_solves_per_sec",
        "value": round(B / t_k, 1),
        "unit": "solves/s",
        "vs_baseline": round(t_s / t_k, 3),
        "perpass_solves_per_sec": round(B / t_s, 1),
        "parity_rel_cost_p50": float(np.percentile(rel, 50)),
        "parity_rel_cost_p99": float(np.percentile(rel, 99)),
        "parity_max_rel_cost": float(rel.max()),
        "parity_iters_equal_frac": float((i_k == i_s).mean()),
        "parity_status_equal_frac": float((s_k == s_s).mean()),
        "mean_iterations": round(float(np.asarray(i_k).mean()), 1),
    }))


if __name__ == "__main__":
    main()
