"""On-chip A/B for the IPDDP whole-solve kernel (VERDICT r3 items 1 & 5):
box fleet (the flagship unicycle MPC) and obstacle fleet (BASELINE config 3,
control box + keep-out BallConstraint), fused kernel vs the per-pass
engines (CDDP_TPU_NO_MEGA kill switch), with parity stats on the SAME
batch. Prints one JSON line per config for the record; not the driver
metric (bench.py is).

Run on the TPU: timeout 590 python bench_ipddp_fleet.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _problems(dtype):
    import cddp_tpu as ct
    from cddp_tpu.models import Unicycle

    dt = 0.05
    box = ct.problem(
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
    dt2 = 0.03
    obstacle = ct.problem(
        Unicycle(),
        ct.quadratic_objective(
            jnp.zeros((3, 3), dtype), jnp.eye(2, dtype=dtype) * 0.05,
            jnp.eye(3, dtype=dtype) * 100.0,
            jnp.asarray([2.0, 2.0, np.pi / 2], dtype), dt2,
        ),
        jnp.zeros(3, dtype), 20, dt2,
    ).add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.asarray([-2.0, -np.pi], dtype),
                              jnp.asarray([2.0, np.pi], dtype)),
    ).add_constraint(
        "BallConstraint",
        ct.ball_constraint(jnp.asarray(0.4, dtype),
                           jnp.asarray([1.0, 1.0], dtype)),
    )
    # Rendezvous fleet (VERDICT r4 item 4): HCW relative motion, control
    # box, terminal equality x_N = 0 — the p+1 reduced-LQR regime through
    # the whole-solve kernel. N=20 keeps the costate-free te footprint
    # inside the measured scoped-VMEM limit at nx=6 (N=24 compiled 19.3M
    # against the 16M cap — the te gate in mega_ipddp is calibrated to
    # this measurement).
    from cddp_tpu.models import HCW

    dt3 = 30.0
    rendezvous = ct.problem(
        HCW(),
        ct.quadratic_objective(
            jnp.eye(6, dtype=dtype) * 1e-4,
            jnp.eye(3, dtype=dtype) * 1e-2,
            jnp.eye(6, dtype=dtype) * 1.0,
            jnp.zeros(6, dtype), dt3,
        ),
        jnp.asarray([10.0, 5.0, 2.0, 0.0, 0.0, 0.0], dtype), 20, dt3,
    ).add_constraint(
        "ControlConstraint",
        ct.control_constraint(jnp.full((3,), -0.004, dtype),
                              jnp.full((3,), 0.004, dtype)),
    ).add_terminal_constraint(
        "TerminalEquality",
        ct.terminal_equality_constraint(jnp.zeros(6, dtype)),
    )
    return {"box_fleet": box, "obstacle_fleet": obstacle,
            "rendezvous_te_fleet": rendezvous}


def _bench(problem, x0, opts, reps):
    import cddp_tpu as ct
    from cddp_tpu.parallel.batch import batched_solve

    @jax.jit
    def run(x0b):
        sol = batched_solve(problem, x0b, solver="IPDDP", options=opts)
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
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    opts = ct.CDDPOptions(max_iterations=10, tolerance=1e-4)
    key = jax.random.PRNGKey(0)

    only = os.environ.get("BENCH_CONFIG")  # run one config per process
    # One ENGINE per process fits the ~10-min TPU compile budget:
    # BENCH_ENGINE=kernel|perpass runs that engine and stages its results
    # to /tmp; the perpass leg prints the comparison when the kernel
    # leg's stage file exists. Unset = both engines in-process.
    engine = os.environ.get("BENCH_ENGINE")
    for name, prob in _problems(dtype).items():
        if only and name != only:
            continue
        nx = prob.state_dim
        # Position-scale perturbations; the rendezvous fleet's velocity
        # states get 1/100 of it (±0.5 m/s over a 600 s horizon is not
        # reachable at |u| <= 0.004 — keep the fleet feasible).
        scale = jnp.full((nx,), 0.5, dtype)
        if name == "rendezvous_te_fleet":
            scale = scale.at[3:].set(0.005)
        x0 = jnp.asarray(prob.x0, dtype)[None] + scale * jax.random.uniform(
            key, (batch, nx), dtype, minval=-1.0, maxval=1.0
        )
        stage = f"/tmp/bench_ipddp_fleet_{name}_{batch}_kernel.npz"
        if engine != "perpass":
            os.environ.pop("CDDP_TPU_NO_MEGA", None)
            jax.clear_caches()
            t_kernel, c_k, i_k, s_k = _bench(prob, x0, opts, reps)
            if engine == "kernel":
                np.savez(stage, t=t_kernel, c=c_k, i=i_k, s=s_k)
                print(json.dumps({
                    "metric": f"ipddp_{name}_solves_per_sec",
                    "value": round(batch / t_kernel, 1),
                    "unit": "solves/s", "staged": stage,
                }))
                continue
        os.environ["CDDP_TPU_NO_MEGA"] = "1"
        jax.clear_caches()
        t_scan, c_s, i_s, s_s = _bench(prob, x0, opts, reps)
        os.environ.pop("CDDP_TPU_NO_MEGA", None)
        if engine == "perpass":
            if not os.path.exists(stage):
                print(json.dumps({
                    "metric": f"ipddp_{name}_perpass_solves_per_sec",
                    "value": round(batch / t_scan, 1), "unit": "solves/s",
                }))
                continue
            d = np.load(stage)
            t_kernel, c_k, i_k, s_k = float(d["t"]), d["c"], d["i"], d["s"]

        rel = np.abs(c_k - c_s) / np.maximum(np.abs(c_s), 1e-9)
        # In f32, equally-valid but differently-ordered programs can take
        # different accept-margin branches on knife-edge instances (the
        # documented driver-inherent tie sensitivity, test_mega_ipddp.py
        # TestF32BranchSensitivity) — report the distribution, not just
        # the outlier max.
        print(json.dumps({
            "metric": f"ipddp_{name}_solves_per_sec",
            "value": round(batch / t_kernel, 1),
            "unit": "solves/s",
            "vs_baseline": round(t_scan / t_kernel, 3),  # speedup vs per-pass
            "perpass_solves_per_sec": round(batch / t_scan, 1),
            "parity_rel_cost_p50": float(np.percentile(rel, 50)),
            "parity_rel_cost_p99": float(np.percentile(rel, 99)),
            "parity_max_rel_cost": float(rel.max()),
            "parity_iters_equal_frac": float((i_k == i_s).mean()),
            "parity_status_equal_frac": float((s_k == s_s).mean()),
        }))


if __name__ == "__main__":
    main()
