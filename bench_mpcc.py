"""Secondary benchmark: vmap-batched MPCC fleet (BASELINE.json config 5 —
'MPCC racing-line tracking MPC: receding-horizon warm-started IPDDP,
vmap-batched 1k instances'). One cold-seeded IPDDP MPC tick for a fleet of
cars distributed around a synthetic track. Prints one JSON line."""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent / "examples"))


def main():
    import mpcc_lib as mpcc

    import os

    B = int(os.environ.get("MPCC_BATCH", "1024"))
    track = mpcc.synthetic_track(n_points=240)
    cfg = mpcc.MpccConfig(
        max_iterations=15,
        track_eval=os.environ.get("MPCC_TRACK_EVAL", "local"),
        local_coeffs=int(os.environ.get("MPCC_LOCAL_COEFFS", "64")),
    )

    # Fleet spread around the track
    s0 = jnp.linspace(0.0, float(track.length) * 0.9, B)
    def place(si):
        ref = track.interpolate(si)
        return jnp.stack([ref["x"], ref["y"], ref["heading"], si,
                          jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0)])
    x_batch = jax.vmap(place)(s0).astype(jnp.float32)

    step = jax.jit(lambda xb: mpcc.batched_mpcc_step_costs(track, cfg, xb))
    u, cost, iters = step(x_batch)
    jax.block_until_ready(cost)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        u, cost, iters = step(x_batch)
    jax.block_until_ready(cost)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": "mpcc_fleet_ticks_per_sec",
        "value": round(B / dt, 1),
        "unit": "ipddp_mpc_ticks/s",
        "fleet": B,
        "mean_iterations": round(float(iters.mean()), 1),
    }))


if __name__ == "__main__":
    main()
