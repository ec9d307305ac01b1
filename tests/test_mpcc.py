"""MPCC example tests (mirror of the ipddp_mpcc_rc.py workload: closed-loop
receding-horizon IPDDP on a closed track with the 7-state latch bicycle)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import mpcc_lib as mpcc


def test_track_interpolation():
    track = mpcc.synthetic_track(n_points=200)
    ref = track.interpolate(jnp.asarray(0.0))
    # Tangent/normal orthonormal
    assert np.isclose(float(ref["tangent"] @ ref["normal"]), 0.0, atol=1e-12)
    # Wraps around the closed track
    ref2 = track.interpolate(track.length + 0.0)
    np.testing.assert_allclose(float(ref["x"]), float(ref2["x"]), atol=1e-9)


def test_latch_exact_under_euler():
    # d(latch)/dt = (u - latch)/dt makes latch_next == u exactly under Euler
    # (ipddp_mpcc_rc.py:111-117).
    m = mpcc.KinematicBicycle7(dt=0.05)
    x = jnp.asarray([0.0, 0.0, 0.1, 0.0, 0.5, 0.01, 0.4])
    u = jnp.asarray([1.3, -0.2, 1.1])
    x1 = m.discrete_dynamics(x, u, 0.0, 0.05)
    np.testing.assert_allclose(np.asarray(x1[4:7]), np.asarray(u), rtol=1e-12)


def test_single_mpc_tick():
    track = mpcc.synthetic_track(n_points=200)
    cfg = mpcc.MpccConfig(max_iterations=40)
    x0 = mpcc.initial_state(track, cfg)
    u, sol = jax.jit(lambda x: mpcc.mpc_tick(track, cfg, x))(x0)
    assert bool(jnp.all(jnp.isfinite(u)))
    # Control respects bounds
    assert cfg.speed_min - 1e-9 <= float(u[0]) <= cfg.speed_max + 1e-9
    assert abs(float(u[1])) <= cfg.delta_max + 1e-9
    # Solver made progress
    assert int(sol.iterations_completed) > 0


def test_closed_loop_progress():
    track = mpcc.synthetic_track(n_points=200)
    cfg = mpcc.MpccConfig(max_iterations=40)
    X, U, iters = mpcc.run_mpc(track, cfg, n_ticks=12)
    # The car advances along the track and stays near the centerline.
    progress = X[-1, mpcc.IDX_THETA] - X[0, mpcc.IDX_THETA]
    assert progress > 0.3, progress
    e_c = []
    for x in X:
        ref = track.interpolate(jnp.asarray(x[mpcc.IDX_THETA]))
        d = jnp.asarray(x[:2]) - jnp.stack([ref["x"], ref["y"]])
        e_c.append(abs(float(ref["normal"] @ d)))
    assert max(e_c) < float(track.width), max(e_c)
