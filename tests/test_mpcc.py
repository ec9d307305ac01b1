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


def test_warm_fleet_tick():
    """Warm-started fleet tick API: shapes, state threading, finite states.
    (No iteration-count claim: the barrier mu restarts at mu0*0.1 on warm
    start per ipddp_solver.cpp:682, so IP warm ticks re-descend the mu
    ladder — the reference's MPCC demo cold-seeds for the same reason.)"""
    import jax
    import jax.numpy as jnp
    import mpcc_lib as mpcc

    track = mpcc.synthetic_track(120)
    cfg = mpcc.MpccConfig(max_iterations=5)
    B = 3
    s0 = jnp.linspace(0.0, float(track.length) * 0.4, B)

    def place(si):
        ref = track.interpolate(si)
        return jnp.stack([ref["x"], ref["y"], ref["heading"], si,
                          jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0)])

    xb = jax.vmap(place)(s0)
    U, st = jax.jit(lambda x: mpcc.warm_fleet_init(track, cfg, x))(xb)
    step = jax.jit(lambda x, u, s: mpcc.warm_fleet_step(track, cfg, x, u, s))
    x = xb
    for _ in range(2):
        x, U, st, iters = step(x, U, st)
    assert x.shape == (B, 7)
    assert U.shape == (B, cfg.horizon, 3)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(jnp.all(iters >= 1))
