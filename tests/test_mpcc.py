"""MPCC example tests (mirror of the ipddp_mpcc_rc.py workload: closed-loop
receding-horizon IPDDP on a closed track with the 7-state latch bicycle)."""

import sys
from pathlib import Path

import jax
import pytest
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


# slow tier: closed-loop / fleet integration
@pytest.mark.slow
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


# slow tier: closed-loop / fleet integration
@pytest.mark.slow
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
    for _ in range(8):
        x, U, st, iters = step(x, U, st)
    assert x.shape == (B, 7)
    assert U.shape == (B, cfg.horizon, 3)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(jnp.all(iters >= 1))
    # Serving-quality contract: after 8 warm ticks at the small budget the
    # fleet must still be on the track (the bench's warm mode rides this
    # loop, so the throughput number is only meaningful if it is).
    for xi in x:
        ref = track.interpolate(xi[mpcc.IDX_THETA])
        d = xi[:2] - jnp.stack([ref["x"], ref["y"]])
        assert abs(float(ref["normal"] @ d)) < float(track.width)


TRACK_CSV = Path(__file__).resolve().parent.parent / "examples" / "data" / "mpcc_racing_track.csv"


def test_real_track_fourier_fit():
    """The bundled reference circuit (ipddp_mpcc_rc.py:230-332, 489 points):
    the gather-free Fourier fit must stay well inside the boundary band —
    measured max 2.8mm vs the 90mm half-width."""
    track = mpcc.load_track_csv(str(TRACK_CSV))
    raw = np.genfromtxt(TRACK_CSV, delimiter=",", names=True)
    ref = track.interpolate(jnp.asarray(raw["s"]))
    err = np.hypot(np.asarray(ref["x"]) - raw["x"], np.asarray(ref["y"]) - raw["y"])
    assert float(err.max()) < 0.005, float(err.max())
    assert abs(float(track.length) - 17.8424) < 0.01


# slow tier: closed-loop / fleet integration
@pytest.mark.slow
def test_real_track_mpc_ticks():
    """Closed-loop MPC advances on the reference circuit with per-tick
    iteration counts in the reference's anecdotal band (~15-40, up to the
    100 budget; full-lap stats: 255 ticks/lap, mean 37 iters/tick)."""
    track = mpcc.load_track_csv(str(TRACK_CSV))
    cfg = mpcc.MpccConfig()
    model = mpcc.KinematicBicycle7(wheelbase=cfg.wheelbase, dt=cfg.dt)
    tick = jax.jit(lambda x: mpcc.mpc_tick(track, cfg, x))
    x = mpcc.initial_state(track, cfg)
    theta0 = float(x[mpcc.IDX_THETA])
    for _ in range(5):
        u, sol = tick(x)
        assert 1 <= int(sol.iterations_completed) <= 100
        x = model.discrete_dynamics(x, u, 0.0, cfg.dt)
    assert float(x[mpcc.IDX_THETA]) > theta0 + 0.05  # made progress
    ref = track.interpolate(x[mpcc.IDX_THETA])
    d = np.hypot(float(x[0]) - float(ref["x"]), float(x[1]) - float(ref["y"]))
    assert d < track.width  # stayed near the track


def test_local_track_fit_matches_fourier():
    """LocalTrack (per-tick Chebyshev window, Clenshaw evaluation — the
    trig-free hot path) reproduces the full Fourier reference over the
    reachable window: x/y sub-mm, heading < 6e-3 rad at 64 coefficients."""
    track = mpcc.synthetic_track()
    cfg = mpcc.MpccConfig()
    reach = cfg.v_theta_max * cfg.horizon * cfg.dt
    for theta0 in (0.0, 1.7, float(track.length) - 1.0):
        lt = mpcc.local_track_fit(track, theta0, reach, n_coeffs=64)
        ths = jnp.linspace(theta0, theta0 + reach, 120)
        a = track.interpolate(ths)
        b = lt.interpolate(ths)
        assert float(jnp.max(jnp.abs(a["x"] - b["x"]))) < 1e-3
        assert float(jnp.max(jnp.abs(a["y"] - b["y"]))) < 1e-3
        dh = jnp.abs(
            ((a["heading"] - b["heading"]) + jnp.pi) % (2 * jnp.pi) - jnp.pi
        )
        assert float(jnp.max(dh)) < 6e-3
        assert float(jnp.max(jnp.abs(a["v_ref"] - b["v_ref"]))) < 0.1


@pytest.mark.slow
def test_local_track_mpc_equivalent():
    """track_eval='local' drives the same closed-loop trajectory as the
    Fourier engine (measured 9.4 mm apart over 50 ticks with equal contour
    quality); here 12 ticks at a tight bound."""
    import dataclasses

    track = mpcc.synthetic_track()
    cfg_f = mpcc.MpccConfig(max_iterations=30)
    cfg_l = dataclasses.replace(cfg_f, track_eval="local", local_coeffs=64)
    Xf, _, _ = mpcc.run_mpc(track, cfg_f, n_ticks=12)
    Xl, _, _ = mpcc.run_mpc(track, cfg_l, n_ticks=12)
    assert np.max(np.abs(Xf[:, :2] - Xl[:, :2])) < 5e-3
    assert abs(Xf[-1, 3] - Xl[-1, 3]) < 1e-2
