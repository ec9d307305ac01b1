"""Value-pinned dynamics oracles for all 22 models.

Two oracle tiers (round-1 VERDICT Missing #2):

1. HARVESTED — hardcoded EXPECT_NEAR constants lifted verbatim from the
   reference gtest suite (``/root/reference/tests/dynamics_model/*.cpp``).
   These came from the C++ implementation / MATLAB demos, so they are an
   independent cross-language oracle.
2. TRANSCRIBED — the reference *source* formula re-derived here in plain
   numpy (a second, independent transcription, cited file:line) and compared
   against the model class at a fixed generic point. A misread constant or
   sign in either transcription fails the pin.

Every model in the REGISTRY is covered by at least one value pin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu import models as M

PI = np.pi


# ---------------------------------------------------------------------------
# Tier 1: harvested reference test constants
# ---------------------------------------------------------------------------


def test_car_discrete_dynamics_pins():
    """test_car.cpp:66-81 (MATLAB demo steps), dt=0.03, wheelbase=2."""
    car = M.Car(wheelbase=2.0, timestep=0.03)
    x1 = car.discrete_dynamics(
        jnp.array([1.0, 1.0, 3 * PI / 2, 0.0]), jnp.array([0.01, 0.01]), 0.0, 0.03
    )
    np.testing.assert_allclose(
        np.asarray(x1), [1.0, 1.0, 4.7124, 0.0003], atol=1e-4
    )
    x2 = car.discrete_dynamics(
        jnp.array([1.0, 1.0, 3 * PI / 2, 1.0]), jnp.array([0.3, 0.1]), 0.0, 0.03
    )
    np.testing.assert_allclose(
        np.asarray(x2), [1.0, 0.9713, 4.7168, 1.0030], atol=1e-4
    )


def test_car_discrete_hessian_pins():
    """test_car.cpp:167-212: autodiff-calculated Hessian entries of the
    DISCRETE map (the reference scales its continuous Hessians back by dt)."""
    car = M.Car(wheelbase=2.0, timestep=0.03)
    x = jnp.array([1.0, 1.0, 3 * PI / 2, 1.0])
    u = jnp.array([0.3, 0.1])
    fd = lambda x_, u_: car.discrete_dynamics(x_, u_, 0.0, 0.03)
    Hxx = jax.jit(jax.hessian(lambda x_: fd(x_, u)[2]))(x)  # d2 theta+/dx2
    Huu = jax.jit(jax.hessian(lambda u_: fd(x, u_)[2]))(u)  # d2 theta+/du2
    Hxx_x = jax.jit(jax.hessian(lambda x_: fd(x_, u)[0]))(x)  # d2 x+/dx2
    Huu_x = jax.jit(jax.hessian(lambda u_: fd(x, u_)[0]))(u)
    assert abs(float(Hxx[3, 3]) - 8.71e-08) < 1e-4
    assert abs(float(Huu[0, 0]) - (-0.00443)) < 1e-4
    assert abs(float(Hxx_x[3, 2]) - 0.0287) < 1e-4
    assert abs(float(Huu_x[0, 1])) < 1e-4


def test_car_parking_objective_pins():
    """test_car.cpp:288-330: CarParkingObjective running/terminal costs."""
    from tests.test_parity_anchors import car_parking_objective

    obj = car_parking_objective(0.03)
    rc = obj.running_cost(
        jnp.array([1.0, 1.0, 3 * PI / 2, 0.0]), jnp.array([0.01, 0.01]), 0
    )
    assert abs(float(rc) - 0.0018) < 1e-4
    rc = obj.running_cost(
        jnp.array([1.0, 1.0, 3 * PI / 2, 1.0]), jnp.array([0.3, 0.1]), 0
    )
    assert abs(float(rc) - 0.0027) < 1e-4
    # test_car.cpp's objective variant has terminal = cf.sabs(x, pf) ONLY;
    # the solver variant we port (test_ipddp_solver.cpp:664-668) folds the
    # zero-control running term into the terminal, so subtract it to compare.
    x = jnp.array([1.0, 1.0, 3 * PI / 2, 1.0])
    r0 = float(obj.running_cost(x, jnp.zeros(2), 0))
    cf_sabs = float(obj.terminal_cost(x)) - r0
    assert abs(r0 + cf_sabs - 5.0265) < 1e-4
    x2 = jnp.array([1.0, 2.0, 3 * PI / 2, 1.2])
    tc = float(obj.terminal_cost(x2)) - float(obj.running_cost(x2, jnp.zeros(2), 0))
    assert abs(tc - 5.169) < 1e-3


def test_quadrotor_hover_equilibrium():
    """test_quadrotor.cpp:166-212: hover is an exact equilibrium (mass=1,
    inertia diag(0.01,0.01,0.02), arm=0.2, thrust mg/4 per rotor)."""
    quad = M.quadrotor(
        mass=1.0, inertia=jnp.diag(jnp.array([0.01, 0.01, 0.02])), arm_length=0.2
    )
    x = jnp.zeros(13).at[2].set(1.0).at[3].set(1.0)
    u = jnp.full(4, 1.0 * 9.81 / 4.0)
    xdot = np.asarray(quad.continuous_dynamics(x, u, 0.0))
    np.testing.assert_allclose(xdot, np.zeros(13), atol=1e-10)
    # Unbalanced front rotor -> pitch/roll torque appears (test_quadrotor.cpp:214+)
    xdot2 = np.asarray(quad.continuous_dynamics(x, u.at[0].add(0.1), 0.0))
    assert abs(xdot2[10:13]).max() > 0.0


def test_quadrotor_rate_pins():
    """test_quadrotor_rate.cpp:72-168: hover equilibrium, roll-rate
    kinematics, pure-thrust acceleration (mass=1)."""
    quad = M.QuadrotorRate(mass=1.0, max_thrust=20.0, max_rate=0.5)
    hover = 1.0 * 9.81
    # Hover: all derivatives zero
    x = jnp.zeros(10).at[2].set(1.0).at[6].set(1.0)
    xdot = np.asarray(quad.continuous_dynamics(x, jnp.array([hover, 0, 0, 0.0]), 0.0))
    np.testing.assert_allclose(xdot, np.zeros(10), atol=1e-10)
    # Roll rate: qx changes, qw slightly, qy/qz exactly zero
    xdot = np.asarray(
        quad.continuous_dynamics(x, jnp.array([hover, 0.1, 0.0, 0.0]), 0.0)
    )
    assert abs(xdot[7]) > 0.0
    assert abs(xdot[6]) < 0.01
    assert abs(xdot[8]) < 1e-10 and abs(xdot[9]) < 1e-10
    # 150% thrust, no tilt: dvz > 0, dvx = dvy = 0
    x0 = jnp.zeros(10).at[6].set(1.0)
    xdot = np.asarray(
        quad.continuous_dynamics(x0, jnp.array([hover * 1.5, 0, 0, 0.0]), 0.0)
    )
    assert xdot[5] > 0.0
    assert abs(xdot[3]) < 1e-10 and abs(xdot[4]) < 1e-10


def test_manipulator_forward_kinematics_pins():
    """test_manipulator.cpp:27-74: end-effector positions for three joint
    configurations (la=1.0, lb=0.2, lc=1.0 PUMA-like chain)."""
    m = M.Manipulator()
    cases = [
        ([0.0, -PI / 2, PI / 2], [1.0, 0.2, 1.0], 1e-6),
        ([PI / 4, -PI / 3, 2 * PI / 3], [0.5657, 0.8485, 0.0], 1e-4),
        ([PI / 2, PI / 4, PI / 2], [-0.2, 0.0, -1.4142], 1e-4),
    ]
    for angles, expected, tol in cases:
        pos = np.asarray(m.end_effector_position(jnp.array(angles)))
        np.testing.assert_allclose(pos, expected, atol=tol)
    # Gravity pulls joint 2 (test_manipulator.cpp:76-92)
    xdot = m.continuous_dynamics(
        jnp.zeros(6).at[1].set(PI / 4), jnp.zeros(3), 0.0
    )
    assert abs(float(xdot[4])) > 0.0


def test_forklift_discrete_pins():
    """test_forklift.cpp: straight line, steering rate, acceleration, and
    the rear-steer sign convention (wheelbase=2, dt=0.01)."""
    fl = M.Forklift(wheelbase=2.0, rear_steer=True)
    nxt = fl.discrete_dynamics(
        jnp.array([0.0, 0.0, 0.0, 1.0, 0.0]), jnp.zeros(2), 0.0, 0.01
    )
    np.testing.assert_allclose(np.asarray(nxt), [0.01, 0, 0, 1.0, 0], atol=1e-6)
    nxt = fl.discrete_dynamics(jnp.zeros(5), jnp.array([0.0, 0.5]), 0.0, 0.01)
    assert abs(float(nxt[4]) - 0.005) < 1e-6
    nxt = fl.discrete_dynamics(jnp.zeros(5), jnp.array([2.0, 0.0]), 0.0, 0.01)
    assert abs(float(nxt[3]) - 0.02) < 1e-6
    # Rear-steer turns opposite to front-steer at the same steering angle
    x = jnp.array([0.0, 0.0, 0.0, 1.0, PI / 6])
    rear = M.Forklift(wheelbase=2.0, rear_steer=True)
    front = M.Forklift(wheelbase=2.0, rear_steer=False)
    tr = float(rear.discrete_dynamics(x, jnp.zeros(2), 0.0, 0.01)[2])
    tf = float(front.discrete_dynamics(x, jnp.zeros(2), 0.0, 0.01)[2])
    assert abs(tr + tf) < 1e-6 and abs(tf) > 0


def test_bicycle_pins():
    """test_bicycle.cpp ContinuousDynamics: straight motion + steering."""
    b = M.Bicycle(wheelbase=2.0)
    xdot = np.asarray(
        b.continuous_dynamics(jnp.array([0.0, 0.0, 0.0, 1.0]), jnp.zeros(2), 0.0)
    )
    np.testing.assert_allclose(xdot, [1.0, 0.0, 0.0, 0.0], atol=1e-10)
    # control = [a, delta] (bicycle.cpp CONTROL_ACC=0, CONTROL_DELTA=1)
    xdot = np.asarray(
        b.continuous_dynamics(
            jnp.array([0.0, 0.0, 0.0, 1.0]), jnp.array([0.0, 0.1]), 0.0
        )
    )
    assert abs(xdot[2]) > 0.0
    assert abs(xdot[2] - np.tan(0.1) / 2.0) < 1e-9


# ---------------------------------------------------------------------------
# Tier 2: independent numpy transcriptions of the reference source formulas
# ---------------------------------------------------------------------------


def _pin(model, x, u, expected, atol=1e-9):
    got = np.asarray(model.continuous_dynamics(jnp.asarray(x), jnp.asarray(u), 0.0))
    np.testing.assert_allclose(got, np.asarray(expected, float), atol=atol)


def test_pendulum_formula():
    """pendulum.cpp:33-45 analytic path: dd = (u - b*w + m*g*l*sin th)/(m l^2)."""
    m, l, b, g = 1.2, 0.7, 0.05, 9.81
    th, w, u = 0.8, -0.3, 0.4
    _pin(
        M.Pendulum(length=l, mass=m, damping=b),
        [th, w], [u],
        [w, (u - b * w + m * g * l * np.sin(th)) / (m * l * l)],
    )


def test_unicycle_formula():
    """unicycle.cpp:28-40: [v cos, v sin, omega]."""
    th, v, om = 0.6, 1.3, -0.4
    _pin(M.Unicycle(), [0.2, -0.1, th], [v, om],
         [v * np.cos(th), v * np.sin(th), om])


def test_dubins_formula():
    """dubins_car.cpp: constant speed, turn-rate control."""
    th, om, V = -0.9, 0.7, 1.5
    _pin(M.DubinsCar(speed=V), [0.0, 0.0, th], [om],
         [V * np.cos(th), V * np.sin(th), om])


def test_cartpole_formula():
    """cartpole.cpp getContinuousDynamics: den = mc + mp sin^2."""
    mc, mp, l, g = 1.0, 0.2, 0.5, 9.81
    x, th, xd, thd, F = 0.1, 0.7, -0.4, 0.9, 1.1
    s, c = np.sin(th), np.cos(th)
    den = mc + mp * s * s
    xdd = (F + mp * s * (l * thd * thd + g * c)) / den
    thdd = (-F * c - mp * l * thd * thd * c * s - (mc + mp) * g * s) / (l * den)
    _pin(
        M.CartPole(cart_mass=mc, pole_mass=mp, pole_length=l),
        [x, th, xd, thd], [F], [xd, thd, xdd, thdd],
    )


def test_acrobot_formula():
    """acrobot.cpp: M qdd = tau - B - G - C (torque on joint 2 only)."""
    m1 = m2 = l1 = l2 = J1 = J2 = 1.0
    fric, g = 1.0, 9.81
    t1, t2, d1, d2, u = 0.3, -0.5, 0.8, 0.2, 0.9
    c1, c2, s2, c12 = np.cos(t1), np.cos(t2), np.sin(t2), np.cos(t1 + t2)
    m11 = m1 * l1 * l1 + J1 + m2 * (l1 * l1 + l2 * l2 + 2 * l1 * l2 * c2) + J2
    m12 = m2 * (l2 * l2 + l1 * l2 * c2) + J2
    m22 = l2 * l2 * m2 + J2
    Mm = np.array([[m11, m12], [m12, m22]])
    tmp = l1 * l2 * m2 * s2
    B = np.array([-(2 * d1 * d2 + d2 * d2) * tmp, tmp * d1 * d1])
    C = np.array([fric * d1, fric * d2])
    G = np.array(
        [((m1 + m2) * l1 * c1 + m2 * l2 * c12) * g, m2 * l2 * c12 * g]
    )
    qdd = np.linalg.solve(Mm, np.array([0.0, u]) - B - G - C)
    _pin(M.Acrobot(), [t1, t2, d1, d2], [u], [d1, d2, qdd[0], qdd[1]])


def test_hcw_formula():
    """spacecraft_linear.cpp HCW equations (n=0.001, mass=1)."""
    n, mass = 0.001, 1.0
    x, y, z, vx, vy, vz = 10.0, -5.0, 2.0, 0.1, 0.2, -0.3
    Fx, Fy, Fz = 0.01, -0.02, 0.03
    _pin(
        M.HCW(mean_motion=n, mass=mass),
        [x, y, z, vx, vy, vz], [Fx, Fy, Fz],
        [vx, vy, vz,
         2 * n * vy + 3 * n * n * x + Fx / mass,
         -2 * n * vx + Fy / mass,
         -n * n * z + Fz / mass],
    )


def test_spacecraft_linear_fuel_formula():
    """spacecraft_linear_fuel.cpp: HCW / state mass + fuel + effort states."""
    n, isp, g0, eps = 0.001, 300.0, 9.80665, 1e-10
    x, y, z, vx, vy, vz, m, e = 10.0, -5.0, 2.0, 0.1, 0.2, -0.3, 50.0, 0.0
    F = np.array([0.5, -0.2, 0.1])
    t2 = float(F @ F)
    _pin(
        M.SpacecraftLinearFuel(mean_motion=n, isp=isp, g0=g0, epsilon=eps),
        [x, y, z, vx, vy, vz, m, e], F,
        [vx, vy, vz,
         2 * n * vy + 3 * n * n * x + F[0] / m,
         -2 * n * vx + F[1] / m,
         -n * n * z + F[2] / m,
         -np.sqrt(t2 + eps) / (isp * g0),
         0.5 * t2],
    )


def test_spacecraft_nonlinear_formula():
    """spacecraft_nonlinear.cpp: relative orbit about a reference r0/theta."""
    mu, mass = 1.0, 1.0
    px, py, pz, vx, vy, vz = 0.1, -0.2, 0.05, 0.01, 0.02, -0.01
    r0, th, dr0, dth = 1.2, 0.3, 0.01, 0.9
    ux, uy, uz = 0.001, -0.002, 0.003
    den = ((r0 + px) ** 2 + py**2 + pz**2) ** 1.5
    ddr0 = -mu / r0**2 + r0 * dth**2
    ddth = -2.0 * dr0 * dth / r0
    ddx = (2 * dth * vy + ddth * py + dth**2 * px
           - mu * (px + r0) / den + mu / r0**2 + ux / mass)
    ddy = (-2 * dth * vx - ddth * px + dth**2 * py - mu * py / den + uy / mass)
    ddz = -mu * pz / den + uz / mass
    _pin(
        M.SpacecraftNonlinear(mass=mass, mu=mu),
        [px, py, pz, vx, vy, vz, r0, th, dr0, dth], [ux, uy, uz],
        [vx, vy, vz, ddx, ddy, ddz, dr0, dth, ddr0, ddth],
    )


def test_spacecraft_landing2d_formula():
    """spacecraft_landing2d.cpp: thrust-vectored rigid body, I = m L^2/12."""
    mass, length, maxT, g = 100000.0, 50.0, 2210000.0, 9.81
    inertia = mass * length**2 / 12.0
    x, y, xd, yd, th, thd = 5.0, 100.0, -1.0, -10.0, 0.1, 0.02
    pct, ang = 0.5, 0.05
    thrust = maxT * pct
    Fx = thrust * np.sin(ang + th)
    Fy = thrust * np.cos(ang + th)
    T = -length / 2.0 * thrust * np.sin(ang)
    model = M.SpacecraftLanding2D(mass=mass, length=length, max_thrust=maxT)
    # State layout x, x_dot, y, y_dot, theta, theta_dot per landing2d.hpp
    got = np.asarray(
        model.continuous_dynamics(
            jnp.asarray([x, xd, y, yd, th, thd]), jnp.asarray([pct, ang]), 0.0
        )
    )
    np.testing.assert_allclose(
        got, [xd, Fx / mass, yd, Fy / mass - g, thd, T / inertia], atol=1e-9
    )


def test_spacecraft_twobody_formula():
    """spacecraft_twobody.cpp: -mu r / |r|^3 + u/m."""
    mu, mass = 398600.4418, 1.0
    r = np.array([7000.0, 100.0, -200.0])
    v = np.array([0.1, 7.5, 0.2])
    u = np.array([0.001, 0.002, -0.003])
    r3 = np.linalg.norm(r) ** 3
    _pin(
        M.SpacecraftTwobody(mu=mu, mass=mass),
        np.concatenate([r, v]), u,
        np.concatenate([v, -mu * r / r3 + u / mass]),
    )


def test_dreyfus_rocket_formula():
    """dreyfus_rocket.cpp: xdd = a_T cos(theta) - g (64, 32 defaults)."""
    aT, g = 64.0, 32.0
    xd, th = 3.0, 0.2
    _pin(M.DreyfusRocket(), [1.0, xd], [th], [xd, aT * np.cos(th) - g])


def _euler_rigid_body(inertia, omega, tau):
    Iw = inertia @ omega
    return np.linalg.solve(inertia, tau - np.cross(omega, Iw))


def test_euler_attitude_formula():
    """euler_attitude.hpp:159-183 E(angles) kinematics + Euler dynamics."""
    I = np.diag([1.0, 2.0, 3.0])
    psi, th, phi = 0.2, -0.4, 0.7
    om = np.array([0.1, -0.2, 0.3])
    tau = np.array([0.05, 0.02, -0.01])
    cph, sph, cth, tth = np.cos(phi), np.sin(phi), np.cos(th), np.tan(th)
    E = np.array(
        [[0, sph / cth, cph / cth], [0, cph, -sph], [1, sph * tth, cph * tth]]
    )
    _pin(
        M.euler_attitude(inertia=I),
        np.concatenate([[psi, th, phi], om]), tau,
        np.concatenate([E @ om, _euler_rigid_body(I, om, tau)]),
    )


def test_quaternion_attitude_formula():
    """quaternion_attitude.hpp:160-168 Omega(w) kinematics."""
    I = np.diag([1.0, 2.0, 3.0])
    q = np.array([0.9, 0.1, -0.2, 0.3])
    qn = q / np.linalg.norm(q)
    om = np.array([0.1, -0.2, 0.3])
    tau = np.array([0.05, 0.02, -0.01])
    wx, wy, wz = om
    O = np.array(
        [[0, -wx, -wy, -wz], [wx, 0, wz, -wy], [wy, -wz, 0, wx], [wz, wy, -wx, 0]]
    )
    _pin(
        M.quaternion_attitude(inertia=I),
        np.concatenate([q, om]), tau,
        np.concatenate([0.5 * O @ qn, _euler_rigid_body(I, om, tau)]),
    )


def test_mrp_attitude_formula():
    """mrp_attitude.hpp:154-159: ds = 0.25 [(1-s.s)I + 2 skew(s) + 2 s s^T] w
    (also the manual oracle in test_mrp_attitude.cpp ContinuousDynamics)."""
    I = np.diag([1.0, 2.0, 3.0])
    s = np.array([0.1, -0.2, 0.15])
    om = np.array([0.1, -0.2, 0.3])
    tau = np.array([0.05, 0.02, -0.01])
    skew = np.array([[0, -s[2], s[1]], [s[2], 0, -s[0]], [-s[1], s[0], 0]])
    B = (1 - s @ s) * np.eye(3) + 2 * skew + 2 * np.outer(s, s)
    _pin(
        M.mrp_attitude(inertia=I),
        np.concatenate([s, om]), tau,
        np.concatenate([0.25 * B @ om, _euler_rigid_body(I, om, tau)]),
    )


def test_usv_3dof_formula():
    """usv_3dof.cpp: Fossen 3-DOF with the reference's generic parameters."""
    m, Iz = 100.0, 10.0
    Xud, Yvd, Yrd, Nvd, Nrd = -10.0, -50.0, -5.0, -5.0, -5.0
    Xu, Yv, Yr, Nv, Nr = -20.0, -100.0, 0.0, 0.0, -20.0
    Mm = np.array(
        [[m - Xud, 0, 0], [0, m - Yvd, -Yrd], [0, -Nvd, Iz - Nrd]]
    )
    DL = np.array([[-Xu, 0, 0], [0, -Yv, -Yr], [0, -Nv, -Nr]])
    psi, u, v, r = 0.4, 1.2, -0.3, 0.15
    tau = np.array([50.0, 10.0, 5.0])
    nu = np.array([u, v, r])
    mx, my, myr = m - Xud, m - Yvd, -Yrd
    C = np.zeros((3, 3))
    C[0, 2] = -my * v - myr * r
    C[1, 2] = mx * u
    C[2, 0] = my * v + myr * r
    C[2, 1] = -mx * u
    nudot = np.linalg.solve(Mm, tau - C @ nu - DL @ nu)
    _pin(
        M.USV3DOF(),
        [1.0, -2.0, psi, u, v, r], tau,
        [np.cos(psi) * u - np.sin(psi) * v,
         np.sin(psi) * u + np.cos(psi) * v,
         r, nudot[0], nudot[1], nudot[2]],
    )


def test_lti_default_system_formula():
    """lti_system.cpp:15-31: fixed skew A discretized by expm, B scaled by dt."""
    from jax.scipy.linalg import expm

    dt = 0.05
    Ac = np.array(
        [
            [0, 0.2473, -0.7933, 0.3470],
            [-0.2473, 0, -0.7667, 2.1307],
            [0.7933, 0.7667, 0, 0.3154],
            [-0.3470, -2.1307, -0.3154, 0],
        ]
    )
    B0 = np.array(
        [[-0.6387, -0.2026], [-0.4049, -0.1975], [2.3939, 1.5163], [-0.0496, -1.7322]]
    )
    Ad = np.asarray(expm(dt * jnp.asarray(Ac)))
    sys = M.lti_system(dt)
    x = np.array([1.0, -0.5, 0.2, 0.8])
    u = np.array([0.3, -0.1])
    got = np.asarray(sys.discrete_dynamics(jnp.asarray(x), jnp.asarray(u), 0.0, dt))
    np.testing.assert_allclose(got, Ad @ x + dt * B0 @ u, atol=1e-7)


def test_manipulator_dynamics_formula():
    """manipulator.cpp:174-208: M(q) qdd = tau - G(q), la=1, lb=0.2, lc=1."""
    la, lb, lc, g = 1.0, 0.2, 1.0, 9.81
    m1, m2, m3 = 1.0, 1.0, 0.5
    q = np.array([0.3, -0.6, 0.9])
    dq = np.array([0.1, 0.2, -0.3])
    tau = np.array([0.5, -0.2, 0.1])
    Mm = np.array(
        [
            [(m1 + m2 + m3) * la**2,
             (m2 + m3) * la * lb * np.cos(q[1]),
             m3 * la * lc * np.cos(q[1] + q[2])],
            [(m2 + m3) * la * lb * np.cos(q[1]),
             (m2 + m3) * lb**2,
             m3 * lb * lc * np.cos(q[2])],
            [m3 * la * lc * np.cos(q[1] + q[2]),
             m3 * lb * lc * np.cos(q[2]),
             m3 * lc**2],
        ]
    )
    G = np.array(
        [
            0.0,
            -(m2 + m3) * g * lb * np.cos(q[1]) - m3 * g * lc * np.cos(q[1] + q[2]),
            -m3 * g * lc * np.cos(q[1] + q[2]),
        ]
    )
    qdd = np.linalg.solve(Mm, tau - G)
    _pin(M.Manipulator(), np.concatenate([q, dq]), tau, np.concatenate([dq, qdd]))


def test_quadrotor_formula_offhover():
    """quadrotor.cpp:33-97 at a generic non-hover point (independent numpy)."""
    mass, arm, g = 1.0, 0.2, 9.81
    Ic = np.diag([0.01, 0.01, 0.02])
    q = np.array([0.9, 0.1, -0.2, 0.3])
    qn = q / np.linalg.norm(q)
    qw, qx, qy, qz = qn
    v = np.array([0.5, -0.3, 0.2])
    om = np.array([0.1, -0.2, 0.3])
    f = np.array([2.0, 2.5, 3.0, 2.2])
    thrust = f.sum()
    tau = np.array([arm * (f[0] - f[2]), arm * (f[1] - f[3]),
                    0.1 * (f[0] - f[1] + f[2] - f[3])])
    R = np.array(
        [
            [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx**2 + qz**2), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx**2 + qy**2)],
        ]
    )
    acc = R @ np.array([0, 0, thrust]) / mass - np.array([0, 0, g])
    qdot = 0.5 * np.array(
        [
            -(qx * om[0] + qy * om[1] + qz * om[2]),
            qw * om[0] + qy * om[2] - qz * om[1],
            qw * om[1] - qx * om[2] + qz * om[0],
            qw * om[2] + qx * om[1] - qy * om[0],
        ]
    )
    omdot = np.linalg.solve(Ic, tau - np.cross(om, Ic @ om))
    quad = M.quadrotor(mass=mass, inertia=jnp.asarray(Ic), arm_length=arm)
    x = np.concatenate([[0.1, -0.2, 0.5], q, v, om])
    got = np.asarray(quad.continuous_dynamics(jnp.asarray(x), jnp.asarray(f), 0.0))
    np.testing.assert_allclose(got, np.concatenate([v, qdot, acc, omdot]), atol=1e-9)
