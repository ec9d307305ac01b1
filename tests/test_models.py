"""All-models tests.

Mirror of python/tests/test_all_dynamics.py:22-82 (every model constructs
and steps) plus the tier-1 FD-oracle Jacobian checks of
tests/dynamics_model/ (one per model, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddp_tpu import models as M
from cddp_tpu.utils.fd import finite_difference_jacobian


def _instances():
    rng = np.random.default_rng(3)

    def rand(n, scale=0.4):
        return jnp.asarray(rng.uniform(-scale, scale, n))

    quat = jnp.array([1.0, 0.02, -0.03, 0.01])
    quat = quat / jnp.linalg.norm(quat)
    cases = [
        (M.Pendulum(length=0.5, damping=0.01), rand(2), rand(1)),
        (M.Unicycle(), rand(3), rand(2)),
        (M.Bicycle(wheelbase=1.5), rand(4), rand(2)),
        (M.DubinsCar(speed=1.2), rand(3), rand(1)),
        (M.Car(wheelbase=2.0, timestep=0.03), rand(4), rand(2)),
        (M.Forklift(), rand(5), rand(2)),
        (M.CartPole(), rand(4), rand(1)),
        (M.Acrobot(), rand(4), rand(1)),
        (
            M.quadrotor(mass=1.2),
            jnp.concatenate([rand(3), quat, rand(3), rand(3)]),
            jnp.asarray(rng.uniform(1.0, 3.0, 4)),
        ),
        (
            M.QuadrotorRate(mass=1.0),
            jnp.concatenate([rand(3), rand(3), quat]),
            jnp.concatenate([jnp.array([9.9]), rand(3)]),
        ),
        (M.Manipulator(), rand(6), rand(3)),
        (M.HCW(mean_motion=0.0011, mass=100.0), rand(6), rand(3)),
        (
            M.SpacecraftLinearFuel(mean_motion=0.0011, isp=300.0),
            jnp.concatenate([rand(6), jnp.array([100.0, 0.0])]),
            rand(3),
        ),
        (
            M.SpacecraftNonlinear(mass=1.0),
            jnp.concatenate([rand(6) * 0.01, jnp.array([1.0, 0.0, 0.0, 1.0])]),
            rand(3),
        ),
        (M.SpacecraftLanding2D(), jnp.concatenate([rand(4) * 100, rand(2)]),
         jnp.array([0.5, 0.05])),
        (
            M.SpacecraftTwobody(mu=398600.0, mass=100.0),
            jnp.concatenate([jnp.array([7000.0, 10.0, -5.0]), rand(3)]),
            rand(3),
        ),
        (M.DreyfusRocket(), rand(2), rand(1)),
        (M.lti_system(0.1), rand(4), rand(2)),
        (M.USV3DOF(), rand(6), rand(3) * 10),
        (M.euler_attitude(), rand(6) * 0.3, rand(3)),
        (
            M.quaternion_attitude(),
            jnp.concatenate([quat, rand(3)]),
            rand(3),
        ),
        (M.mrp_attitude(), jnp.concatenate([rand(3) * 0.2, rand(3)]), rand(3)),
    ]
    return cases


CASES = _instances()
IDS = [type(m).__name__ for m, _, _ in CASES]


def test_zoo_complete():
    assert len(M.REGISTRY) == 22
    assert len(CASES) == 22


@pytest.mark.parametrize("model,x,u", CASES, ids=IDS)
def test_step_finite(model, x, u):
    x1 = model.discrete_dynamics(x, u, 0.0, 0.01)
    assert x1.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(x1)))


@pytest.mark.parametrize("model,x,u", CASES, ids=IDS)
def test_jacobians_match_fd(model, x, u):
    Fx, Fu = model.jacobians(x, u, 0.0)
    assert Fx.shape == (model.state_dim, model.state_dim)
    assert Fu.shape == (model.state_dim, model.control_dim)
    Fx_fd = finite_difference_jacobian(
        lambda xx: model.continuous_dynamics(jnp.asarray(xx), u, 0.0), x, h=1e-6
    )
    Fu_fd = finite_difference_jacobian(
        lambda uu: model.continuous_dynamics(x, jnp.asarray(uu), 0.0), u, h=1e-6
    )
    np.testing.assert_allclose(Fx, Fx_fd, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(Fu, Fu_fd, rtol=2e-4, atol=2e-4)


def test_lti_seeded_random_reproducible():
    k = jax.random.PRNGKey(42)
    a = M.lti_system(0.1, key=k)
    b = M.lti_system(0.1, key=k)
    np.testing.assert_array_equal(np.asarray(a.A), np.asarray(b.A))
    np.testing.assert_array_equal(np.asarray(a.B), np.asarray(b.B))


def test_rotations_roundtrip():
    from cddp_tpu.utils import rotations as R

    q = jnp.array([0.9, 0.1, -0.2, 0.15])
    q = q / jnp.linalg.norm(q)
    Rm = R.quat_to_rotation_matrix(q)
    # Orthonormality
    np.testing.assert_allclose(Rm @ Rm.T, jnp.eye(3), atol=1e-12)
    q2 = R.rotation_matrix_to_quat(Rm)
    np.testing.assert_allclose(q, q2, atol=1e-10)

    angles = jnp.array([0.3, -0.4, 0.7])
    Re = R.euler_zyx_to_rotation_matrix(angles)
    np.testing.assert_allclose(
        R.rotation_matrix_to_euler_zyx(Re), angles, atol=1e-10
    )

    sigma = R.quat_to_mrp(q)
    np.testing.assert_allclose(R.mrp_to_quat(sigma), q, atol=1e-10)
    # Shadow-set: -q maps to the same MRP as q after the qw<0 flip
    np.testing.assert_allclose(R.quat_to_mrp(-q), sigma, atol=1e-12)


def test_rotation_matrix_to_quat_180_degree_corners():
    """180-degree rotations whose axis has equal-magnitude opposite-sign
    components tie two Shepperd branches with sign-opposite candidate
    quaternions; summing ties cancels them (round-trip error ~2 before the
    argmax fix). Pin exact branch selection."""
    from cddp_tpu.utils import rotations as R

    def axis_angle_R(axis, ang):
        a = np.asarray(axis, float)
        a = a / np.linalg.norm(a)
        K = np.array(
            [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]]
        )
        return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)

    for axis in [(1, -1, 0), (0, 1, -1), (1, 0, -1), (1, 1, 1), (1, 0, 0)]:
        for ang in [np.pi, np.pi - 1e-9, 0.0, 2.3]:
            Rm = jnp.asarray(axis_angle_R(axis, ang))
            q = R.rotation_matrix_to_quat(Rm)
            np.testing.assert_allclose(
                R.quat_to_rotation_matrix(q), Rm, atol=1e-7,
                err_msg=f"axis={axis} ang={ang}",
            )
