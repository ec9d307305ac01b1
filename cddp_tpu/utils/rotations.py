"""Rotation/attitude helpers.

Rebuild of ``src/cddp_core/helper.cpp:27-206``: Euler-ZYX / quaternion / MRP /
rotation-matrix conversions and the skew operator, including MRP shadow-set
handling (:70-93). Pure jnp — differentiable and vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3x3 cross-product matrix (helper.cpp skew)."""
    z = jnp.zeros_like(v[0])
    return jnp.array(
        [
            [z, -v[2], v[1]],
            [v[2], z, -v[0]],
            [-v[1], v[0], z],
        ]
    )


def quat_to_rotation_matrix(q):
    """[w,x,y,z] quaternion -> rotation matrix (quadrotor.cpp:99-117 /
    helper.cpp quatToRotationMatrix). Assumes unit norm."""
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [
                1 - 2 * (qy * qy + qz * qz),
                2 * (qx * qy - qz * qw),
                2 * (qx * qz + qy * qw),
            ],
            [
                2 * (qx * qy + qz * qw),
                1 - 2 * (qx * qx + qz * qz),
                2 * (qy * qz - qx * qw),
            ],
            [
                2 * (qx * qz - qy * qw),
                2 * (qy * qz + qx * qw),
                1 - 2 * (qx * qx + qy * qy),
            ],
        ]
    )


def rotation_matrix_to_quat(R):
    """Rotation matrix -> [w,x,y,z] quaternion, with true Shepperd branch
    selection (largest of tr, R00, R11, R22) so 180-degree rotations — where
    the trace-only formula degenerates to 0/0 — come out exact."""
    tr = jnp.trace(R)

    def from_w():
        s = 2.0 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
        return jnp.stack([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                          (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])

    def from_x():
        s = 2.0 * jnp.sqrt(jnp.maximum(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-12))
        return jnp.stack([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                          (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])

    def from_y():
        s = 2.0 * jnp.sqrt(jnp.maximum(1.0 + R[1, 1] - R[0, 0] - R[2, 2], 1e-12))
        return jnp.stack([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                          0.25 * s, (R[1, 2] + R[2, 1]) / s])

    def from_z():
        s = 2.0 * jnp.sqrt(jnp.maximum(1.0 + R[2, 2] - R[0, 0] - R[1, 1], 1e-12))
        return jnp.stack([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                          (R[1, 2] + R[2, 1]) / s, 0.25 * s])

    cands = jnp.stack([from_w(), from_x(), from_y(), from_z()])
    scores = jnp.stack([tr, R[0, 0], R[1, 1], R[2, 2]])
    # Select exactly ONE branch (argmax). Summing tied branches is wrong for
    # 180-degree rotations whose axis has equal-magnitude opposite-sign
    # components (e.g. (1,-1,0)/sqrt2): the tied candidates are sign-opposite
    # quaternions that cancel, and normalization amplifies rounding noise.
    q = cands[jnp.argmax(scores)]
    return q / jnp.linalg.norm(q)


def euler_zyx_to_rotation_matrix(angles):
    """[psi (yaw), theta (pitch), phi (roll)] -> R = Rz(psi) Ry(theta) Rx(phi)."""
    psi, theta, phi = angles[0], angles[1], angles[2]
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    Rz = jnp.array([[cpsi, -spsi, 0.0], [spsi, cpsi, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[cth, 0.0, sth], [0.0, 1.0, 0.0], [-sth, 0.0, cth]])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cphi, -sphi], [0.0, sphi, cphi]])
    return Rz @ Ry @ Rx


def rotation_matrix_to_euler_zyx(R):
    """Inverse of :func:`euler_zyx_to_rotation_matrix`."""
    theta = -jnp.arcsin(jnp.clip(R[2, 0], -1.0, 1.0))
    psi = jnp.arctan2(R[1, 0], R[0, 0])
    phi = jnp.arctan2(R[2, 1], R[2, 2])
    return jnp.stack([psi, theta, phi])


def quat_to_mrp(q):
    """Quaternion -> modified Rodrigues parameters with shadow-set switch
    when qw < 0 (helper.cpp:70-93)."""
    q = jnp.where(q[0] < 0, -q, q)
    return q[1:4] / (1.0 + q[0])


def mrp_to_quat(sigma):
    """MRP -> quaternion [w,x,y,z]."""
    s2 = sigma @ sigma
    qw = (1.0 - s2) / (1.0 + s2)
    qv = 2.0 * sigma / (1.0 + s2)
    return jnp.concatenate([qw[None], qv])


def mrp_to_rotation_matrix(sigma):
    return quat_to_rotation_matrix(mrp_to_quat(sigma))
