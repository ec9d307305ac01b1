"""Three-joint serial manipulator with simplified point-mass dynamics
(nx=6: q(3), dq(3); nu=3: joint torques).

Rebuild of ``src/dynamics_model/manipulator.cpp``: M(q) ddq + G(q) = tau with
the reference's simplified mass matrix (:174-193) and gravity vector
(:195-208); link masses (1.0, 1.0, 0.5) hard-coded as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from cddp_tpu.models.base import DynamicalSystem


class Manipulator(DynamicalSystem):
    state_dim: int = struct.field(pytree_node=False, default=6)
    control_dim: int = struct.field(pytree_node=False, default=3)

    la: float = 1.0  # link lengths
    lb: float = 1.0
    lc: float = 0.5
    gravity: float = 9.81

    def mass_matrix(self, q):
        m1, m2, m3 = 1.0, 1.0, 0.5
        M00 = (m1 + m2 + m3) * self.la**2
        M11 = (m2 + m3) * self.lb**2
        M22 = m3 * self.lc**2
        M01 = (m2 + m3) * self.la * self.lb * jnp.cos(q[1])
        M12 = m3 * self.lb * self.lc * jnp.cos(q[2])
        M02 = m3 * self.la * self.lc * jnp.cos(q[1] + q[2])
        return jnp.array([[M00, M01, M02], [M01, M11, M12], [M02, M12, M22]])

    def gravity_vector(self, q):
        m2, m3 = 1.0, 0.5
        g1 = (
            -(m2 + m3) * self.gravity * self.lb * jnp.cos(q[1])
            - m3 * self.gravity * self.lc * jnp.cos(q[1] + q[2])
        )
        g2 = -m3 * self.gravity * self.lc * jnp.cos(q[1] + q[2])
        return jnp.stack([jnp.zeros_like(g1), g1, g2])

    def continuous_dynamics(self, x, u, t):
        q, dq = x[:3], x[3:]
        ddq = jnp.linalg.solve(self.mass_matrix(q), u - self.gravity_vector(q))
        return jnp.concatenate([dq, ddq])
