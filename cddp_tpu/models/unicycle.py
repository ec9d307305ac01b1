"""Unicycle kinematics (nx=3: x, y, theta; nu=2: v, omega).

Rebuild of ``src/dynamics_model/unicycle.cpp:28-67``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from cddp_tpu.models.base import DynamicalSystem


class Unicycle(DynamicalSystem):
    state_dim: int = struct.field(pytree_node=False, default=3)
    control_dim: int = struct.field(pytree_node=False, default=2)

    def continuous_dynamics(self, x, u, t):
        theta = x[2]
        v, omega = u[0], u[1]
        return jnp.stack([v * jnp.cos(theta), v * jnp.sin(theta), omega])
