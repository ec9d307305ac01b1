"""Dynamics model zoo (reference: src/dynamics_model/, 22 models)."""

from cddp_tpu.models.base import DynamicalSystem, rollout
from cddp_tpu.models.pendulum import Pendulum
from cddp_tpu.models.unicycle import Unicycle
from cddp_tpu.models.cartpole import CartPole

REGISTRY = {
    "Pendulum": Pendulum,
    "Unicycle": Unicycle,
    "CartPole": CartPole,
}
