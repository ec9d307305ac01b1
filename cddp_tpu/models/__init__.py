"""Dynamics model zoo — all 22 reference models (src/dynamics_model/,
umbrella include cddp.hpp:41-58), as pure-JAX systems."""

from cddp_tpu.models.base import CustomSystem, DynamicalSystem, custom_system, rollout
from cddp_tpu.models.pendulum import Pendulum
from cddp_tpu.models.unicycle import Unicycle
from cddp_tpu.models.bicycle import Bicycle
from cddp_tpu.models.dubins_car import DubinsCar
from cddp_tpu.models.car import Car
from cddp_tpu.models.forklift import Forklift
from cddp_tpu.models.cartpole import CartPole
from cddp_tpu.models.acrobot import Acrobot
from cddp_tpu.models.quadrotor import Quadrotor, quadrotor
from cddp_tpu.models.quadrotor_rate import QuadrotorRate
from cddp_tpu.models.manipulator import Manipulator
from cddp_tpu.models.spacecraft import (
    HCW,
    SpacecraftLanding2D,
    SpacecraftLinearFuel,
    SpacecraftNonlinear,
    SpacecraftTwobody,
)
from cddp_tpu.models.dreyfus_rocket import DreyfusRocket
from cddp_tpu.models.lti_system import LTISystem, lti_system
from cddp_tpu.models.usv_3dof import USV3DOF
from cddp_tpu.models.attitude import (
    EulerAttitude,
    MrpAttitude,
    QuaternionAttitude,
    euler_attitude,
    mrp_attitude,
    quaternion_attitude,
)

# Names match the Python binding layer (python/pycddp/__init__.py:12-75,
# bind_dynamics.cpp:106-257) so reference users find the same classes.
REGISTRY = {
    "Pendulum": Pendulum,
    "Unicycle": Unicycle,
    "Bicycle": Bicycle,
    "DubinsCar": DubinsCar,
    "Car": Car,
    "Forklift": Forklift,
    "CartPole": CartPole,
    "Acrobot": Acrobot,
    "Quadrotor": Quadrotor,
    "QuadrotorRate": QuadrotorRate,
    "Manipulator": Manipulator,
    "HCW": HCW,
    "SpacecraftLinearFuel": SpacecraftLinearFuel,
    "SpacecraftNonlinear": SpacecraftNonlinear,
    "SpacecraftLanding2D": SpacecraftLanding2D,
    "SpacecraftTwobody": SpacecraftTwobody,
    "DreyfusRocket": DreyfusRocket,
    "LTISystem": LTISystem,
    "USV3DOF": USV3DOF,
    "EulerAttitude": EulerAttitude,
    "QuaternionAttitude": QuaternionAttitude,
    "MrpAttitude": MrpAttitude,
}
