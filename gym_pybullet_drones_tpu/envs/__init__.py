from gym_pybullet_drones_tpu.envs.spec import (
    ActionType,
    DroneModel,
    ImageType,
    ObservationType,
    Physics,
)
from gym_pybullet_drones_tpu.envs.base import (
    TASK_CTRL,
    TASK_HOVER,
    TASK_MULTIHOVER,
    TASK_VELOCITY,
    Aviary,
    AviaryConfig,
    AviaryState,
)

# Hardware/firmware-in-the-loop envs import native bridges lazily to keep the
# base package import light.
def __getattr__(name):
    if name == "CFAviary":
        from gym_pybullet_drones_tpu.envs.cf import CFAviary
        return CFAviary
    if name == "BetaAviary":
        from gym_pybullet_drones_tpu.envs.beta import BetaAviary
        return BetaAviary
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
