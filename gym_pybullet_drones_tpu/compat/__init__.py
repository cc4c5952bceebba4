from gym_pybullet_drones_tpu.compat.gym import (
    BaseAviaryEnv,
    CtrlAviary,
    HoverAviary,
    MultiHoverAviary,
    VelocityAviary,
)
