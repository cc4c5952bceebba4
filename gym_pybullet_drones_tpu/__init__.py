"""gym_pybullet_drones_tpu — a TPU-native quadrotor simulation, control, and RL suite.

A from-scratch JAX/XLA rebuild of the capabilities of `utiasDSL/gym-pybullet-drones`
(reference layout: gym_pybullet_drones/__init__.py:3-21): closed-form Crazyflie 2.x
rigid-body dynamics with drag / ground-effect / downwash aero, the DSL cascaded PID
controller, Gymnasium-compatible environments (CtrlAviary, VelocityAviary,
HoverAviary, MultiHoverAviary), on-device `lax.scan` rollouts, and multi-chip
sharding over a `jax.sharding.Mesh`.

Design: a *functional core* (pure, jit/vmap/shard_map-friendly step functions over
explicit pytree state) wrapped by a thin *Gymnasium shell* for drop-in parity with
the reference API.
"""

__version__ = "0.1.0"

from gym_pybullet_drones_tpu.envs.spec import (
    ActionType,
    DroneModel,
    ImageType,
    ObservationType,
    Physics,
)

# Gymnasium registration mirrors the reference ids
# (reference: gym_pybullet_drones/__init__.py:3-21).
try:
    from gymnasium.envs.registration import register as _register

    _register(
        id="ctrl-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:CtrlAviary",
    )
    _register(
        id="velocity-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:VelocityAviary",
    )
    _register(
        id="hover-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:HoverAviary",
    )
    _register(
        id="multihover-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:MultiHoverAviary",
    )
except Exception:  # pragma: no cover - gymnasium absent or double registration
    pass
