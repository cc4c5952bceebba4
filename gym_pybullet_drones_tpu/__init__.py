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

    # vector_entry_point: `gym.make_vec(id, num_envs=E)` builds the batched
    # one-dispatch-per-step VecAviary (compat/vector.py) instead of E host
    # envs — the TPU-native replacement for SB3's make_vec_env.
    _register(
        id="ctrl-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:CtrlAviary",
        vector_entry_point="gym_pybullet_drones_tpu.compat.vector:_vec_ctrl",
    )
    _register(
        id="velocity-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:VelocityAviary",
        vector_entry_point="gym_pybullet_drones_tpu.compat.vector:_vec_velocity",
    )
    _register(
        id="hover-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:HoverAviary",
        vector_entry_point="gym_pybullet_drones_tpu.compat.vector:_vec_hover",
    )
    _register(
        id="multihover-aviary-v0",
        entry_point="gym_pybullet_drones_tpu.compat.gym:MultiHoverAviary",
        vector_entry_point="gym_pybullet_drones_tpu.compat.vector:_vec_multihover",
    )
except Exception:  # pragma: no cover - gymnasium absent or double registration
    pass
