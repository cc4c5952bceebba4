"""DSL cascaded PID controller for the Crazyflie 2.x, as a pure function.

Behavioral spec: gym_pybullet_drones/control/DSLPIDControl.py:37-259 — position
PID -> target thrust + target attitude, then attitude PID -> torques -> motor
mixer -> PWM -> RPM, with the reference's exact integral clips, torque clips,
and PWM<->RPM affine map. The reference's mutable attributes (integral errors,
last rpy) become an explicit ``DSLPIDState`` pytree carried by the caller, so
the controller vmaps over fleets and lives inside ``lax.scan`` rollouts.

All math broadcasts over leading batch axes: inputs shaped (..., 3)/(..., 4)
produce (..., 4) RPMs.
"""

import jax
import jax.numpy as jnp
from flax import struct

from gym_pybullet_drones_tpu.core.params import G, _MODEL_TABLE
from gym_pybullet_drones_tpu.core.rotations import (
    euler_intrinsic_xyz_to_matrix,
    matrix_to_euler_intrinsic_xyz,
    quat_to_euler_xyz,
    quat_to_matrix,
)
from gym_pybullet_drones_tpu.envs.spec import DroneModel

# Mixer matrices (DSLPIDControl.py:47-60)
_MIXER_CF2X = [[-0.5, -0.5, -1.0], [-0.5, 0.5, 1.0], [0.5, 0.5, -1.0], [0.5, -0.5, 1.0]]
_MIXER_CF2P = [[0.0, -1.0, -1.0], [1.0, 0.0, 1.0], [0.0, 1.0, -1.0], [-1.0, 0.0, 1.0]]


@struct.dataclass
class DSLPIDParams:
    p_for: jax.Array  # (3,)
    i_for: jax.Array
    d_for: jax.Array
    p_tor: jax.Array
    i_tor: jax.Array
    d_tor: jax.Array
    pwm2rpm_scale: jax.Array
    pwm2rpm_const: jax.Array
    min_pwm: jax.Array
    max_pwm: jax.Array
    mixer: jax.Array  # (4, 3)
    kf: jax.Array
    gravity: jax.Array  # m * g


@struct.dataclass
class DSLPIDState:
    """Carried controller memory (DSLPIDControl.reset, :65-78)."""

    last_rpy: jax.Array  # (..., 3)
    integral_pos_e: jax.Array  # (..., 3)
    integral_rpy_e: jax.Array  # (..., 3)


def dsl_pid_params(model: DroneModel = DroneModel.CF2X, g: float = G, dtype=jnp.float32) -> DSLPIDParams:
    if model not in (DroneModel.CF2X, DroneModel.CF2P):
        raise ValueError("DSLPID supports CF2X and CF2P only (DSLPIDControl.py:34-36)")
    table = _MODEL_TABLE[model]
    arr = lambda v: jnp.asarray(v, dtype=dtype)
    mixer = _MIXER_CF2X if model == DroneModel.CF2X else _MIXER_CF2P
    return DSLPIDParams(
        p_for=arr([0.4, 0.4, 1.25]),
        i_for=arr([0.05, 0.05, 0.05]),
        d_for=arr([0.2, 0.2, 0.5]),
        p_tor=arr([70000.0, 70000.0, 60000.0]),
        i_tor=arr([0.0, 0.0, 500.0]),
        d_tor=arr([20000.0, 20000.0, 12000.0]),
        pwm2rpm_scale=arr(0.2685),
        pwm2rpm_const=arr(4070.3),
        min_pwm=arr(20000.0),
        max_pwm=arr(65535.0),
        mixer=arr(mixer),
        kf=arr(table["kf"]),
        gravity=arr(g * table["m"]),
    )


def dsl_pid_reset(batch_shape=(), dtype=jnp.float32) -> DSLPIDState:
    # distinct zeros per leaf: shared buffers break donate_argnums (see
    # core.dynamics.init_kin_state)
    z = lambda: jnp.zeros(batch_shape + (3,), dtype=dtype)
    return DSLPIDState(last_rpy=z(), integral_pos_e=z(), integral_rpy_e=z())


def _position_control(
    params: DSLPIDParams, integral_pos_e, dt, cur_pos, cur_quat, cur_vel,
    target_pos, target_rpy, target_vel,
):
    """Position loop (DSLPIDControl.py:149-209). Returns thrust (PWM units),
    target intrinsic-XYZ Euler angles, pos error, and the updated integral."""
    cur_rotation = quat_to_matrix(cur_quat)
    pos_e = target_pos - cur_pos
    vel_e = target_vel - cur_vel
    integral_pos_e = jnp.clip(integral_pos_e + pos_e * dt, -2.0, 2.0)
    integral_pos_e = integral_pos_e.at[..., 2].set(
        jnp.clip(integral_pos_e[..., 2], -0.15, 0.15)
    )
    target_thrust = (
        params.p_for * pos_e
        + params.i_for * integral_pos_e
        + params.d_for * vel_e
        + jnp.stack(
            [jnp.zeros_like(pos_e[..., 0]), jnp.zeros_like(pos_e[..., 0]),
             jnp.broadcast_to(params.gravity, pos_e[..., 0].shape)], -1
        )
    )
    scalar_thrust = jnp.maximum(
        0.0, jnp.sum(target_thrust * cur_rotation[..., :, 2], axis=-1)
    )
    thrust = (
        jnp.sqrt(scalar_thrust / (4.0 * params.kf)) - params.pwm2rpm_const
    ) / params.pwm2rpm_scale
    target_z_ax = target_thrust / jnp.linalg.norm(target_thrust, axis=-1, keepdims=True)
    yaw = target_rpy[..., 2]
    target_x_c = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], -1)
    zx = jnp.cross(target_z_ax, target_x_c)
    target_y_ax = zx / jnp.linalg.norm(zx, axis=-1, keepdims=True)
    target_x_ax = jnp.cross(target_y_ax, target_z_ax)
    # Rows stacked then transposed (axes as columns), DSLPIDControl.py:204-205
    target_rotation = jnp.stack([target_x_ax, target_y_ax, target_z_ax], -1)
    target_euler = matrix_to_euler_intrinsic_xyz(target_rotation)
    return thrust, target_euler, pos_e, integral_pos_e


def _attitude_control(
    params: DSLPIDParams, last_rpy, integral_rpy_e, dt, thrust, cur_quat,
    target_euler, target_rpy_rates,
):
    """Attitude loop (DSLPIDControl.py:212-259). Returns RPMs and new memory."""
    cur_rotation = quat_to_matrix(cur_quat)
    cur_rpy = quat_to_euler_xyz(cur_quat)
    # Reference roundtrips euler -> quat -> matrix with a label swap that is a
    # no-op (DSLPIDControl.py:247-249); net effect is from_euler('XYZ').
    target_rotation = euler_intrinsic_xyz_to_matrix(target_euler)
    rot_matrix_e = (
        jnp.einsum("...ji,...jk->...ik", target_rotation, cur_rotation)
        - jnp.einsum("...ji,...jk->...ik", cur_rotation, target_rotation)
    )
    rot_e = jnp.stack(
        [rot_matrix_e[..., 2, 1], rot_matrix_e[..., 0, 2], rot_matrix_e[..., 1, 0]], -1
    )
    rpy_rates_e = target_rpy_rates - (cur_rpy - last_rpy) / dt
    integral_rpy_e = jnp.clip(integral_rpy_e - rot_e * dt, -1500.0, 1500.0)
    integral_rpy_e = integral_rpy_e.at[..., 0:2].set(
        jnp.clip(integral_rpy_e[..., 0:2], -1.0, 1.0)
    )
    target_torques = (
        -params.p_tor * rot_e
        + params.d_tor * rpy_rates_e
        + params.i_tor * integral_rpy_e
    )
    target_torques = jnp.clip(target_torques, -3200.0, 3200.0)
    pwm = thrust[..., None] + jnp.einsum("mk,...k->...m", params.mixer, target_torques)
    pwm = jnp.clip(pwm, params.min_pwm, params.max_pwm)
    rpm = params.pwm2rpm_scale * pwm + params.pwm2rpm_const
    return rpm, cur_rpy, integral_rpy_e


def dsl_pid_control(
    params: DSLPIDParams,
    state: DSLPIDState,
    control_timestep,
    cur_pos,
    cur_quat,
    cur_vel,
    target_pos,
    target_rpy=None,
    target_vel=None,
    target_rpy_rates=None,
):
    """Full cascaded PID step (DSLPIDControl.computeControl, :82-145).

    Returns ``(rpm, new_state, pos_e, yaw_e)``. ``cur_ang_vel`` is unused by the
    reference and therefore not an argument.
    """
    zeros = jnp.zeros_like(cur_pos)
    target_rpy = zeros if target_rpy is None else target_rpy
    target_vel = zeros if target_vel is None else target_vel
    target_rpy_rates = zeros if target_rpy_rates is None else target_rpy_rates
    thrust, target_euler, pos_e, integral_pos_e = _position_control(
        params, state.integral_pos_e, control_timestep,
        cur_pos, cur_quat, cur_vel, target_pos, target_rpy, target_vel,
    )
    rpm, cur_rpy, integral_rpy_e = _attitude_control(
        params, state.last_rpy, state.integral_rpy_e, control_timestep,
        thrust, cur_quat, target_euler, target_rpy_rates,
    )
    new_state = DSLPIDState(
        last_rpy=cur_rpy, integral_pos_e=integral_pos_e, integral_rpy_e=integral_rpy_e
    )
    yaw_e = target_euler[..., 2] - cur_rpy[..., 2]
    return rpm, new_state, pos_e, yaw_e


def one23d_interface(params: DSLPIDParams, thrust):
    """1/2/4-dim thrust -> per-motor PWM (DSLPIDControl._one23DInterface, :263-287).

    ``thrust`` has trailing dim 1, 2, or 4 (static); returns (..., 4) PWM.
    """
    dim = thrust.shape[-1]
    if dim not in (1, 2, 4):
        raise ValueError("thrust trailing dim must be 1, 2, or 4")
    pwm = jnp.clip(
        (jnp.sqrt(thrust / (params.kf * (4 // dim))) - params.pwm2rpm_const)
        / params.pwm2rpm_scale,
        params.min_pwm,
        params.max_pwm,
    )
    if dim == 1:
        return jnp.repeat(pwm, 4, axis=-1)
    if dim == 2:
        return jnp.concatenate([pwm, jnp.flip(pwm, axis=-1)], -1)
    return pwm
