"""Firmware Mellinger controller as a pure, batched JAX function.

Behavioral twin of the native bridge ``bridges/cffirmware/src/cffirm.cpp``
(:368-500 ``controllerMellinger``, :80-108 ``lpf2p``, and the
QUAD_FORMATION_X power stage mirrored from ``envs/cf.py:247-276``), which
itself re-implements the subset of the Bitcraze firmware the reference
drives (gym_pybullet_drones/envs/CFAviary.py:401-416, :615-652).

Why a twin: the C++ bridge is host-side and single-vehicle by design (one
firmware context per CFAviary). This module is the on-device counterpart —
a vmappable, jit-friendly geometric tracking controller (Mellinger & Kumar
2011 with firmware default tuning) whose memory is an explicit pytree, so
whole fleets can fly full-state setpoints inside one ``lax.scan`` with zero
host round-trips. Parity with the native bridge is regression-tested in
``tests/test_mellinger_jax.py``.

Scope: the position / full-state setpoint mode (``mode.x == modeAbs``, the
only mode the high-level commander emits). The attitude-only passthrough
branches (cffirm.cpp:432-436, :484-485) are host-bridge-only territory.

Units follow the firmware wire conventions so the twin is directly
comparable with the C side:
  positions/velocities/accelerations : m, m/s, m/s^2 (world frame)
  quaternion                         : xyzw
  gyro / setpoint rates              : deg/s (legacy frame handled inside)
  outputs                            : PWM counts (thrust 0..65535,
                                       torques clipped to +-32000)
"""

import jax
import jax.numpy as jnp
from flax import struct

from gym_pybullet_drones_tpu.core.rotations import quat_to_matrix

ATTITUDE_RATE = 500.0  # Hz, firmware stabilizer rate (cffirm.cpp ATTITUDE_RATE)
_DEG2RAD = 0.017453292519943295


@struct.dataclass
class Lpf2pCoeffs:
    """2nd-order Butterworth biquad coefficients (cffirm.cpp lpf2pInit)."""

    b0: jax.Array
    b1: jax.Array
    b2: jax.Array
    a1: jax.Array
    a2: jax.Array


def lpf2p_coeffs(sample_freq: float, cutoff_freq: float, dtype=jnp.float32) -> Lpf2pCoeffs:
    import math

    if cutoff_freq <= 0.0 or sample_freq <= 0.0:
        z = jnp.asarray(0.0, dtype)
        return Lpf2pCoeffs(b0=jnp.asarray(1.0, dtype), b1=z, b2=z, a1=z, a2=z)
    fr = sample_freq / cutoff_freq
    ohm = math.tan(math.pi / fr)
    c = 1.0 + 2.0 * math.cos(math.pi / 4.0) * ohm + ohm * ohm
    arr = lambda v: jnp.asarray(v, dtype)
    b0 = ohm * ohm / c
    return Lpf2pCoeffs(
        b0=arr(b0),
        b1=arr(2.0 * b0),
        b2=arr(b0),
        a1=arr(2.0 * (ohm * ohm - 1.0) / c),
        a2=arr((1.0 - 2.0 * math.cos(math.pi / 4.0) * ohm + ohm * ohm) / c),
    )


def lpf2p_apply(coeffs: Lpf2pCoeffs, delay1, delay2, sample):
    """One biquad step (cffirm.cpp lpf2pApply, incl. the NaN-inflow guard).

    Returns ``(out, delay1, delay2)``; broadcasts over any batch shape.
    """
    delay0 = sample - delay1 * coeffs.a1 - delay2 * coeffs.a2
    delay0 = jnp.where(jnp.isfinite(delay0), delay0, sample)
    out = delay0 * coeffs.b0 + delay1 * coeffs.b1 + delay2 * coeffs.b2
    return out, delay0, delay1


@struct.dataclass
class MellingerParams:
    """Firmware default tuning (cffirm.cpp controllerMellingerInit, :368-388)."""

    mass: jax.Array          # kg (firmware g_vehicleMass, CF2 + deck)
    mass_thrust: jax.Array   # thrust (N) -> PWM counts
    kp_xy: jax.Array
    kd_xy: jax.Array
    ki_xy: jax.Array
    i_range_xy: jax.Array
    kp_z: jax.Array
    kd_z: jax.Array
    ki_z: jax.Array
    i_range_z: jax.Array
    kr_xy: jax.Array
    kw_xy: jax.Array
    ki_m_xy: jax.Array
    i_range_m_xy: jax.Array
    kr_z: jax.Array
    kw_z: jax.Array
    ki_m_z: jax.Array
    i_range_m_z: jax.Array
    kd_omega_rp: jax.Array
    dt: jax.Array            # 1 / ATTITUDE_RATE
    lpf: Lpf2pCoeffs         # 30 Hz D-term low-pass (roll & pitch share coeffs)


@struct.dataclass
class MellingerState:
    """Carried controller memory (cffirm.cpp mel.* mutable fields)."""

    i_error: jax.Array         # (..., 3) position integral, m*s
    i_error_m: jax.Array       # (..., 3) attitude-error integral
    prev_omega_err: jax.Array  # (..., 3) rad/s, legacy frame
    lpf_delay1: jax.Array      # (..., 2) D-term biquad memory [roll, pitch]
    lpf_delay2: jax.Array      # (..., 2)


def mellinger_params(kd_omega_rp: float = 200.0, dtype=jnp.float32) -> MellingerParams:
    arr = lambda v: jnp.asarray(v, dtype)
    return MellingerParams(
        mass=arr(0.032),
        mass_thrust=arr(132000.0),
        kp_xy=arr(0.4), kd_xy=arr(0.2), ki_xy=arr(0.05), i_range_xy=arr(2.0),
        kp_z=arr(1.25), kd_z=arr(0.4), ki_z=arr(0.05), i_range_z=arr(0.4),
        kr_xy=arr(70000.0), kw_xy=arr(20000.0), ki_m_xy=arr(0.0), i_range_m_xy=arr(1.0),
        kr_z=arr(60000.0), kw_z=arr(12000.0), ki_m_z=arr(500.0), i_range_m_z=arr(1500.0),
        kd_omega_rp=arr(kd_omega_rp),
        dt=arr(1.0 / ATTITUDE_RATE),
        lpf=lpf2p_coeffs(ATTITUDE_RATE, 30.0, dtype=dtype),
    )


def mellinger_reset(batch_shape=(), dtype=jnp.float32) -> MellingerState:
    z3 = jnp.zeros(batch_shape + (3,), dtype=dtype)
    z2 = jnp.zeros(batch_shape + (2,), dtype=dtype)
    return MellingerState(i_error=z3, i_error_m=z3, prev_omega_err=z3,
                          lpf_delay1=z2, lpf_delay2=z2)


def _vnorm(a):
    """cffirm vnorm: unit vector, falling back to +z below 1e-9 magnitude."""
    n = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    safe = a / jnp.where(n < 1e-9, 1.0, n)
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], a.dtype), a.shape)
    return jnp.where(n < 1e-9, up, safe)


def mellinger_control(
    params: MellingerParams,
    state: MellingerState,
    cur_pos,
    cur_vel,
    cur_quat,
    gyro_deg,
    sp_pos,
    sp_vel=None,
    sp_acc=None,
    sp_yaw_deg=None,
    sp_quat=None,
    sp_rate_deg=None,
):
    """One firmware tick of the Mellinger controller (cffirm.cpp:394-500).

    All inputs broadcast over leading batch axes; trailing dims are 3 (vectors)
    or 4 (``cur_quat``/``sp_quat``, xyzw). ``gyro_deg`` is the firmware gyro
    feed in deg/s — the reference plumbs finite-differenced Euler rates there
    (CFAviary.py:215-217 / envs/cf.py:153). Yaw comes from ``sp_quat`` when
    given (full-state command, cffirm.cpp:424-428), else ``sp_yaw_deg``.

    Returns ``(control, new_state)`` where ``control`` is a dict with
    ``thrust`` (PWM counts) and ``roll/pitch/yaw`` torque commands clipped to
    +-32000, matching the C ``control_t`` exactly.
    """
    zeros = jnp.zeros_like(cur_pos)
    sp_vel = zeros if sp_vel is None else sp_vel
    sp_acc = zeros if sp_acc is None else sp_acc
    sp_rate_deg = zeros if sp_rate_deg is None else sp_rate_deg
    dt = params.dt

    r_error = sp_pos - cur_pos
    v_error = sp_vel - cur_vel
    i_range = jnp.stack([params.i_range_xy, params.i_range_xy, params.i_range_z])
    i_error = jnp.clip(state.i_error + r_error * dt, -i_range, i_range)
    kp = jnp.stack([params.kp_xy, params.kp_xy, params.kp_z])
    kd = jnp.stack([params.kd_xy, params.kd_xy, params.kd_z])
    ki = jnp.stack([params.ki_xy, params.ki_xy, params.ki_z])
    grav = jnp.zeros_like(sp_acc).at[..., 2].add(9.81)
    target_thrust = params.mass * (sp_acc + grav) + kp * r_error + kd * v_error + ki * i_error

    if sp_quat is not None:
        qx, qy, qz, qw = (sp_quat[..., 0], sp_quat[..., 1], sp_quat[..., 2], sp_quat[..., 3])
        desired_yaw = jnp.arctan2(2.0 * (qw * qz + qx * qy),
                                  1.0 - 2.0 * (qy * qy + qz * qz))
    elif sp_yaw_deg is not None:
        desired_yaw = jnp.asarray(sp_yaw_deg, cur_pos.dtype) * _DEG2RAD
    else:
        desired_yaw = jnp.zeros_like(cur_pos[..., 0])

    # cffirm quat_to_R == core.rotations.quat_to_matrix (xyzw, row-major)
    rot = quat_to_matrix(cur_quat)
    z_axis = rot[..., :, 2]
    current_thrust = jnp.sum(target_thrust * z_axis, axis=-1)

    z_des = _vnorm(target_thrust)
    x_c = jnp.stack([jnp.cos(desired_yaw), jnp.sin(desired_yaw),
                     jnp.zeros_like(desired_yaw)], -1)
    y_des = _vnorm(jnp.cross(z_des, x_c))
    x_des = jnp.cross(y_des, z_des)

    # eR = (Rdes^T R - R^T Rdes)^vee, firmware layout: no 1/2 factor, y negated
    # for the legacy inverted-pitch output frame (cffirm.cpp:448-455).
    xb, yb = rot[..., :, 0], rot[..., :, 1]
    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    er = jnp.stack(
        [
            dot(yb, z_des) - dot(z_axis, y_des),
            -(dot(z_axis, x_des) - dot(xb, z_des)),
            dot(xb, y_des) - dot(yb, x_des),
        ],
        -1,
    )

    ew = (sp_rate_deg - gyro_deg) * _DEG2RAD
    ew = ew.at[..., 1].multiply(-1.0)
    err_d = (ew - state.prev_omega_err) / dt
    d_roll, delay1_r, delay2_r = lpf2p_apply(
        params.lpf, state.lpf_delay1[..., 0], state.lpf_delay2[..., 0], err_d[..., 0])
    d_pitch, delay1_p, delay2_p = lpf2p_apply(
        params.lpf, state.lpf_delay1[..., 1], state.lpf_delay2[..., 1], err_d[..., 1])

    i_range_m = jnp.stack([params.i_range_m_xy, params.i_range_m_xy, params.i_range_m_z])
    i_error_m = jnp.clip(state.i_error_m - er * dt, -i_range_m, i_range_m)

    mx = (-params.kr_xy * er[..., 0] + params.kw_xy * ew[..., 0]
          + params.ki_m_xy * i_error_m[..., 0] + params.kd_omega_rp * d_roll)
    my = (-params.kr_xy * er[..., 1] + params.kw_xy * ew[..., 1]
          + params.ki_m_xy * i_error_m[..., 1] + params.kd_omega_rp * d_pitch)
    mz = (-params.kr_z * er[..., 2] + params.kw_z * ew[..., 2]
          + params.ki_m_z * i_error_m[..., 2])

    thrust = params.mass_thrust * current_thrust
    armed = thrust > 0
    clip_t = lambda v: jnp.clip(v, -32000.0, 32000.0)
    control = {
        "thrust": thrust,
        "roll": jnp.where(armed, clip_t(mx), 0.0),
        "pitch": jnp.where(armed, clip_t(my), 0.0),
        "yaw": jnp.where(armed, clip_t(-mz), 0.0),
    }
    # Thrust-cut integrator reset (cffirm.cpp:493-499)
    keep = armed[..., None]
    new_state = MellingerState(
        i_error=jnp.where(keep, i_error, 0.0),
        i_error_m=jnp.where(keep, i_error_m, 0.0),
        prev_omega_err=jnp.where(keep, ew, 0.0),
        lpf_delay1=jnp.stack([delay1_r, delay1_p], -1),
        lpf_delay2=jnp.stack([delay2_r, delay2_p], -1),
    )
    return control, new_state


# ---------------------------------------------------------------------------
# Power stage: QUAD_FORMATION_X mixer + brushed-motor PWM curve
# (envs/cf.py:247-276, reference CFAviary.py:615-652)
# ---------------------------------------------------------------------------

SUPPLY_VOLTAGE = 3.0
MAX_PWM = 65535.0
MIN_PWM = 20000.0
PWM2RPM_SCALE = 0.2685
PWM2RPM_CONST = 4070.3


def power_distribution_x(control):
    """control dict -> per-motor PWM counts (..., 4), brushed curve applied."""
    r = control["roll"] / 2.0
    p = control["pitch"] / 2.0
    t, y = control["thrust"], control["yaw"]
    thrusts = jnp.stack([t - r + p + y, t - r - p - y, t + r - p + y, t + r + p - y], -1)
    thrusts = jnp.clip(thrusts, 0.0, MAX_PWM)
    scaled = thrusts / 65536.0 * 60.0
    volts = -0.0006239 * scaled**2 + 0.088 * scaled
    percentage = jnp.minimum(1.0, volts / SUPPLY_VOLTAGE)
    return percentage * MAX_PWM


def pwm_to_rpm(pwms):
    """Motor PWM -> RPM action (envs/cf.py:167-168)."""
    return PWM2RPM_SCALE * jnp.clip(pwms, MIN_PWM, MAX_PWM) + PWM2RPM_CONST


def mellinger_rpm(params, state, cur_pos, cur_vel, cur_quat, gyro_deg, sp_pos,
                  **setpoint_kwargs):
    """Convenience: one controller tick straight to (..., 4) RPMs."""
    control, new_state = mellinger_control(
        params, state, cur_pos, cur_vel, cur_quat, gyro_deg, sp_pos,
        **setpoint_kwargs)
    return pwm_to_rpm(power_distribution_x(control)), new_state
