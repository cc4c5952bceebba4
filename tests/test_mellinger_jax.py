"""Parity and closed-loop tests for the pure-JAX Mellinger twin
(control/mellinger.py) against the native cffirm bridge
(bridges/cffirmware/src/cffirm.cpp:368-500)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.bridges import cffirmware as firm
from gym_pybullet_drones_tpu.control.mellinger import (
    lpf2p_apply,
    lpf2p_coeffs,
    mellinger_control,
    mellinger_params,
    mellinger_reset,
    mellinger_rpm,
    power_distribution_x,
)

F32 = np.float32


def test_lpf2p_parity():
    """JAX biquad matches the C lpf2p sample-for-sample."""
    cf = firm.lpf2pData()
    firm.lpf2pInit(cf, 500.0, 30.0)
    coeffs = lpf2p_coeffs(500.0, 30.0)
    rng = np.random.default_rng(0)
    samples = rng.normal(size=200).astype(F32) * 50.0
    d1 = jnp.asarray(0.0, jnp.float32)
    d2 = jnp.asarray(0.0, jnp.float32)
    for s in samples:
        want = firm.lpf2pApply(cf, float(s))
        got, d1, d2 = lpf2p_apply(coeffs, d1, d2, jnp.float32(s))
        np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-5)


def _random_quat(rng):
    q = rng.normal(size=4).astype(F32)
    return q / np.linalg.norm(q)


def test_mellinger_tick_parity():
    """300 ticks of randomized full-state flight: the JAX twin reproduces the
    C controller's thrust and torque outputs (both float32; the D-term's
    1/dt amplification makes this the tightest axis)."""
    firm.controllerMellingerInit()
    params = mellinger_params()
    mstate = mellinger_reset()

    control = firm.control_t()
    setpoint = firm.setpoint_t()
    sensors = firm.sensorData_t()
    cstate = firm.state_t()
    setpoint.mode.x = firm.modeAbs
    setpoint.mode.y = firm.modeAbs
    setpoint.mode.z = firm.modeAbs
    setpoint.mode.quat = firm.modeDisable

    rng = np.random.default_rng(42)
    for t in range(300):
        pos = (rng.normal(size=3) * 0.5).astype(F32)
        vel = (rng.normal(size=3) * 0.5).astype(F32)
        quat = _random_quat(rng)
        gyro = (rng.normal(size=3) * 40.0).astype(F32)
        sp_pos = (rng.normal(size=3) * 0.5 + np.array([0, 0, 1])).astype(F32)
        sp_vel = (rng.normal(size=3) * 0.3).astype(F32)
        sp_acc = (rng.normal(size=3) * 0.5).astype(F32)
        sp_yaw = F32(rng.uniform(-90, 90))
        sp_rate = (rng.normal(size=3) * 20.0).astype(F32)

        cstate.position.x, cstate.position.y, cstate.position.z = map(float, pos)
        cstate.velocity.x, cstate.velocity.y, cstate.velocity.z = map(float, vel)
        aq = cstate.attitudeQuaternion
        aq.x, aq.y, aq.z, aq.w = map(float, quat)
        sensors.gyro.x, sensors.gyro.y, sensors.gyro.z = map(float, gyro)
        setpoint.position.x, setpoint.position.y, setpoint.position.z = map(float, sp_pos)
        setpoint.velocity.x, setpoint.velocity.y, setpoint.velocity.z = map(float, sp_vel)
        (setpoint.acceleration.x, setpoint.acceleration.y,
         setpoint.acceleration.z) = map(float, sp_acc)
        setpoint.attitude.yaw = float(sp_yaw)
        (setpoint.attitudeRate.roll, setpoint.attitudeRate.pitch,
         setpoint.attitudeRate.yaw) = map(float, sp_rate)

        firm.controllerMellinger(control, setpoint, sensors, cstate, 0)
        got, mstate = mellinger_control(
            params, mstate,
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(quat),
            jnp.asarray(gyro), jnp.asarray(sp_pos), sp_vel=jnp.asarray(sp_vel),
            sp_acc=jnp.asarray(sp_acc), sp_yaw_deg=jnp.asarray(sp_yaw),
            sp_rate_deg=jnp.asarray(sp_rate),
        )
        for key, want in (("thrust", control.thrust), ("roll", control.roll),
                          ("pitch", control.pitch), ("yaw", control.yaw)):
            np.testing.assert_allclose(
                float(got[key]), want, rtol=2e-4, atol=1.0,
                err_msg=f"tick {t} field {key}")

    # Power stage spot check against the host-side formula (envs/cf.py:247-276)
    pwms = np.asarray(power_distribution_x(jax.tree.map(jnp.asarray, got)))
    thrusts = np.clip(
        [got["thrust"] - got["roll"] / 2 + got["pitch"] / 2 + got["yaw"],
         got["thrust"] - got["roll"] / 2 - got["pitch"] / 2 - got["yaw"],
         got["thrust"] + got["roll"] / 2 - got["pitch"] / 2 + got["yaw"],
         got["thrust"] + got["roll"] / 2 + got["pitch"] / 2 - got["yaw"]],
        0.0, 65535.0).astype(np.float64)
    scaled = thrusts / 65536 * 60
    volts = -0.0006239 * scaled**2 + 0.088 * scaled
    want_pwms = np.minimum(1.0, volts / 3.0) * 65535.0
    np.testing.assert_allclose(pwms, want_pwms, rtol=1e-4, atol=0.5)


def test_mellinger_full_state_quat_yaw_parity():
    """The full-state branch (mode.quat == modeAbs) extracts yaw from the
    setpoint quaternion (cffirm.cpp:424-428)."""
    firm.controllerMellingerInit()
    params = mellinger_params()
    mstate = mellinger_reset()

    control = firm.control_t()
    setpoint = firm.setpoint_t()
    sensors = firm.sensorData_t()
    cstate = firm.state_t()
    for m in ("x", "y", "z", "quat"):
        setattr(setpoint.mode, m, firm.modeAbs)

    rng = np.random.default_rng(7)
    pos = np.zeros(3, F32)
    vel = np.zeros(3, F32)
    quat = _random_quat(rng)
    gyro = np.zeros(3, F32)
    sp_pos = np.array([0.2, -0.1, 1.0], F32)
    sp_quat = _random_quat(rng)

    cstate.position.x, cstate.position.y, cstate.position.z = map(float, pos)
    cstate.velocity.x, cstate.velocity.y, cstate.velocity.z = map(float, vel)
    aq = cstate.attitudeQuaternion
    aq.x, aq.y, aq.z, aq.w = map(float, quat)
    setpoint.position.x, setpoint.position.y, setpoint.position.z = map(float, sp_pos)
    sq = setpoint.attitudeQuaternion
    sq.x, sq.y, sq.z, sq.w = map(float, sp_quat)

    firm.controllerMellinger(control, setpoint, sensors, cstate, 0)
    got, _ = mellinger_control(
        params, mstate, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(quat),
        jnp.asarray(gyro), jnp.asarray(sp_pos), sp_quat=jnp.asarray(sp_quat))
    for key, want in (("thrust", control.thrust), ("roll", control.roll),
                      ("pitch", control.pitch), ("yaw", control.yaw)):
        np.testing.assert_allclose(float(got[key]), want, rtol=2e-4, atol=1.0)


def test_mellinger_fleet_closed_loop():
    """A 4-drone fleet flies to staggered hover setpoints fully on-device:
    batched Mellinger (no vmap needed — the controller broadcasts) driving
    the functional env through the `preprocessed_rpm` hook inside one
    lax.scan. The firmware's mass constant (0.032 vs the CF2X's 0.027) and
    the brushed power curve give a known steady-state z sag of ~10 cm —
    the same bias the host-bridge CFAviary flies with — so the gate is
    hover stability plus a 0.15 m position band."""
    from gym_pybullet_drones_tpu.core.rotations import quat_to_euler_xyz
    from gym_pybullet_drones_tpu.envs import base
    from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL

    n = 4
    cfg = AviaryConfig(num_drones=n, task=TASK_CTRL, pyb_freq=500, ctrl_freq=500,
                       action_buffer_size=0, dtype="float32")
    params = base.build_params(cfg)
    ctrl_params = base.build_ctrl_params(cfg)
    state0 = base.reset(cfg, params)
    target = jnp.zeros((n, 3), jnp.float32)

    mparams = mellinger_params()
    mstate0 = mellinger_reset(batch_shape=(n,))
    sp_pos = jnp.concatenate(
        [state0.kin.pos[:, :2],
         (0.4 + 0.15 * jnp.arange(n, dtype=jnp.float32))[:, None]], axis=1)
    rad2deg = jnp.float32(57.29577951308232)
    dt = jnp.float32(1.0 / 500.0)

    def tick(carry, _):
        state, mstate, prev_rpy = carry
        rpy = quat_to_euler_xyz(state.kin.quat)
        gyro_deg = (rpy - prev_rpy) / dt * rad2deg  # CFAviary.py:215-217 feed
        rpm, mstate = mellinger_rpm(
            mparams, mstate, state.kin.pos, state.kin.vel, state.kin.quat,
            gyro_deg, sp_pos)
        state, *_ = base.step(cfg, params, ctrl_params, target, state,
                              jnp.zeros((n, 4), jnp.float32),
                              preprocessed_rpm=rpm)
        return (state, mstate, rpy), None

    prev_rpy0 = quat_to_euler_xyz(state0.kin.quat)
    (state, _, _), _ = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=2500)
    )((state0, mstate0, prev_rpy0))

    pos = np.asarray(state.kin.pos)
    vel = np.asarray(state.kin.vel)
    err = pos - np.asarray(sp_pos)
    assert np.all(np.abs(err[:, :2]) < 0.05), err
    assert np.all(np.abs(err[:, 2]) < 0.15), err
    assert np.all(np.abs(vel) < 0.05), vel
    # The fleet must hold its staggered separation (tracks per-drone setpoints)
    assert np.all(np.diff(pos[:, 2]) > 0.10), pos[:, 2]
