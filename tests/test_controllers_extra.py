"""CTBR + MRAC parity/behavior tests and compat-shell checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gym_pybullet_drones_tpu.control.ctbr import ctbr_control, ctbr_params
from gym_pybullet_drones_tpu.control.mrac import mrac_control, mrac_params, mrac_reset
from gym_pybullet_drones_tpu.envs.spec import DroneModel


def _ctbr_oracle(pos, quat_xyzw, vel, target_pos, target_vel):
    """Float64 re-derivation of CTBRControl.computeControl (:149-168)."""
    G = np.array([0.0, 0.0, -9.8])
    K_P, K_D = np.array([3.0, 3.0, 8.0]), np.array([2.5, 2.5, 5.0])
    K_RATES = np.array([5.0, 5.0, 1.0])
    P, D = target_pos - pos, target_vel - vel
    tar_acc = K_P * P + K_D * D - G
    R = Rotation.from_quat(quat_xyzw)
    norm_thrust = tar_acc @ R.apply([0.0, 0.0, 1.0])
    z_body = tar_acc / np.linalg.norm(tar_acc)
    x_body = np.cross([0.0, 1.0, 0.0], z_body)
    x_body /= np.linalg.norm(x_body)
    y_body = np.cross(z_body, x_body)
    tar_R = Rotation.from_matrix(np.vstack([x_body, y_body, z_body]).T)
    q_err = (R.inv() * tar_R).as_quat()  # xyzw
    rates = 2.0 * K_RATES * q_err[0:3]
    if q_err[3] < 0:
        rates = -rates
    return np.concatenate([[norm_thrust], rates])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctbr_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1, 1, 3)
    vel = rng.uniform(-1, 1, 3)
    rpy = rng.uniform(-0.5, 0.5, 3)
    quat = Rotation.from_euler("xyz", rpy).as_quat()
    tp = pos + rng.uniform(-1, 1, 3)
    tv = rng.uniform(-0.5, 0.5, 3)
    params = ctbr_params(dtype=jnp.float64)
    out = ctbr_control(params, jnp.asarray(pos), jnp.asarray(quat),
                       jnp.asarray(vel), jnp.asarray(tp), jnp.asarray(tv))
    expected = _ctbr_oracle(pos, quat, vel, tp, tv)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-8, atol=1e-8)


def test_mrac_params_are_stabilizing():
    p = mrac_params(DroneModel.CF2X, dtype=jnp.float64)
    Am = np.asarray(p.Am)
    eig = np.linalg.eigvals(Am)
    assert np.all(eig.real < -0.5)  # poles placed at -1..-12
    # Lyapunov residual: Am^T P + P Am = -600 I
    P = np.asarray(p.P)
    residual = Am.T @ P + P @ Am + 600.0 * np.eye(12)
    assert np.abs(residual).max() < 1e-6


def test_mrac_hover_rpm_near_hover():
    """At the hover fixed point with zero target error, the MRAC output should
    command roughly hover RPM (u -> mg through the PWM map)."""
    from gym_pybullet_drones_tpu.core.params import drone_params

    params = mrac_params(DroneModel.CF2X)
    dp = drone_params(DroneModel.CF2X)
    state = mrac_reset(params, ())
    pos = jnp.asarray([0.0, 0.0, 1.0])
    quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    zeros = jnp.zeros(3)
    rpm, state, _, _ = mrac_control(
        params, state, 1.0 / 120.0, pos, quat, zeros, zeros,
        jnp.asarray([0.0, 0.0, 1.0]),
    )
    # u = Kx X + Kr rt at equilibrium reproduces a thrust within ~2x of mg
    assert 0.25 * float(dp.hover_rpm) < float(rpm.mean()) < 2.5 * float(dp.hover_rpm)


def test_compat_controller_shells():
    from gym_pybullet_drones_tpu.control.compat import CTBRControl, DSLPIDControl, MRAC

    state20 = np.zeros(20)
    state20[0:3] = [0.0, 0.0, 0.5]
    state20[6] = 1.0  # quat w (slots 3:7 are xyzw)
    state20[3:7] = [0, 0, 0, 1]

    pid = DSLPIDControl(DroneModel.CF2X)
    rpm, pos_e, yaw_e = pid.computeControlFromState(
        1 / 48, state20, target_pos=np.array([0.0, 0.0, 1.0]))
    assert rpm.shape == (4,) and np.all(rpm > 0)

    ctbr = CTBRControl(DroneModel.CF2X)
    thrust, p, q, r = ctbr.computeControlFromState(
        1 / 500, state20, target_pos=np.array([0.0, 0.0, 1.0]))
    assert thrust > 9.0  # > g: climbing

    mrac = MRAC(DroneModel.CF2X)
    rpm, pos_e, rpy_e = mrac.computeControlFromState(
        1 / 120, state20, target_pos=np.array([0.0, 0.0, 1.0]))
    assert rpm.shape == (4,) and np.all(np.isfinite(rpm))
