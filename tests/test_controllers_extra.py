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


def test_base_control_pid_coefficient_surface():
    """setPIDCoefficients retunes the DSLPID kernel through the reference
    attribute names (BaseControl.py:138-177) and errors out, reference-style,
    on non-PID controllers."""
    import pytest as _pytest

    from gym_pybullet_drones_tpu.control.compat import CTBRControl, DSLPIDControl

    c = DSLPIDControl(DroneModel.CF2X)
    state = np.zeros(20)
    state[6] = 1.0
    # small error so the PWM stays off the 65535 clip and gains are visible
    target = np.array([0.0, 0.0, 0.02])
    rpm_before, _, _ = c.computeControlFromState(1 / 48, state, target)
    c.setPIDCoefficients(p_coeff_pos=np.array([4.0, 4.0, 12.5]))
    np.testing.assert_allclose(c.P_COEFF_FOR, [4.0, 4.0, 12.5])
    c.reset()
    rpm_after, _, _ = c.computeControlFromState(1 / 48, state, target)
    assert not np.allclose(rpm_before, rpm_after)

    with _pytest.raises(SystemExit):
        CTBRControl(DroneModel.RACE).setPIDCoefficients(p_coeff_pos=[1, 1, 1])


def test_dsl_pid_internal_loops_compose():
    """_dslPIDPositionControl + _dslPIDAttitudeControl equal computeControl
    (DSLPIDControl.py:130-145), and _getURDFParameter reads the packaged
    URDF with the reference's positional indexing."""
    from gym_pybullet_drones_tpu.control.compat import DSLPIDControl

    state = np.zeros(20)
    state[2], state[6] = 0.1, 1.0
    target = np.array([0.2, -0.1, 1.0])

    c1 = DSLPIDControl(DroneModel.CF2X)
    thrust, target_euler, pos_e = c1._dslPIDPositionControl(
        1 / 48, state[0:3], state[3:7], state[10:13], target,
        np.zeros(3), np.zeros(3))
    rpm_split = c1._dslPIDAttitudeControl(1 / 48, thrust, state[3:7],
                                          target_euler, np.zeros(3))
    c2 = DSLPIDControl(DroneModel.CF2X)
    rpm_full, pos_e_full, _ = c2.computeControlFromState(1 / 48, state, target)
    np.testing.assert_allclose(rpm_split, rpm_full, atol=1e-2)
    np.testing.assert_allclose(pos_e, pos_e_full, atol=1e-6)

    pwm = c1._one23DInterface(np.array([0.27]))
    assert pwm.shape == (4,) and np.all(pwm >= c1.MIN_PWM)

    assert c1._getURDFParameter("m") == pytest.approx(0.027)
    assert c1._getURDFParameter("kf") == pytest.approx(3.16e-10)
    assert c1._getURDFParameter("radius") == pytest.approx(0.06)


def test_mrac_compute_k_reference_surface():
    """MRAC._compute_K (MRAC.py:56-104) re-derives the placed-pole gains and
    exposes the reference-named linear-algebra attributes."""
    from gym_pybullet_drones_tpu.control.compat import MRAC

    m = MRAC(DroneModel.CF2X)
    Kx, Kr = m._compute_K()
    assert Kx.shape == (12, 4) and np.allclose(Kr, np.eye(4))
    eig = np.linalg.eigvals(m.Am)
    assert np.all(eig.real < 0)  # reference model is Hurwitz by construction
    # Lyapunov residual: Am^T P + P Am = -Q with Q = 600 I (float32 params,
    # so the residual carries single-precision round-off)
    res = m.Am.T @ m.P + m.P @ m.Am + 600 * np.eye(12)
    assert np.abs(res).max() < 0.01
