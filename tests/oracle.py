"""Independent NumPy float64 oracle for parity tests.

Implements, directly from the reference's documented equations, the explicit
dynamics substep (BaseAviary._dynamics / _integrateQ, BaseAviary.py:815-892) and
the DSL PID controller (DSLPIDControl.py:82-259) using scipy for rotations
(pybullet's getMatrixFromQuaternion == scipy from_quat(xyzw).as_matrix(),
getEulerFromQuaternion == as_euler('xyz')). This is the golden generator the
JAX kernels are verified against, since PyBullet itself is not installed here.
"""

import numpy as np
from scipy.spatial.transform import Rotation

from gym_pybullet_drones_tpu.core.params import G, _MODEL_TABLE
from gym_pybullet_drones_tpu.envs.spec import DroneModel


def consts(model=DroneModel.CF2X):
    t = _MODEL_TABLE[model]
    m, kf, km, t2w = t["m"], t["kf"], t["km"], t["thrust2weight"]
    gravity = G * m
    out = dict(t)
    out.update(
        m=m, kf=kf, km=km, L=t["arm"], gravity=gravity,
        hover_rpm=np.sqrt(gravity / (4 * kf)),
        max_rpm=np.sqrt(t2w * gravity / (4 * kf)),
        J=np.diag([t["ixx"], t["iyy"], t["izz"]]),
        J_inv=np.linalg.inv(np.diag([t["ixx"], t["iyy"], t["izz"]])),
    )
    out["max_thrust"] = 4 * kf * out["max_rpm"] ** 2
    out["gnd_eff_h_clip"] = 0.25 * t["prop_radius"] * np.sqrt(
        15 * out["max_rpm"] ** 2 * kf * t["gnd_eff_coeff"] / out["max_thrust"]
    )
    return out


def integrate_q(quat, omega, dt):
    omega_norm = np.linalg.norm(omega)
    p, q, r = omega
    if np.isclose(omega_norm, 0):
        return quat
    lam = np.array([
        [0, r, -q, p],
        [-r, 0, p, q],
        [q, -p, 0, r],
        [-p, -q, -r, 0],
    ]) * 0.5
    theta = omega_norm * dt / 2
    return (np.eye(4) * np.cos(theta) + 2 / omega_norm * lam * np.sin(theta)) @ quat


def dyn_substep(pos, quat, vel, rpy_rates, rpm, c, dt, model=DroneModel.CF2X):
    """Reference explicit-dynamics substep; returns pos, quat, vel, rpy_rates, ang_v."""
    rotation = Rotation.from_quat(quat).as_matrix()
    forces = np.asarray(rpm, dtype=np.float64) ** 2 * c["kf"]
    thrust_world = rotation @ np.array([0, 0, np.sum(forces)])
    force_world = thrust_world - np.array([0, 0, c["gravity"]])
    z_torques = np.asarray(rpm) ** 2 * c["km"]
    if model == DroneModel.RACE:
        z_torques = -z_torques
    z_torque = -z_torques[0] + z_torques[1] - z_torques[2] + z_torques[3]
    L = c["L"]
    if model == DroneModel.RACE:
        x_t = (forces[0] + forces[1] - forces[2] - forces[3]) * (L / np.sqrt(2))
        y_t = (-forces[0] + forces[1] + forces[2] - forces[3]) * (L / np.sqrt(2))
    elif model == DroneModel.CF2X:
        x_t = -(forces[0] + forces[1] - forces[2] - forces[3]) * (L / np.sqrt(2))
        y_t = (-forces[0] + forces[1] + forces[2] - forces[3]) * (L / np.sqrt(2))
    else:
        x_t = (forces[1] - forces[3]) * L
        y_t = (-forces[0] + forces[2]) * L
    torques = np.array([x_t, y_t, z_torque]) - np.cross(rpy_rates, c["J"] @ rpy_rates)
    rpy_rates_deriv = c["J_inv"] @ torques
    accs = force_world / c["m"]
    vel = vel + dt * accs
    rpy_rates = rpy_rates + dt * rpy_rates_deriv
    pos = pos + dt * vel
    quat = integrate_q(quat, rpy_rates, dt)
    ang_v = rotation @ rpy_rates
    return pos, quat, vel, rpy_rates, ang_v


class DSLPIDOracle:
    """Reference DSL PID (DSLPIDControl.py), float64, single drone."""

    def __init__(self, model=DroneModel.CF2X, g=G):
        c = consts(model)
        self.KF, self.GRAVITY = c["kf"], g * c["m"]
        self.P_FOR = np.array([0.4, 0.4, 1.25])
        self.I_FOR = np.array([0.05, 0.05, 0.05])
        self.D_FOR = np.array([0.2, 0.2, 0.5])
        self.P_TOR = np.array([70000.0, 70000.0, 60000.0])
        self.I_TOR = np.array([0.0, 0.0, 500.0])
        self.D_TOR = np.array([20000.0, 20000.0, 12000.0])
        self.SCALE, self.CONST = 0.2685, 4070.3
        self.MIN_PWM, self.MAX_PWM = 20000.0, 65535.0
        if model == DroneModel.CF2X:
            self.MIXER = np.array(
                [[-0.5, -0.5, -1], [-0.5, 0.5, 1], [0.5, 0.5, -1], [0.5, -0.5, 1]]
            )
        else:
            self.MIXER = np.array([[0, -1, -1], [1, 0, 1], [0, 1, -1], [-1, 0, 1]])
        self.reset()

    def reset(self):
        self.last_rpy = np.zeros(3)
        self.integral_pos_e = np.zeros(3)
        self.integral_rpy_e = np.zeros(3)

    def compute(self, dt, pos, quat, vel, target_pos,
                target_rpy=np.zeros(3), target_vel=np.zeros(3),
                target_rpy_rates=np.zeros(3)):
        R = Rotation.from_quat(quat).as_matrix()
        pos_e = target_pos - pos
        vel_e = target_vel - vel
        self.integral_pos_e = np.clip(self.integral_pos_e + pos_e * dt, -2.0, 2.0)
        self.integral_pos_e[2] = np.clip(self.integral_pos_e[2], -0.15, 0.15)
        target_thrust = (
            self.P_FOR * pos_e + self.I_FOR * self.integral_pos_e
            + self.D_FOR * vel_e + np.array([0, 0, self.GRAVITY])
        )
        scalar_thrust = max(0.0, np.dot(target_thrust, R[:, 2]))
        thrust = (np.sqrt(scalar_thrust / (4 * self.KF)) - self.CONST) / self.SCALE
        target_z = target_thrust / np.linalg.norm(target_thrust)
        xc = np.array([np.cos(target_rpy[2]), np.sin(target_rpy[2]), 0.0])
        target_y = np.cross(target_z, xc) / np.linalg.norm(np.cross(target_z, xc))
        target_x = np.cross(target_y, target_z)
        target_rotation = np.vstack([target_x, target_y, target_z]).T
        target_euler = Rotation.from_matrix(target_rotation).as_euler("XYZ")
        # Attitude loop
        cur_rpy = Rotation.from_quat(quat).as_euler("xyz")
        tgt_R = Rotation.from_euler("XYZ", target_euler).as_matrix()
        rme = tgt_R.T @ R - R.T @ tgt_R
        rot_e = np.array([rme[2, 1], rme[0, 2], rme[1, 0]])
        rpy_rates_e = target_rpy_rates - (cur_rpy - self.last_rpy) / dt
        self.last_rpy = cur_rpy
        self.integral_rpy_e = np.clip(self.integral_rpy_e - rot_e * dt, -1500.0, 1500.0)
        self.integral_rpy_e[0:2] = np.clip(self.integral_rpy_e[0:2], -1.0, 1.0)
        target_torques = np.clip(
            -self.P_TOR * rot_e + self.D_TOR * rpy_rates_e + self.I_TOR * self.integral_rpy_e,
            -3200, 3200,
        )
        pwm = np.clip(thrust + self.MIXER @ target_torques, self.MIN_PWM, self.MAX_PWM)
        return self.SCALE * pwm + self.CONST, pos_e, target_euler[2] - cur_rpy[2]
