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


def _ground_effect_prop_forces(pos, R, rpy, rpm, c):
    """Per-prop ground-effect increments (BaseAviary._groundEffect, :715-752)."""
    offs = np.asarray(c["prop_offsets"], dtype=np.float64)  # (4, 3)
    prop_z = pos[2] + offs @ R[2, :]
    heights = np.clip(prop_z, c["gnd_eff_h_clip"], np.inf)
    ge = (
        np.asarray(rpm, dtype=np.float64) ** 2
        * c["kf"]
        * c["gnd_eff_coeff"]
        * (c["prop_radius"] / (4.0 * heights)) ** 2
    )
    if abs(rpy[0]) < np.pi / 2 and abs(rpy[1]) < np.pi / 2:
        return ge
    return np.zeros(4)


def _downwash_body_z(pos_all, k, c):
    """Summed downwash magnitude on drone k along its body -z
    (BaseAviary._downwash, :785-811): every drone i strictly above k within
    10 m lateral distance contributes -alpha * exp(-0.5 (dxy/beta)^2)."""
    total = 0.0
    for i in range(len(pos_all)):
        delta = pos_all[i] - pos_all[k]
        dz = delta[2]
        dxy = np.linalg.norm(delta[0:2])
        if dz > 0 and dxy < 10.0:
            alpha = c["dw_coeff_1"] * (c["prop_radius"] / (4.0 * dz)) ** 2
            beta = c["dw_coeff_2"] * dz + c["dw_coeff_3"]
            total += -alpha * np.exp(-0.5 * (dxy / beta) ** 2)
    return total


def pyb_substep_fleet(
    pos, quat, vel, ang_v, rpm, last_rpm, c, dt,
    model=DroneModel.CF2X,
    gnd=False, drag=False, dw=False, contact=True,
):
    """One PyBullet-compatible substep for an (N, ·) fleet, float64 NumPy.

    Independent implementation of the force-level pipeline the reference feeds
    PyBullet (BaseAviary._physics :679-711 + aero terms :715-811, stepped by
    stepSimulation :370): per-prop thrusts at the prop link offsets, yaw
    reaction torque, optional ground effect / drag (previous substep's action)
    / downwash, semi-implicit Euler with body-frame Newton-Euler rotation and
    a plane-contact clamp standing in for Bullet's constraint solver (see
    docs/PYB_DERIVATION.md for the derivation and deviation bounds).

    ``ang_v`` is world-frame. Arrays are modified copies; returns the new
    (pos, quat, vel, ang_v) tuple.
    """
    n = len(pos)
    pos, quat = np.array(pos, dtype=np.float64), np.array(quat, dtype=np.float64)
    vel, ang_v = np.array(vel, dtype=np.float64), np.array(ang_v, dtype=np.float64)
    offs = np.asarray(c["prop_offsets"], dtype=np.float64)
    # Downwash must read a SNAPSHOT of the fleet (the reference applies all
    # forces from the same pre-step kinematics before one stepSimulation —
    # Jacobi, not Gauss-Seidel): without this, drone k's wake would see the
    # already-updated positions of drones i < k, making the oracle
    # drone-order-dependent.
    pos_snapshot = pos.copy()
    for j in range(n):
        R = Rotation.from_quat(quat[j]).as_matrix()
        rpy = Rotation.from_quat(quat[j]).as_euler("xyz")
        forces = np.asarray(rpm[j], dtype=np.float64) ** 2 * c["kf"]
        z_torques = np.asarray(rpm[j], dtype=np.float64) ** 2 * c["km"]
        if model == DroneModel.RACE:
            z_torques = -z_torques
        z_torque = -z_torques[0] + z_torques[1] - z_torques[2] + z_torques[3]
        prop_forces = forces
        if gnd:
            prop_forces = prop_forces + _ground_effect_prop_forces(
                pos[j], R, rpy, rpm[j], c)
        tau_x = np.dot(prop_forces, offs[:, 1])
        tau_y = -np.dot(prop_forces, offs[:, 0])
        torques_body = np.array([tau_x, tau_y, z_torque])
        force_world = R[:, 2] * np.sum(prop_forces)
        if drag:
            drag_coeff = np.array(
                [c["drag_coeff_xy"], c["drag_coeff_xy"], c["drag_coeff_z"]])
            omega_sum = np.sum(2.0 * np.pi * np.asarray(last_rpm[j]) / 60.0)
            force_world = force_world + (-drag_coeff * omega_sum * vel[j])
        if dw:
            force_world = force_world + R[:, 2] * _downwash_body_z(
                pos_snapshot, j, c)
        accel = force_world / c["m"] - np.array([0.0, 0.0, G])
        new_vel = vel[j] + dt * accel
        omega_body = R.T @ ang_v[j]
        coupling = np.cross(omega_body, c["J"] @ omega_body)
        new_omega_body = omega_body + dt * (c["J_inv"] @ (torques_body - coupling))
        new_ang_v = R @ new_omega_body
        new_pos = pos[j] + dt * new_vel
        new_quat = integrate_q(quat[j], new_omega_body, dt)
        new_quat = new_quat / np.linalg.norm(new_quat)
        if contact:
            z_min = c["collision_h"] / 2.0 - c["collision_z_offset"]
            if new_pos[2] < z_min:
                new_pos[2] = z_min
                new_vel[2] = max(new_vel[2], 0.0)
                if accel[2] <= 0.0:
                    new_ang_v = np.zeros(3)
        pos[j], quat[j], vel[j], ang_v[j] = new_pos, new_quat, new_vel, new_ang_v
    return pos, quat, vel, ang_v


# ---------------------------------------------------------------------------
# Sequential-impulse contact solver (float64 twin of core/contact.py).
# Same algorithm and constants as the JAX implementation — Bullet's velocity-
# level LCP pass (restitution 0, Coulomb friction box-clamped per tangent,
# Baumgarte erp=0.2 after 1 mm slop, speculative contacts within the 0.02 m
# breaking threshold, 10 Gauss-Seidel iterations, friction rows after normal
# rows). See docs/PYB_DERIVATION.md §5 for derivation and deviation bounds.
# ---------------------------------------------------------------------------

CONTACT_N_ITER = 10
CONTACT_ERP = 0.2
CONTACT_SLOP = 0.001
CONTACT_BREAKING = 0.02
CONTACT_MU_PLANE = 0.5
CONTACT_MU_PAIR = 0.25
CONTACT_RIM_SAMPLES = 8


def _rim_points(c):
    th = 2.0 * np.pi * np.arange(CONTACT_RIM_SAMPLES) / CONTACT_RIM_SAMPLES
    xy = np.stack([np.cos(th), np.sin(th)], -1) * c["collision_r"]
    pts = []
    for s in (-1.0, 1.0):
        z = np.full((CONTACT_RIM_SAMPLES, 1),
                    c["collision_z_offset"] + s * c["collision_h"] / 2.0)
        pts.append(np.concatenate([xy, z], -1))
    return np.concatenate(pts, 0)  # (C, 3)


def _target_vn(d, dt):
    d_eff = d + CONTACT_SLOP
    return -d_eff / dt if d_eff > 0.0 else -CONTACT_ERP * d_eff / dt


def _tangents(n):
    ref = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    t1 = np.cross(n, ref)
    t1 = t1 / max(np.linalg.norm(t1), 1e-9)
    return t1, np.cross(n, t1)


def contact_solve_fleet(pos, quat, vel, ang_v, c, dt, *, drone_drone=False,
                        obstacle_pos=None, obstacle_r=None):
    """Gauss-Seidel impulse solve on the PRE-integration pose. Returns
    corrected (vel, ang_v) copies. Mirrors core/contact.py::solve_contacts:
    per iteration — plane normal rows (all drones, contacts in rim order),
    pair normal rows (triu order), obstacle normal rows, then the friction
    rows in the same grouping (t1 then t2 per contact)."""
    n = len(pos)
    vel = np.array(vel, dtype=np.float64)
    ang_v = np.array(ang_v, dtype=np.float64)
    inv_m = 1.0 / c["m"]
    J_inv = c["J_inv"]
    Rs = [Rotation.from_quat(quat[k]).as_matrix() for k in range(n)]
    I_inv_w = [R @ J_inv @ R.T for R in Rs]
    pts = _rim_points(c)
    C = len(pts)
    ez = np.array([0.0, 0.0, 1.0])
    ex = np.array([1.0, 0.0, 0.0])
    ey = np.array([0.0, 1.0, 0.0])

    # Plane rows
    plane = []  # per drone: list of (r, d, Jn, Jt1, Jt2, kn, kt1, kt2)
    for k in range(n):
        rows = []
        for ci in range(C):
            r = Rs[k] @ pts[ci]
            d = pos[k][2] + r[2]
            Jn = I_inv_w[k] @ np.cross(r, ez)
            Jt1 = I_inv_w[k] @ np.cross(r, ex)
            Jt2 = I_inv_w[k] @ np.cross(r, ey)
            kn = inv_m + np.dot(np.cross(r, ez), Jn)
            kt1 = inv_m + np.dot(np.cross(r, ex), Jt1)
            kt2 = inv_m + np.dot(np.cross(r, ey), Jt2)
            rows.append((r, d, Jn, Jt1, Jt2, kn, kt1, kt2))
        plane.append(rows)
    lam_pl = np.zeros((C, n))
    lam_pl_t = np.zeros((C, n, 2))

    # Pair rows (sphere radius = collision_r, contact at the midpoint)
    pairs = []
    if drone_drone and n > 1:
        radius = c["collision_r"]
        for i in range(n):
            for j in range(i + 1, n):
                delta = pos[i] - pos[j]
                dist = np.linalg.norm(delta)
                nrm = delta / max(dist, 1e-9)
                d = dist - 2.0 * radius
                point = 0.5 * (pos[i] + pos[j])
                r_i, r_j = point - pos[i], point - pos[j]
                t1, t2 = _tangents(nrm)
                row = dict(i=i, j=j, n=nrm, d=d, r_i=r_i, r_j=r_j, t1=t1, t2=t2)
                for name, axis in (("n", nrm), ("t1", t1), ("t2", t2)):
                    Ji = I_inv_w[i] @ np.cross(r_i, axis)
                    Jj = I_inv_w[j] @ np.cross(r_j, axis)
                    row["J%s_i" % name], row["J%s_j" % name] = Ji, Jj
                    row["k%s" % name] = (2.0 * inv_m
                                         + np.dot(np.cross(r_i, axis), Ji)
                                         + np.dot(np.cross(r_j, axis), Jj))
                pairs.append(row)
    lam_p = np.zeros(len(pairs))
    lam_p_t = np.zeros((len(pairs), 2))

    # Obstacle rows
    obs = []
    if obstacle_pos is not None:
        radius = c["collision_r"]
        for mi in range(len(obstacle_pos)):
            for k in range(n):
                delta = pos[k] - obstacle_pos[mi]
                dist = np.linalg.norm(delta)
                nrm = delta / max(dist, 1e-9)
                d = dist - (radius + obstacle_r[mi])
                r = -radius * nrm
                t1, t2 = _tangents(nrm)
                row = dict(k=k, n=nrm, d=d, r=r, t1=t1, t2=t2)
                for name, axis in (("n", nrm), ("t1", t1), ("t2", t2)):
                    J = I_inv_w[k] @ np.cross(r, axis)
                    row["J%s" % name] = J
                    row["k%s" % name] = inv_m + np.dot(np.cross(r, axis), J)
                obs.append(row)
    lam_o = np.zeros(len(obs))
    lam_o_t = np.zeros((len(obs), 2))

    for _ in range(CONTACT_N_ITER):
        # plane normal rows (contact-major to match the JAX scan order)
        for ci in range(C):
            for k in range(n):
                r, d, Jn, _, _, kn, _, _ = plane[k][ci]
                if d >= CONTACT_BREAKING:
                    continue
                u_n = vel[k][2] + ang_v[k][0] * r[1] - ang_v[k][1] * r[0]
                dlam = (_target_vn(d, dt) - u_n) / kn
                new = max(lam_pl[ci, k] + dlam, 0.0)
                a = new - lam_pl[ci, k]
                lam_pl[ci, k] = new
                vel[k][2] += a * inv_m
                ang_v[k] += a * Jn
        # pair normal rows
        for pi_, row in enumerate(pairs):
            if row["d"] >= CONTACT_BREAKING:
                continue
            i, j = row["i"], row["j"]
            u = (vel[i] + np.cross(ang_v[i], row["r_i"])
                 - vel[j] - np.cross(ang_v[j], row["r_j"]))
            un = np.dot(u, row["n"])
            dlam = (_target_vn(row["d"], dt) - un) / row["kn"]
            new = max(lam_p[pi_] + dlam, 0.0)
            a = new - lam_p[pi_]
            lam_p[pi_] = new
            vel[i] += a * inv_m * row["n"]
            vel[j] -= a * inv_m * row["n"]
            ang_v[i] += a * row["Jn_i"]
            ang_v[j] -= a * row["Jn_j"]
        # obstacle normal rows
        for oi, row in enumerate(obs):
            if row["d"] >= CONTACT_BREAKING:
                continue
            k = row["k"]
            u = vel[k] + np.cross(ang_v[k], row["r"])
            un = np.dot(u, row["n"])
            dlam = (_target_vn(row["d"], dt) - un) / row["kn"]
            new = max(lam_o[oi] + dlam, 0.0)
            a = new - lam_o[oi]
            lam_o[oi] = new
            vel[k] += a * inv_m * row["n"]
            ang_v[k] += a * row["Jn"]
        # plane friction rows
        for ci in range(C):
            for k in range(n):
                r, d, _, Jt1, Jt2, _, kt1, kt2 = plane[k][ci]
                if d >= CONTACT_BREAKING:
                    continue
                limit = CONTACT_MU_PLANE * lam_pl[ci, k]
                for ti, (tdir, Jt, kt) in enumerate(
                        ((ex, Jt1, kt1), (ey, Jt2, kt2))):
                    u = vel[k] + np.cross(ang_v[k], r)
                    dlam = -np.dot(u, tdir) / kt
                    new = np.clip(lam_pl_t[ci, k, ti] + dlam, -limit, limit)
                    a = new - lam_pl_t[ci, k, ti]
                    lam_pl_t[ci, k, ti] = new
                    vel[k] += a * inv_m * tdir
                    ang_v[k] += a * Jt
        # pair friction rows
        for pi_, row in enumerate(pairs):
            if row["d"] >= CONTACT_BREAKING:
                continue
            i, j = row["i"], row["j"]
            limit = CONTACT_MU_PAIR * lam_p[pi_]
            for ti, name in enumerate(("t1", "t2")):
                u = (vel[i] + np.cross(ang_v[i], row["r_i"])
                     - vel[j] - np.cross(ang_v[j], row["r_j"]))
                dlam = -np.dot(u, row[name]) / row["k%s" % name]
                new = np.clip(lam_p_t[pi_, ti] + dlam, -limit, limit)
                a = new - lam_p_t[pi_, ti]
                lam_p_t[pi_, ti] = new
                vel[i] += a * inv_m * row[name]
                vel[j] -= a * inv_m * row[name]
                ang_v[i] += a * row["J%s_i" % name]
                ang_v[j] -= a * row["J%s_j" % name]
        # obstacle friction rows
        for oi, row in enumerate(obs):
            if row["d"] >= CONTACT_BREAKING:
                continue
            k = row["k"]
            limit = CONTACT_MU_PAIR * lam_o[oi]
            for ti, name in enumerate(("t1", "t2")):
                u = vel[k] + np.cross(ang_v[k], row["r"])
                dlam = -np.dot(u, row[name]) / row["k%s" % name]
                new = np.clip(lam_o_t[oi, ti] + dlam, -limit, limit)
                a = new - lam_o_t[oi, ti]
                lam_o_t[oi, ti] = new
                vel[k] += a * inv_m * row[name]
                ang_v[k] += a * row["J%s" % name]
    return vel, ang_v


def pyb_substep_fleet_impulse(
    pos, quat, vel, ang_v, rpm, last_rpm, c, dt,
    model=DroneModel.CF2X,
    gnd=False, drag=False, dw=False,
    drone_drone=False, obstacle_pos=None, obstacle_r=None,
):
    """One PYB substep with the sequential-impulse contact model.

    Phase order matches Bullet (and core/dynamics.py's impulse branch):
    force-integrate all velocities from the pre-step pose, contact-solve on
    the pre-step pose, then integrate positions/orientations.
    """
    n = len(pos)
    pos = np.array(pos, dtype=np.float64)
    quat = np.array(quat, dtype=np.float64)
    vel = np.array(vel, dtype=np.float64)
    ang_v = np.array(ang_v, dtype=np.float64)
    offs = np.asarray(c["prop_offsets"], dtype=np.float64)
    pos_snapshot = pos.copy()
    new_vel = np.zeros_like(vel)
    new_ang_v = np.zeros_like(ang_v)
    omega_body_all = np.zeros_like(ang_v)
    Rs = []
    for j in range(n):
        R = Rotation.from_quat(quat[j]).as_matrix()
        Rs.append(R)
        rpy = Rotation.from_quat(quat[j]).as_euler("xyz")
        forces = np.asarray(rpm[j], dtype=np.float64) ** 2 * c["kf"]
        z_torques = np.asarray(rpm[j], dtype=np.float64) ** 2 * c["km"]
        if model == DroneModel.RACE:
            z_torques = -z_torques
        z_torque = -z_torques[0] + z_torques[1] - z_torques[2] + z_torques[3]
        prop_forces = forces
        if gnd:
            prop_forces = prop_forces + _ground_effect_prop_forces(
                pos[j], R, rpy, rpm[j], c)
        torques_body = np.array([np.dot(prop_forces, offs[:, 1]),
                                 -np.dot(prop_forces, offs[:, 0]), z_torque])
        force_world = R[:, 2] * np.sum(prop_forces)
        if drag:
            drag_coeff = np.array(
                [c["drag_coeff_xy"], c["drag_coeff_xy"], c["drag_coeff_z"]])
            omega_sum = np.sum(2.0 * np.pi * np.asarray(last_rpm[j]) / 60.0)
            force_world = force_world + (-drag_coeff * omega_sum * vel[j])
        if dw:
            force_world = force_world + R[:, 2] * _downwash_body_z(
                pos_snapshot, j, c)
        accel = force_world / c["m"] - np.array([0.0, 0.0, G])
        new_vel[j] = vel[j] + dt * accel
        omega_body = R.T @ ang_v[j]
        coupling = np.cross(omega_body, c["J"] @ omega_body)
        new_omega_body = omega_body + dt * (c["J_inv"] @ (torques_body - coupling))
        new_ang_v[j] = R @ new_omega_body
    new_vel, new_ang_v = contact_solve_fleet(
        pos, quat, new_vel, new_ang_v, c, dt, drone_drone=drone_drone,
        obstacle_pos=obstacle_pos, obstacle_r=obstacle_r)
    for j in range(n):
        omega_body_all[j] = Rs[j].T @ new_ang_v[j]
        pos[j] = pos[j] + dt * new_vel[j]
        q = integrate_q(quat[j], omega_body_all[j], dt)
        quat[j] = q / np.linalg.norm(q)
    return pos, quat, new_vel, new_ang_v


def pyb_step_fleet_impulse(pos, quat, vel, ang_v, rpm, last_rpm, c, dt,
                           n_substeps, mode="PYB", model=DroneModel.CF2X,
                           drone_drone=False, obstacle_pos=None,
                           obstacle_r=None):
    """n_substeps substeps under the impulse contact model (same last-action
    drag plumbing as pyb_step_fleet)."""
    flags = _PYB_MODE_FLAGS[mode]
    last = np.array(last_rpm, dtype=np.float64)
    for _ in range(n_substeps):
        pos, quat, vel, ang_v = pyb_substep_fleet_impulse(
            pos, quat, vel, ang_v, rpm, last, c, dt, model=model,
            drone_drone=drone_drone, obstacle_pos=obstacle_pos,
            obstacle_r=obstacle_r, **flags)
        last = np.array(rpm, dtype=np.float64)
    return pos, quat, vel, ang_v, last


_PYB_MODE_FLAGS = {
    "PYB": dict(gnd=False, drag=False, dw=False),
    "PYB_GND": dict(gnd=True, drag=False, dw=False),
    "PYB_DRAG": dict(gnd=False, drag=True, dw=False),
    "PYB_DW": dict(gnd=False, drag=False, dw=True),
    "PYB_GND_DRAG_DW": dict(gnd=True, drag=True, dw=True),
}


def pyb_step_fleet(pos, quat, vel, ang_v, rpm, last_rpm, c, dt, n_substeps,
                   mode="PYB", model=DroneModel.CF2X):
    """``n_substeps`` substeps under one control action (BaseAviary.py:343-372).

    The drag term of the first substep uses the previous control period's
    action (``last_rpm``, set at :372 and read at :359); later substeps use the
    current one. Returns the new kinematics plus the carried last action.
    """
    flags = _PYB_MODE_FLAGS[mode]
    last = np.array(last_rpm, dtype=np.float64)
    for _ in range(n_substeps):
        pos, quat, vel, ang_v = pyb_substep_fleet(
            pos, quat, vel, ang_v, rpm, last, c, dt, model=model, **flags)
        last = np.array(rpm, dtype=np.float64)
    return pos, quat, vel, ang_v, last


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
