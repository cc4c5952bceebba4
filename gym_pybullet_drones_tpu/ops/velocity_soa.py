"""Fused structure-of-arrays kernel for the VelocityAviary hot path.

The general env step (`envs/base.py`) is written in array-of-structures form —
(E, N, 3) positions, (E, N, 4) quaternions — which reads naturally but breaks
XLA's elementwise fusion at every stack/concat/einsum: on TPU the 4096-drone
step compiles to a long serial chain of small kernels whose fixed per-op cost
dominates (measured ~209 us per batch step at 4096 drones).

This module re-expresses the same math in structure-of-arrays form: every
state component is a flat (E,) array and every operation is a scalar
expression over those arrays — no reshapes, no concatenations, no matmuls —
so XLA fuses the whole control step (DSLPID velocity pipeline + 5 PYB physics
substeps) into a handful of elementwise kernels.

The math mirrors, term for term:
  * `control/dsl_pid.py` (velocity pipeline of VelocityAviary.py:129-168 with
    target_pos = cur_pos, so pos_e == 0)
  * `core/dynamics.substep_pyb` with Physics.PYB flags (thrust at prop
    offsets, yaw reaction torque, Newton-Euler, axis-angle quat update,
    ground clamp)
and is verified against them to float32 tolerance in tests/test_soa.py.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.params import DroneParams
from gym_pybullet_drones_tpu.control.dsl_pid import DSLPIDParams
from gym_pybullet_drones_tpu.ops.tpu_math import asin as _asin, atan2 as _atan2

# State component names: position, quaternion (xyzw), velocity, world angular
# velocity, last RPM per motor, PID integrals and last-rpy memory.
SOA_KEYS = (
    "px", "py", "pz", "qx", "qy", "qz", "qw", "vx", "vy", "vz",
    "wx", "wy", "wz", "r0", "r1", "r2", "r3",
    "ipx", "ipy", "ipz", "irx", "iry", "irz", "lrx", "lry", "lrz",
)


def soa_from_state(state) -> Dict[str, jax.Array]:
    """AviaryState (leaves (E, 1, d)) -> dict of (E,) component arrays."""
    kin = state.kin
    assert kin.pos.shape[-2] == 1, (
        f"SoA fast path is single-drone-per-env (got N={kin.pos.shape[-2]}); "
        "use the general envs/base step for multi-drone aviaries")
    sq = lambda x, i: x[..., 0, i]
    s = {}
    for i, k in enumerate(("px", "py", "pz")):
        s[k] = sq(kin.pos, i)
    for i, k in enumerate(("qx", "qy", "qz", "qw")):
        s[k] = sq(kin.quat, i)
    for i, k in enumerate(("vx", "vy", "vz")):
        s[k] = sq(kin.vel, i)
    for i, k in enumerate(("wx", "wy", "wz")):
        s[k] = sq(kin.ang_v, i)
    for i, k in enumerate(("r0", "r1", "r2", "r3")):
        s[k] = sq(state.last_rpm, i)
    for i, k in enumerate(("ipx", "ipy", "ipz")):
        s[k] = sq(state.ctrl.integral_pos_e, i)
    for i, k in enumerate(("irx", "iry", "irz")):
        s[k] = sq(state.ctrl.integral_rpy_e, i)
    for i, k in enumerate(("lrx", "lry", "lrz")):
        s[k] = sq(state.ctrl.last_rpy, i)
    return s


def soa_to_state(s: Dict[str, jax.Array], template):
    """dict of (E,) arrays -> AviaryState with the template's structure.

    rpy_rates follows `core/dynamics.substep_pyb`: R(quat)^T @ ang_v,
    recomputed from the ADVANCED columns (not the template's stale value).
    """
    pack = lambda ks: jnp.stack([s[k] for k in ks], -1)[:, None, :]
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rot_cols_from_quat(
        s["qx"], s["qy"], s["qz"], s["qw"])
    wx, wy, wz = s["wx"], s["wy"], s["wz"]
    rpy_rates = jnp.stack([r00 * wx + r10 * wy + r20 * wz,
                           r01 * wx + r11 * wy + r21 * wz,
                           r02 * wx + r12 * wy + r22 * wz], -1)[:, None, :]
    kin = template.kin.replace(
        pos=pack(("px", "py", "pz")),
        quat=pack(("qx", "qy", "qz", "qw")),
        vel=pack(("vx", "vy", "vz")),
        ang_v=pack(("wx", "wy", "wz")),
        rpy_rates=rpy_rates,
    )
    return template.replace(
        kin=kin,
        last_rpm=pack(("r0", "r1", "r2", "r3")),
        ctrl=template.ctrl.replace(
            integral_pos_e=pack(("ipx", "ipy", "ipz")),
            integral_rpy_e=pack(("irx", "iry", "irz")),
            last_rpy=pack(("lrx", "lry", "lrz")),
        ),
    )


def _rot_cols_from_quat(qx, qy, qz, qw):
    """Rotation-matrix entries from an xyzw quaternion (quat_to_matrix)."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx_, wy_, wz_ = qw * qx, qw * qy, qw * qz
    r00 = 1 - 2 * (yy + zz); r01 = 2 * (xy - wz_); r02 = 2 * (xz + wy_)
    r10 = 2 * (xy + wz_); r11 = 1 - 2 * (xx + zz); r12 = 2 * (yz - wx_)
    r20 = 2 * (xz - wy_); r21 = 2 * (yz + wx_); r22 = 1 - 2 * (xx + yy)
    return r00, r01, r02, r10, r11, r12, r20, r21, r22


def soa_consts(cp: DSLPIDParams, dp: DroneParams) -> Dict[str, object]:
    """Extract all pytree parameters as plain Python floats (must run OUTSIDE
    jit — under tracing, ops on closure arrays yield tracers)."""
    return dict(
        p_for=[float(cp.p_for[i]) for i in range(3)],
        i_for=[float(cp.i_for[i]) for i in range(3)],
        d_for=[float(cp.d_for[i]) for i in range(3)],
        p_tor=[float(cp.p_tor[i]) for i in range(3)],
        i_tor=[float(cp.i_tor[i]) for i in range(3)],
        d_tor=[float(cp.d_tor[i]) for i in range(3)],
        mixer=[[float(cp.mixer[m, k]) for k in range(3)] for m in range(4)],
        scale=float(cp.pwm2rpm_scale), const=float(cp.pwm2rpm_const),
        min_pwm=float(cp.min_pwm), max_pwm=float(cp.max_pwm),
        kf_c=float(cp.kf), grav=float(cp.gravity),
        # physics half shared with the SoA swarm step (ops/swarm_soa.py)
        **physics_consts(dp),
    )


def physics_consts(dp: DroneParams) -> Dict[str, object]:
    """`physics_substep_soa`'s constants as plain floats (run OUTSIDE jit)."""
    return dict(
        kf=float(dp.kf), km=float(dp.km), yaw_sign=float(dp.yaw_sign),
        m_=float(dp.m), g_=float(dp.g),
        J=[float(dp.J[i, i]) for i in range(3)],
        Jinv=[float(dp.J_inv[i, i]) for i in range(3)],
        offs=[[float(dp.prop_offsets[p_, k]) for k in range(3)] for p_ in range(4)],
        z_min=float(dp.collision_h) / 2.0 - float(dp.collision_z_offset),
    )


def physics_substep_soa(c: Dict[str, object], pyb_dt,
                        px, py, pz, qx, qy, qz, qw,
                        vx, vy, vz, wx, wy, wz, rpm, fz_body=None):
    """One Physics.PYB substep over SoA columns (the exact op sequence of
    `core/dynamics.substep_pyb` without aero terms): thrust at prop offsets,
    yaw reaction torque, Newton-Euler, axis-angle quat update, plane clamp.
    ``rpm`` is a list of four (E,) motor-speed columns. ``fz_body`` is an
    optional externally-computed body-z COM force column (the Pallas wake
    sum, ops/swarm_soa.py) entering the force assembly exactly like
    `substep_pyb`'s dense dw term — torque-free, and included in the accel
    used by the resting-contact test. Shared by the velocity-env hot path
    and the SoA coupled-swarm step.
    """
    kf, km, yaw_sign = c["kf"], c["km"], c["yaw_sign"]
    m_, g_ = c["m_"], c["g_"]
    J, Jinv, offs, z_min = c["J"], c["Jinv"], c["offs"], c["z_min"]

    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rot_cols_from_quat(qx, qy, qz, qw)
    f = [rpm[m] * rpm[m] * kf for m in range(4)]
    t_m = [rpm[m] * rpm[m] * km * yaw_sign for m in range(4)]
    tau_z = -t_m[0] + t_m[1] - t_m[2] + t_m[3]
    tau_x = f[0] * offs[0][1] + f[1] * offs[1][1] + f[2] * offs[2][1] + f[3] * offs[3][1]
    tau_y = -(f[0] * offs[0][0] + f[1] * offs[1][0] + f[2] * offs[2][0] + f[3] * offs[3][0])
    fsum = f[0] + f[1] + f[2] + f[3]
    if fz_body is not None:
        fsum = fsum + fz_body
    axw, ayw, azw = r02 * fsum / m_, r12 * fsum / m_, r22 * fsum / m_ - g_
    nvx, nvy, nvz = vx + pyb_dt * axw, vy + pyb_dt * ayw, vz + pyb_dt * azw

    # omega world -> body: R^T w
    obx = r00 * wx + r10 * wy + r20 * wz
    oby = r01 * wx + r11 * wy + r21 * wz
    obz = r02 * wx + r12 * wy + r22 * wz
    # coupling = w x (J w) (J diagonal)
    cx = oby * (J[2] * obz) - obz * (J[1] * oby)
    cy = obz * (J[0] * obx) - obx * (J[2] * obz)
    cz = obx * (J[1] * oby) - oby * (J[0] * obx)
    nbx = obx + pyb_dt * Jinv[0] * (tau_x - cx)
    nby = oby + pyb_dt * Jinv[1] * (tau_y - cy)
    nbz = obz + pyb_dt * Jinv[2] * (tau_z - cz)
    nwx = r00 * nbx + r01 * nby + r02 * nbz
    nwy = r10 * nbx + r11 * nby + r12 * nbz
    nwz = r20 * nbx + r21 * nby + r22 * nbz

    npx, npy, npz = px + pyb_dt * nvx, py + pyb_dt * nvy, pz + pyb_dt * nvz

    # integrate_quat (axis-angle, body rates nb)
    onorm = jnp.sqrt(nbx * nbx + nby * nby + nbz * nbz)
    sn = jnp.maximum(onorm, 1e-9)
    theta = sn * pyb_dt / 2.0
    ct, st = jnp.cos(theta), jnp.sin(theta) / sn
    mqx = nbz * qy - nby * qz + nbx * qw
    mqy = -nbz * qx + nbx * qz + nby * qw
    mqz = nby * qx - nbx * qy + nbz * qw
    mqw = -nbx * qx - nby * qy - nbz * qz
    big = onorm > 1e-9
    nqx = jnp.where(big, ct * qx + st * mqx, qx)
    nqy = jnp.where(big, ct * qy + st * mqy, qy)
    nqz = jnp.where(big, ct * qz + st * mqz, qz)
    nqw = jnp.where(big, ct * qw + st * mqw, qw)
    qn = jnp.sqrt(nqx * nqx + nqy * nqy + nqz * nqz + nqw * nqw)
    nqx, nqy, nqz, nqw = nqx / qn, nqy / qn, nqz / qn, nqw / qn

    # plane contact clamp
    below = npz < z_min
    npz = jnp.where(below, z_min, npz)
    nvz = jnp.where(below, jnp.maximum(nvz, 0.0), nvz)
    pressed = below & (azw <= 0.0)
    nwx = jnp.where(pressed, 0.0, nwx)
    nwy = jnp.where(pressed, 0.0, nwy)
    nwz = jnp.where(pressed, 0.0, nwz)

    return (npx, npy, npz, nqx, nqy, nqz, nqw, nvx, nvy, nvz, nwx, nwy, nwz)


def velocity_step_soa(consts: Dict[str, object], ctrl_dt, pyb_dt,
                      n_substeps: int, speed_limit,
                      s: Dict[str, jax.Array],
                      ax, ay, az, amag) -> Dict[str, jax.Array]:
    """One VelocityAviary control step in SoA form.

    `s` maps SOA_KEYS to (E,) arrays; (ax, ay, az, amag) is the velocity
    command; `consts` comes from `soa_consts` (plain floats, safe under jit).
    Returns the updated dict.
    """
    c = consts
    p_for, i_for, d_for = c["p_for"], c["i_for"], c["d_for"]
    p_tor, i_tor, d_tor = c["p_tor"], c["i_tor"], c["d_tor"]
    mixer = c["mixer"]
    scale, const = c["scale"], c["const"]
    min_pwm, max_pwm = c["min_pwm"], c["max_pwm"]
    kf_c, grav = c["kf_c"], c["grav"]

    px, py, pz = s["px"], s["py"], s["pz"]
    qx, qy, qz, qw = s["qx"], s["qy"], s["qz"], s["qw"]
    vx, vy, vz = s["vx"], s["vy"], s["vz"]
    wx, wy, wz = s["wx"], s["wy"], s["wz"]
    ipz_ = [s["ipx"], s["ipy"], s["ipz"]]
    ir = [s["irx"], s["iry"], s["irz"]]
    lr = [s["lrx"], s["lry"], s["lrz"]]

    # ---------------- DSLPID, velocity pipeline --------------------------
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rot_cols_from_quat(qx, qy, qz, qw)
    # PyBullet-convention rpy (quat_to_euler_xyz)
    # Pallas-compatible inverse trig (ops/tpu_math; ~1e-7 vs jnp.arctan2)
    cur_roll = _atan2(r21, r22)
    cur_pitch = _asin(jnp.clip(-r20, -1.0, 1.0))
    cur_yaw = _atan2(r10, r00)

    vnorm = jnp.sqrt(ax * ax + ay * ay + az * az)
    safe = jnp.maximum(vnorm, 1e-12)
    fac = jnp.where(vnorm > 0, speed_limit * jnp.abs(amag) / safe, 0.0)
    tvx, tvy, tvz = ax * fac, ay * fac, az * fac

    # pos_e == 0 (target_pos = cur_pos, VelocityAviary.py:164); integrals are
    # clipped but unchanged.
    ip = [jnp.clip(ipz_[0], -2.0, 2.0), jnp.clip(ipz_[1], -2.0, 2.0),
          jnp.clip(jnp.clip(ipz_[2], -2.0, 2.0), -0.15, 0.15)]
    ex, ey, ez = tvx - vx, tvy - vy, tvz - vz
    ttx = i_for[0] * ip[0] + d_for[0] * ex
    tty = i_for[1] * ip[1] + d_for[1] * ey
    ttz = i_for[2] * ip[2] + d_for[2] * ez + grav
    scalar_thrust = jnp.maximum(0.0, ttx * r02 + tty * r12 + ttz * r22)
    thrust_pwm = (jnp.sqrt(scalar_thrust / (4.0 * kf_c)) - const) / scale
    tnorm = jnp.sqrt(ttx * ttx + tty * tty + ttz * ttz)
    zdx, zdy, zdz = ttx / tnorm, tty / tnorm, ttz / tnorm
    # target x_c from current yaw (target_rpy = [0, 0, yaw])
    cyaw, syaw = jnp.cos(cur_yaw), jnp.sin(cur_yaw)
    # y_des = normalize(z_des x x_c)
    yx = zdy * 0.0 - zdz * syaw
    yy = zdz * cyaw - zdx * 0.0
    yz = zdx * syaw - zdy * cyaw
    yn = jnp.sqrt(yx * yx + yy * yy + yz * yz)
    yx, yy, yz = yx / yn, yy / yn, yz / yn
    # x_des = y_des x z_des
    xx_ = yy * zdz - yz * zdy
    xy_ = yz * zdx - yx * zdz
    xz_ = yx * zdy - yy * zdx
    # Target rotation has columns (x_des, y_des, z_des); reference converts
    # matrix -> intrinsic-XYZ euler -> matrix (a float no-op); we use the
    # matrix directly.
    d00, d01, d02 = xx_, yx, zdx
    d10, d11, d12 = xy_, yy, zdy
    d20, d21, d22 = xz_, yz, zdz

    # rot_matrix_e = Rd^T R - R^T Rd, vee components [ (2,1), (0,2), (1,0) ]
    # (Rd^T R)[i][j] = d_col_i . r_col_j ; r cols: c0=(r00,r10,r20) etc.
    def dcol(i):
        return ((d00, d10, d20), (d01, d11, d21), (d02, d12, d22))[i]

    def rcol(j):
        return ((r00, r10, r20), (r01, r11, r21), (r02, r12, r22))[j]

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    e21 = dot3(dcol(2), rcol(1)) - dot3(rcol(2), dcol(1))
    e02 = dot3(dcol(0), rcol(2)) - dot3(rcol(0), dcol(2))
    e10 = dot3(dcol(1), rcol(0)) - dot3(rcol(1), dcol(0))
    rot_e = [e21, e02, e10]

    cur_rpy = [cur_roll, cur_pitch, cur_yaw]
    rr_e = [-(cur_rpy[k] - lr[k]) / ctrl_dt for k in range(3)]
    ir = [jnp.clip(ir[k] - rot_e[k] * ctrl_dt, -1500.0, 1500.0) for k in range(3)]
    ir[0] = jnp.clip(ir[0], -1.0, 1.0)
    ir[1] = jnp.clip(ir[1], -1.0, 1.0)
    tq = [jnp.clip(-p_tor[k] * rot_e[k] + d_tor[k] * rr_e[k] + i_tor[k] * ir[k],
                   -3200.0, 3200.0) for k in range(3)]
    rpm = []
    for m in range(4):
        pwm = thrust_pwm + mixer[m][0] * tq[0] + mixer[m][1] * tq[1] + mixer[m][2] * tq[2]
        pwm = jnp.clip(pwm, min_pwm, max_pwm)
        rpm.append(scale * pwm + const)

    new_lr = cur_rpy

    # ---------------- physics substeps (Physics.PYB) ----------------------
    for _ in range(n_substeps):
        (px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz) = (
            physics_substep_soa(c, pyb_dt, px, py, pz, qx, qy, qz, qw,
                                vx, vy, vz, wx, wy, wz, rpm))

    return dict(
        px=px, py=py, pz=pz, qx=qx, qy=qy, qz=qz, qw=qw,
        vx=vx, vy=vy, vz=vz, wx=wx, wy=wy, wz=wz,
        r0=rpm[0], r1=rpm[1], r2=rpm[2], r3=rpm[3],
        ipx=ip[0], ipy=ip[1], ipz=ip[2],
        irx=ir[0], iry=ir[1], irz=ir[2],
        lrx=new_lr[0], lry=new_lr[1], lrz=new_lr[2],
    )
