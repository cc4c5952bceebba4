"""Golden-trajectory generator: float64 oracle flights serialized to npz.

Run `python tests/golden/generate.py` to (re)create the golden files. The
oracle (tests/oracle.py) implements the reference's explicit dynamics and
DSLPID directly from the documented equations in NumPy float64 — PyBullet
itself is not installable here, so this is the tolerance anchor the SURVEY
prescribes (§4): the JAX kernels must match these trajectories to float64
round-off, and stay within the documented float32 budget in production mode.

Configs (mirroring BASELINE.json — all five driver configs now have a golden):
  hover_dyn     — single CF2X, DSLPID to [0,0,1], DYN physics, 240/48 Hz, 4 s
  helix_dyn     — 3 CF2X drones on the pid.py circular waypoint table, 4 s
  helix_pyb     — same helix under Physics.PYB (force pipeline + contact), 4 s
  hover_learn   — HoverAviary learn config (240/30, ONE_D_RPM, PYB): scripted
                  drop-to-ground + thrust sweep, 8.2 s (covers contact clamp,
                  reward, timeout truncation)
  multihover    — MultiHoverAviary 2-drone learn config, 4 s
  downwash_pyb  — 2 stacked drones, PYB_DW, downwash.py geometry, 4 s
  downwash_gdd  — same under PYB_GND_DRAG_DW (all aero terms), 4 s
  velocity_pyb  — 4-drone VelocityAviary slice (piecewise velocity refs), 4 s

The PYB-mode files are *oracle-derived* (PyBullet is not installable in this
image): they anchor the JAX pipeline against an independently-written NumPy
float64 implementation of the same documented force pipeline, per the
derivation + deviation bounds in docs/PYB_DERIVATION.md.
"""

import os

import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from oracle import (  # noqa: E402
    DSLPIDOracle,
    consts,
    dyn_substep,
    pyb_step_fleet,
    pyb_step_fleet_impulse,
)
from gym_pybullet_drones_tpu.envs.spec import DroneModel  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

from scipy.spatial.transform import Rotation  # noqa: E402


def _quats_from_rpys(rpys):
    return np.stack([Rotation.from_euler("xyz", r).as_quat() for r in rpys])


def _obs20(pos, quat, vel, ang_v, last_rpm):
    """Reference 20-dim state vector (BaseAviary._getDroneStateVector, :541-561)."""
    rpy = np.stack([Rotation.from_quat(q).as_euler("xyz") for q in quat])
    return np.concatenate([pos, quat, rpy, vel, ang_v, last_rpm], axis=1)


def _fly_pyb(init_xyzs, init_rpys, target_fn, duration_s, mode="PYB",
             ctrl_hz=48, pyb_hz=240, model=DroneModel.CF2X):
    """Physics-first control loop under the PYB force pipeline (matches the
    step-then-control structure of the example scripts / golden replays)."""
    n = len(init_xyzs)
    c = consts(model)
    pids = [DSLPIDOracle(model=model) for _ in range(n)]
    pos = np.array(init_xyzs, dtype=np.float64)
    quat = _quats_from_rpys(init_rpys)
    vel = np.zeros((n, 3))
    ang_v = np.zeros((n, 3))
    sub = pyb_hz // ctrl_hz
    steps = int(duration_s * ctrl_hz)
    rpm = np.zeros((n, 4))
    last_rpm = np.zeros((n, 4))
    out_pos = np.zeros((steps, n, 3))
    out_quat = np.zeros((steps, n, 4))
    out_vel = np.zeros((steps, n, 3))
    out_ang_v = np.zeros((steps, n, 3))
    out_rpm = np.zeros((steps, n, 4))
    for t in range(steps):
        pos, quat, vel, ang_v, last_rpm = pyb_step_fleet(
            pos, quat, vel, ang_v, rpm, last_rpm, c, 1.0 / pyb_hz, sub,
            mode=mode, model=model)
        for j in range(n):
            tgt, trpy = target_fn(t, j)
            rpm[j], _, _ = pids[j].compute(
                1.0 / ctrl_hz, pos[j], quat[j], vel[j], tgt, target_rpy=trpy)
        out_pos[t], out_quat[t], out_vel[t], out_ang_v[t] = pos, quat, vel, ang_v
        out_rpm[t] = rpm
    return dict(pos=out_pos, quat=out_quat, vel=out_vel, ang_v=out_ang_v,
                rpm=out_rpm)


def _fly_rl_env(init_xyzs, target_pos, action_fn, duration_s, bound,
                mode="PYB", ctrl_hz=30, pyb_hz=240, episode_len_sec=8.0):
    """Env-level oracle for the RL learn configs: ONE_D_RPM action pipeline
    (BaseRLAviary.py:224-225), PYB physics, HoverAviary/MultiHoverAviary
    reward/terminated/truncated (HoverAviary.py:77-117, MultiHover :84-130)."""
    n = len(init_xyzs)
    c = consts(DroneModel.CF2X)
    hover_rpm = c["hover_rpm"]
    pos = np.array(init_xyzs, dtype=np.float64)
    quat = _quats_from_rpys(np.zeros((n, 3)))
    vel = np.zeros((n, 3))
    ang_v = np.zeros((n, 3))
    last_rpm = np.zeros((n, 4))
    sub = pyb_hz // ctrl_hz
    steps = int(round(duration_s * ctrl_hz))
    step_count = 0
    out = dict(pos=np.zeros((steps, n, 3)), quat=np.zeros((steps, n, 4)),
               vel=np.zeros((steps, n, 3)), ang_v=np.zeros((steps, n, 3)),
               reward=np.zeros(steps), terminated=np.zeros(steps, bool),
               truncated=np.zeros(steps, bool), action=np.zeros((steps, n, 1)))
    tgt = np.asarray(target_pos, dtype=np.float64)
    for t in range(steps):
        a = np.asarray(action_fn(t), dtype=np.float64).reshape(n, 1)
        rpm = hover_rpm * (1.0 + 0.05 * np.repeat(a, 4, axis=1))
        pos, quat, vel, ang_v, last_rpm = pyb_step_fleet(
            pos, quat, vel, ang_v, rpm, last_rpm, c, 1.0 / pyb_hz, sub,
            mode=mode)
        err = np.linalg.norm(tgt - pos, axis=1)
        reward = np.sum(np.maximum(0.0, 2.0 - err**4))
        if n == 1:
            terminated = bool(err[0] < 1e-4)
        else:
            terminated = bool(np.sum(err) < 1e-4)
        rpy = np.stack([Rotation.from_quat(q).as_euler("xyz") for q in quat])
        oob = np.any(
            (np.abs(pos[:, 0]) > bound) | (np.abs(pos[:, 1]) > bound)
            | (pos[:, 2] > 2.0) | (np.abs(rpy[:, 0]) > 0.4)
            | (np.abs(rpy[:, 1]) > 0.4)
        )
        # Reference ordering: _computeTruncated reads step_counter BEFORE the
        # step advances it (BaseAviary.py:376-382) — an 8 s episode spans 242
        # control steps at 240/30, not 241.
        truncated = bool(oob or (step_count / pyb_hz > episode_len_sec))
        step_count += sub
        out["pos"][t], out["quat"][t] = pos, quat
        out["vel"][t], out["ang_v"][t] = vel, ang_v
        out["reward"][t], out["terminated"][t] = reward, terminated
        out["truncated"][t], out["action"][t] = truncated, a
    return out


def _fly_velocity_env(init_xyzs, action_fn, duration_s, ctrl_hz=48, pyb_hz=240):
    """Env-level oracle for VelocityAviary (VelocityAviary.py:129-168): embedded
    DSLPID toward target_vel = SPEED_LIMIT*|a3|*v_unit, target_pos = cur pos,
    yaw preserved; PYB physics; 20-dim obs."""
    n = len(init_xyzs)
    c = consts(DroneModel.CF2X)
    speed_limit = 0.03 * c["max_speed_kmh"] * (1000.0 / 3600.0)
    pids = [DSLPIDOracle() for _ in range(n)]
    pos = np.array(init_xyzs, dtype=np.float64)
    quat = _quats_from_rpys(np.zeros((n, 3)))
    vel = np.zeros((n, 3))
    ang_v = np.zeros((n, 3))
    last_rpm = np.zeros((n, 4))
    sub = pyb_hz // ctrl_hz
    steps = int(duration_s * ctrl_hz)
    out_obs = np.zeros((steps, n, 20))
    out_act = np.zeros((steps, n, 4))
    for t in range(steps):
        a = np.asarray(action_fn(t), dtype=np.float64).reshape(n, 4)
        rpm = np.zeros((n, 4))
        for j in range(n):
            v = a[j, 0:3]
            vn = np.linalg.norm(v)
            v_unit = v / vn if vn > 0 else np.zeros(3)
            yaw = Rotation.from_quat(quat[j]).as_euler("xyz")[2]
            rpm[j], _, _ = pids[j].compute(
                1.0 / ctrl_hz, pos[j], quat[j], vel[j],
                target_pos=pos[j], target_rpy=np.array([0.0, 0.0, yaw]),
                target_vel=speed_limit * abs(a[j, 3]) * v_unit)
        pos, quat, vel, ang_v, last_rpm = pyb_step_fleet(
            pos, quat, vel, ang_v, rpm, last_rpm, c, 1.0 / pyb_hz, sub)
        out_obs[t] = _obs20(pos, quat, vel, ang_v, last_rpm)
        out_act[t] = a
    return dict(obs=out_obs, action=out_act)


def _fly(init_xyzs, init_rpys, target_fn, duration_s, ctrl_hz=48, pyb_hz=240):
    n = len(init_xyzs)
    c = consts(DroneModel.CF2X)
    pids = [DSLPIDOracle() for _ in range(n)]
    from scipy.spatial.transform import Rotation

    pos = np.array(init_xyzs, dtype=np.float64)
    quat = np.stack([
        Rotation.from_euler("xyz", r).as_quat() for r in init_rpys])
    vel = np.zeros((n, 3))
    rr = np.zeros((n, 3))
    sub = pyb_hz // ctrl_hz
    steps = int(duration_s * ctrl_hz)
    rpm = np.zeros((n, 4))
    out_pos = np.zeros((steps, n, 3))
    out_quat = np.zeros((steps, n, 4))
    out_rpm = np.zeros((steps, n, 4))
    for t in range(steps):
        for j in range(n):
            for _ in range(sub):
                pos[j], quat[j], vel[j], rr[j], _ = dyn_substep(
                    pos[j], quat[j], vel[j], rr[j], rpm[j], c, 1.0 / pyb_hz)
        for j in range(n):
            tgt, trpy = target_fn(t, j)
            rpm[j], _, _ = pids[j].compute(
                1.0 / ctrl_hz, pos[j], quat[j], vel[j], tgt, target_rpy=trpy)
        out_pos[t] = pos
        out_quat[t] = quat
        out_rpm[t] = rpm
    return out_pos, out_quat, out_rpm


def _fly_contact(init_xyzs, init_rpys, vel0, duration_s, rpm_fn,
                 drone_drone=False, ctrl_hz=48, pyb_hz=240, mode="PYB"):
    """Contact-regime flights under the sequential-impulse solver
    (oracle.pyb_step_fleet_impulse): tumble / hard-landing-slide / collision
    goldens for VERDICT round-2 item #1."""
    n = len(init_xyzs)
    c = consts(DroneModel.CF2X)
    pos = np.array(init_xyzs, dtype=np.float64)
    quat = _quats_from_rpys(init_rpys)
    vel = np.array(vel0, dtype=np.float64)
    ang_v = np.zeros((n, 3))
    last = np.zeros((n, 4))
    sub = pyb_hz // ctrl_hz
    steps = int(duration_s * ctrl_hz)
    out = dict(pos=np.zeros((steps, n, 3)), quat=np.zeros((steps, n, 4)),
               vel=np.zeros((steps, n, 3)), ang_v=np.zeros((steps, n, 3)),
               rpm=np.zeros((steps, n, 4)))
    for t in range(steps):
        rpm = np.asarray(rpm_fn(t), dtype=np.float64)
        pos, quat, vel, ang_v, last = pyb_step_fleet_impulse(
            pos, quat, vel, ang_v, rpm, last, c, 1.0 / pyb_hz, sub,
            drone_drone=drone_drone, mode=mode)
        out["pos"][t], out["quat"][t] = pos, quat
        out["vel"][t], out["ang_v"][t] = vel, ang_v
        out["rpm"][t] = rpm
    return out


def main():
    # --- contact-regime goldens (sequential-impulse solver) ---------------
    # tumble: tilted powerless drop -> rim impacts -> rights itself flat
    out = _fly_contact([[0.0, 0.0, 0.3]], [[0.5, 0.2, 0.0]],
                       [[0.0, 0.0, 0.0]], 2.0, lambda t: np.zeros((1, 4)))
    np.savez(os.path.join(HERE, "tumble_pyb.npz"), **out,
             init_xyzs=np.array([[0.0, 0.0, 0.3]]),
             init_rpys=np.array([[0.5, 0.2, 0.0]]),
             init_vel=np.zeros((1, 3)))

    # slide: hard landing from 0.5 m with 1 m/s lateral speed -> Coulomb
    # friction (mu = 0.5) grinds it to rest
    out = _fly_contact([[0.0, 0.0, 0.5]], [[0.0, 0.0, 0.0]],
                       [[1.0, 0.0, 0.0]], 2.0, lambda t: np.zeros((1, 4)))
    np.savez(os.path.join(HERE, "slide_pyb.npz"), **out,
             init_xyzs=np.array([[0.0, 0.0, 0.5]]),
             init_rpys=np.zeros((1, 3)),
             init_vel=np.array([[1.0, 0.0, 0.0]]))

    # land_gnd: powered descent into ground effect under the impulse solver
    # (PYB_GND) — the aero cushion (per-prop ground-effect forces,
    # BaseAviary.py:715-752) interacting with the contact rows; the one
    # regime where aero terms and the solver are simultaneously active.
    c_l = consts(DroneModel.CF2X)
    hov_l = c_l["hover_rpm"]
    out = _fly_contact([[0.0, 0.0, 0.5]], [[0.0, 0.0, 0.0]],
                       [[0.0, 0.0, 0.0]], 2.5,
                       lambda t: np.full((1, 4), 0.95 * hov_l),
                       mode="PYB_GND")
    np.savez(os.path.join(HERE, "land_gnd_pyb.npz"), **out,
             init_xyzs=np.array([[0.0, 0.0, 0.5]]),
             init_rpys=np.zeros((1, 3)), init_vel=np.zeros((1, 3)))

    # collide2: head-on two-drone approach at hover thrust -> restitution-0
    # stop at sphere contact
    c2 = consts(DroneModel.CF2X)
    hov2 = c2["hover_rpm"]
    out = _fly_contact([[-0.2, 0.0, 0.5], [0.2, 0.0, 0.5]],
                       [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
                       [[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]], 2.0,
                       lambda t: np.full((2, 4), hov2), drone_drone=True)
    np.savez(os.path.join(HERE, "collide2_pyb.npz"), **out,
             init_xyzs=np.array([[-0.2, 0.0, 0.5], [0.2, 0.0, 0.5]]),
             init_rpys=np.zeros((2, 3)),
             init_vel=np.array([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]]))

    # hover_dyn
    tgt = np.array([0.0, 0.0, 1.0])
    p, q, r = _fly([[0, 0, 0.1]], [[0, 0, 0]],
                   lambda t, j: (tgt, np.zeros(3)), 4.0)
    np.savez(os.path.join(HERE, "hover_dyn.npz"), pos=p, quat=q, rpm=r)

    # helix_dyn (pid.py:64-77 geometry)
    H, H_STEP, R_ = 0.1, 0.05, 0.3
    n = 3
    init_xyzs = [[R_ * np.cos((i / 6) * 2 * np.pi + np.pi / 2),
                  R_ * np.sin((i / 6) * 2 * np.pi + np.pi / 2) - R_,
                  H + i * H_STEP] for i in range(n)]
    init_rpys = [[0, 0, i * (np.pi / 2) / n] for i in range(n)]
    ctrl_hz, period = 48, 10
    NUM_WP = ctrl_hz * period
    idx = np.arange(NUM_WP)
    txy = np.stack([
        R_ * np.cos((idx / NUM_WP) * 2 * np.pi + np.pi / 2) + init_xyzs[0][0],
        R_ * np.sin((idx / NUM_WP) * 2 * np.pi + np.pi / 2) - R_ + init_xyzs[0][1],
    ], 1)
    wp0 = [int((i * NUM_WP / 6) % NUM_WP) for i in range(n)]
    wp = list(wp0)

    def target_fn(t, j):
        k = wp[j]
        tgt = np.array([txy[k, 0], txy[k, 1], init_xyzs[j][2]])
        if j == n - 1:  # advance counters once per control step
            for jj in range(n):
                wp[jj] = wp[jj] + 1 if wp[jj] < NUM_WP - 1 else 0
        return tgt, np.array(init_rpys[j])

    p, q, r = _fly(init_xyzs, init_rpys, target_fn, 4.0)
    np.savez(os.path.join(HERE, "helix_dyn.npz"), pos=p, quat=q, rpm=r,
             txy=txy, wp0=np.array(wp0),
             init_xyzs=np.array(init_xyzs), init_rpys=np.array(init_rpys))

    # helix_pyb — identical geometry under the PYB force pipeline
    wp = list(wp0)
    out = _fly_pyb(init_xyzs, init_rpys, target_fn, 4.0, mode="PYB")
    np.savez(os.path.join(HERE, "helix_pyb.npz"), **out, txy=txy,
             wp0=np.array(wp0), init_xyzs=np.array(init_xyzs),
             init_rpys=np.array(init_rpys))

    # hover_learn — HoverAviary learn config (240/30, ONE_D_RPM, PYB).
    # Script: 1 s near-free fall (reaches the contact clamp), then a thrust
    # sweep that lifts off and excites the vertical dynamics; 8.2 s so the
    # final steps cross the 8 s timeout truncation (HoverAviary.py:115-117).
    z0 = 0.025 / 2 + 0.1  # default spawn height (BaseAviary.py:194-197)

    def hover_action(t):
        if t < 30:
            return np.array([-0.9])
        return np.array([0.0 + 0.5 * np.sin(2 * np.pi * (t - 30) / 60.0)])

    out = _fly_rl_env([[0.0, 0.0, z0]], [[0.0, 0.0, 1.0]], hover_action,
                      8.2, bound=1.5)
    np.savez(os.path.join(HERE, "hover_learn_pyb.npz"), **out)

    # multihover — 2-drone learn config; targets INIT_XYZS + [0,0,1/(i+1)]
    # (MultiHoverAviary.py:71), bound 2.0, per-drone phase-shifted scripts.
    arm = 0.0397
    mh_init = [[0.0, 0.0, z0], [4 * arm, 4 * arm, z0]]
    mh_tgt = [[0.0, 0.0, z0 + 1.0], [4 * arm, 4 * arm, z0 + 0.5]]

    def mh_action(t):
        return np.array([
            [0.3 + 0.4 * np.sin(2 * np.pi * t / 50.0)],
            [0.2 + 0.5 * np.cos(2 * np.pi * t / 70.0)],
        ])

    out = _fly_rl_env(mh_init, mh_tgt, mh_action, 4.0, bound=2.0)
    np.savez(os.path.join(HERE, "multihover_pyb.npz"), **out)

    # downwash suite — downwash.py geometry (:45-64): two stacked drones,
    # +-0.5 m cosine sweep, drone 1 phase-shifted half a period; PYB_DW and
    # PYB_GND_DRAG_DW variants.
    dw_init = [[0.5, 0.0, 1.0], [-0.5, 0.0, 0.5]]
    PERIOD, DW_HZ = 5, 48
    DW_NUM_WP = DW_HZ * PERIOD
    dw_x = 0.5 * np.cos(2 * np.pi * np.arange(DW_NUM_WP) / DW_NUM_WP)
    dw_wp = [0, DW_NUM_WP // 2]

    def dw_target(t, j):
        k = dw_wp[j]
        tgt = np.array([dw_x[k], 0.0, dw_init[j][2]])
        if j == 1:
            for jj in range(2):
                dw_wp[jj] = dw_wp[jj] + 1 if dw_wp[jj] < DW_NUM_WP - 1 else 0
        return tgt, np.zeros(3)

    out = _fly_pyb(dw_init, [[0, 0, 0], [0, 0, 0]], dw_target, 4.0,
                   mode="PYB_DW")
    np.savez(os.path.join(HERE, "downwash_pyb.npz"), **out, x=dw_x,
             wp0=np.array([0, DW_NUM_WP // 2]), init_xyzs=np.array(dw_init))

    dw_wp = [0, DW_NUM_WP // 2]
    out = _fly_pyb(dw_init, [[0, 0, 0], [0, 0, 0]], dw_target, 4.0,
                   mode="PYB_GND_DRAG_DW")
    np.savez(os.path.join(HERE, "downwash_gdd.npz"), **out, x=dw_x,
             wp0=np.array([0, DW_NUM_WP // 2]), init_xyzs=np.array(dw_init))

    # velocity_pyb — 4-drone VelocityAviary slice, piecewise velocity refs
    # (pid_velocity.py:100-105 style: straight legs, per-drone directions).
    v_init = [[0.0, 0.0, 0.3], [0.3, 0.0, 0.3], [0.0, 0.3, 0.3], [0.3, 0.3, 0.3]]
    DIRS = np.array([[1, 0, 0], [0, 1, 0], [-1, 0, 0.5], [0, -1, 0.5]],
                    dtype=np.float64)

    def vel_action(t):
        leg = (t // 48) % 4
        a = np.zeros((4, 4))
        for j in range(4):
            d = DIRS[(j + leg) % 4]
            a[j, 0:3] = d
            a[j, 3] = 0.25 * (leg + 1)
        return a

    out = _fly_velocity_env(v_init, vel_action, 4.0)
    np.savez(os.path.join(HERE, "velocity_pyb.npz"), **out,
             init_xyzs=np.array(v_init))

    # cf2p_pyb — CF2P (plus-configuration mixer, its own inertia) DSLPID
    # square-wave waypoint flight under PYB; anchors the P-config torque
    # geometry end to end.
    def cf2p_target(t, j):
        leg = (t // 48) % 4
        tgt = [np.array([0.2, 0.0, 0.5]), np.array([0.0, 0.2, 0.7]),
               np.array([-0.2, 0.0, 0.5]), np.array([0.0, -0.2, 0.6])][leg]
        return tgt, np.zeros(3)

    out = _fly_pyb([[0.0, 0.0, 0.3]], [[0, 0, 0]], cf2p_target, 4.0,
                   mode="PYB", model=DroneModel.CF2P)
    np.savez(os.path.join(HERE, "cf2p_pyb.npz"), **out)

    # race_pyb — RACE model under scripted open-loop RPMs (no DSLPID: the
    # reference controller rejects non-CF2 models, DSLPIDControl.py:30-35).
    # The script excites every RACE-specific constant: yaw reaction sign
    # flip, wide prop offsets, 0.830 kg mass, spherical inertia.
    c_race = consts(DroneModel.RACE)
    hov = c_race["hover_rpm"]

    def race_rpm(t):
        base = hov * (1.0 + 0.03 * np.sin(2 * np.pi * t / 40.0))
        d = np.array([1.0, -1.0, 1.0, -1.0]) * 0.01 * hov * np.sin(
            2 * np.pi * t / 25.0)  # yaw excitation
        tilt = np.array([1.0, 1.0, -1.0, -1.0]) * 0.004 * hov * np.cos(
            2 * np.pi * t / 30.0)  # roll/pitch excitation
        return (base + d + tilt)[None, :]

    pos = np.array([[0.0, 0.0, 1.0]])
    quat = _quats_from_rpys([[0.0, 0.0, 0.0]])
    vel = np.zeros((1, 3))
    ang_v = np.zeros((1, 3))
    last = np.zeros((1, 4))
    steps = 48 * 3
    rp = dict(pos=np.zeros((steps, 1, 3)), quat=np.zeros((steps, 1, 4)),
              vel=np.zeros((steps, 1, 3)), ang_v=np.zeros((steps, 1, 3)),
              rpm=np.zeros((steps, 1, 4)))
    for t in range(steps):
        rpm = race_rpm(t)
        pos, quat, vel, ang_v, last = pyb_step_fleet(
            pos, quat, vel, ang_v, rpm, last, c_race, 1.0 / 240, 5,
            mode="PYB", model=DroneModel.RACE)
        rp["pos"][t], rp["quat"][t] = pos, quat
        rp["vel"][t], rp["ang_v"][t] = vel, ang_v
        rp["rpm"][t] = rpm
    np.savez(os.path.join(HERE, "race_pyb.npz"), **rp)
    print("golden files written to", HERE)


if __name__ == "__main__":
    main()
