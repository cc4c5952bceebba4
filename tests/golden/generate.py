"""Golden-trajectory generator: float64 oracle flights serialized to npz.

Run `python tests/golden/generate.py` to (re)create the golden files. The
oracle (tests/oracle.py) implements the reference's explicit dynamics and
DSLPID directly from the documented equations in NumPy float64 — PyBullet
itself is not installable here, so this is the tolerance anchor the SURVEY
prescribes (§4): the JAX kernels must match these trajectories to float64
round-off, and stay within the documented float32 budget in production mode.

Configs (mirroring BASELINE.json):
  hover_dyn   — single CF2X, DSLPID to [0,0,1], DYN physics, 240/48 Hz, 4 s
  helix_dyn   — 3 CF2X drones on the pid.py circular waypoint table, 4 s
"""

import os

import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from oracle import DSLPIDOracle, consts, dyn_substep  # noqa: E402
from gym_pybullet_drones_tpu.envs.spec import DroneModel  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


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


def main():
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
    print("golden files written to", HERE)


if __name__ == "__main__":
    main()
