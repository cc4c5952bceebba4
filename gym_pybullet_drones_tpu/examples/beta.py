"""Betaflight-in-the-loop flight (retelling of reference examples/beta.py:
racer model at 500/500 Hz :42-51, CSV trajectory streamed as pos/vel
setpoints :91-118, CTBR control after t > TRAJ_TIME :128-138).

The reference drives an externally-built `betaflight_SITL.elf`
(assets/clone_bfs.sh); here the default is the wire-compatible `MockSITL`.
For the real thing, build with `scripts/build_betaflight_sitl.sh N` and pass
`--sitl_dir betaflight_sitl` (or explicit `sitl_paths`). The flight follows
the beta-traj.csv-schema trajectory (generated on first use by
`assets/make_beta_traj.py`); drone pairs fly it forward/reversed like the
reference's two interleaved trajectories (beta.py:91-118).
"""

import argparse
import csv
import os

import numpy as np

from gym_pybullet_drones_tpu.bridges.betaflight import MockSITL
from gym_pybullet_drones_tpu.control.compat import CTBRControl
from gym_pybullet_drones_tpu.envs.beta import BetaAviary
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_DRONES = DroneModel.RACE
DEFAULT_SIMULATION_FREQ_HZ = 500
DEFAULT_CONTROL_FREQ_HZ = 500
DEFAULT_DURATION_SEC = 10
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    drone=DEFAULT_DRONES,
    num_drones=1,
    gui=False,
    plot=True,
    simulation_freq_hz=DEFAULT_SIMULATION_FREQ_HZ,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    duration_sec=DEFAULT_DURATION_SEC,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    use_mock_sitl=True,
    sitl_paths=None,
    sitl_dir=None,
    traj_csv=None,
    colab=False,
    **_ignored,
):
    if sitl_dir and not sitl_paths:
        # Layout produced by scripts/build_betaflight_sitl.sh
        sitl_paths = [
            os.path.join(sitl_dir, f"bf{i}", "obj", "main",
                         "betaflight_SITL.elf")
            for i in range(num_drones)
        ]
        missing = [p for p in sitl_paths if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                f"SITL binaries not found: {missing}; build them with "
                "scripts/build_betaflight_sitl.sh")
    mocks = []
    if use_mock_sitl and not sitl_paths:
        mocks = [MockSITL(i).start() for i in range(num_drones)]

    # Trajectory table (beta-traj.csv schema): pos/vel setpoint per 2 ms row
    if traj_csv is None:
        from gym_pybullet_drones_tpu.assets.make_beta_traj import ensure_csv

        traj_csv = ensure_csv()
    with open(traj_csv) as f:
        rows = list(csv.DictReader(f))
    traj = np.array([[float(r["p_x"]), float(r["p_y"]), float(r["p_z"]),
                      float(r["v_x"]), float(r["v_y"]), float(r["v_z"])]
                     for r in rows])
    env = BetaAviary(drone_model=drone, num_drones=num_drones,
                     physics=Physics.PYB, pyb_freq=simulation_freq_hz,
                     ctrl_freq=control_freq_hz, sitl_paths=sitl_paths,
                     output_folder=output_folder)
    ctrl = [CTBRControl(drone) for _ in range(num_drones)]
    logger = Logger(logging_freq_hz=control_freq_hz, num_drones=num_drones,
                    output_folder=output_folder, colab=colab)

    obs, info = env.reset(seed=0)
    num_steps = int(duration_sec * control_freq_hz)
    action = np.zeros((num_drones, 4))
    try:
        for i in range(num_steps):
            obs, reward, terminated, truncated, info = env.step(action, i)
            t = i / control_freq_hz
            for j in range(num_drones):
                # Stream the CSV as pos/vel setpoints after TRAJ_TIME
                # (beta.py:119-138); odd drones fly the table reversed — the
                # reference's second interleaved trajectory.
                if t > env.TRAJ_TIME:
                    k = min(int((t - env.TRAJ_TIME) * control_freq_hz),
                            len(traj) - 1)
                    row = traj[len(traj) - 1 - k] if j % 2 else traj[k]
                    target_pos = row[0:3] + np.array([0.3 * j, 0.0, 0.0])
                    target_vel = row[3:6] * (-1.0 if j % 2 else 1.0)
                else:
                    target_pos = np.array([0.3 * j, 0.0, 0.1])
                    target_vel = np.zeros(3)
                out = ctrl[j].computeControlFromState(
                    1.0 / control_freq_hz, obs[j], target_pos=target_pos,
                    target_vel=target_vel)
                action[j] = out
                logger.log(drone=j, timestamp=t, state=obs[j])
    finally:
        env.close()
        for m in mocks:
            m.stop()

    logger.save()
    if plot:
        logger.plot()
    return logger


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Betaflight SITL flight")
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC, type=int)
    parser.add_argument("--plot", default=True, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    parser.add_argument("--num_drones", default=1, type=int)
    parser.add_argument("--sitl_dir", default=None, type=str,
                        help="betaflight_sitl dir from build_betaflight_sitl.sh"
                             " (real SITL instead of MockSITL)")
    parser.add_argument("--traj_csv", default=None, type=str,
                        help="beta-traj.csv-schema trajectory file")
    run(**vars(parser.parse_args()))
