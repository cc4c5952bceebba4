"""Crazyflie-firmware flight on a square trajectory (retelling of reference
examples/cf.py: 500/25 Hz :33-34, takeoff then `sendFullStateCmd` squares
:74-97), driving the native C++ firmware subset instead of pycffirmware.
"""

import argparse

import numpy as np

from gym_pybullet_drones_tpu.envs.cf import CFAviary
from gym_pybullet_drones_tpu.envs.spec import DroneModel
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_DRONES = DroneModel.CF2X
DEFAULT_SIMULATION_FREQ_HZ = 500
DEFAULT_CONTROL_FREQ_HZ = 25
DEFAULT_DURATION_SEC = 20
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    drone=DEFAULT_DRONES,
    gui=False,
    plot=True,
    simulation_freq_hz=DEFAULT_SIMULATION_FREQ_HZ,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    duration_sec=DEFAULT_DURATION_SEC,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    colab=False,
    **_ignored,
):
    env = CFAviary(drone_model=drone, pyb_freq=simulation_freq_hz,
                   ctrl_freq=control_freq_hz, output_folder=output_folder)
    obs, info = env.reset()
    logger = Logger(logging_freq_hz=control_freq_hz, num_drones=1,
                    output_folder=output_folder, colab=colab)

    # Square waypoints after a 2 s takeoff to 0.5 m (cf.py:74-97)
    corners = np.array([[0.0, 0.0], [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
    takeoff_s, edge_s = 3.0, 4.0
    env.sendTakeoffCmd(0.5, 2.0)
    num_steps = int(duration_sec * control_freq_hz)
    sent_full_state = False
    for i in range(num_steps):
        t = i / control_freq_hz
        if t >= takeoff_s:
            # Piecewise-linear square tracking via full-state commands
            leg = (t - takeoff_s) / edge_s
            k = int(leg) % 4
            frac = leg - int(leg)
            p0, p1 = corners[k], corners[(k + 1) % 4]
            pos = p0 + (p1 - p0) * frac
            vel = (p1 - p0) / edge_s
            env.sendFullStateCmd([pos[0], pos[1], 0.5], [vel[0], vel[1], 0.0],
                                 [0.0, 0.0, 0.0], 0.0, [0.0, 0.0, 0.0], t)
            sent_full_state = True
        out = env.step(i)
        obs = out[0]
        logger.log(drone=0, timestamp=t, state=obs[0])

    logger.save()
    if plot:
        logger.plot()
    return logger


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Crazyflie firmware square flight")
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC, type=int)
    parser.add_argument("--plot", default=True, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    run(**vars(parser.parse_args()))
