"""Betaflight-in-the-loop flight (retelling of reference examples/beta.py:
racer model at 500/500 Hz :42-51, CTBR control after t > TRAJ_TIME :128-138,
lemniscate-style trajectory). The reference drives an externally-built
`betaflight_SITL.elf`; here the default is the wire-compatible `MockSITL`
(pass `sitl_paths` for real binaries).
"""

import argparse

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
    colab=False,
    **_ignored,
):
    mocks = []
    if use_mock_sitl and not sitl_paths:
        mocks = [MockSITL(i).start() for i in range(num_drones)]
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
                # Figure-eight reference after climb-out (beta.py:91-118 style)
                tt = max(0.0, t - env.TRAJ_TIME - 2.0)
                target = np.array([
                    0.5 * np.sin(0.6 * tt) + 0.3 * j,
                    0.5 * np.sin(1.2 * tt),
                    1.0,
                ])
                out = ctrl[j].computeControlFromState(
                    1.0 / control_freq_hz, obs[j], target_pos=target)
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
    run(**vars(parser.parse_args()))
