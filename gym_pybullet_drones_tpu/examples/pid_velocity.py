"""Velocity-reference flight: 4 drones under piecewise-constant velocity
commands (TPU-native retelling of reference examples/pid_velocity.py: same
initial poses :61-72, same velocity schedule :100-105, 240/48 Hz 5 s).

The velocity targets are a precomputed (T, 4, 4) table scanned through one
jitted program (VelocityAviary semantics: the embedded DSLPID chases the
commanded direction at |v4| x SPEED_LIMIT, VelocityAviary.py:129-168).
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_VELOCITY
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_DRONE = DroneModel.CF2X
DEFAULT_GUI = False
DEFAULT_PLOT = True
DEFAULT_SIMULATION_FREQ_HZ = 240
DEFAULT_CONTROL_FREQ_HZ = 48
DEFAULT_DURATION_SEC = 5
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    drone=DEFAULT_DRONE,
    gui=DEFAULT_GUI,
    plot=DEFAULT_PLOT,
    simulation_freq_hz=DEFAULT_SIMULATION_FREQ_HZ,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    duration_sec=DEFAULT_DURATION_SEC,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    colab=False,
    **_ignored,
):
    INIT_XYZS = np.array([[0, 0, 0.1], [0.3, 0, 0.1], [0.6, 0, 0.1], [0.9, 0, 0.1]])
    INIT_RPYS = np.array([[0, 0, 0], [0, 0, np.pi / 3], [0, 0, np.pi / 4],
                          [0, 0, np.pi / 2]])
    num_drones = 4

    # Piecewise-constant velocity table (pid_velocity.py:100-105)
    NUM_WP = control_freq_hz * duration_sec
    i = np.arange(NUM_WP)[:, None]
    TARGET_VEL = np.zeros((NUM_WP, 4, 4))
    TARGET_VEL[:, 0] = np.where(i < NUM_WP / 8, [-0.5, 1, 0, 0.99], [0.5, -1, 0, 0.99])
    TARGET_VEL[:, 1] = np.where(i < NUM_WP / 8 + NUM_WP / 6, [0, 1, 0, 0.99], [0, -1, 0, 0.99])
    TARGET_VEL[:, 2] = np.where(i < NUM_WP / 8 + 2 * NUM_WP / 6,
                                [0.2, 1, 0.2, 0.99], [-0.2, -1, -0.2, 0.99])
    TARGET_VEL[:, 3] = np.where(i < NUM_WP / 8 + 3 * NUM_WP / 6,
                                [0, 1, 0.5, 0.99], [0, -1, -0.5, 0.99])

    cfg = AviaryConfig(
        drone_model=drone, num_drones=num_drones, physics=Physics.PYB,
        pyb_freq=simulation_freq_hz, ctrl_freq=control_freq_hz, task=TASK_VELOCITY,
        initial_xyzs=tuple(map(tuple, INIT_XYZS)),
        initial_rpys=tuple(map(tuple, INIT_RPYS)),
    )
    params = envbase.build_params(cfg)
    ctrl_params = envbase.build_ctrl_params(cfg)
    dummy_target = jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype)
    num_steps = int(duration_sec * control_freq_hz)

    vel_table = jnp.asarray(TARGET_VEL, dtype=cfg.jnp_dtype)

    def body(carry, t):
        state, action = carry
        # Reference loop order (pid_velocity.py:117-128): step on the carried
        # action, then pick this step's velocity command for the next step.
        state, obs, *_ = envbase.step(cfg, params, ctrl_params, dummy_target,
                                      state, action)
        next_action = vel_table[jnp.minimum(t, NUM_WP - 1)]
        control12 = jnp.concatenate([
            jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype),
            jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype),
            next_action[:, 0:3], jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype)], -1)
        return (state, next_action), (obs, control12)

    state0 = envbase.reset(cfg, params)
    action0 = jnp.zeros((num_drones, 4), dtype=cfg.jnp_dtype)
    scan = jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(num_steps)))
    (state, _), (traj, controls) = scan((state0, action0))

    logger = Logger(logging_freq_hz=control_freq_hz, num_drones=num_drones,
                    output_folder=output_folder, duration_sec=duration_sec,
                    colab=colab)
    logger.log_trajectory(traj, controls=controls)
    logger.save()
    logger.save_as_csv("vel")
    if plot:
        logger.plot()
    return logger


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Velocity control: VelocityAviary (TPU-native)")
    parser.add_argument("--drone", default=DEFAULT_DRONE, type=DroneModel, choices=DroneModel)
    parser.add_argument("--gui", default=DEFAULT_GUI, type=str2bool)
    parser.add_argument("--plot", default=DEFAULT_PLOT, type=str2bool)
    parser.add_argument("--simulation_freq_hz", default=DEFAULT_SIMULATION_FREQ_HZ, type=int)
    parser.add_argument("--control_freq_hz", default=DEFAULT_CONTROL_FREQ_HZ, type=int)
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC, type=int)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    run(**vars(parser.parse_args()))
