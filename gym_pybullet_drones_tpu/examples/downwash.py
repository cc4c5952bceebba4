"""Downwash demo: two stacked drones oscillating through each other's wake
under `Physics.PYB_DW` (TPU-native retelling of reference examples/downwash.py:
same initial poses :45-47, +-0.5 m cosine sweep :59-64, 240/48 Hz 12 s).
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.control.dsl_pid import (
    dsl_pid_control,
    dsl_pid_params,
    dsl_pid_reset,
)
from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_DRONE = DroneModel.CF2X
DEFAULT_GUI = False
DEFAULT_SIMULATION_FREQ_HZ = 240
DEFAULT_CONTROL_FREQ_HZ = 48
DEFAULT_DURATION_SEC = 12
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    drone=DEFAULT_DRONE,
    gui=DEFAULT_GUI,
    simulation_freq_hz=DEFAULT_SIMULATION_FREQ_HZ,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    duration_sec=DEFAULT_DURATION_SEC,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    plot=True,
    colab=False,
    **_ignored,
):
    INIT_XYZS = np.array([[0.5, 0, 1.0], [-0.5, 0, 0.5]])
    num_drones = 2

    # +-0.5 m cosine sweep; drone 1 phase-shifted half a period (downwash.py:59-64)
    PERIOD = 5
    NUM_WP = control_freq_hz * PERIOD
    idx = np.arange(NUM_WP)
    TARGET_X = 0.5 * np.cos(2 * np.pi * idx / NUM_WP)
    wp0 = np.array([0, NUM_WP // 2])

    cfg = AviaryConfig(
        drone_model=drone, num_drones=num_drones, physics=Physics.PYB_DW,
        pyb_freq=simulation_freq_hz, ctrl_freq=control_freq_hz, task=TASK_CTRL,
        initial_xyzs=tuple(map(tuple, INIT_XYZS)),
    )
    params = envbase.build_params(cfg)
    ctrl_params = dsl_pid_params(drone)
    dummy_target = jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype)
    num_steps = int(duration_sec * control_freq_hz)

    target_x = jnp.asarray(TARGET_X, dtype=cfg.jnp_dtype)
    target_z = jnp.asarray(INIT_XYZS[:, 2], dtype=cfg.jnp_dtype)

    def body(carry, _):
        state, pid_state, wp, action = carry
        state, obs, *_ = envbase.step(cfg, params, ctrl_params, dummy_target,
                                      state, action)
        tgt = jnp.stack([target_x[wp], jnp.zeros_like(target_z), target_z], -1)
        rpm, pid_state, _, _ = dsl_pid_control(
            ctrl_params, pid_state, cfg.ctrl_timestep,
            state.kin.pos, state.kin.quat, state.kin.vel, tgt,
        )
        wp_next = jnp.where(wp < NUM_WP - 1, wp + 1, 0)
        control12 = jnp.concatenate([
            tgt, jnp.zeros((num_drones, 9), dtype=cfg.jnp_dtype)], -1)
        return (state, pid_state, wp_next, rpm), (obs, control12)

    state0 = envbase.reset(cfg, params)
    carry0 = (state0, dsl_pid_reset((num_drones,)), jnp.asarray(wp0),
              jnp.zeros((num_drones, 4), dtype=cfg.jnp_dtype))
    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=num_steps))
    (state, *_), (traj, controls) = scan(carry0)

    logger = Logger(logging_freq_hz=control_freq_hz, num_drones=num_drones,
                    output_folder=output_folder, duration_sec=duration_sec,
                    colab=colab)
    logger.log_trajectory(traj, controls=controls)
    logger.save()
    if plot:
        logger.plot()
    return logger


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Downwash demo (TPU-native)")
    parser.add_argument("--drone", default=DEFAULT_DRONE, type=DroneModel, choices=DroneModel)
    parser.add_argument("--gui", default=DEFAULT_GUI, type=str2bool)
    parser.add_argument("--simulation_freq_hz", default=DEFAULT_SIMULATION_FREQ_HZ, type=int)
    parser.add_argument("--control_freq_hz", default=DEFAULT_CONTROL_FREQ_HZ, type=int)
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC, type=int)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    run(**vars(parser.parse_args()))
