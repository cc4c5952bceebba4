"""Helix-tracking demo: N drones on a circular trajectory under DSLPID.

TPU-native retelling of the reference examples/pid.py (same initial poses
:64-66, same circular waypoint table :72-77, same 240/48 Hz 12 s defaults
:43-45): the whole flight — env physics, per-drone PID, waypoint advance — is
one `jit(lax.scan)` program; the host sees only the final stacked trajectory,
which is bulk-logged. With `gui=True` it instead steps interactively with
`render`/`sync` pacing like the reference's GUI loop (:132-167).
"""

import argparse
import time

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
from gym_pybullet_drones_tpu.utils.utils import str2bool, sync

DEFAULT_DRONES = DroneModel.CF2X
DEFAULT_NUM_DRONES = 3
DEFAULT_PHYSICS = Physics.PYB
DEFAULT_GUI = False
DEFAULT_PLOT = True
DEFAULT_SIMULATION_FREQ_HZ = 240
DEFAULT_CONTROL_FREQ_HZ = 48
DEFAULT_DURATION_SEC = 12
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    drone=DEFAULT_DRONES,
    num_drones=DEFAULT_NUM_DRONES,
    physics=DEFAULT_PHYSICS,
    gui=DEFAULT_GUI,
    plot=DEFAULT_PLOT,
    simulation_freq_hz=DEFAULT_SIMULATION_FREQ_HZ,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    duration_sec=DEFAULT_DURATION_SEC,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    colab=False,
    **_ignored,
):
    # Initial poses on a circle with stacked heights (pid.py:64-66)
    H, H_STEP, R = 0.1, 0.05, 0.3
    INIT_XYZS = np.array([
        [R * np.cos((i / 6) * 2 * np.pi + np.pi / 2),
         R * np.sin((i / 6) * 2 * np.pi + np.pi / 2) - R,
         H + i * H_STEP] for i in range(num_drones)
    ])
    INIT_RPYS = np.array([[0.0, 0.0, i * (np.pi / 2) / num_drones]
                          for i in range(num_drones)])

    # Circular waypoint table (pid.py:71-77)
    PERIOD = 10
    NUM_WP = control_freq_hz * PERIOD
    idx = np.arange(NUM_WP)
    TARGET_XY = np.stack([
        R * np.cos((idx / NUM_WP) * 2 * np.pi + np.pi / 2) + INIT_XYZS[0, 0],
        R * np.sin((idx / NUM_WP) * 2 * np.pi + np.pi / 2) - R + INIT_XYZS[0, 1],
    ], axis=1)
    wp0 = np.array([int((i * NUM_WP / 6) % NUM_WP) for i in range(num_drones)])

    cfg = AviaryConfig(
        drone_model=drone, num_drones=num_drones, physics=physics,
        pyb_freq=simulation_freq_hz, ctrl_freq=control_freq_hz, task=TASK_CTRL,
        initial_xyzs=tuple(map(tuple, INIT_XYZS)),
        initial_rpys=tuple(map(tuple, INIT_RPYS)),
    )
    params = envbase.build_params(cfg)
    ctrl_params = dsl_pid_params(drone)
    num_steps = int(duration_sec * control_freq_hz)

    target_xy = jnp.asarray(TARGET_XY, dtype=cfg.jnp_dtype)
    target_z = jnp.asarray(INIT_XYZS[:, 2], dtype=cfg.jnp_dtype)
    target_rpy = jnp.asarray(INIT_RPYS, dtype=cfg.jnp_dtype)
    dummy_target = jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype)

    def body(carry, _):
        state, pid_state, wp, action = carry
        state, obs, *_ = envbase.step(cfg, params, ctrl_params, dummy_target,
                                      state, action)
        tgt = jnp.concatenate([target_xy[wp], target_z[:, None]], -1)
        rpm, pid_state, _, _ = dsl_pid_control(
            ctrl_params, pid_state, cfg.ctrl_timestep,
            state.kin.pos, state.kin.quat, state.kin.vel,
            tgt, target_rpy,
        )
        wp_next = jnp.where(wp < NUM_WP - 1, wp + 1, 0)
        control12 = jnp.concatenate([
            target_xy[wp_next], target_z[:, None], target_rpy,
            jnp.zeros((num_drones, 6), dtype=cfg.jnp_dtype)], -1)
        return (state, pid_state, wp_next, rpm), (obs, control12)

    state0 = envbase.reset(cfg, params)
    carry0 = (state0, dsl_pid_reset((num_drones,)), jnp.asarray(wp0),
              jnp.zeros((num_drones, 4), dtype=cfg.jnp_dtype))

    logger = Logger(logging_freq_hz=control_freq_hz, num_drones=num_drones,
                    output_folder=output_folder, duration_sec=duration_sec,
                    colab=colab)

    if not gui:
        scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=num_steps))
        (state, *_), (traj, controls) = scan(carry0)
        logger.log_trajectory(traj, controls=controls)
    else:
        carry = carry0
        step1 = jax.jit(lambda c: body(c, None))
        start = time.time()
        for i in range(num_steps):
            carry, (obs, control12) = step1(carry)
            for j in range(num_drones):
                logger.log(drone=j, timestamp=i / control_freq_hz,
                           state=np.asarray(obs)[j], control=np.asarray(control12)[j])
            sync(i, start, cfg.ctrl_timestep)

    logger.save()
    logger.save_as_csv("pid")
    if plot:
        logger.plot()
    return logger


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Helix flight: CtrlAviary + DSLPIDControl (TPU-native)")
    parser.add_argument("--drone", default=DEFAULT_DRONES, type=DroneModel,
                        choices=DroneModel)
    parser.add_argument("--num_drones", default=DEFAULT_NUM_DRONES, type=int)
    parser.add_argument("--physics", default=DEFAULT_PHYSICS, type=Physics,
                        choices=Physics)
    parser.add_argument("--gui", default=DEFAULT_GUI, type=str2bool)
    parser.add_argument("--plot", default=DEFAULT_PLOT, type=str2bool)
    parser.add_argument("--simulation_freq_hz", default=DEFAULT_SIMULATION_FREQ_HZ, type=int)
    parser.add_argument("--control_freq_hz", default=DEFAULT_CONTROL_FREQ_HZ, type=int)
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC, type=int)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    run(**vars(parser.parse_args()))
