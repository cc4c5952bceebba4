"""MRAC hover demo: adaptive control to [0, 0, 1] (TPU-native retelling of
reference examples/mrac.py: CtrlAviary + MRAC at 240/120 Hz for 15 s,
:44-57, loop :82-103). The adaptive gain updates (Kx, Kr, Xm) ride in the
scan carry as an `MRACState` pytree.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.control.mrac import mrac_control, mrac_params, mrac_reset
from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_DRONE = DroneModel.CF2X
DEFAULT_SIMULATION_FREQ_HZ = 240
DEFAULT_CONTROL_FREQ_HZ = 120
DEFAULT_DURATION_SEC = 15
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    drone=DEFAULT_DRONE,
    gui=False,
    plot=True,
    simulation_freq_hz=DEFAULT_SIMULATION_FREQ_HZ,
    control_freq_hz=DEFAULT_CONTROL_FREQ_HZ,
    duration_sec=DEFAULT_DURATION_SEC,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    colab=False,
    **_ignored,
):
    num_drones = 1
    INIT_XYZS = np.array([[0.0, 0.0, 0.1]])
    TARGET = np.array([[0.0, 0.0, 1.0]])

    cfg = AviaryConfig(
        drone_model=drone, num_drones=num_drones, physics=Physics.PYB,
        pyb_freq=simulation_freq_hz, ctrl_freq=control_freq_hz, task=TASK_CTRL,
        initial_xyzs=tuple(map(tuple, INIT_XYZS)),
    )
    params = envbase.build_params(cfg)
    ctrl_params = mrac_params(drone)
    dummy_ctrl = envbase.build_ctrl_params(cfg)
    dummy_target = jnp.zeros((num_drones, 3), dtype=cfg.jnp_dtype)
    target = jnp.asarray(TARGET, dtype=cfg.jnp_dtype)
    num_steps = int(duration_sec * control_freq_hz)

    def body(carry, _):
        state, mrac_state, action = carry
        state, obs, *_ = envbase.step(cfg, params, dummy_ctrl, dummy_target,
                                      state, action)
        rpm, mrac_state, _, _ = mrac_control(
            ctrl_params, mrac_state, cfg.ctrl_timestep,
            state.kin.pos, state.kin.quat, state.kin.vel, state.kin.ang_v,
            target,
        )
        return (state, mrac_state, rpm), obs

    state0 = envbase.reset(cfg, params)
    carry0 = (state0, mrac_reset(ctrl_params, (num_drones,)),
              jnp.zeros((num_drones, 4), dtype=cfg.jnp_dtype))
    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=num_steps))
    (state, *_), traj = scan(carry0)

    final_pos = np.asarray(state.kin.pos[0])
    print(f"[INFO] MRAC final position: {final_pos} (target {TARGET[0]})")

    logger = Logger(logging_freq_hz=control_freq_hz, num_drones=num_drones,
                    output_folder=output_folder, duration_sec=duration_sec,
                    colab=colab)
    logger.log_trajectory(traj)
    logger.save()
    if plot:
        logger.plot()
    return final_pos


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="MRAC hover (TPU-native)")
    parser.add_argument("--drone", default=DEFAULT_DRONE, type=DroneModel, choices=DroneModel)
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC, type=int)
    parser.add_argument("--plot", default=True, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    run(**vars(parser.parse_args()))
