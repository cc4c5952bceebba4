"""Replay a trained policy (TPU-native retelling of reference examples/play.py:
loads the saved model, runs a deterministic rollout with logging :20-76)."""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER, TASK_MULTIHOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import PPOConfig, ppo_init
from gym_pybullet_drones_tpu.utils.logger import Logger
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_OUTPUT_FOLDER = "results"


def play(
    model_path=None,
    multiagent=False,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    gui=False,
    plot=True,
    act=ActionType.ONE_D_RPM,
    duration_sec=8,
    colab=False,
    animate=False,
):
    if model_path is None:
        model_path = os.path.join(output_folder, "best_model.msgpack")
    num_drones = 2 if multiagent else 1
    env_cfg = AviaryConfig(
        num_drones=num_drones,
        task=TASK_MULTIHOVER if multiagent else TASK_HOVER,
        action_type=act, obs_type=ObservationType.KIN,
        pyb_freq=240, ctrl_freq=30, action_buffer_size=15,
    )
    runner, aux = ppo_init(env_cfg, PPOConfig(num_envs=1), jax.random.key(0))
    with open(model_path, "rb") as f:
        params = serialization.from_bytes(runner.params, f.read())
    from gym_pybullet_drones_tpu.rl.ppo import deterministic_rollout

    states, rewards = deterministic_rollout(env_cfg, aux, params,
                                            int(duration_sec * env_cfg.ctrl_freq))
    print(f"[INFO] replay total reward {float(np.asarray(rewards).sum()):.1f}")
    logger = Logger(logging_freq_hz=env_cfg.ctrl_freq, num_drones=num_drones,
                    output_folder=output_folder, colab=colab)
    logger.log_trajectory(np.asarray(states))
    if plot:
        logger.plot()
    if animate:
        # 3-D third-person flight animation (the GUI/video stand-in; the
        # reference shows the replay in the PyBullet GUI, play.py:40-76)
        from gym_pybullet_drones_tpu.utils.viz import animate_trajectory

        out = animate_trajectory(
            logger, os.path.join(output_folder, "replay.gif"),
            fps=env_cfg.ctrl_freq // 2)
        print(f"[INFO] replay animation saved to {out}")
    return float(np.asarray(rewards).sum())


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Replay a trained policy")
    parser.add_argument("--model_path", default=None, type=str)
    parser.add_argument("--multiagent", default=False, type=str2bool)
    parser.add_argument("--plot", default=True, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER, type=str)
    parser.add_argument("--animate", default=False, type=str2bool)
    play(**vars(parser.parse_args()))
