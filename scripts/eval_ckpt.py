"""CPU re-verification of a trained policy checkpoint under the honest
protocol: N consecutive deterministic episodes on ONE env (the action buffer
persists across auto-resets, reference BaseRLAviary.py:153-155, so episodes
genuinely differ; see CLAUDE.md "RL eval protocol").

Run: JAX_PLATFORMS=cpu python scripts/eval_ckpt.py <ckpt.msgpack> \
         <case: rpm4|pid|vel|one_d_pid|one_d_rpm|rgb> [--multiagent] [--hidden 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from flax import serialization

from gym_pybullet_drones_tpu.envs.base import (
    AviaryConfig,
    TASK_HOVER,
    TASK_MULTIHOVER,
)
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import PPOConfig, evaluate_policy, ppo_init


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("case", choices=["rpm4", "pid", "vel", "one_d_pid",
                                     "one_d_rpm", "rgb"])
    ap.add_argument("--multiagent", action="store_true")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--eval_eps", type=int, default=10)
    args = ap.parse_args()

    act = {"rpm4": ActionType.RPM, "pid": ActionType.PID,
           "vel": ActionType.VEL, "one_d_pid": ActionType.ONE_D_PID,
           "one_d_rpm": ActionType.ONE_D_RPM,
           "rgb": ActionType.ONE_D_RPM}[args.case]
    env_cfg = AviaryConfig(
        num_drones=2 if args.multiagent else 1,
        task=TASK_MULTIHOVER if args.multiagent else TASK_HOVER,
        action_type=act,
        obs_type=(ObservationType.RGB if args.case == "rgb"
                  else ObservationType.KIN),
        pyb_freq=240, ctrl_freq=30, action_buffer_size=15,
        episode_len_sec=8.0,
        frame_stack=4 if args.case == "rgb" else 0,
    )
    runner, aux = ppo_init(
        env_cfg, PPOConfig(num_envs=1, hidden=(args.hidden, args.hidden)),
        jax.random.key(0))
    with open(args.ckpt, "rb") as f:
        params = serialization.from_bytes(runner.params, f.read())
    ret, n = evaluate_policy(env_cfg, aux, params,
                             num_steps=260 * args.eval_eps, num_envs=1)
    thr = 920.0 if args.multiagent else (474.0 if args.case == "rgb" else 467.0)
    print(f"{args.ckpt} case={args.case} multi={args.multiagent}: "
          f"eval {ret:.2f} over {n} episodes "
          f"(threshold {thr}) -> {'SOLVED' if ret >= thr else 'below'}",
          flush=True)


if __name__ == "__main__":
    main()
