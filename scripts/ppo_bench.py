"""PPO training-throughput bench (docs/PERF.md table; VERDICT r2 item #6).

Measures end-to-end train-step time (rollout + GAE + 10 epochs of minibatch
updates, one fused jit via make_ppo_train_loop so dispatch latency is
excluded) for a ladder of env counts, with both minibatch policies:
SB3-pinned 64 rows (the round-2 small-batch latency chain) and the round-3
auto scaling (SB3's 32 minibatches per epoch at any width).

Run on the TPU: python scripts/ppo_bench.py [num_envs ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    make_ppo_train_loop,
    ppo_init,
)


def measure(num_envs, minibatch_size, loop_len=10):
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    ppo_cfg = PPOConfig(num_envs=num_envs, n_steps=128,
                        minibatch_size=minibatch_size)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(0))
    loop = jax.jit(make_ppo_train_loop(env_cfg, ppo_cfg, aux, loop_len),
                   donate_argnums=(0,))
    runner, _ = loop(runner)
    jax.block_until_ready(runner.params)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        runner, _ = loop(runner)
        jax.block_until_ready(runner.params)
        best = min(best, (time.perf_counter() - t0) / loop_len)
    steps_s = ppo_cfg.batch_size / best
    return best * 1e3, steps_s, ppo_cfg.resolved_minibatch_size


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [128, 1024, 4096]
    for n in sizes:
        for mb in (64, None):
            ms, sps, res = measure(n, mb)
            tag = "sb3-64" if mb == 64 else f"auto-{res}"
            print(f"num_envs={n} minibatch={tag}: {ms:.1f} ms/update, "
                  f"{sps/1e6:.2f}M env-steps/s of training", flush=True)


if __name__ == "__main__":
    main()
