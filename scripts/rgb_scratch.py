"""From-scratch RGB Hover to the reference threshold (VERDICT r4 #3).

Round 4 characterized the failure precisely: from random init the kl_lr arm
reaches 425 on the 10-episode protocol at update 10, then sustained PPO
optimization destroys deterministic competence (the stochastic objective is
satisfied by a noise-dithering policy whose mean decays to the 103.4
constant-action attractor). The reference needs no warm start
(learn.py:73-95, threshold 474 at :79-80), so neither should we.

This script combines the round-5 countermeasures aimed at that mechanism:

  * det_frac    — a fraction of envs roll out with the MEAN action, so mean
                  -policy competence enters the PPO objective directly;
  * anchor_coef — mean-policy BC pull toward the best deterministic-eval
                  snapshot so far (re-anchored by this host loop whenever
                  eval improves; rl/ppo.py `anchor=True`);
  * dense evals — a cheap 1-episode probe EVERY update (the 425 transit at
                  u10 was only visible at 10-update granularity); the full
                  10-consecutive-episode protocol (2600 steps, 1 env) runs
                  whenever the probe clears --protocol_gate, and training
                  stops the moment protocol >= threshold.

Writes best params to results/best_rgb_scratch.msgpack (+ protocol-passing
checkpoint results/rgb_scratch_solved.msgpack) and a JSON curve. Run on the
TPU chip:  python scripts/rgb_scratch.py --seed 0
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import serialization

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    evaluate_policy,
    make_ppo_train_step,
    ppo_init,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--updates", type=int, default=200)
    ap.add_argument("--num_envs", type=int, default=64)
    ap.add_argument("--det_frac", type=float, default=0.25)
    ap.add_argument("--anchor_coef", type=float, default=1.0)
    ap.add_argument("--anchor_after", type=float, default=250.0,
                    help="start anchoring once the probe eval clears this")
    ap.add_argument("--target_kl", type=float, default=0.01)
    ap.add_argument("--anneal_to", type=float, default=None,
                    help="log_std anneal target (stage-2 precision: safe "
                         "under the anchor, unlike the bare round-4 arms)")
    ap.add_argument("--anneal_frac", type=float, default=0.6)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--threshold", type=float, default=474.0)
    ap.add_argument("--protocol_gate", type=float, default=440.0,
                    help="probe level that triggers the full 10-episode "
                         "protocol eval")
    ap.add_argument("--frame_stack", type=int, default=4)
    ap.add_argument("--init_ckpt", default=None)
    ap.add_argument("--out", default="results")
    args = ap.parse_args()

    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
        frame_stack=args.frame_stack,
    )
    ppo_cfg = PPOConfig(
        num_envs=args.num_envs, n_steps=128,
        minibatch_size=min(1024, args.num_envs * 128),
        learning_rate=args.lr, target_kl=args.target_kl,
        det_frac=args.det_frac, anchor_coef=args.anchor_coef,
        log_std_anneal_to=args.anneal_to,
        log_std_anneal_updates=max(1, int(args.updates * args.anneal_frac)),
    )
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(args.seed))
    if args.init_ckpt:
        with open(args.init_ckpt, "rb") as f:
            runner = runner.replace(
                params=serialization.from_bytes(runner.params, f.read()))
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux, anchor=True),
                    donate_argnums=(0,))

    os.makedirs(args.out, exist_ok=True)
    anchor = jax.device_get(runner.params)
    anchoring = False
    best_probe, best_params = -np.inf, jax.device_get(runner.params)
    curve = []
    t0 = time.time()
    for u in range(1, args.updates + 1):
        runner, m = train(runner, anchor if anchoring else None)
        jax.block_until_ready(m["loss"])
        probe, _ = evaluate_policy(env_cfg, aux, runner.params,
                                   num_steps=260, num_envs=1)
        row = dict(update=u, probe=float(probe),
                   train_r=float(m["mean_reward"]),
                   approx_kl=float(m["approx_kl"]),
                   log_std=float(jnp.asarray(
                       runner.params["params"]["log_std"]).mean()))
        if probe > best_probe:
            best_probe = probe
            best_params = jax.device_get(runner.params)
            with open(os.path.join(args.out, "best_rgb_scratch.msgpack"),
                      "wb") as f:
                f.write(serialization.to_bytes(best_params))
            if probe >= args.anchor_after:
                anchor, anchoring = best_params, True
        if probe >= args.protocol_gate:
            proto, n_eps = evaluate_policy(env_cfg, aux, runner.params,
                                           num_steps=2600, num_envs=1)
            row["protocol"] = float(proto)
            print(f"[u{u}] probe {probe:.1f} -> protocol {proto:.1f} "
                  f"({n_eps} eps)", flush=True)
            if proto >= args.threshold:
                with open(os.path.join(args.out,
                                       "rgb_scratch_solved.msgpack"),
                          "wb") as f:
                    f.write(serialization.to_bytes(
                        jax.device_get(runner.params)))
                curve.append(row)
                print(f"[SOLVED from scratch] protocol {proto:.2f} >= "
                      f"{args.threshold} at update {u} "
                      f"({u * ppo_cfg.batch_size} env-steps, "
                      f"{time.time()-t0:.0f}s)", flush=True)
                break
        curve.append(row)
        print(f"[{time.time()-t0:6.0f}s] u{u}/{args.updates} "
              f"probe {probe:.1f} best {best_probe:.1f} "
              f"train {row['train_r']:.2f} kl {row['approx_kl']:.4f} "
              f"anchor {'on' if anchoring else 'off'}", flush=True)
    with open(os.path.join(args.out,
                           f"rgb_scratch_s{args.seed}.json"), "w") as f:
        json.dump(dict(args=vars(args), curve=curve), f)


if __name__ == "__main__":
    main()
