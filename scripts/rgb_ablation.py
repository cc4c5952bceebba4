"""RGB-from-scratch PPO collapse ablation (VERDICT r3 item #5).

Round-3 finding: Hover-RGB PPO from random init collapses to a
constant-action attractor — deterministic eval freezes while log_std
anneals — across two seeds and two renderer versions; both committed RGB
checkpoints exist only via warm-start. The verdict suspects the
anneal/entropy schedule, not the task. This script runs the prescribed
ablation grid at a small fixed budget and records full learning curves, so
the outcome is either a from-scratch recipe or a real negative result with
data (docs/ROUND4.md):

  arms (each num_envs x n_steps = 64 x 128, ~1.6M env-steps):
    baseline   — the learn.py-style from-scratch config (anneal ON)
    no_anneal  — log_std anneal disabled
    ent_01     — no anneal + ent_coef 0.01 (entropy keeps exploration alive)
    kl_lr      — no anneal + KL-adaptive LR (target_kl 0.01, rl/ppo.py)
    fs8        — no anneal + frame_stack 8 (longer motion context)

Per arm: per-update mean reward + every-10-updates deterministic eval on
one env (260 steps, the single-episode probe; the 10-episode protocol gates
final claims), written to results/rgb_ablation.json. Run on the TPU chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    evaluate_policy,
    make_ppo_train_step,
    ppo_init,
)

ARMS = {
    "baseline": dict(log_std_anneal_to=-2.5),
    "no_anneal": dict(),
    "ent_01": dict(ent_coef=0.01),
    "kl_lr": dict(target_kl=0.01),
    "fs8": dict(frame_stack=8),
    # Round-4 follow-up arms: mixed deterministic/stochastic rollouts
    # (PPOConfig.det_frac) aimed at the measured collapse mechanism — the
    # stochastic objective is blind to mean-policy competence; det envs put
    # the mean policy's own states and returns into the batch.
    "det_mix": dict(target_kl=0.01, det_frac=0.25),
    "det_half": dict(target_kl=0.01, det_frac=0.5),
    "det_anneal": dict(det_frac=0.25, log_std_anneal_to=-2.5),
}


def run_arm(name, overrides, updates, num_envs, seed, ckpt_root=None):
    """One ablation arm; checkpoint/resumes every 10 updates when
    ``ckpt_root`` is set — the v5e's sustained-load client hangs (the
    round-3/round-4 failure mode, docs/PERF.md) kill long runs mid-arm, so
    an outer watchdog restarts this script and the arm continues from its
    last eval boundary instead of from scratch."""
    import json as _json

    from gym_pybullet_drones_tpu.runtime.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    frame_stack = overrides.pop("frame_stack", 4)
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=frame_stack,
    )
    anneal_to = overrides.pop("log_std_anneal_to", None)
    ppo_cfg = PPOConfig(
        num_envs=num_envs, n_steps=128,
        minibatch_size=min(1024, num_envs * 128),
        learning_rate=3e-4,
        log_std_anneal_to=anneal_to,
        log_std_anneal_updates=max(1, int(0.6 * updates)),
        **overrides,
    )
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(seed))
    curve, evals, start_u = [], [], 0
    ck_dir = os.path.join(ckpt_root, name) if ckpt_root else None
    if ck_dir and os.path.isdir(ck_dir) and latest_step(ck_dir) > 0:
        start_u = latest_step(ck_dir)
        runner = restore_checkpoint(ck_dir, runner, step=start_u)
        with open(os.path.join(ck_dir, "progress.json")) as f:
            prog = _json.load(f)
        curve, evals = prog["curve"], prog["evals"]
        print(f"[{name}] resumed at update {start_u}", flush=True)
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux),
                    donate_argnums=(0,))
    t0 = time.time()
    for u in range(start_u + 1, updates + 1):
        runner, m = train(runner)
        jax.block_until_ready(m["loss"])
        curve.append(float(m["mean_reward"]))
        if u % 10 == 0 or u == updates:
            ret, n = evaluate_policy(env_cfg, aux, runner.params,
                                     num_steps=260, num_envs=1)
            log_std = float(jnp.asarray(
                runner.params["params"]["log_std"]).mean())
            evals.append(dict(update=u, eval_return=ret, episodes=int(n),
                              log_std=log_std,
                              approx_kl=float(m["approx_kl"])))
            print(f"[{name}] u{u}/{updates} train_r/step "
                  f"{curve[-1]:.3f} eval {ret:.1f} log_std {log_std:.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if ck_dir:
                save_checkpoint(ck_dir, runner, step=u)
                with open(os.path.join(ck_dir, "progress.json"), "w") as f:
                    _json.dump(dict(curve=curve, evals=evals), f)
    return dict(arm=name, curve=curve, evals=evals,
                frame_stack=frame_stack, anneal_to=anneal_to,
                seconds=time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=200)  # 64*128*200 = 1.64M
    ap.add_argument("--num_envs", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--out", default="results/rgb_ablation.json")
    ap.add_argument("--ckpt_root", default="results/abl_ck",
                    help="mid-arm resume checkpoints ('' disables)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    results = []
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    done = {r["arm"] for r in results}
    for arm in args.arms.split(","):
        if arm in done:
            print(f"[skip] {arm} already recorded", flush=True)
            continue
        results.append(run_arm(arm, dict(ARMS[arm]), args.updates,
                               args.num_envs, args.seed,
                               ckpt_root=args.ckpt_root or None))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[saved] {args.out} after {arm}", flush=True)


if __name__ == "__main__":
    main()
