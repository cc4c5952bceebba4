"""Training experiments for the two unsolved learn.py configurations
(VERDICT round-1 items #3 and #4).

  rpm4  — HoverAviary, KIN obs, 4-dim ActionType.RPM, threshold 467
          (reference learn.py:82). Round-1 best deterministic eval was 271:
          the stochastic policy leaned on action noise for attitude dither.
          Fix under test: log-std annealing (PPOConfig.log_std_anneal_to).
  rgb   — HoverAviary, RGB obs (held 24 FPS frames), ONE_D_RPM, threshold 474
          (learn.py:79-80). A single frame carries no velocity info; fix
          under test: channel-wise frame stacking (AviaryConfig.frame_stack).

Writes progress (flushed) + best params msgpack to results/.
Run on the TPU chip: python scripts/train_hard_rl.py rpm4 [--steps 3e7]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# The container's sitecustomize pins the axon TPU plugin and ignores the
# JAX_PLATFORMS env var; honor it at config level (CLAUDE.md quirk).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from flax import serialization

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    evaluate_policy,
    make_ppo_train_step,
    ppo_init,
)
from gym_pybullet_drones_tpu.rl.warmstart import bc_pretrain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=["rpm4", "rgb", "pid", "vel", "one_d_pid",
                                     "one_d_rpm"])
    ap.add_argument("--multiagent", action="store_true",
                    help="MultiHoverAviary (2 drones); threshold 920")
    ap.add_argument("--contact", action="store_true",
                    help="train the way the reference trains (round-5, "
                         "VERDICT r4 #2): collisions=True with the "
                         "Bullet-faithful impulse solver — landmark "
                         "obstacles become real collision bodies and "
                         "multiagent fleets get drone-drone contact "
                         "(reference BaseAviary.py:370 + "
                         "BaseRLAviary.py:99-128). Evals run contact-on "
                         "too; checkpoints are suffixed _contact")
    ap.add_argument("--steps", type=float, default=None)
    ap.add_argument("--num_envs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--anneal_to", type=float, default=-2.5)
    ap.add_argument("--bc", action="store_true",
                    help="behavior-clone the DSLPID-in-band expert first (rpm4)")
    ap.add_argument("--bc_episodes", type=int, default=768)
    ap.add_argument("--bc_steps", type=int, default=20000)
    ap.add_argument("--bc_noise", type=float, default=0.25)
    ap.add_argument("--dagger", type=int, default=0)
    ap.add_argument("--hidden", type=int, default=64,
                    help="policy/value MLP width (SB3 default 64)")
    ap.add_argument("--anneal_frac", type=float, default=0.6)
    ap.add_argument("--frame_stack", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--threshold", type=float, default=None,
                    help="override the stop-on-solve bar (e.g. to train past "
                         "the reference threshold for cross-platform margin)")
    ap.add_argument("--init_ckpt", default=None,
                    help="warm-start from a params msgpack (e.g. a "
                         "checkpoints/*.msgpack trained before a renderer "
                         "or env change) instead of random init")
    ap.add_argument("--eval_eps", type=int, default=10,
                    help="consecutive deterministic episodes per eval; raise "
                         "to select checkpoints robust to float32 chaos "
                         "(TPU-trained policies are re-verified on CPU)")
    ap.add_argument("--out", default="results")
    ap.add_argument("--resume", action="store_true",
                    help="checkpoint the full runner at every eval boundary "
                         "and continue from the last one on rerun (v5e "
                         "sustained-load hang resilience, docs/PERF.md)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.case != "rgb":
        from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

        act = {"rpm4": ActionType.RPM, "pid": ActionType.PID,
               "vel": ActionType.VEL,
               "one_d_pid": ActionType.ONE_D_PID,
               "one_d_rpm": ActionType.ONE_D_RPM}[args.case]
        n_drones = 2 if args.multiagent else 1
        env_cfg = AviaryConfig(
            num_drones=n_drones,
            task=TASK_MULTIHOVER if args.multiagent else TASK_HOVER,
            action_type=act,
            obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
            action_buffer_size=15, episode_len_sec=8.0,
            collisions=args.contact,
            contact_mode="impulse" if args.contact else "clamp",
        )
        threshold = 920.0 if args.multiagent else 467.0  # learn.py:82
        total = int(args.steps or 3e7)
        num_envs = args.num_envs or 128
    else:
        from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

        n_drones = 2 if args.multiagent else 1
        env_cfg = AviaryConfig(
            num_drones=n_drones,
            task=TASK_MULTIHOVER if args.multiagent else TASK_HOVER,
            action_type=ActionType.ONE_D_RPM,
            obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
            action_buffer_size=15, episode_len_sec=8.0,
            frame_stack=args.frame_stack,
            collisions=args.contact,
            contact_mode="impulse" if args.contact else "clamp",
        )
        threshold = 949.5 if args.multiagent else 474.0
        total = int(args.steps or 3e6)
        num_envs = args.num_envs or 64

    if args.threshold is not None:
        threshold = args.threshold
    updates = max(1, total // (num_envs * 128))
    ppo_cfg = PPOConfig(
        num_envs=num_envs, n_steps=128,
        minibatch_size=min(1024, num_envs * 128),
        learning_rate=args.lr, hidden=(args.hidden, args.hidden),
        # RGB-single solved without annealing; the multiagent pixel bar
        # (949.5 vs joint optimum 950.61) leaves ~1 reward of headroom, so
        # it anneals like the KIN cases.
        log_std_anneal_to=(args.anneal_to
                           if (args.case != "rgb" or args.multiagent)
                           else None),
        log_std_anneal_updates=int(updates * args.anneal_frac),
    )
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(args.seed))
    if args.init_ckpt:
        with open(args.init_ckpt, "rb") as f:
            runner = runner.replace(
                params=serialization.from_bytes(runner.params, f.read()))
        ret0, n0 = evaluate_policy(env_cfg, aux, runner.params,
                                   num_steps=2600, num_envs=1)
        print(f"[init] warm-start {args.init_ckpt}: eval {ret0:.1f} "
              f"({n0} eps)", flush=True)
    if args.bc and args.case == "rpm4":
        runner, _ = bc_pretrain(env_cfg, runner, aux,
                                jax.random.key(args.seed + 1),
                                episodes=args.bc_episodes,
                                bc_steps=args.bc_steps, noise=args.bc_noise,
                                dagger_rounds=args.dagger)
        ret0, n0 = evaluate_policy(env_cfg, aux, runner.params,
                                   num_steps=260, num_envs=4)
        print(f"[bc] post-BC deterministic eval {ret0:.1f} ({n0} eps)",
              flush=True)
    # Crash/hang resume (round 4, VERDICT r3 item #2): the v5e's sustained
    # -load client hangs (docs/PERF.md) kill long training runs mid-flight;
    # with --resume the full runner checkpoints at every eval boundary and a
    # rerun (e.g. under an outer `while ! solved; do timeout ...; done`
    # watchdog) continues from the last one instead of from scratch.
    start_u = 0
    if args.resume:
        from gym_pybullet_drones_tpu.runtime.checkpoint import (
            latest_step,
            restore_checkpoint,
            save_checkpoint,
        )

        case_tag = (args.case + ("_ma" if args.multiagent else "")
                    + ("_contact" if args.contact else ""))
        ck_dir = os.path.join(args.out, f"resume_{case_tag}")
        if os.path.isdir(ck_dir) and latest_step(ck_dir) > 0:
            start_u = latest_step(ck_dir)
            runner = restore_checkpoint(ck_dir, runner, step=start_u)
            print(f"[resume] continuing from update {start_u}", flush=True)
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux),
                    donate_argnums=(0,))

    eval_every = max(1, updates // 60)
    best, best_params = -np.inf, runner.params
    t0 = time.time()
    print(f"[cfg] case={args.case} total={total} updates={updates} "
          f"num_envs={num_envs} anneal_to={ppo_cfg.log_std_anneal_to} "
          f"anneal_updates={ppo_cfg.log_std_anneal_updates}", flush=True)
    for u in range(start_u, updates):
        runner, metrics = train(runner)
        if (u + 1) % eval_every == 0 or u == updates - 1:
            # SB3-equivalent protocol: 10 consecutive episodes on ONE env
            # (the action buffer persists across auto-resets, reference
            # BaseRLAviary.py:153-155, so consecutive episodes differ; a
            # single-episode eval overstates robustness).
            ret, n_eps = evaluate_policy(env_cfg, aux, runner.params,
                                         num_steps=260 * args.eval_eps,
                                         num_envs=1)
            ls = np.asarray(runner.params["params"]["log_std"]).mean()
            print(f"[{time.time()-t0:7.1f}s] upd {u+1}/{updates} "
                  f"steps {(u+1)*ppo_cfg.batch_size/1e6:.2f}M "
                  f"eval {ret:.1f} ({n_eps} eps) "
                  f"train r/step {float(metrics['mean_reward']):.3f} "
                  f"log_std {ls:.2f}", flush=True)
            if ret > best:
                best, best_params = ret, jax.device_get(runner.params)
                tag = (args.case + ("_ma" if args.multiagent else "")
                       + ("_contact" if args.contact else ""))
                with open(os.path.join(
                        args.out, f"best_{tag}.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(best_params))
            if args.resume:
                save_checkpoint(ck_dir, runner, step=u + 1)
            if ret >= threshold:
                print(f"[SOLVED] {ret:.1f} >= {threshold}", flush=True)
                break
    ret, n_eps = evaluate_policy(env_cfg, aux, best_params,
                                 num_steps=260 * args.eval_eps, num_envs=1)
    print(f"[FINAL] best-checkpoint deterministic eval {ret:.2f} "
          f"over {n_eps} episodes (threshold {threshold})", flush=True)


if __name__ == "__main__":
    main()
