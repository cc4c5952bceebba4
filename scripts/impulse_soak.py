"""Soak repro + mitigation harness for impulse-mode PPO on the v5e.

Round-3 finding (docs/ROUND3.md honest ledger): PPO training with
``contact_mode="impulse"`` at 128 envs x 128 steps crashes the v5e TPU
worker under SUSTAINED load — repeated train-loop + eval dispatches —
reproduced 2/3, while every component in isolation (rollout-only 128x128,
one full train step, a 10-step loop, 16x16 training, everything on CPU)
runs clean. VERDICT r3 item 2 asks for a minimal repro and mitigations in
order: smaller fused dispatch chunks, de-donated buffers, reduced live
sets, XLA flag bisect; success = >=50 consecutive impulse-mode updates at
128x128 on the real chip, or a documented repro + resume harness.

This script is that repro: N consecutive update dispatches with flushed
per-update progress (so the crash point is visible in the log), optional
eval interleave (the round-3 crash loop had them), and the mitigation
knobs exposed as flags.

Usage (on the TPU chip — do NOT force CPU):
    python scripts/impulse_soak.py --updates 50                 # repro
    python scripts/impulse_soak.py --updates 50 --no-donate     # mitigation 2
    python scripts/impulse_soak.py --updates 50 --chunk 5       # fused chunks
    python scripts/impulse_soak.py --updates 50 --eval-every 10 # + eval load

Exits 0 after completing all updates; a worker crash surfaces as a raised
XlaRuntimeError / hung dispatch (run under `timeout`).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    evaluate_policy,
    make_ppo_train_loop,
    make_ppo_train_step,
    ppo_init,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=50)
    ap.add_argument("--num_envs", type=int, default=128)
    ap.add_argument("--n_steps", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=1,
                    help="updates fused per dispatch (make_ppo_train_loop)")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable donate_argnums on the train step")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="interleave an eval dispatch every K updates "
                         "(round-3 crash loop shape); 0 disables")
    ap.add_argument("--num_drones", type=int, default=1)
    ap.add_argument("--cpu", action="store_true", help="force CPU (control)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # NOTE: do NOT enable jax_compilation_cache_dir here — measured on this
    # image, any device op with the persistent cache enabled wedges the
    # remote axon worker (even a trivial reduction; the worker needs its
    # auto-restart afterwards). Tunnel compiles stay uncached.
    print(f"[soak] devices: {jax.devices()}", flush=True)

    env_cfg = AviaryConfig(
        num_drones=args.num_drones, task=TASK_HOVER,
        action_type=ActionType.ONE_D_RPM, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
        collisions=args.num_drones > 1, contact_mode="impulse",
    )
    ppo_cfg = PPOConfig(num_envs=args.num_envs, n_steps=args.n_steps)
    t_init = time.time()
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(0))
    jax.block_until_ready(runner.obs)
    print(f"[soak] ppo_init done in {time.time() - t_init:.1f}s", flush=True)

    if args.chunk > 1:
        train = make_ppo_train_loop(env_cfg, ppo_cfg, aux, args.chunk)
    else:
        step = make_ppo_train_step(env_cfg, ppo_cfg, aux)
        train = (jax.jit(step) if args.no_donate
                 else jax.jit(step, donate_argnums=(0,)))

    # Split trace/lower (local) from compile (remote over the tunnel) so the
    # hang point is visible in the log.
    t_low = time.time()
    lowered = train.lower(runner)
    print(f"[soak] lowered in {time.time() - t_low:.1f}s", flush=True)
    t_comp = time.time()
    train = lowered.compile()
    print(f"[soak] compiled in {time.time() - t_comp:.1f}s", flush=True)

    t0 = time.time()
    done_updates = 0
    while done_updates < args.updates:
        t1 = time.time()
        runner, metrics = train(runner)
        jax.block_until_ready(metrics)
        done_updates += args.chunk
        loss = float(jnp.asarray(metrics["loss"]).ravel()[-1])
        print(f"[soak] update {done_updates}/{args.updates} "
              f"loss {loss:.4f} dt {time.time() - t1:.2f}s "
              f"elapsed {time.time() - t0:.1f}s", flush=True)
        if args.eval_every and done_updates % args.eval_every == 0:
            te = time.time()
            ret, n = evaluate_policy(env_cfg, aux, runner.params,
                                     num_steps=260, num_envs=4)
            print(f"[soak]   eval return {ret:.1f} ({n} eps) "
                  f"dt {time.time() - te:.2f}s", flush=True)
    print(f"[soak] COMPLETED {done_updates} updates in "
          f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
