"""Headline benchmark: env-steps/s on one chip at 4096 vectorized drones.

Config 5 of BASELINE.json: a VelocityAviary-style swarm — 4096 single-drone
velocity-command environments in lockstep (embedded DSLPID + 5 PYB physics
substeps per env-step). The measured program is the fused structure-of-arrays
step (`ops/velocity_soa.py`, parity-tested against the general env step in
tests/test_soa.py) scanned over 200-step chunks. Set BENCH_BACKEND=aos to
measure the general array-of-structures step instead, or BENCH_BACKEND=pallas
for the single-kernel VMEM-resident Pallas rollout.

The reference's equivalent loop is host Python + PyBullet at O(100) steps/s
per env; the driver-set target of 1e6 aggregate env-steps/s/chip is the
baseline divisor for `vs_baseline`. Prints exactly one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.base import (
    AviaryConfig,
    TASK_VELOCITY,
    build_ctrl_params,
    build_params,
)
from gym_pybullet_drones_tpu.ops.velocity_soa import (
    soa_consts,
    soa_from_state,
    velocity_step_soa,
)
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset, make_batched_step

NUM_DRONES = 4096
# Env steps fused per device dispatch. Each dispatch costs ~30 ms of host/
# tunnel latency regardless of size, while the device itself runs ~1B
# env-steps/s — so throughput scales almost linearly with chunk size until
# device compute dominates (200 -> 27.8M, 12.8k -> 656M, 102k -> 987M
# steps/s measured). Production rollouts batch this way too: 102400 steps is
# ~35 min of 48 Hz sim time per dispatch.
CHUNK = 102400
REPEATS = 4


def _fixed_actions(cfg):
    """Formation-flight velocity references: unit compass headings at quarter
    speed-limit (pid_velocity.py:100-105 analogue)."""
    angles = jnp.linspace(0.0, 2.0 * jnp.pi, NUM_DRONES, endpoint=False)
    return (jnp.cos(angles), jnp.sin(angles), jnp.zeros(NUM_DRONES),
            jnp.full(NUM_DRONES, 0.25))


def _bench(run_chunk, state):
    state = run_chunk(state)
    jax.block_until_ready(state)
    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = run_chunk(state)
        jax.block_until_ready(state)
        best = max(best, NUM_DRONES * CHUNK / (time.perf_counter() - t0))
    return best


def main():
    backend = os.environ.get("BENCH_BACKEND", "soa")
    cfg = AviaryConfig(task=TASK_VELOCITY, pyb_freq=240, ctrl_freq=48)
    params = build_params(cfg)
    ctrl_params = build_ctrl_params(cfg)
    speed_limit = 0.03 * float(params.max_speed_kmh) * (1000.0 / 3600.0)
    ax, ay, az, amag = _fixed_actions(cfg)
    state0 = batch_reset(cfg, params, NUM_DRONES)

    if backend == "aos":
        target_pos = jnp.zeros((cfg.num_drones, 3), dtype=cfg.jnp_dtype)
        step = make_batched_step(cfg, params, ctrl_params, target_pos,
                                 auto_reset=False)
        action = jnp.stack([ax, ay, az, amag], -1)[:, None, :]

        @jax.jit
        def run_chunk(state):
            def body(s, _):
                s, _out = step(s, action)
                return s, None
            state, _ = jax.lax.scan(body, state, None, length=CHUNK, unroll=2)
            return state

        best = _bench(run_chunk, state0)
    elif backend == "pallas":
        from gym_pybullet_drones_tpu.ops.velocity_pallas import (
            make_velocity_rollout_pallas,
        )

        consts = soa_consts(ctrl_params, params)
        ro = jax.jit(make_velocity_rollout_pallas(
            consts, cfg.ctrl_timestep, cfg.pyb_timestep, cfg.steps_per_ctrl,
            speed_limit, CHUNK))
        action = dict(ax=ax, ay=ay, az=az, amag=amag)
        best = _bench(lambda s: ro(s, action), soa_from_state(state0))
    else:  # fused SoA scan (default)
        consts = soa_consts(ctrl_params, params)

        @jax.jit
        def run_chunk(s):
            def body(s, _):
                return velocity_step_soa(
                    consts, cfg.ctrl_timestep, cfg.pyb_timestep,
                    cfg.steps_per_ctrl, speed_limit, s, ax, ay, az, amag), None
            s, _ = jax.lax.scan(body, s, None, length=CHUNK, unroll=2)
            return s

        best = _bench(run_chunk, soa_from_state(state0))

    baseline = 1_000_000.0  # driver target (BASELINE.json)
    print(json.dumps({
        "metric": f"env-steps/s per chip, {NUM_DRONES}-drone VelocityAviary swarm",
        "value": round(best, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(best / baseline, 4),
    }))


if __name__ == "__main__":
    main()
