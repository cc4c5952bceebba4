"""Headline benchmark: env-steps/s on one chip at 4096 vectorized drones.

Config 5 of BASELINE.json: a VelocityAviary-style swarm — 4096 single-drone
velocity-command environments advanced in lockstep (vmap over envs, lax.scan
over time, embedded DSLPID per drone) as one jitted program with donated state.
The reference's equivalent loop is host Python + PyBullet at O(100) steps/s per
env; the driver-set target is 1e6 aggregate env-steps/s/chip, used as the
baseline divisor for `vs_baseline`.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_VELOCITY, build_ctrl_params, build_params
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset, make_batched_step

NUM_DRONES = 4096
CHUNK = 200  # env steps fused per device call
REPEATS = 5


def main():
    cfg = AviaryConfig(task=TASK_VELOCITY, pyb_freq=240, ctrl_freq=48)
    params = build_params(cfg)
    ctrl_params = build_ctrl_params(cfg)
    target_pos = jnp.zeros((cfg.num_drones, 3), dtype=cfg.jnp_dtype)
    step = make_batched_step(cfg, params, ctrl_params, target_pos, auto_reset=False)

    state = batch_reset(cfg, params, NUM_DRONES)
    # Fixed formation-flight velocity references: unit headings around the
    # compass, quarter speed-limit magnitude (pid_velocity.py:100-105 analogue).
    angles = jnp.linspace(0.0, 2.0 * jnp.pi, NUM_DRONES, endpoint=False)
    action = jnp.stack(
        [jnp.cos(angles), jnp.sin(angles), jnp.zeros_like(angles),
         jnp.full_like(angles, 0.25)], -1
    )[:, None, :]  # (E, N=1, 4)

    @jax.jit
    def run_chunk(state):
        def body(s, _):
            s, out = step(s, action)
            return s, None
        state, _ = jax.lax.scan(body, state, None, length=CHUNK)
        return state

    # Warm-up / compile
    state = run_chunk(state)
    jax.block_until_ready(state)

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = run_chunk(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        best = max(best, NUM_DRONES * CHUNK / dt)

    baseline = 1_000_000.0  # driver target (BASELINE.json)
    print(json.dumps({
        "metric": f"env-steps/s per chip, {NUM_DRONES}-drone VelocityAviary swarm",
        "value": round(best, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(best / baseline, 4),
    }))


if __name__ == "__main__":
    main()
