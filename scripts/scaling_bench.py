"""Weak-scaling harness: sharded env batches over an N-device mesh.

Measures aggregate env-steps/s of the VelocityAviary swarm with the env axis
sharded over 1, 2, 4, ... devices (drones per device held constant — weak
scaling). On a multi-chip TPU slice this exercises ICI-sharded execution; on
a dev box run it against a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py

The env axis is embarrassingly parallel (XLA inserts no collectives), so
ideal weak scaling is flat time / linear throughput; deviations expose
runtime dispatch overheads. Cross-shard physics (downwash all_gather) is
exercised separately by `runtime/mesh.make_swarm_downwash_fn`.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The container's sitecustomize pins the axon TPU plugin and ignores the
# JAX_PLATFORMS env var; honor it at config level (CLAUDE.md quirk).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.base import (
    AviaryConfig,
    TASK_VELOCITY,
    build_ctrl_params,
    build_params,
)
from gym_pybullet_drones_tpu.runtime.mesh import (
    env_sharding,
    make_mesh,
    shard_env_batch,
)
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset

PER_DEVICE = 1024
CHUNK = 50
REPEATS = 3


def run_at(n_devices: int):
    mesh = make_mesh(("env",), devices=jax.devices()[:n_devices])
    cfg = AviaryConfig(task=TASK_VELOCITY, pyb_freq=240, ctrl_freq=48)
    params = build_params(cfg)
    ctrl_params = build_ctrl_params(cfg)
    tp = jnp.zeros((cfg.num_drones, 3), dtype=cfg.jnp_dtype)
    E = PER_DEVICE * n_devices
    from gym_pybullet_drones_tpu.runtime.rollout import make_batched_step

    raw_step = make_batched_step(cfg, params, ctrl_params, tp, auto_reset=False)
    state = shard_env_batch(mesh, batch_reset(cfg, params, E))
    angles = jnp.linspace(0.0, 2 * jnp.pi, E, endpoint=False)
    action = jax.device_put(
        jnp.stack([jnp.cos(angles), jnp.sin(angles), jnp.zeros_like(angles),
                   jnp.full_like(angles, 0.25)], -1)[:, None, :],
        env_sharding(mesh))
    sh = env_sharding(mesh)

    # One fused scan per measurement so per-dispatch latency amortizes
    # (docs/PERF.md "chunk amortization").
    @partial(jax.jit, out_shardings=None)
    def chunk(state):
        def body(s, _):
            s, _out = raw_step(s, action)
            return s, None
        state, _ = jax.lax.scan(body, state, None, length=CHUNK)
        return state

    state = chunk(state)
    jax.block_until_ready(state)
    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = chunk(state)
        jax.block_until_ready(state)
        best = max(best, E * CHUNK / (time.perf_counter() - t0))
    return best


def main():
    # Multi-host entry (docs/SCALING.md): run the SAME command on every host
    # of the pod slice with --coordinator host0:1234 --num_processes H
    # --process_id h (or rely on the TPU pod auto-detection by passing only
    # --distributed). Single-host runs skip initialize entirely.
    ap = argparse.ArgumentParser()
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() (TPU pods "
                         "auto-detect coordinator/process ids)")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (non-TPU or manual setups)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()
    if args.distributed or args.coordinator is not None:
        kwargs = {}
        if args.coordinator is not None:
            kwargs = dict(coordinator_address=args.coordinator,
                          num_processes=args.num_processes,
                          process_id=args.process_id)
        jax.distributed.initialize(**kwargs)
        print(json.dumps({"process": jax.process_index(),
                          "processes": jax.process_count(),
                          "local_devices": jax.local_device_count(),
                          "global_devices": jax.device_count()}))
    n_avail = len(jax.devices())
    results = []
    n = 1
    while n <= n_avail:
        rate = run_at(n)
        results.append({"devices": n, "envs": PER_DEVICE * n,
                        "steps_per_s": round(rate, 1),
                        "per_device": round(rate / n, 1)})
        print(json.dumps(results[-1]))
        n *= 2
    if len(results) > 1:
        eff = results[-1]["per_device"] / results[0]["per_device"]
        print(json.dumps({"weak_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
