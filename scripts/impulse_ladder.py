"""Impulse-solver fleet ladder: cost of Bullet-grade contact vs the clamp
(VERDICT r4 #4 "Done" criterion).

Measures `step_physics(contact_mode="impulse", collisions=True)` — plane
rows + the round-5 neighbor-compacted drone-drone pair rows — against the
clamp/spring pipeline at fleet sizes through 4096+, on a co-planar
contact-rich lattice (drones 10 cm apart laterally: inside the 12 cm
contact diameter, so pair rows are ACTIVE — a worst-case contact load,
not an empty-fleet sham). Prints one JSON line per row.

Run on the TPU chip:  python scripts/impulse_ladder.py [sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, step_physics
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics

CHUNK = 50
IMPULSE_CHUNK = 10   # the v5e faults on long outer scans of the deeply
                     # nested impulse program (CLAUDE.md round-5 class);
                     # at 32k+ drones the safe length shrinks below 50 —
                     # 10-step chunks measured identical throughput
REPEATS = 3


def fleet(n, seed=0):
    """Contact-rich co-planar lattice: 10 cm pitch (2r = 12 cm -> every
    lateral neighbor pair is in contact), hovering at 1 m."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n)))
    g = np.stack(np.meshgrid(np.arange(side) * 0.10,
                             np.arange(side) * 0.10), -1).reshape(-1, 2)[:n]
    pos = np.concatenate([g, np.full((n, 1), 1.0)], 1).astype(np.float32)
    pos[:, :2] += rng.uniform(-0.005, 0.005, (n, 2)).astype(np.float32)
    return init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]
    # LADDER_MODES=impulse skips the clamp arm: its dense per-substep pair
    # pass is O(N^2) memory and OOMs the chip beyond ~32k drones (the
    # production large-N clamp path is runtime.make_swarm_physics, measured
    # in PERF.md's megadrone ladder — this script measures the solver).
    modes = tuple(os.environ.get("LADDER_MODES", "clamp,impulse").split(","))
    params = drone_params(DroneModel.CF2X)
    for n in sizes:
        kin0 = fleet(n)
        rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
        for mode in modes:
            chunk = IMPULSE_CHUNK if mode == "impulse" else CHUNK

            @jax.jit
            def run_chunk(kin, last):
                def body(carry, _):
                    kin, last = carry
                    kin, last = step_physics(
                        kin, rpm, last, params, 1 / 240, 5, Physics.PYB,
                        collisions=True, contact_mode=mode)
                    return (kin, last), None
                (kin, last), _ = jax.lax.scan(body, (kin, rpm), None,
                                              length=chunk)
                return kin, last

            kin, last = run_chunk(kin0, rpm)
            jax.block_until_ready(kin)
            best = 0.0
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                kin, last = run_chunk(kin, last)
                jax.block_until_ready(kin)
                best = max(best, n * chunk / (time.perf_counter() - t0))
            p = np.asarray(kin.pos)
            sane = bool(np.all(np.isfinite(p)) and p[:, 2].max() < 5.0
                        and p[:, 2].min() > -0.1)
            print(json.dumps({
                "metric": f"drone-steps/s {mode} contact",
                "n": n, "value": round(best),
                "unit": "drone-steps/s", "sane": sane,
            }), flush=True)


if __name__ == "__main__":
    main()
