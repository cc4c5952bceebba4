"""Coupled-swarm throughput with contact physics enabled (VERDICT r1 item #2).

Measures `runtime/swarm.make_big_swarm_physics` (PYB_DW + 5 substeps, tiled
Pallas downwash + tiled Pallas drone-drone contact) at N drones on one chip,
with a lax.scan chunk per dispatch. Prints drone-steps/s for collisions
on/off. Run on the real TPU: `python scripts/collide_bench.py [N] [CHUNK]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    # Grid pitch in meters. 0.5 (default, the round-1/2 ladder) is a
    # VERY dense pack — a 20 m cube at 65k where ~30% of all pairs genuinely
    # interact through the 10 m wake cutoff (docs/PERF.md SOL analysis);
    # realistic large-fleet spacing (2-4 m) is where neighbor pruning bites.
    pitch = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    params = drone_params(DroneModel.CF2X)
    rng = np.random.default_rng(0)
    side = int(round(n ** (1 / 3))) + 1
    g = np.stack(np.meshgrid(*[np.arange(side) * pitch] * 3),
                 -1).reshape(-1, 3)[:n]
    pos = jnp.asarray((g + rng.uniform(-0.2 * pitch, 0.2 * pitch, g.shape)
                       + [0, 0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)

    # Default: the factory's geometry-based choice (runtime.swarm.
    # select_swarm_backend — binned for big spread fleets, soa otherwise);
    # SWARM_BACKEND pins a specific backend for sweeps.
    backend = os.environ.get("SWARM_BACKEND", "")
    if not backend:
        from gym_pybullet_drones_tpu.runtime.swarm import select_swarm_backend

        backend = select_swarm_backend(np.asarray(pos))
        print(f"auto backend: {backend}", flush=True)
    rpm_cols = [rpm[:, m] for m in range(4)]

    for collisions in (False, True):
        if backend == "binned":
            from gym_pybullet_drones_tpu.ops.swarm_binned import (
                binned_geometry, make_binned_swarm,
            )

            resort = int(os.environ.get("SWARM_RESORT", "4"))
            # SWARM_CELL/SWARM_CAP override the auto geometry; SWARM_OCC
            # picks the occupancy target for the auto cell size; SWARM_BS
            # sub-divides cells into finer source tiles.
            occ = int(os.environ.get("SWARM_OCC", "256"))
            # SWARM_CELL pins the cell size; binned_geometry recomputes the
            # grid AND the cap for it (advisor round-4: keeping the auto-cell
            # cap made every rebin take the dense-packed overflow branch).
            cell_env = os.environ.get("SWARM_CELL", "")
            cell, bnx, bny, bcap = binned_geometry(
                np.asarray(pos), occ_target=occ,
                cell=float(cell_env) if cell_env else None)
            if os.environ.get("SWARM_CAP", ""):
                bcap = int(os.environ["SWARM_CAP"])
            bs_env = os.environ.get("SWARM_BS", "")
            bt_env = os.environ.get("SWARM_BT", "")
            print(f"binned geometry: cell={cell:.2f} grid={bnx}x{bny} "
                  f"cap={bcap} slots={bnx * bny * bcap}", flush=True)
            init, sstep, export = make_binned_swarm(
                params, 1 / 240, 5, collisions=collisions, cell_size=cell,
                nx=bnx, ny=bny, cap=bcap, resort_every=resort,
                bt=int(bt_env) if bt_env else None,
                bs=int(bs_env) if bs_env else None)
            s0 = jax.jit(init)(kin)

            @jax.jit
            def run_chunk(s, rpm_cols):
                def body(s, _):
                    return sstep(s, rpm_cols), None
                s, _ = jax.lax.scan(body, s, None, length=chunk)
                return s

            args = (s0, rpm_cols)
        elif backend == "sorted":
            from gym_pybullet_drones_tpu.ops.swarm_soa import make_sorted_swarm

            order = os.environ.get("SWARM_ORDER", "z")
            resort = int(os.environ.get("SWARM_RESORT", "4"))
            # SWARM_NBR: "" = off, "auto" = auto cap, int = pinned cap;
            # SWARM_BT/SWARM_BS pick the tile shape (nbr path wants finer
            # source tiles than the dense grid, e.g. BT=256 BS=128).
            nbr = os.environ.get("SWARM_NBR", "")
            nbr_cap = (None if nbr == "" else
                       True if nbr == "auto" else int(nbr))
            bt = int(os.environ.get("SWARM_BT", "256"))
            bs_env = os.environ.get("SWARM_BS", "")
            init, sstep, export = make_sorted_swarm(
                params, 1 / 240, 5, collisions=collisions, order=order,
                resort_every=resort, neighbor_cap=nbr_cap, bt=bt,
                bs=int(bs_env) if bs_env else None)
            s0 = jax.jit(init)(kin)

            @jax.jit
            def run_chunk(s, rpm_cols):
                def body(s, _):
                    return sstep(s, rpm_cols), None
                s, _ = jax.lax.scan(body, s, None, length=chunk)
                return s

            args = (s0, rpm_cols)
        elif backend == "soa":
            from gym_pybullet_drones_tpu.ops.swarm_soa import (
                make_swarm_step_soa, swarm_soa_from_kin,
            )

            soa_step = make_swarm_step_soa(params, 1 / 240, 5,
                                           collisions=collisions)
            s0 = swarm_soa_from_kin(kin)

            @jax.jit
            def run_chunk(s, rpm_cols):
                def body(s, _):
                    return soa_step(s, rpm_cols), None
                s, _ = jax.lax.scan(body, s, None, length=chunk)
                return s

            args = (s0, rpm_cols)
        else:
            step = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB_DW,
                                          collisions=collisions)

            @jax.jit
            def run_chunk(kin, rpm):
                def body(carry, _):
                    kin, last = carry
                    kin, last = step(kin, rpm, last)
                    return (kin, last), None
                (kin, last), _ = jax.lax.scan(body, (kin, rpm), None,
                                              length=chunk)
                return kin

            args = (kin, rpm)

        out = run_chunk(*args)
        jax.block_until_ready(out)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_chunk(*args)
            jax.block_until_ready(out)
            dt_s = time.perf_counter() - t0
            best = max(best, n * chunk / dt_s)
        print(f"backend={backend} collisions={collisions}: {best:,.0f} "
              f"drone-steps/s ({best / n:,.0f} control-steps/s) at N={n}",
              flush=True)


if __name__ == "__main__":
    main()
