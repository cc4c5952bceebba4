"""Microprofile of the coupled-swarm pair-pass components on one TPU chip.

Times each piece in isolation (argsort, gather/scatter, dw pass sorted and
unsorted, interact pass, collide pass, bare SoA substep chain) to guide the
round-3 neighbor-pruning work. Run: python scripts/pair_profile.py [N].
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3  # ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    params = drone_params(DroneModel.CF2X)
    rng = np.random.default_rng(0)
    side = int(round(n ** (1 / 3))) + 1
    g = np.stack(np.meshgrid(*[np.arange(side) * 0.5] * 3), -1).reshape(-1, 3)[:n]
    pos = jnp.asarray((g + rng.uniform(-0.1, 0.1, g.shape) + [0, 0, 1.0])
                      .astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 0.1, (n, 3)).astype(np.float32))
    cols = [pos[:, i] for i in range(3)] + [vel[:, i] for i in range(3)]

    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_pallas
    from gym_pybullet_drones_tpu.ops.interact_pallas import make_interact_pallas
    from gym_pybullet_drones_tpu.ops.collide_pallas import make_collide_pallas
    from gym_pybullet_drones_tpu.ops.velocity_soa import (
        physics_consts, physics_substep_soa)

    c = physics_consts(params)
    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]

    t = bench(jax.jit(lambda z: jnp.argsort(z)), cols[2])
    print(f"argsort(z) ({n}): {t:.3f} ms")
    order = jnp.argsort(cols[2])
    t = bench(jax.jit(lambda o, a: [x[o] for x in a]), order, cols)
    print(f"gather 6 cols: {t:.3f} ms")
    t = bench(jax.jit(lambda o, a: [jnp.zeros_like(x).at[o].set(x) for x in a]),
              order, cols)
    print(f"scatter 6 cols: {t:.3f} ms")

    for z_sort in (False, True):
        dw = make_downwash_pallas(params, z_sort=z_sort)
        t = bench(jax.jit(lambda x, y, z: dw.cols(x, y, z)), *cols[:3])
        print(f"dw pass z_sort={z_sort}: {t:.3f} ms")
        ia = make_interact_pallas(params, z_sort=z_sort)
        t = bench(jax.jit(lambda *a: ia.cols(*a)), *cols)
        print(f"interact pass z_sort={z_sort}: {t:.3f} ms")
        co = make_collide_pallas(params, z_sort=z_sort)
        t = bench(jax.jit(lambda *a: co.cols(*a)), *cols)
        print(f"collide pass z_sort={z_sort}: {t:.3f} ms")

    @jax.jit
    def chain(px, py, pz, qx, qy, qz, qw, vx, vy, vz, wx, wy, wz, mag):
        out = physics_substep_soa(c, 1 / 240, px, py, pz, qx, qy, qz, qw,
                                  vx, vy, vz, wx, wy, wz, rpm_cols,
                                  fz_body=mag)
        return out

    q = [jnp.zeros(n, jnp.float32)] * 3 + [jnp.ones(n, jnp.float32)]
    w = [jnp.zeros(n, jnp.float32)] * 3
    mag = jnp.zeros(n, jnp.float32)
    t = bench(chain, *cols[:3], *q, *cols[3:], *w, mag)
    print(f"bare SoA substep chain: {t:.3f} ms")


if __name__ == "__main__" and not os.environ.get("MASKED"):
    main()


def masked_profile():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    params = drone_params(DroneModel.CF2X)
    rng = np.random.default_rng(0)
    side = int(round(n ** (1 / 3))) + 1
    g = np.stack(np.meshgrid(*[np.arange(side) * 0.5] * 3), -1).reshape(-1, 3)[:n]
    pos = np.asarray((g + rng.uniform(-0.1, 0.1, g.shape) + [0, 0, 1.0])
                     .astype(np.float32))
    order = np.argsort(pos[:, 2])
    pos = jnp.asarray(pos[order])  # pre-sorted: same culling potential
    vel = jnp.asarray(rng.normal(0, 0.1, (n, 3)).astype(np.float32))
    cols = [pos[:, i] for i in range(3)] + [vel[:, i] for i in range(3)]

    from gym_pybullet_drones_tpu.ops.downwash_pallas import (
        make_downwash_masked, make_downwash_pallas)
    from gym_pybullet_drones_tpu.ops.interact_pallas import (
        make_interact_masked)
    from gym_pybullet_drones_tpu.ops.spatial import (
        contact_live_mask, wake_live_mask)

    t = bench(jax.jit(lambda x, y, z: wake_live_mask(
        x, y, z, 256, 512, params=params)), *cols[:3])
    print(f"wake mask compute: {t:.3f} ms")
    mask = wake_live_mask(*cols[:3], 256, 512, params=params)
    print("wake mask live frac:", float(mask.mean()))
    mc = contact_live_mask(*cols[:3], 256, 512, 0.12)
    print("contact mask live frac:", float(mc.mean()))

    dwm = make_downwash_masked(params)
    t = bench(jax.jit(lambda x, y, z: dwm.cols(x, y, z)), *cols[:3])
    print(f"masked dw pass (presorted z): {t:.3f} ms")
    # reference: sorted kernel given PRE-SORTED data still re-sorts internally
    dws = make_downwash_pallas(params, z_sort=True)
    t = bench(jax.jit(lambda x, y, z: dws.cols(x, y, z)), *cols[:3])
    print(f"z_sort dw pass: {t:.3f} ms")
    iam = make_interact_masked(params)
    t = bench(jax.jit(lambda *a: iam.cols(*a)), *cols)
    print(f"masked interact pass (presorted z): {t:.3f} ms")


if __name__ == "__main__" and os.environ.get("MASKED"):
    masked_profile()
