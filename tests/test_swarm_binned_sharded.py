"""Sharded binned cell-list swarm: multi-device parity (VERDICT r4 #1).

The round-4 binned backend becomes a first-class runtime path in round 5:
the same (init, step, export) loop runs with its slot axis sharded over a
`jax.sharding.Mesh` (whole-cell slabs per device, pair sources all-gathered
through the kernels' rectangular ``src`` entries). These tests pin, on the
8-virtual-device CPU mesh (conftest):

* rectangular masked kernels == square masked kernels sliced (unit level);
* the sharded binned loop == the single-device binned loop (bit-level
  target: same (bt, bs) tiles, same ascending source order) == the dense
  SoA step (tolerance level), with and without contact.

Reference behavior anchored: the 10 m wake cutoff neighborhood
(BaseAviary.py:801) and whole-fleet contact resolution (BaseAviary.py:370).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel
from gym_pybullet_drones_tpu.ops.swarm_binned import (
    binned_geometry,
    make_binned_swarm,
    shard_binned_state,
)
from gym_pybullet_drones_tpu.runtime import mesh as meshmod


def _spread_fleet(n=512, pitch=4.0, seed=3):
    rng = np.random.RandomState(seed)
    side = int(round(n ** (1 / 3))) + 1
    g = np.stack(np.meshgrid(*[np.arange(side) * pitch] * 3),
                 -1).reshape(-1, 3)[:n]
    pos = (g + rng.uniform(-0.3, 0.3, g.shape) + [0, 0, 1.0]).astype(
        np.float32)
    kin = init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    vel = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    return kin.replace(vel=jnp.asarray(vel))


def test_rectangular_masked_kernels_match_square_slices():
    """The rectangular (src=) masked kernels == the square masked kernels'
    corresponding target rows, bit-exactly: same (bt, bs), same ascending
    source order, sources = the full set, targets = one slab — exactly the
    sharded decomposition."""
    from gym_pybullet_drones_tpu.ops.downwash_pallas import (
        make_downwash_masked,
    )
    from gym_pybullet_drones_tpu.ops.interact_pallas import (
        make_interact_masked,
    )

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.RandomState(7)
    cols = [jnp.asarray(a.astype(np.float32)) for a in (
        rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
        rng.uniform(0.5, 6.0, n),
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
        rng.uniform(-1, 1, n))]
    # padded-layout validity pattern: last 128 slots are padding
    valid = jnp.asarray(np.arange(n) < n - 128)
    sent = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    cols = [jnp.where(valid, a, 0.0) for a in cols]
    cols[2] = jnp.where(valid, cols[2], sent)  # z sentinel for padding

    for maker, nargs in ((make_downwash_masked, 3),
                         (make_interact_masked, 6)):
        kern = maker(params, bt=64, bs=128, interpret=True,
                     neighbor_cap=4, dense_fallback=False)
        full = kern.cols(*cols[:nargs], valid=valid)
        lo, hi = 128, 256  # one slab
        tgt = [a[lo:hi] for a in cols[:nargs]]
        rect = kern.cols(*tgt, valid=valid[lo:hi],
                         src=tuple(cols[:nargs]), src_valid=valid)
        flat_full = jax.tree.leaves(full)
        flat_rect = jax.tree.leaves(rect)
        for f, r in zip(flat_full, flat_rect):
            np.testing.assert_array_equal(np.asarray(f)[lo:hi],
                                          np.asarray(r))


def test_sharded_binned_matches_single_device():
    """8-device sharded binned loop == single-device binned loop over
    several control steps (resorts included), contact off AND on, plus the
    dense-SoA cross-check on the contact-off arm."""
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )

    params = drone_params(DroneModel.CF2X)
    kin = _spread_fleet()
    n = kin.pos.shape[0]
    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]
    steps = 3

    mesh = meshmod.make_mesh()
    assert mesh.size == 8
    cell, nx, ny, cap = binned_geometry(np.asarray(kin.pos), occ_target=64)
    # whole-cell slabs per device: pad the grid up to a multiple of 8 cells
    while (nx * ny) % mesh.size != 0:
        ny += 1

    # (collisions, forced neighbor_cap): the None rows run the compacted
    # grid; the cap-1 row FORCES the per-device live-tile overflow so the
    # rectangular z-sorted fallback branch is what executes under shard_map
    for collisions, nbr_cap in ((False, None), (True, None), (True, 1)):
        kw = dict(cell_size=cell, nx=nx, ny=ny, cap=cap, resort_every=2,
                  collisions=collisions, interpret=True,
                  neighbor_cap=nbr_cap)
        init, sstep, export = make_binned_swarm(params, 1 / 240, 5, **kw)
        s = jax.jit(init)(kin)
        run1 = jax.jit(lambda s, r: jax.lax.scan(
            lambda ss, _: (sstep(ss, r), None), s, None, length=steps)[0])
        ref_kin = export(run1(s, rpm_cols), kin)

        initm, sstepm, exportm = make_binned_swarm(params, 1 / 240, 5,
                                                   mesh=mesh, **kw)
        sm = shard_binned_state(mesh, jax.jit(initm)(kin))
        runm = jax.jit(lambda s, r: jax.lax.scan(
            lambda ss, _: (sstepm(ss, r), None), s, None, length=steps)[0])
        got_kin = exportm(runm(sm, rpm_cols), kin)

        np.testing.assert_allclose(np.asarray(got_kin.pos),
                                   np.asarray(ref_kin.pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_kin.vel),
                                   np.asarray(ref_kin.vel), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_kin.quat),
                                   np.asarray(ref_kin.quat), atol=1e-7)

        if not collisions:
            soa_step = make_swarm_step_soa(params, 1 / 240, 5,
                                           collisions=False, interpret=True)
            ss = swarm_soa_from_kin(kin)
            for _ in range(steps):
                ss = soa_step(ss, rpm_cols)
            dense_kin = swarm_soa_to_kin(ss, kin)
            np.testing.assert_allclose(np.asarray(got_kin.pos),
                                       np.asarray(dense_kin.pos), atol=1e-4)


def test_swarm_physics_factory():
    """`runtime.make_swarm_physics`: uniform (init, step, export) contract
    across backends, geometry-based auto selection, no env vars."""
    from gym_pybullet_drones_tpu.runtime.swarm import (
        make_swarm_physics,
        select_swarm_backend,
    )

    # auto-selection rule (pure, cheap): spread big fleet -> binned;
    # dense pack or small fleet -> soa; any mesh -> binned
    rng = np.random.RandomState(0)
    spread = rng.uniform(0, 400, (20000, 3))   # pitch ~14 m
    dense = rng.uniform(0, 12, (20000, 3))     # pitch ~0.4 m
    small = rng.uniform(0, 400, (512, 3))
    assert select_swarm_backend(spread) == "binned"
    assert select_swarm_backend(dense) == "soa"
    assert select_swarm_backend(small) == "soa"
    assert select_swarm_backend(small, mesh=meshmod.make_mesh()) == "binned"

    # both concrete backends run a few steps through the SAME contract and
    # agree (the spread lattice keeps the pair terms well-conditioned)
    params = drone_params(DroneModel.CF2X)
    kin = _spread_fleet(n=256, pitch=4.0)
    rpm = jnp.full((256, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]
    outs = {}
    for backend, kw in (("soa", {}), ("binned", {}),
                        ("soa", dict(sorted=True, resort_every=2))):
        init, step, export = make_swarm_physics(
            params, 1 / 240, 5, collisions=True, init_pos=kin,
            backend=backend, interpret=True, **kw)
        s = jax.jit(init)(kin)
        for _ in range(2):
            s = jax.jit(step)(s, rpm_cols)
        outs["sorted" if kw else backend] = export(s, kin)
    for other in ("binned", "sorted"):
        np.testing.assert_allclose(np.asarray(outs["soa"].pos),
                                   np.asarray(outs[other].pos), atol=1e-4)
        np.testing.assert_allclose(np.asarray(outs["soa"].vel),
                                   np.asarray(outs[other].vel), atol=1e-3)
