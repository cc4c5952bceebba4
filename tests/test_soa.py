"""SoA fused velocity-step parity vs the general envs/base step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_VELOCITY
from gym_pybullet_drones_tpu.ops.velocity_soa import (
    soa_consts,
    soa_from_state,
    soa_to_state,
    velocity_step_soa,
)
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset, make_batched_step


def test_soa_matches_reference_step():
    cfg = AviaryConfig(task=TASK_VELOCITY, pyb_freq=240, ctrl_freq=48,
                       dtype="float32")
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = jnp.zeros((1, 3), dtype=jnp.float32)
    E = 64
    step = jax.jit(make_batched_step(cfg, params, cp, tp, auto_reset=False))

    rng = np.random.RandomState(0)
    action = np.zeros((E, 1, 4), dtype=np.float32)
    action[:, 0, 0:3] = rng.uniform(-1, 1, (E, 3))
    action[:, 0, 3] = rng.uniform(0, 1, E)
    action = jnp.asarray(action)

    speed_limit = 0.03 * float(params.max_speed_kmh) * (1000.0 / 3600.0)
    consts = soa_consts(cp, params)
    soa_step = jax.jit(lambda s, a: velocity_step_soa(
        consts, cfg.ctrl_timestep, cfg.pyb_timestep, cfg.steps_per_ctrl,
        speed_limit, s, a[:, 0, 0], a[:, 0, 1], a[:, 0, 2], a[:, 0, 3]))

    # Per-step deviation is float32 noise (~1e-8 on quat, ~0.01 RPM, from
    # skipping the reference's matrix->euler->matrix float no-op); a 20-step
    # closed loop keeps the accumulated gap well inside mm scale.
    state = batch_reset(cfg, params, E)
    soa = soa_from_state(state)
    for t in range(20):
        state, out = step(state, action)
        soa = soa_step(soa, action)

    ref = state
    got = soa_to_state(soa, ref)
    np.testing.assert_allclose(np.asarray(got.kin.pos), np.asarray(ref.kin.pos),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.kin.vel), np.asarray(ref.kin.vel),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.kin.quat), np.asarray(ref.kin.quat),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.last_rpm), np.asarray(ref.last_rpm),
                               atol=20.0)  # RPM scale ~15000


def test_pallas_rollout_matches_soa_interpret():
    from gym_pybullet_drones_tpu.ops.velocity_pallas import (
        make_velocity_rollout_pallas,
    )

    cfg = AviaryConfig(task=TASK_VELOCITY, pyb_freq=240, ctrl_freq=48)
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    speed_limit = 0.03 * float(params.max_speed_kmh) * (1000.0 / 3600.0)
    consts = soa_consts(cp, params)
    E, T = 1024, 8
    soa0 = soa_from_state(batch_reset(cfg, params, E))
    rng = np.random.RandomState(1)
    action = dict(
        ax=jnp.asarray(rng.uniform(-1, 1, E), jnp.float32),
        ay=jnp.asarray(rng.uniform(-1, 1, E), jnp.float32),
        az=jnp.asarray(rng.uniform(-1, 1, E), jnp.float32),
        amag=jnp.asarray(rng.uniform(0, 1, E), jnp.float32),
    )
    s = dict(soa0)
    for _ in range(T):
        s = velocity_step_soa(consts, cfg.ctrl_timestep, cfg.pyb_timestep,
                              cfg.steps_per_ctrl, speed_limit, s,
                              action["ax"], action["ay"], action["az"],
                              action["amag"])
    ro = make_velocity_rollout_pallas(consts, cfg.ctrl_timestep,
                                      cfg.pyb_timestep, cfg.steps_per_ctrl,
                                      speed_limit, T, interpret=True)
    got = ro(soa0, action)
    for k in ("px", "py", "pz", "qw", "vx", "vz"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(s[k]),
                                   atol=1e-5)


def test_tpu_math_matches_numpy():
    from gym_pybullet_drones_tpu.ops.tpu_math import asin, atan2

    rng = np.random.RandomState(2)
    y = jnp.asarray(rng.uniform(-5, 5, 4096), jnp.float32)
    x = jnp.asarray(rng.uniform(-5, 5, 4096), jnp.float32)
    np.testing.assert_allclose(np.asarray(atan2(y, x)),
                               np.arctan2(np.asarray(y), np.asarray(x)),
                               atol=3e-7)
    v = jnp.asarray(rng.uniform(-1, 1, 4096), jnp.float32)
    np.testing.assert_allclose(np.asarray(asin(v)), np.arcsin(np.asarray(v)),
                               atol=6e-7)
    # Quadrant edges
    np.testing.assert_allclose(float(atan2(jnp.float32(1.0), jnp.float32(0.0))),
                               np.pi / 2)
    np.testing.assert_allclose(float(atan2(jnp.float32(-1.0), jnp.float32(0.0))),
                               -np.pi / 2)
    np.testing.assert_allclose(float(atan2(jnp.float32(0.0), jnp.float32(-2.0))),
                               np.pi, rtol=1e-6)


def test_pallas_downwash_matches_dense():
    from gym_pybullet_drones_tpu.core import aero
    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_pallas

    cfg = AviaryConfig(task=TASK_VELOCITY)
    params = envbase.build_params(cfg)
    N = 1024
    rng = np.random.RandomState(5)
    # Keep drones separated (>= 0.2 m vertical spacing scale) so pair
    # magnitudes stay in a well-conditioned range
    pos = jnp.asarray(
        rng.uniform(-1, 1, (N, 3)) * np.array([4, 4, 1.5]) + [0, 0, 2.0],
        jnp.float32)
    dense = np.asarray(aero.downwash_forces_body_z(pos, params))
    dw = make_downwash_pallas(params, bt=256, bs=256, interpret=True)
    got = np.asarray(dw(pos))
    np.testing.assert_allclose(got, dense, rtol=1e-4,
                               atol=1e-4 * max(1.0, np.abs(dense).max()))


def test_swarm_soa_matches_aos_big_swarm():
    """SoA coupled-swarm step (ops/swarm_soa.py) == AoS
    make_big_swarm_physics on a wake-sane lattice, with and without contact
    (interpret-mode Pallas on CPU)."""
    import numpy as np

    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )
    from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.RandomState(11)
    g = np.stack(np.meshgrid(*[np.arange(8) * 0.5] * 3), -1).reshape(-1, 3)
    pos = jnp.asarray((g + rng.uniform(-0.1, 0.1, g.shape)
                       + [0, 0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    kin = kin.replace(vel=jnp.asarray(
        rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)))
    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]

    # co-planar overlapping pairs for the contact case: dz == 0 keeps the
    # wake mask off between partners (the 1/dz^2 + narrow-beta regime turns
    # any f32 contact-mask flip into meters; see test_collisions.py notes)
    base = np.stack(np.meshgrid(np.arange(16) * 0.5, np.arange(16) * 0.5),
                    -1).reshape(-1, 2)
    xy = np.concatenate([base, base + [0.1, 0.0]], axis=0)
    cpos = np.concatenate([xy, np.full((n, 1), 1.0)], 1).astype(np.float32)
    ckin = init_kin_state(jnp.asarray(cpos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    cvel = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    cvel[:, 2] = 0.0
    ckin = ckin.replace(vel=jnp.asarray(cvel))

    for collisions, k0 in ((False, kin), (True, ckin)):
        aos = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB_DW,
                                     collisions=collisions, interpret=True)
        aos_kin, _ = aos(k0, rpm, rpm)
        soa_step = make_swarm_step_soa(params, 1 / 240, 5,
                                       collisions=collisions, interpret=True)
        s = soa_step(swarm_soa_from_kin(k0), rpm_cols)
        soa_kin = swarm_soa_to_kin(s, k0)
        np.testing.assert_allclose(np.asarray(soa_kin.pos),
                                   np.asarray(aos_kin.pos), atol=1e-5)
        np.testing.assert_allclose(np.asarray(soa_kin.vel),
                                   np.asarray(aos_kin.vel), atol=1e-4)
        np.testing.assert_allclose(np.asarray(soa_kin.quat),
                                   np.asarray(aos_kin.quat), atol=1e-6)
        np.testing.assert_allclose(np.asarray(soa_kin.ang_v),
                                   np.asarray(aos_kin.ang_v), atol=1e-4)
        np.testing.assert_allclose(np.asarray(soa_kin.rpy_rates),
                                   np.asarray(aos_kin.rpy_rates), atol=1e-4)


def test_pallas_pair_kernels_z_sorted_match_dense():
    """z-sorted tile-culling variants (forced on, since auto only enables
    them at N >= Z_SORT_MIN_N) == dense reference-semantics paths on a random
    well-separated cloud: the triangle cull of the wake and the z-band cull
    of contact must be exact, not approximate."""
    from gym_pybullet_drones_tpu.core import aero
    from gym_pybullet_drones_tpu.core.collisions import resolve_drone_collisions
    from gym_pybullet_drones_tpu.ops.collide_pallas import make_collide_pallas
    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_pallas
    from gym_pybullet_drones_tpu.ops.interact_pallas import make_interact_pallas

    cfg = AviaryConfig(task=TASK_VELOCITY)
    params = envbase.build_params(cfg)
    N = 1024
    rng = np.random.RandomState(11)
    pos = jnp.asarray(
        rng.uniform(-1, 1, (N, 3)) * np.array([4, 4, 1.5]) + [0, 0, 2.0],
        jnp.float32)
    # sprinkle overlapping pairs so the contact band actually fires
    pos = pos.at[1::64].set(
        pos[0::64] + jnp.asarray([0.08, 0.0, 0.05], jnp.float32))
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)), jnp.float32)

    dense_w = np.asarray(aero.downwash_forces_body_z(pos, params))
    p_ref, v_ref = resolve_drone_collisions(pos, vel, params.collision_r)
    tol = 1e-4 * max(1.0, np.abs(dense_w).max())

    dw = make_downwash_pallas(params, bt=256, bs=256, interpret=True,
                              z_sort=True)
    np.testing.assert_allclose(np.asarray(dw(pos)), dense_w, rtol=1e-4,
                               atol=tol)

    co = make_collide_pallas(params, bt=256, bs=256, interpret=True,
                             z_sort=True)
    p2, v2 = co(pos, vel)
    assert np.abs(np.asarray(p2) - np.asarray(pos)).max() > 0  # contacts fired
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref), atol=1e-6)

    ia = make_interact_pallas(params, bt=256, bs=256, interpret=True,
                              z_sort=True)
    mag, dp, dv = ia(pos, vel)
    np.testing.assert_allclose(np.asarray(mag), dense_w, rtol=1e-4, atol=tol)
    np.testing.assert_allclose(np.asarray(pos + dp), np.asarray(p_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel + dv), np.asarray(v_ref),
                               atol=1e-6)


def test_masked_pair_kernels_match_dense():
    """Round-3 mask-gated kernels (value-based tile bounds + cone cull,
    ops/spatial) == dense reference paths on a random cloud under an
    ARBITRARY permutation — the masks must be exact whatever the order.
    The cone cull only drops tiles whose every pair underflows f32 exp
    (exact zeros in the dense path too), so tolerances match the z-sorted
    variants'."""
    from gym_pybullet_drones_tpu.core import aero
    from gym_pybullet_drones_tpu.core.collisions import resolve_drone_collisions
    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_masked
    from gym_pybullet_drones_tpu.ops.interact_pallas import make_interact_masked

    cfg = AviaryConfig(task=TASK_VELOCITY)
    params = envbase.build_params(cfg)
    N = 1024
    rng = np.random.RandomState(11)
    pos = jnp.asarray(
        rng.uniform(-1, 1, (N, 3)) * np.array([4, 4, 1.5]) + [0, 0, 2.0],
        jnp.float32)
    pos = pos.at[1::64].set(
        pos[0::64] + jnp.asarray([0.08, 0.0, 0.05], jnp.float32))
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)), jnp.float32)
    perm = jnp.asarray(rng.permutation(N))  # deliberately unsorted order
    pos_p, vel_p = pos[perm], vel[perm]

    dense_w = np.asarray(aero.downwash_forces_body_z(pos, params))[perm]
    p_ref, v_ref = resolve_drone_collisions(pos, vel, params.collision_r)
    p_ref, v_ref = np.asarray(p_ref)[perm], np.asarray(v_ref)[perm]
    tol = 1e-4 * max(1.0, np.abs(dense_w).max())

    for cone in (False, True):
        dw = make_downwash_masked(params, bt=256, bs=256, interpret=True,
                                  cone=cone)
        np.testing.assert_allclose(np.asarray(dw(pos_p)), dense_w, rtol=1e-4,
                                   atol=tol)

    ia = make_interact_masked(params, bt=256, bs=256, interpret=True)
    mag, dp, dv = ia(pos_p, vel_p)
    assert np.abs(np.asarray(dp)).max() > 0  # contacts fired
    np.testing.assert_allclose(np.asarray(mag), dense_w, rtol=1e-4, atol=tol)
    np.testing.assert_allclose(np.asarray(pos_p + dp), p_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel_p + dv), v_ref, atol=1e-6)


def test_sorted_swarm_matches_soa_step():
    """Persistently-sorted swarm loop (make_sorted_swarm) == the per-pass
    sorted SoA step over several control steps, for both orders, on the
    wake-sane lattice (no contact) and the co-planar contact lattice (the
    reorder-robust geometries per the repo's conditioning notes)."""
    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.envs.spec import DroneModel
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_sorted_swarm,
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.RandomState(11)
    g = np.stack(np.meshgrid(*[np.arange(8) * 0.5] * 3), -1).reshape(-1, 3)
    pos = jnp.asarray((g + rng.uniform(-0.1, 0.1, g.shape)
                       + [0, 0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    kin = kin.replace(vel=jnp.asarray(
        rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)))

    base = np.stack(np.meshgrid(np.arange(16) * 0.5, np.arange(16) * 0.5),
                    -1).reshape(-1, 2)
    xy = np.concatenate([base, base + [0.1, 0.0]], axis=0)
    cpos = np.concatenate([xy, np.full((n, 1), 1.0)], 1).astype(np.float32)
    ckin = init_kin_state(jnp.asarray(cpos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    cvel = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    cvel[:, 2] = 0.0
    ckin = ckin.replace(vel=jnp.asarray(cvel))

    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]
    steps = 3

    for collisions, k0 in ((False, kin), (True, ckin)):
        soa_step = make_swarm_step_soa(params, 1 / 240, 5,
                                       collisions=collisions, interpret=True)
        s = swarm_soa_from_kin(k0)
        for _ in range(steps):
            s = soa_step(s, rpm_cols)
        ref_kin = swarm_soa_to_kin(s, k0)
        for order in ("z", "morton"):
            init, sstep, export = make_sorted_swarm(
                params, 1 / 240, 5, collisions=collisions, interpret=True,
                order=order, resort_every=2)
            ss = init(k0)
            for _ in range(steps):
                ss = sstep(ss, rpm_cols)
            got = export(ss, k0)
            np.testing.assert_allclose(np.asarray(got.pos),
                                       np.asarray(ref_kin.pos), atol=1e-4)
            np.testing.assert_allclose(np.asarray(got.vel),
                                       np.asarray(ref_kin.vel), atol=1e-3)
            np.testing.assert_allclose(np.asarray(got.quat),
                                       np.asarray(ref_kin.quat), atol=1e-5)


def test_spatial_helpers():
    """ops/spatial unit coverage: fit_block divisor clamping, tile_bounds6
    equivalence with per-column bounds, morton key spatial locality."""
    from gym_pybullet_drones_tpu.ops.spatial import (
        fit_block,
        morton_key,
        tile_bounds,
        tile_bounds6,
    )

    assert fit_block(1024, 65536, 128) == 1024
    assert fit_block(1024, 512, 128) == 512   # clamped to the fleet
    assert fit_block(1024, 768, 128) == 768   # n itself is legal
    assert fit_block(512, 768, 128) == 384    # largest legal divisor
    assert fit_block(256, 4096, 8) == 256

    rng = np.random.RandomState(3)
    x, y, z = (jnp.asarray(rng.uniform(-5, 5, 512), jnp.float32)
               for _ in range(3))
    b6 = tile_bounds6(x, y, z, 64)
    for k, col in enumerate((x, y, z)):
        lo, hi = tile_bounds(col, 64)
        np.testing.assert_array_equal(np.asarray(b6[k]), np.asarray(lo))
        np.testing.assert_array_equal(np.asarray(b6[k + 3]), np.asarray(hi))

    # Morton locality: consecutive keys map to nearby points — the mean
    # distance between key-adjacent points must be far below the random
    # (shuffled) baseline.
    key = np.asarray(morton_key(x, y, z))
    order = np.argsort(key)
    p = np.stack([np.asarray(c) for c in (x, y, z)], -1)[order]
    d_sorted = np.linalg.norm(np.diff(p, axis=0), axis=1).mean()
    d_random = np.linalg.norm(
        np.diff(p[rng.permutation(512)], axis=0), axis=1).mean()
    assert d_sorted < 0.4 * d_random, (d_sorted, d_random)


def test_neighbor_compacted_kernels_bitmatch_masked():
    """Round-4 cell-list path (VERDICT r3 item #3): the neighbor-compacted
    kernels (`neighbor_cap`) must be BIT-identical to the dense masked grid
    at equal (bt, bs) — compaction preserves ascending source order, so the
    f32 summation order is unchanged; padding slots contribute exact zeros;
    and a too-small cap falls back to the dense grid under lax.cond (exact
    by construction). Geometry includes contacts (pairs at 0.08 m)."""
    from gym_pybullet_drones_tpu.ops.downwash_pallas import make_downwash_masked
    from gym_pybullet_drones_tpu.ops.interact_pallas import make_interact_masked

    cfg = AviaryConfig(task=TASK_VELOCITY)
    params = envbase.build_params(cfg)
    N = 1024
    rng = np.random.RandomState(5)
    pos = jnp.asarray(rng.uniform(0, 16, (N, 3)), jnp.float32)
    pos = pos.at[1::64].set(
        pos[0::64] + jnp.asarray([0.05, 0.0, 0.05], jnp.float32))
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)), jnp.float32)
    cols = (pos[:, 0], pos[:, 1], pos[:, 2])
    vcols = (vel[:, 0], vel[:, 1], vel[:, 2])

    dw_m = make_downwash_masked(params, bt=128, bs=128, interpret=True)
    ref = np.asarray(dw_m.cols(*cols))
    for cap in (True, 3, 1):  # auto, tight-but-enough?, certain overflow
        dw_n = make_downwash_masked(params, bt=128, bs=128, interpret=True,
                                    neighbor_cap=cap)
        np.testing.assert_array_equal(np.asarray(dw_n.cols(*cols)), ref)

    ia_m = make_interact_masked(params, bt=128, bs=128, interpret=True)
    ia_n = make_interact_masked(params, bt=128, bs=128, interpret=True,
                                neighbor_cap=True)
    ra = ia_m.cols(*cols, *vcols)
    rb = ia_n.cols(*cols, *vcols)
    assert np.abs(np.asarray(ra[1])).max() > 0  # contacts fired
    for u, v in zip(jax.tree.leaves(ra), jax.tree.leaves(rb)):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_compact_live_tiles_unit():
    """compact_live_tiles: ascending order per row, packed idx<<16|bits
    (16-bit sub-tile mask field), zero padding, exact count_max."""
    from gym_pybullet_drones_tpu.ops.spatial import compact_live_tiles

    mask = jnp.asarray([[0, 1, 0, 0x103],
                        [2, 0, 0, 0],
                        [0, 0, 0, 0],
                        [1, 1, 1, 1]], jnp.int32)
    idx, count_max = compact_live_tiles(mask.reshape(-1), 4, 4, cap=2)
    got = np.asarray(idx).reshape(4, 2)
    np.testing.assert_array_equal(
        got, [[(1 << 16) | 1, (3 << 16) | 0x103],
              [(0 << 16) | 2, 0],
              [0, 0],
              [(0 << 16) | 1, (1 << 16) | 1]])  # row 3 overflows, keeps 2
    assert int(count_max) == 4


def test_sorted_swarm_neighbor_backend_matches_masked():
    """make_sorted_swarm(neighbor_cap=True) == the same loop without
    compaction, bit-for-bit over several control steps (same tiles, same
    order, same resort schedule)."""
    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.envs.spec import DroneModel
    from gym_pybullet_drones_tpu.ops.swarm_soa import make_sorted_swarm

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.RandomState(7)
    g = np.stack(np.meshgrid(*[np.arange(8) * 2.0] * 3), -1).reshape(-1, 3)
    pos = jnp.asarray((g + rng.uniform(-0.4, 0.4, g.shape)
                       + [0, 0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]

    outs = []
    for cap in (None, True):
        init, sstep, export = make_sorted_swarm(
            params, 1 / 240, 5, collisions=True, interpret=True,
            order="morton", resort_every=2, neighbor_cap=cap,
            bt=128, bs=128)
        s = init(kin)
        for _ in range(3):
            s = sstep(s, rpm_cols)
        outs.append(export(s, kin))
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_subtile_packed_mask_unit():
    """subtile_packed_mask == brute-force per-slice tests: bit k is the
    wake mask of the k-th 128-wide source slice at (bt, 128) granularity,
    bit 8+k the contact mask; OR of sub-bits == the coarse tile mask."""
    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.ops.spatial import (
        contact_live_mask,
        subtile_count,
        subtile_packed_mask,
        wake_live_mask,
    )

    params = drone_params()
    rng = np.random.RandomState(3)
    N, bt, bs = 1024, 128, 256
    x, y, z = (jnp.asarray(rng.uniform(0, 12, N), jnp.float32)
               for _ in range(3))
    sub = subtile_count(bs)
    assert sub == 2
    packed = np.asarray(subtile_packed_mask(
        x, y, z, bt, bs, min_dist=0.12, params=params)).reshape(N // bt,
                                                                N // bs)
    fine_w = np.asarray(wake_live_mask(x, y, z, bt, bs // sub,
                                       params=params)).reshape(
        N // bt, N // bs, sub)
    fine_c = np.asarray(contact_live_mask(x, y, z, bt, bs // sub,
                                          0.12)).reshape(N // bt,
                                                         N // bs, sub)
    expect = ((fine_w << np.arange(sub)).sum(-1)
              | ((fine_c << (np.arange(sub) + 8)).sum(-1)))
    np.testing.assert_array_equal(packed, expect)
    # OR of sub-bits == the coarse (bt, bs) tile mask
    coarse_w = np.asarray(wake_live_mask(x, y, z, bt, bs, params=params))
    np.testing.assert_array_equal(
        ((packed & 0xFF) != 0).astype(np.int32), coarse_w)


def test_tile_bounds6_valid_excludes_padding():
    """Round-4 validity-aware bounds: padding slots are excluded, so mixed
    tiles get the exact bounds of their real members and all-padding tiles
    get an EMPTY box (min > max) — which every box-gap test reads as
    infinitely far, killing the tile in all masks."""
    from gym_pybullet_drones_tpu.ops.spatial import tile_bounds6

    rng = np.random.RandomState(9)
    x, y, z = (jnp.asarray(rng.uniform(-5, 5, 256), jnp.float32)
               for _ in range(3))
    valid = jnp.asarray(rng.rand(256) < 0.7)
    valid = valid.at[64:128].set(False)  # one all-padding tile
    # plant sentinels on padding slots like the binned layout does
    xs = jnp.where(valid, x, 0.0)
    zs = jnp.where(valid, z, -1e9)
    b = tile_bounds6(xs, y, zs, 64, valid=valid)
    for t in range(4):
        sel = np.asarray(valid[t * 64:(t + 1) * 64])
        if not sel.any():
            assert float(b[0][t]) > float(b[3][t])  # empty box
            continue
        np.testing.assert_allclose(float(b[2][t]),
                                   np.asarray(z)[t * 64:(t + 1) * 64][sel].min())
        np.testing.assert_allclose(float(b[5][t]),
                                   np.asarray(z)[t * 64:(t + 1) * 64][sel].max())


def test_binned_swarm_matches_soa_step():
    """Round-4 binned cell-list backend (ops/swarm_binned) == the per-pass
    sorted SoA step over several control steps, on the wake-sane spread
    lattice (no contact) and the co-planar contact lattice, in three
    regimes: comfortable capacity, sub-cell source tiles (bs < cap), and
    FORCED layout overflow (cap too small -> dense (cell,z)-packed layout +
    the z-sorted pass-level fallback; correctness must never depend on the
    caps)."""
    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.envs.spec import DroneModel
    from gym_pybullet_drones_tpu.ops.swarm_binned import (
        binned_geometry,
        make_binned_swarm,
    )
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.RandomState(11)
    g = np.stack(np.meshgrid(*[np.arange(8) * 2.0] * 3), -1).reshape(-1, 3)
    pos = jnp.asarray((g + rng.uniform(-0.4, 0.4, g.shape)
                       + [0, 0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    kin = kin.replace(vel=jnp.asarray(
        rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)))

    base = np.stack(np.meshgrid(np.arange(16) * 0.5, np.arange(16) * 0.5),
                    -1).reshape(-1, 2)
    xy = np.concatenate([base, base + [0.1, 0.0]], axis=0)
    cpos = np.concatenate([xy, np.full((n, 1), 1.0)], 1).astype(np.float32)
    ckin = init_kin_state(jnp.asarray(cpos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    cvel = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    cvel[:, 2] = 0.0
    ckin = ckin.replace(vel=jnp.asarray(cvel))

    rpm = jnp.full((n, 4), float(params.hover_rpm), jnp.float32)
    rpm_cols = [rpm[:, m] for m in range(4)]
    steps = 3

    cell, gnx, gny, gcap = binned_geometry(np.asarray(pos), occ_target=64)
    assert gcap % 128 == 0 and gnx * gny * gcap >= n
    arms = [
        (kin, False, dict(cell_size=cell, nx=gnx, ny=gny, cap=gcap)),
        (kin, False, dict(cell_size=cell, nx=gnx, ny=gny, cap=256, bs=128)),
        (ckin, True, dict(cell_size=3.0, nx=4, ny=4, cap=256)),
        # 1 m cells clipped to 3x3: the edge cell holds ~278 > 128 drones
        (ckin, True, dict(cell_size=1.0, nx=3, ny=3, cap=128)),
    ]
    for k0, collisions, kw in arms:
        soa_step = make_swarm_step_soa(params, 1 / 240, 5,
                                       collisions=collisions, interpret=True)
        s = swarm_soa_from_kin(k0)
        for _ in range(steps):
            s = soa_step(s, rpm_cols)
        ref_kin = swarm_soa_to_kin(s, k0)

        init, sstep, export = make_binned_swarm(
            params, 1 / 240, 5, collisions=collisions, interpret=True,
            resort_every=2, **kw)
        ss = jax.jit(init)(k0)

        @jax.jit
        def run(ss, rpm_cols):
            def body(ss, _):
                return sstep(ss, rpm_cols), None
            ss, _ = jax.lax.scan(body, ss, None, length=steps)
            return ss

        got = export(run(ss, rpm_cols), k0)
        np.testing.assert_allclose(np.asarray(got.pos),
                                   np.asarray(ref_kin.pos), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.vel),
                                   np.asarray(ref_kin.vel), atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.quat),
                                   np.asarray(ref_kin.quat), atol=1e-5)


def test_binned_padding_never_phantoms_landed_drones():
    """Advisor round-4 regression: the substep's ground clamp snaps padding
    rows (pz = -1e9) to (0, 0, z_min); if the pair pass ran before the
    padding freeze, every padding slot of a live tile became a phantom
    drone resting at the world origin and a real drone landed within
    min_dist of it received phantom contact pushes. A landed drone near
    the origin sharing a cell with padding must rest exactly in place and
    match the dense SoA path."""
    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state
    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.envs.spec import DroneModel
    from gym_pybullet_drones_tpu.ops.swarm_binned import make_binned_swarm
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )

    params = drone_params(DroneModel.CF2X)
    z_min = float(params.collision_h) / 2.0 - float(params.collision_z_offset)
    # Drone 0 landed 4 cm from the origin (inside min_dist = 12 cm of the
    # phantom point); the rest of the fleet far away so the 3x3 grid has
    # plenty of padding in drone 0's cell.
    pos = np.array([[0.04, 0.02, z_min]]
                   + [[20.0 + i * 2.0, 20.0, 1.0] for i in range(7)],
                   np.float32)
    n = pos.shape[0]
    kin = init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    rpm_cols = [jnp.zeros((n,), jnp.float32)] * 4  # motors off: resting
    steps = 4

    init, sstep, export = make_binned_swarm(
        params, 1 / 240, 5, collisions=True, interpret=True,
        cell_size=10.0, nx=3, ny=3, cap=128, resort_every=2)
    s = jax.jit(init)(kin)
    for _ in range(steps):
        s = jax.jit(sstep)(s, rpm_cols)
    got = export(s, kin)

    soa_step = make_swarm_step_soa(params, 1 / 240, 5, collisions=True,
                                   interpret=True)
    ref = swarm_soa_from_kin(kin)
    for _ in range(steps):
        ref = soa_step(ref, rpm_cols)
    ref_kin = swarm_soa_to_kin(ref, kin)

    # The landed drone must not move laterally at all (phantom pushes were
    # ~0.5 cm/substep toward +x here), and the whole fleet matches dense.
    np.testing.assert_array_equal(np.asarray(got.pos)[0, :2], pos[0, :2])
    np.testing.assert_allclose(np.asarray(got.pos),
                               np.asarray(ref_kin.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.vel),
                               np.asarray(ref_kin.vel), atol=1e-6)
