"""Contact physics: drone-drone spheres + static RL obstacles
(core/collisions.py; reference gets these from Bullet's solver,
BaseAviary.py:484-505, BaseRLAviary.py:99-128)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gym_pybullet_drones_tpu.core.collisions import (
    ObstacleSet,
    resolve_drone_collisions,
    resolve_obstacle_collisions,
    rl_obstacles,
)
from gym_pybullet_drones_tpu.core.dynamics import (
    init_kin_state,
    step_physics,
)
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics

R_COLL = 0.06  # cf2x.urdf:31-36 collision cylinder radius


def _hover_rpm(params, n):
    return jnp.full((n, 4), params.hover_rpm)


def test_head_on_pair_deflects_and_never_interpenetrates():
    """Two drones launched at each other at 0.5 m/s must end up separated by
    >= 2*collision_r and on their original sides (no tunnel-through)."""
    params = drone_params(DroneModel.CF2X)
    kin = init_kin_state(
        jnp.asarray([[-0.2, 0.0, 1.0], [0.2, 0.0, 1.0]]),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]] * 2),
    )
    kin = kin.replace(vel=jnp.asarray([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]]))
    rpm = _hover_rpm(params, 2)

    @jax.jit
    def step(kin):
        kin, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5, Physics.PYB,
                              collisions=True)
        return kin

    min_gap = np.inf
    for _ in range(96):  # 2 s
        kin = step(kin)
        gap = float(jnp.linalg.norm(kin.pos[0] - kin.pos[1]))
        min_gap = min(min_gap, gap)
    # Contact never lets centers closer than 2r (small Jacobi residual slack)
    assert min_gap >= 2 * R_COLL - 5e-3
    # They did not pass through each other
    assert float(kin.pos[0, 0]) < float(kin.pos[1, 0])


def test_no_contact_trajectories_bit_identical():
    """Far-apart drones: enabling collisions must not change a single bit."""
    params = drone_params(DroneModel.CF2X)
    kin0 = init_kin_state(
        jnp.asarray([[0.0, 0.0, 1.0], [5.0, 0.0, 1.0]]),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]] * 2),
    )
    rpm = _hover_rpm(params, 2) * 1.01

    def roll(collisions):
        kin = kin0
        for _ in range(20):
            kin, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                                  Physics.PYB, collisions=collisions)
        return kin

    a, b = roll(True), roll(False)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_overlapping_spawn_separates():
    """Deep overlap resolves gradually (max_push cap), never explosively."""
    pos = jnp.asarray([[0.0, 0.0, 1.0], [0.02, 0.0, 1.0]])
    vel = jnp.zeros((2, 3))
    for _ in range(40):
        pos, vel = resolve_drone_collisions(pos, vel, R_COLL)
        # bounded step: no teleporting
        assert float(jnp.abs(vel).max()) < 1e-6
    gap = float(jnp.linalg.norm(pos[0] - pos[1]))
    assert gap >= 2 * R_COLL - 1e-6


def test_obstacle_blocks_drone():
    """A drone flying straight at the block landmark cannot pass through.

    Round 3: the block is a literal box (pybullet_data block.urdf,
    BaseRLAviary.py:108) — the drone sphere must stop at the box FACE
    (x = 1 - half_x - collision_r), matching the rendered geometry."""
    params = drone_params(DroneModel.CF2X)
    obstacles = rl_obstacles()
    kin = init_kin_state(jnp.asarray([[0.5, 0.0, 0.1]]),
                         jnp.asarray([[0.0, 0.0, 0.0, 1.0]]))
    kin = kin.replace(vel=jnp.asarray([[0.6, 0.0, 0.0]]))
    rpm = _hover_rpm(params, 1)

    @jax.jit
    def step(kin):
        kin, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5, Physics.PYB,
                              collisions=True, obstacles=obstacles)
        return kin

    face_x = 1.0 - float(obstacles.half[0, 0])  # near face of the block box
    for _ in range(96):
        kin = step(kin)
        assert float(kin.pos[0, 0]) <= face_x - R_COLL + 5e-3
    # Parked against the face, not somewhere short of it
    assert float(kin.pos[0, 0]) > face_x - R_COLL - 0.02


def test_velocity_kill_is_inelastic():
    """Normal approach velocity is removed, tangential preserved."""
    pos = jnp.asarray([[0.0, 0.0, 1.0], [0.11, 0.0, 1.0]])
    vel = jnp.asarray([[1.0, 0.5, 0.0], [-1.0, -0.25, 0.0]])
    _, v2 = resolve_drone_collisions(pos, vel, R_COLL)
    # closing speed along x was 2.0; each corrects half -> both x-velocities 0
    np.testing.assert_allclose(np.asarray(v2[:, 0]), [0.0, 0.0], atol=1e-6)
    # tangential (y) untouched
    np.testing.assert_allclose(np.asarray(v2[:, 1]), [0.5, -0.25], atol=1e-6)


def test_obstacle_static_velocity_kill():
    obstacles = ObstacleSet(pos=jnp.asarray([[0.0, 0.0, 1.0]]),
                            radius=jnp.asarray([0.1]))
    pos = jnp.asarray([[0.15, 0.0, 1.0]])
    vel = jnp.asarray([[-0.5, 0.3, 0.0]])
    _, v2 = resolve_obstacle_collisions(pos, vel, R_COLL, obstacles)
    np.testing.assert_allclose(np.asarray(v2[0]), [0.0, 0.3, 0.0], atol=1e-6)


def test_env_step_with_collisions():
    """AviaryConfig.collisions threads through envs.base.step: two drones on a
    converging velocity command stop at contact distance."""
    cfg = AviaryConfig(
        num_drones=2, physics=Physics.PYB, pyb_freq=240, ctrl_freq=48,
        task=TASK_CTRL, collisions=True,
        initial_xyzs=((-0.15, 0.0, 0.5), (0.15, 0.0, 0.5)),
    )
    params = envbase.build_params(cfg)
    ctrl_params = envbase.build_ctrl_params(cfg)
    target = jnp.zeros((2, 3), dtype=cfg.jnp_dtype)
    state = envbase.reset(cfg, params)
    # swap-position RPM commands via the DSLPID would need the controller;
    # simplest: give both drones identical hover RPM with initial velocities
    state = state.replace(kin=state.kin.replace(
        vel=jnp.asarray([[0.4, 0.0, 0.0], [-0.4, 0.0, 0.0]], cfg.jnp_dtype)))
    action = jnp.full((2, 4), float(params.hover_rpm), cfg.jnp_dtype)
    step = jax.jit(lambda s, a: envbase.step(cfg, params, ctrl_params,
                                             target, s, a))
    for _ in range(48):
        state, *_ = step(state, action)
        gap = float(jnp.linalg.norm(state.kin.pos[0] - state.kin.pos[1]))
        assert gap >= 2 * R_COLL - 5e-3


def test_sharded_swarm_collisions_match_dense():
    """8-way drone-axis sharding with all-gathered contact partners equals the
    dense single-device resolve."""
    from gym_pybullet_drones_tpu.core.dynamics import substep_pyb
    from gym_pybullet_drones_tpu.runtime.swarm import (
        make_sharded_swarm_physics,
        shard_swarm_kin,
    )

    n = 32
    params = drone_params(DroneModel.CF2X)
    rng = np.random.default_rng(0)
    pos = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    pos[:, 2] += 1.0
    kin = init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    kin = kin.replace(vel=jnp.asarray(
        rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)))
    rpm = _hover_rpm(params, n)

    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    sharded = make_sharded_swarm_physics(mesh, params, 1 / 240, 5,
                                         Physics.PYB_DW, collisions=True)
    kin_sh = shard_swarm_kin(mesh, kin)
    out_sh, _ = sharded(kin_sh, rpm, rpm)

    dense_kin, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                                Physics.PYB_DW, collisions=True)
    # f32 reduction-order differences between the gathered and local pair sums
    # amplify through the contact nonlinearity: measured 8e-8 pos after one
    # substep, 1.7e-5 after five (this dense 32-drone cloud has ~everybody
    # touching). Velocity scales the same way.
    np.testing.assert_allclose(np.asarray(out_sh.pos),
                               np.asarray(dense_kin.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_sh.vel),
                               np.asarray(dense_kin.vel), atol=5e-3)


def test_collide_pallas_matches_dense():
    """Tiled Pallas contact kernel (interpret mode) == dense jnp resolve."""
    from gym_pybullet_drones_tpu.ops.collide_pallas import make_collide_pallas

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.default_rng(3)
    # Dense cloud with plenty of overlapping pairs
    pos = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    resolve = make_collide_pallas(params, bt=256, bs=256, interpret=True)
    p1, v1 = resolve(pos, vel)
    p2, v2 = resolve_drone_collisions(pos, vel, params.collision_r)
    assert float(jnp.abs(p1 - pos).max()) > 0.0  # contacts actually occurred
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_big_swarm_collisions_matches_dense():
    """make_big_swarm_physics(collisions=True, interpret Pallas) == dense
    step_physics(collisions=True) on a contact-heavy 512-drone cloud.

    Physics.PYB (no wake): a 0.15 m lattice sits inside the wake model's
    ill-conditioned 1/dz^2 regime (see test_rollout.py:228 note), which would
    amplify f32 reassociation noise into meters regardless of contacts; the
    contact kernel itself is what's under test here, the dw+contact combo is
    covered by test_sharded_swarm_collisions_match_dense."""
    from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics

    params = drone_params(DroneModel.CF2X)
    n = 512
    rng = np.random.default_rng(5)
    g = np.stack(np.meshgrid(*[np.arange(8) * 0.15] * 3), -1).reshape(-1, 3)
    pos = jnp.asarray((g + rng.uniform(-0.05, 0.05, g.shape)
                       + [0, 0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    kin = kin.replace(vel=jnp.asarray(
        rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)))
    rpm = _hover_rpm(params, n)

    dense, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                            Physics.PYB, collisions=True)
    step = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB,
                                  collisions=True, interpret=True)
    big, _ = step(kin, rpm, rpm)
    np.testing.assert_allclose(np.asarray(big.pos), np.asarray(dense.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(big.vel), np.asarray(dense.vel),
                               atol=1e-4)


def test_fused_interact_kernel_matches_dense_contact_free():
    """Fused downwash+contact kernel (make_big_swarm_physics dw+collisions
    path): agreement with the dense pipeline on a wake-active but
    contact-free swarm (interact_pallas.py deviation note: post-contact wake
    positions only differ when contacts fire).

    Geometry: unique-z stacks (64 xy cells x 8 drones, exact 0.3 m z gaps,
    xy cells 1.0 m apart >> the 0.12 m contact diameter -> zero contacts).
    The 1.0 m lateral cell spacing matters: cross-cell pairs sit at mm-scale
    |dz| (the ill-conditioned 1/dz^2 regime, CLAUDE.md note), but at 1 m
    lateral the wake Gaussian is ~e^-42, so even a blown-up 1/dz^2 magnitude
    is negligible — at 0.5 m (e^-10) it is not, and implementations drift
    cm apart from round-off."""
    from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics

    params = drone_params(DroneModel.CF2X)
    n = 512
    k = np.arange(n)
    cell = k // 8
    g = np.stack([(cell % 8) * 1.0, (cell // 8) * 1.0,
                  (k % 8) * 0.3 + cell * 0.3 / 64.0], -1)
    pos = jnp.asarray((g + [0.0, 0.0, 1.0]).astype(np.float32))
    kin = init_kin_state(pos, jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    rpm = _hover_rpm(params, n)

    dense, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                            Physics.PYB_DW, collisions=True)
    step = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB_DW,
                                  collisions=True, interpret=True)
    fused, _ = step(kin, rpm, rpm)
    # atol 1e-4: the default z_sort pair pass legitimately reorders the f32
    # wake summation (round-off through the 1/dz^2 gradient over 5 substeps)
    np.testing.assert_allclose(np.asarray(fused.pos), np.asarray(dense.pos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.vel), np.asarray(dense.vel),
                               atol=1e-3)


def test_fused_interact_kernel_contact_active():
    """Active contacts with the fused kernel: a co-planar layer of
    overlapping pairs (dz exactly 0 -> the wake mask is off between contact
    partners, keeping the comparison out of the ill-conditioned 1/dz^2 regime
    — see test_rollout.py:228 note) must match dense to round-off."""
    from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics

    params = drone_params(DroneModel.CF2X)
    rng = np.random.default_rng(7)
    base = np.stack(np.meshgrid(np.arange(16) * 0.5, np.arange(16) * 0.5),
                    -1).reshape(-1, 2)
    # each grid point spawns an overlapping pair (gap 0.1 < 0.12 diameter)
    xy = np.concatenate([base, base + [0.1, 0.0]], axis=0)
    n = xy.shape[0]
    pos = np.concatenate([xy, np.full((n, 1), 1.0)], axis=1).astype(np.float32)
    kin = init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    vel = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    vel[:, 2] = 0.0  # keep the layer exactly co-planar
    kin = kin.replace(vel=jnp.asarray(vel))
    rpm = _hover_rpm(params, n)

    dense, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                            Physics.PYB_DW, collisions=True)
    step = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB_DW,
                                  collisions=True, interpret=True)
    fused, _ = step(kin, rpm, rpm)
    # contacts actually fired
    assert np.abs(np.asarray(fused.pos) - np.asarray(kin.pos)).max() > 0
    np.testing.assert_allclose(np.asarray(fused.pos), np.asarray(dense.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.vel), np.asarray(dense.vel),
                               atol=1e-4)


def test_sharded_pallas_swarm_matches_dense():
    """shard_map + RECTANGULAR tiled pair kernels (local targets x gathered
    global sources) == the dense single-device pipeline. This is the
    O(N_global)-memory path that lets coupled 100k+ fleets shard over a mesh
    (the dense sharded form needs (N_local, N_global) pair tensors).

    Composite well-conditioned geometry: wake-active unique-z towers (128
    cells x 8 drones, 0.3 m z gaps, 1.0 m cells — contact-free) plus, 100 m
    away (beyond the 10 m wake cutoff), 512 co-planar overlapping pairs
    (contact-active, wake-inert since dz = 0 exactly)."""
    from gym_pybullet_drones_tpu.runtime.swarm import (
        make_sharded_swarm_physics,
        shard_swarm_kin,
    )

    params = drone_params(DroneModel.CF2X)
    rng = np.random.default_rng(9)
    # towers: 1024 drones
    k = np.arange(1024)
    cell = k // 8
    towers = np.stack([(cell % 16) * 1.0, (cell // 16) * 1.0,
                       1.0 + (k % 8) * 0.3], -1)
    # contact pairs: 512 bases + 512 partners offset 0.1 < 0.12 diameter
    base = np.stack(np.meshgrid(np.arange(32) * 0.5, np.arange(16) * 0.5),
                    -1).reshape(-1, 2) + [100.0, 0.0]
    xy = np.concatenate([base, base + [0.1, 0.0]], axis=0)
    pairs = np.concatenate([xy, np.full((1024, 1), 1.0)], axis=1)
    pos = np.concatenate([towers, pairs], axis=0).astype(np.float32)  # 2048
    n = pos.shape[0]
    vel = np.zeros((n, 3), np.float32)
    vel[1024:] = rng.uniform(-0.2, 0.2, (1024, 3)).astype(np.float32)
    vel[1024:, 2] = 0.0  # pairs stay exactly co-planar
    kin = init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1)))
    kin = kin.replace(vel=jnp.asarray(vel))
    rpm = _hover_rpm(params, n)

    dense_kin, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                                Physics.PYB_DW, collisions=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    sharded = make_sharded_swarm_physics(mesh, params, 1 / 240, 5,
                                         Physics.PYB_DW, collisions=True,
                                         pallas=True, interpret=True)
    out_sh, _ = sharded(shard_swarm_kin(mesh, kin), rpm, rpm)

    # contacts actually fired in the pair group
    moved = np.abs(np.asarray(out_sh.pos[1024:, :2]) - pos[1024:, :2]).max()
    assert moved > 1e-4, moved
    # and wakes actually acted in the towers (bottom drones pushed down)
    sink = pos[:1024, 2] - np.asarray(out_sh.pos[:1024, 2])
    assert sink[k % 8 == 0].mean() > 2 * abs(sink[k % 8 == 7].mean())
    np.testing.assert_allclose(np.asarray(out_sh.pos),
                               np.asarray(dense_kin.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_sh.vel),
                               np.asarray(dense_kin.vel), atol=1e-3)


def test_grounded_drone_under_wake_pressed_parity():
    """The resting-contact `pressed` test must see the wake force in every
    wake path (dense dw term and the Pallas `dw_force_body_z` injection,
    runtime/swarm.py / ops/swarm_soa.py).

    A grounded drone spinning at 1 rad/s runs motors slightly above hover
    (net accel_z > 0 alone) while a neighbor 0.5 m overhead presses it down
    with ~0.30 N of wake (> its own excess thrust): net accel_z <= 0, so the
    dense `substep_pyb` kills the residual spin (dynamics.py pressed test).
    Before the dw_force_body_z fix the Pallas-injection paths computed the
    pressed test from thrust alone and kept the drone spinning forever.
    Geometry: 2.0 m cell spacing (wake Gaussian across cells ~e^-4400, zero)
    and a clean 0.5 m dz inside each cell (well out of the ill-conditioned
    near-coincident regime, CLAUDE.md)."""
    from gym_pybullet_drones_tpu.ops.swarm_soa import (
        make_swarm_step_soa,
        swarm_soa_from_kin,
        swarm_soa_to_kin,
    )
    from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics

    params = drone_params(DroneModel.CF2X)
    z_min = float(params.collision_h) / 2.0 - float(params.collision_z_offset)
    cells = 256  # N = 512, one full source block of the pair kernels
    gx = (np.arange(cells) % 16) * 2.0
    gy = (np.arange(cells) // 16) * 2.0
    pos = np.zeros((2 * cells, 3), np.float32)
    pos[0::2] = np.stack([gx, gy, np.full(cells, z_min)], -1)  # grounded
    pos[1::2] = np.stack([gx, gy, np.full(cells, z_min + 0.5)], -1)  # source
    kin = init_kin_state(jnp.asarray(pos), jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (2 * cells, 1)))
    ang_v = np.zeros((2 * cells, 3), np.float32)
    ang_v[0::2, 2] = 1.0  # residual spin on the grounded drones
    kin = kin.replace(ang_v=jnp.asarray(ang_v))
    rpm = np.full((2 * cells, 4), float(params.hover_rpm), np.float32)
    rpm[0::2] *= 1.02  # excess thrust ~0.011 N << wake ~0.30 N
    rpm = jnp.asarray(rpm)

    dense, _ = step_physics(kin, rpm, rpm, params, 1 / 240, 5,
                            Physics.PYB_DW, collisions=False)
    assert np.all(np.abs(np.asarray(dense.ang_v[0::2])) == 0.0), \
        "dense pressed test must kill the grounded spin"

    big = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB_DW,
                                 interpret=True)
    fused, _ = big(kin, rpm, rpm)
    np.testing.assert_allclose(np.asarray(fused.ang_v),
                               np.asarray(dense.ang_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.pos), np.asarray(dense.pos),
                               atol=1e-5)

    soa_step = jax.jit(make_swarm_step_soa(params, 1 / 240, 5,
                                           interpret=True))
    rpm_cols = [rpm[:, m] for m in range(4)]
    out = swarm_soa_to_kin(soa_step(swarm_soa_from_kin(kin), rpm_cols), kin)
    np.testing.assert_allclose(np.asarray(out.ang_v),
                               np.asarray(dense.ang_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(dense.pos),
                               atol=1e-5)


def test_drone_center_inside_box_is_pushed_out():
    """Review finding (round 3): a drone center INSIDE a box core must not
    produce a zero contact normal — the center-direction fallback pushes it
    out in both contact models instead of leaving a dead contact."""
    from gym_pybullet_drones_tpu.core.collisions import (
        resolve_obstacle_collisions,
        rl_obstacles,
    )
    from gym_pybullet_drones_tpu.core.contact import solve_contacts

    obstacles = rl_obstacles(jnp.float64)
    # inside the block box core at [1, 0, 0.1] (half 0.025/0.075/0.025),
    # offset toward +y so the fallback direction is well defined
    pos = jnp.asarray([[1.0, 0.04, 0.1]], jnp.float64)
    vel = jnp.zeros((1, 3), jnp.float64)

    p2, v2 = resolve_obstacle_collisions(pos, vel, 0.06, obstacles)
    push = np.asarray(p2 - pos)[0]
    assert np.linalg.norm(push) > 1e-4, push  # pushout engaged
    assert push[1] > 0  # along the fallback (+y center direction)

    params = drone_params(DroneModel.CF2X)
    quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float64)
    v3, _ = solve_contacts(pos, quat, jnp.zeros((1, 3), jnp.float64),
                           jnp.zeros((1, 3), jnp.float64),
                           drone_params(DroneModel.CF2X, dtype=jnp.float64),
                           1 / 240, obstacles=obstacles)
    assert float(v3[0, 1]) > 0.01, np.asarray(v3)  # separating impulse fired
