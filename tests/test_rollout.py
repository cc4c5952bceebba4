"""Rollout, auto-reset, sharding, and PPO unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType
from gym_pybullet_drones_tpu.runtime import mesh as meshmod
from gym_pybullet_drones_tpu.runtime.rollout import (
    batch_reset,
    episode_returns,
    make_batched_step,
    rollout,
)


def _hover_cfg(**kw):
    kw.setdefault("task", TASK_HOVER)
    kw.setdefault("action_type", ActionType.RPM)
    kw.setdefault("pyb_freq", 240)
    kw.setdefault("ctrl_freq", 30)
    kw.setdefault("action_buffer_size", 2)
    return AviaryConfig(**kw)


def test_batched_step_matches_single():
    cfg = _hover_cfg()
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    step = make_batched_step(cfg, params, cp, tp, auto_reset=False)
    E = 4
    state = batch_reset(cfg, params, E)
    action = jnp.tile(jnp.asarray([[0.02, -0.01, 0.0, 0.01]]), (E, 1))[:, None, :]
    new_state, out = step(state, action)
    s1, o1, r1, t1, tr1 = envbase.step(
        cfg, params, cp, tp,
        jax.tree.map(lambda x: x[0], state), action[0],
    )
    np.testing.assert_allclose(np.asarray(out.obs[0]), np.asarray(o1), rtol=1e-6)
    np.testing.assert_allclose(float(out.reward[0]), float(r1), rtol=1e-6)


def test_auto_reset_restores_initial_state():
    cfg = _hover_cfg(episode_len_sec=0.2)  # times out after 6 ctrl steps
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    step = jax.jit(make_batched_step(cfg, params, cp, tp, auto_reset=True))
    E = 2
    state = batch_reset(cfg, params, E)
    init_pos = np.asarray(state.kin.pos)
    action = jnp.zeros((E, 1, 4))  # free fall -> truncation by timeout
    done_seen = False
    for _ in range(10):
        state, out = step(state, action)
        if bool(out.truncated.any()):
            done_seen = True
            break
    assert done_seen
    # After auto-reset the done env is back at the spawn point with step 0
    np.testing.assert_allclose(np.asarray(state.kin.pos), init_pos, atol=1e-6)
    assert int(state.step_count.max()) == 0
    # And the returned obs is the fresh episode's first obs (z = spawn height)
    fresh_obs = envbase.compute_obs(cfg, envbase.reset(cfg, params))
    np.testing.assert_allclose(np.asarray(out.obs[0]), np.asarray(fresh_obs), atol=1e-6)


def test_rollout_scan_and_returns():
    cfg = _hover_cfg(episode_len_sec=0.5)
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    step = make_batched_step(cfg, params, cp, tp)
    E = 3
    state = batch_reset(cfg, params, E)
    obs0 = jax.vmap(lambda s: envbase.compute_obs(cfg, s))(state)

    def policy(pstate, obs, key):
        return jnp.zeros((E, 1, 4)), pstate

    (carry, outs) = jax.jit(
        lambda s, o: rollout(step, policy, s, None, o, 64)
    )(state, obs0)
    assert outs.reward.shape == (64, E)
    rets, counts = episode_returns(outs)
    assert int(counts.sum()) > 0  # short episodes -> completions within 64 steps


def test_sharded_env_step_multichip():
    cfg = _hover_cfg()
    params = envbase.build_params(cfg)
    cp = envbase.build_ctrl_params(cfg)
    tp = envbase.hover_target_pos(cfg, params)
    mesh = meshmod.make_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual devices
    E = 16
    state = meshmod.shard_env_batch(mesh, batch_reset(cfg, params, E))
    step = meshmod.make_sharded_batched_step(cfg, params, cp, tp, mesh, donate=False)
    action = jax.device_put(jnp.zeros((E, 1, 4)), meshmod.env_sharding(mesh))
    new_state, out = step(state, action)
    assert out.obs.sharding.spec == P("env")
    assert np.all(np.isfinite(np.asarray(out.obs)))


def test_swarm_downwash_sharded_matches_dense():
    from gym_pybullet_drones_tpu.core import aero

    cfg = AviaryConfig(task=TASK_CTRL)
    params = envbase.build_params(cfg)
    mesh = meshmod.make_mesh()
    N = 32
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (N, 3)) * np.array([2, 2, 1]) + [0, 0, 1.2],
                      dtype=jnp.float32)
    dense = aero.downwash_forces_body_z(pos, params)
    fn = meshmod.make_swarm_downwash_fn(mesh, params)
    sharded = jax.jit(fn)(
        jax.device_put(pos, NamedSharding(mesh, P("env", None)))
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_ppo_trains_and_improves():
    from gym_pybullet_drones_tpu.rl.ppo import (
        PPOConfig, evaluate_policy, make_ppo_train_step, ppo_init,
    )

    env_cfg = _hover_cfg(action_type=ActionType.ONE_D_RPM, action_buffer_size=4)
    ppo_cfg = PPOConfig(num_envs=16, n_steps=64, n_epochs=4, minibatch_size=128)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(1))
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux))
    runner, m0 = train(runner)
    first = float(m0["mean_reward"])
    for _ in range(99):
        runner, metrics = train(runner)
    assert np.isfinite(float(metrics["loss"]))
    last = float(metrics["mean_reward"])
    # Deterministic single-trajectory eval is too noisy at this budget; the
    # stochastic train reward/step (16 envs x 64 steps) rises reliably from
    # ~1.4 toward the 2.0 ceiling (solved-threshold runs: examples/learn.py).
    assert last > first + 0.2, (first, last)
    assert last > 1.6, last
    # Eval still runs to cover the deterministic path end to end
    ret, _ = evaluate_policy(env_cfg, aux, runner.params, num_steps=250)
    assert np.isfinite(ret)


def test_graft_entry_compiles():
    import importlib
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    m = importlib.import_module("__graft_entry__")
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    m.dryrun_multichip(8)


def test_rgb_cnn_ppo_train_step():
    from gym_pybullet_drones_tpu.envs.spec import ObservationType
    from gym_pybullet_drones_tpu.rl.ppo import (
        PPOConfig, make_ppo_train_step, ppo_init,
    )

    env_cfg = _hover_cfg(obs_type=ObservationType.RGB, action_buffer_size=0,
                         action_type=ActionType.ONE_D_RPM)
    ppo_cfg = PPOConfig(num_envs=2, n_steps=4, n_epochs=1, minibatch_size=8)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(0))
    assert runner.obs.shape == (2, 1, 48, 64, 4) and runner.obs.dtype == jnp.uint8
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux))
    runner, metrics = train(runner)
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_swarm_physics_matches_dense():
    """Drone-axis-sharded PYB_DW physics == the dense single-device pipeline."""
    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, step_physics
    from gym_pybullet_drones_tpu.envs.spec import Physics
    from gym_pybullet_drones_tpu.runtime.swarm import (
        make_sharded_swarm_physics,
        shard_swarm_kin,
    )

    cfg = AviaryConfig(task=TASK_CTRL, num_drones=32)
    params = envbase.build_params(cfg)
    mesh = meshmod.make_mesh()
    N = 32
    rng = np.random.RandomState(3)
    pos = jnp.asarray(rng.uniform(-1, 1, (N, 3)) * np.array([1, 1, 0.5])
                      + [0, 0, 1.0], dtype=jnp.float32)
    quat = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (N, 1))
    kin = init_kin_state(pos, quat)
    rpm = jnp.full((N, 4), float(params.hover_rpm), jnp.float32)
    last = jnp.zeros((N, 4), jnp.float32)

    dense_kin, dense_last = step_physics(kin, rpm, last, params, 1 / 240, 5,
                                         Physics.PYB_DW)

    step = make_sharded_swarm_physics(mesh, params, 1 / 240, 5, Physics.PYB_DW)
    skin = shard_swarm_kin(mesh, kin)
    out_kin, out_last = step(skin, rpm, last)
    np.testing.assert_allclose(np.asarray(out_kin.pos),
                               np.asarray(dense_kin.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_kin.vel),
                               np.asarray(dense_kin.vel), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_kin.quat),
                               np.asarray(dense_kin.quat), atol=1e-6)


def test_big_swarm_pallas_dw_matches_dense():
    """Pallas-downwash big-swarm step == dense PYB_DW (Euler increments of
    COM forces commute, so injecting the wake force before the substep's own
    integration is algebraically identical)."""
    from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, step_physics
    from gym_pybullet_drones_tpu.envs.spec import Physics
    from gym_pybullet_drones_tpu.runtime.swarm import make_big_swarm_physics

    cfg = AviaryConfig(task=TASK_CTRL)
    params = envbase.build_params(cfg)
    N = 512
    rng = np.random.RandomState(4)
    # Unique-z stacks: 64 xy cells of 8 drones each with EXACT 0.3 m z gaps
    # (wake alpha = K/dz^2 ~ 0.8 N — strong but gentle enough that 5
    # substeps drift z by mm, far below the gap). Every pairwise |dz| stays
    # a stable multiple of ~0.3, so the dz > 0 mask and the 1/dz^2 magnitude
    # are well-conditioned. (A lattice with same-layer drones at ~equal z
    # sits in the ill-conditioned regime — see the CLAUDE.md testing note —
    # where only bit-identical per-pair arithmetic keeps two implementations
    # in lockstep, which would forbid any algebraic kernel optimization.)
    k = np.arange(N)
    cell = k // 8
    g = np.stack([(cell % 8) * 1.0, (cell // 8) * 1.0, (k % 8) * 0.3
                  + cell * 0.3 / 64.0], -1)
    jit = rng.uniform(-0.1, 0.1, (N, 3))
    jit[:, 2] = 0.0  # keep the z gaps exact
    pos = jnp.asarray(g + jit + [0, 0, 1.0], jnp.float32)
    quat = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (N, 1))
    kin = init_kin_state(pos, quat)
    rpm = jnp.full((N, 4), float(params.hover_rpm), jnp.float32)
    last = jnp.zeros((N, 4), jnp.float32)

    dense_kin, _ = step_physics(kin, rpm, last, params, 1 / 240, 5,
                                Physics.PYB_DW)
    # interpret-mode Pallas on CPU
    import gym_pybullet_drones_tpu.ops.downwash_pallas as dwp
    step = None
    orig = dwp.make_downwash_pallas
    try:
        dwp.make_downwash_pallas = lambda p, **kw: orig(
            p, bt=256, bs=256, interpret=True,
            z_sort=kw.get("z_sort", False))
        step = make_big_swarm_physics(params, 1 / 240, 5, Physics.PYB_DW)
        big_kin, _ = step(kin, rpm, last)
    finally:
        dwp.make_downwash_pallas = orig
    np.testing.assert_allclose(np.asarray(big_kin.pos),
                               np.asarray(dense_kin.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(big_kin.vel),
                               np.asarray(dense_kin.vel), atol=1e-3)


def test_ppo_train_loop_chains_updates():
    from gym_pybullet_drones_tpu.rl.ppo import (
        PPOConfig, make_ppo_train_loop, ppo_init,
    )

    env_cfg = _hover_cfg(action_type=ActionType.ONE_D_RPM, action_buffer_size=2)
    ppo_cfg = PPOConfig(num_envs=4, n_steps=8, n_epochs=1, minibatch_size=32)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(0))
    loop = make_ppo_train_loop(env_cfg, ppo_cfg, aux, updates_per_call=3)
    runner, metrics = loop(runner)
    assert metrics["loss"].shape == (3,)
    assert int(runner.update_count) == 3
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


def test_ppo_det_frac_mixed_rollout():
    """PPOConfig.det_frac (round-4 RGB-collapse countermeasure): with a
    deterministic env fraction the train step runs, reports the det envs'
    own reward stream, and the det envs receive exactly the mean action —
    verified by zero spread between two rollouts differing only in noise
    key for the det env rows of the SAME params."""
    from gym_pybullet_drones_tpu.rl.ppo import (
        PPOConfig, make_ppo_train_step, ppo_init,
    )

    env_cfg = _hover_cfg(action_type=ActionType.ONE_D_RPM,
                         action_buffer_size=4)
    ppo_cfg = PPOConfig(num_envs=8, n_steps=16, n_epochs=2,
                        minibatch_size=32, det_frac=0.25)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(3))
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux))
    r1, m1 = train(runner)
    assert np.isfinite(float(m1["loss"]))
    assert "mean_reward_det" in m1 and np.isfinite(float(m1["mean_reward_det"]))
    # same initial runner, different rng: the 2 det envs' trajectories are
    # noise-free, so their env states after one rollout must be identical
    runner2 = runner.replace(rng=jax.random.key(99))
    r2, _ = train(runner2)
    for a, b in zip(jax.tree.leaves(r1.env_state), jax.tree.leaves(r2.env_state)):
        if a is None or a.ndim == 0:
            continue
        np.testing.assert_array_equal(np.asarray(a)[:2], np.asarray(b)[:2])


def test_ppo_anchor_pulls_mean_toward_snapshot():
    """PPOConfig.anchor_coef (round-5 from-scratch-RGB fix, VERDICT r4 #3):
    the anchored train step runs, and with a LARGE anchor coefficient the
    post-update policy mean sits closer to the anchor snapshot's mean than
    an unanchored update from the same runner does."""
    from gym_pybullet_drones_tpu.rl.ppo import (
        PPOConfig, make_ppo_train_step, ppo_init,
    )

    env_cfg = _hover_cfg(action_type=ActionType.ONE_D_RPM,
                         action_buffer_size=4)
    kw = dict(num_envs=8, n_steps=16, n_epochs=2, minibatch_size=32)
    runner, aux = ppo_init(env_cfg, PPOConfig(**kw), jax.random.key(5))
    plain = jax.jit(make_ppo_train_step(env_cfg, PPOConfig(**kw), aux))
    # anchor to a FOREIGN snapshot (different init) so the pull is visible
    anchor_runner, _ = ppo_init(env_cfg, PPOConfig(**kw), jax.random.key(17))
    anchor_params = anchor_runner.params

    obs = np.asarray(runner.obs)
    net = aux["network"]

    def mean_dist(params):
        m1 = net.apply(params, obs)[0]
        m2 = net.apply(anchor_params, obs)[0]
        return float(np.abs(np.asarray(m1) - np.asarray(m2)).mean())

    anchored = jax.jit(make_ppo_train_step(
        env_cfg, PPOConfig(anchor_coef=100.0, **kw), aux, anchor=True))
    r_anchor, m = anchored(runner, anchor_params)
    assert np.isfinite(float(m["loss"]))
    r_plain, _ = plain(runner.replace(rng=runner.rng))
    assert mean_dist(r_anchor.params) < mean_dist(r_plain.params)
