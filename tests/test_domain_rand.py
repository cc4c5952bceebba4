"""Domain randomization (`core.params.randomize_params`): per-env perturbed
plants for sim2real training. No reference equivalent (PyBullet loads fixed
URDF constants); enabled here by the params-as-pytree design — a batched
DroneParams vmaps straight through the step function."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.params import (
    RANDOMIZABLE,
    drone_params,
    randomize_params,
)
from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_CTRL, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, DroneModel, ObservationType
from gym_pybullet_drones_tpu.runtime.rollout import (
    batch_reset,
    make_batched_step,
    params_are_batched,
)


def test_randomize_params_shapes_and_nominal_software_constants():
    """Every randomized PLANT field gets a (E,) spread; the derived
    actuator/software constants (hover/max RPM, caps) stay EXACTLY nominal —
    recalibrating them per env would cancel the perturbation for the
    RPM-normalized action types (see randomize_params docstring)."""
    nominal = drone_params(DroneModel.CF2X)
    spec = {k: 0.15 for k in RANDOMIZABLE}
    E = 16
    p = randomize_params(jax.random.key(0), nominal, E, spec)

    assert params_are_batched(p)
    assert p.m.shape == (E,) and p.J.shape == (E, 3, 3)
    # actual spread (probability of all 16 draws landing at the center ~ 0)
    assert float(jnp.std(p.m)) > 0
    # geometry and software constants are exact nominal tiles
    for field in ("arm", "hover_rpm", "max_rpm", "max_thrust",
                  "max_xy_torque", "max_z_torque", "gravity",
                  "gnd_eff_h_clip"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p, field)),
            np.full(E, float(getattr(nominal, field))), err_msg=field)
    np.testing.assert_array_equal(np.asarray(p.prop_offsets),
                                  np.tile(np.asarray(nominal.prop_offsets),
                                          (E, 1, 1)))
    # J_inv tracks the scaled J per env
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("eij,ejk->eik", p.J, p.J_inv)),
        np.tile(np.eye(3), (E, 1, 1)), atol=1e-5)
    # perturbations stay inside the spec band
    for field, nom in (("m", nominal.m), ("kf", nominal.kf)):
        ratio = np.asarray(getattr(p, field)) / float(nom)
        assert ratio.min() >= 0.85 - 1e-6 and ratio.max() <= 1.15 + 1e-6


def test_one_d_rpm_randomization_is_not_cancelled():
    """Under ONE_D_RPM the action map uses the NOMINAL hover_rpm, so an m
    perturbation must change the closed-loop physics by a macroscopic amount
    (with per-env recalibrated hover_rpm the spread collapses to f32
    round-off — the historical no-op failure mode this test pins)."""
    cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    nominal = envbase.build_params(cfg)
    ctrl = envbase.build_ctrl_params(cfg)
    target = envbase.hover_target_pos(cfg, nominal)
    E = 8
    p = randomize_params(jax.random.key(7), nominal, E, {"m": 0.2})
    step = jax.jit(make_batched_step(cfg, p, ctrl, target, auto_reset=False))
    state = batch_reset(cfg, p, E)
    action = jnp.full((E, 1, 1), 0.3)  # mild climb command
    for _ in range(30):  # 1 s
        state, _ = step(state, action)
    z = np.asarray(state.kin.pos[:, 0, 2])
    assert z.max() - z.min() > 5e-2, z  # macroscopic, not round-off


def test_randomize_params_empty_spec_is_tile():
    nominal = drone_params(DroneModel.CF2X)
    p = randomize_params(jax.random.key(1), nominal, 4, {})
    for leaf, nom_leaf in zip(jax.tree.leaves(p), jax.tree.leaves(nominal)):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.broadcast_to(np.asarray(nom_leaf),
                                              leaf.shape))


def test_randomize_params_rejects_unknown_keys():
    nominal = drone_params(DroneModel.CF2X)
    with pytest.raises(ValueError, match="arm"):
        randomize_params(jax.random.key(0), nominal, 2, {"arm": 0.1})


def test_randomized_mass_orders_climb_rates():
    """Identical RPM on perturbed plants: vertical acceleration must order
    inversely with mass (heavier sinks, lighter climbs)."""
    cfg = AviaryConfig(num_drones=1, task=TASK_CTRL, pyb_freq=240,
                      ctrl_freq=48, initial_xyzs=[[0.0, 0.0, 1.0]])
    nominal = envbase.build_params(cfg)
    ctrl = envbase.build_ctrl_params(cfg)
    E = 8
    p = randomize_params(jax.random.key(2), nominal, E, {"m": 0.2})

    step = jax.jit(make_batched_step(cfg, p, ctrl, None, auto_reset=False))
    state = batch_reset(cfg, p, E)
    # every env is reset identically from the nominal geometry
    np.testing.assert_array_equal(np.asarray(state.kin.pos[0]),
                                  np.asarray(state.kin.pos[-1]))
    action = jnp.broadcast_to(nominal.hover_rpm, (E, 1, 4))
    for _ in range(24):  # 0.5 s at nominal-hover thrust
        state, out = step(state, action)
    dz = np.asarray(state.kin.pos[:, 0, 2]) - 1.0
    m = np.asarray(p.m)
    order_m = np.argsort(m)
    # climb strictly decreases with mass
    assert (np.diff(dz[order_m]) < 0).all(), (m, dz)
    # and the sign flips around the nominal mass
    assert dz[m < float(nominal.m)].min() > 0
    assert dz[m > float(nominal.m)].max() < 0


def test_ppo_train_step_with_domain_rand():
    """One PPO train step over randomized plants: runs, finite metrics, and
    the env batch really is stepping different dynamics (identical policy
    rollouts diverge across envs)."""
    from gym_pybullet_drones_tpu.rl.ppo import (
        PPOConfig, make_ppo_train_step, ppo_init,
    )

    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=2.0,
    )
    ppo_cfg = PPOConfig(num_envs=4, n_steps=16, n_epochs=1,
                        minibatch_size=32)
    runner, aux = ppo_init(env_cfg, ppo_cfg, jax.random.key(3),
                           domain_rand={"m": 0.1, "kf": 0.05})
    assert "train_params_env" in aux
    assert aux["train_params_env"].m.shape == (4,)
    train = jax.jit(make_ppo_train_step(env_cfg, ppo_cfg, aux))
    runner, metrics = train(runner)
    assert all(np.isfinite(float(v)) for v in jax.tree.leaves(metrics))
    # same initial obs everywhere, but perturbed plants diverge the batch by
    # a macroscopic amount (round-off-only spread = the cancellation no-op)
    pos = np.asarray(runner.env_state.kin.pos[:, 0, 2])
    assert pos.max() - pos.min() > 1e-3, pos


def test_sharded_step_with_randomized_params_matches_dense():
    """Randomized-params batch sharded over the 8-device mesh == the dense
    (unsharded) step to f32 round-off (the two compilations fuse
    differently): the params batch axis partitions with the env axis."""
    from jax.sharding import PartitionSpec as P

    from gym_pybullet_drones_tpu.runtime import mesh as meshmod

    cfg = AviaryConfig(num_drones=1, task=TASK_CTRL, pyb_freq=240,
                      ctrl_freq=48, initial_xyzs=[[0.0, 0.0, 1.0]])
    nominal = envbase.build_params(cfg)
    ctrl = envbase.build_ctrl_params(cfg)
    E = 16
    p = randomize_params(jax.random.key(5), nominal, E, {"m": 0.2, "kf": 0.1})

    state = batch_reset(cfg, p, E)
    action = jnp.broadcast_to(nominal.hover_rpm, (E, 1, 4))
    dense_step = jax.jit(make_batched_step(cfg, p, ctrl, None,
                                           auto_reset=False))
    dense, _ = dense_step(state, action)

    mesh = meshmod.make_mesh()
    sstate = meshmod.shard_env_batch(mesh, state)
    saction = jax.device_put(action, meshmod.env_sharding(mesh))
    step = meshmod.make_sharded_batched_step(cfg, p, ctrl, None, mesh,
                                             auto_reset=False, donate=False)
    sharded, out = step(sstate, saction)
    assert out.obs.sharding.spec == P("env")
    np.testing.assert_allclose(np.asarray(sharded.kin.pos),
                               np.asarray(dense.kin.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.kin.vel),
                               np.asarray(dense.kin.vel), atol=1e-6)
    # the divergence across envs proves each shard stepped its own plant
    vz = np.asarray(sharded.kin.vel[:, 0, 2])
    assert vz.max() - vz.min() > 1e-3, vz
