"""Gymnasium VectorEnv shell (compat/vector.py).

The strongest check is step-for-step equivalence against gymnasium's OWN
`SyncVectorEnv` in SAME_STEP autoreset mode wrapping the single-env drop-in
shell: identical actions must produce identical obs/reward/term/trunc streams
and identical `final_obs` payloads across episode boundaries — proving the
batched one-dispatch path implements exactly the semantics a switching SB3 /
gymnasium user expects (reference trains through SB3 VecEnvs,
examples/learn.py:54-95).
"""

import numpy as np
import pytest

import gymnasium as gym
from gymnasium.vector import AutoresetMode, SyncVectorEnv

import gym_pybullet_drones_tpu  # noqa: F401  (registers env ids)
from gym_pybullet_drones_tpu.compat.gym import (
    CtrlAviary,
    HoverAviary,
    MultiHoverAviary,
)
from gym_pybullet_drones_tpu.compat.vector import VecAviary, make_vec_env


def test_spaces_match_batched_single_env():
    vec = VecAviary(8, HoverAviary)
    single = HoverAviary()
    assert vec.num_envs == 8
    assert vec.single_action_space == single.action_space
    assert vec.single_observation_space == single.observation_space
    assert vec.action_space.shape == (8,) + single.action_space.shape
    assert vec.observation_space.shape == (8,) + single.observation_space.shape
    assert vec.metadata["autoreset_mode"] is AutoresetMode.SAME_STEP
    single.close()
    vec.close()


def test_step_shapes_and_dtypes():
    vec = VecAviary(4, HoverAviary)
    obs, infos = vec.reset(seed=0)
    assert obs.shape == vec.observation_space.shape
    assert obs.dtype == np.float32
    acts = np.zeros(vec.action_space.shape, dtype=np.float32)
    obs, rew, term, trunc, infos = vec.step(acts)
    assert obs.shape == vec.observation_space.shape
    assert rew.shape == (4,) and rew.dtype == np.float32
    assert term.shape == (4,) and term.dtype == bool
    assert trunc.shape == (4,) and trunc.dtype == bool
    vec.close()


@pytest.mark.parametrize("env_class,n_envs", [(HoverAviary, 3),
                                              (MultiHoverAviary, 2)])
def test_equivalence_vs_sync_vector_env(env_class, n_envs):
    """Bit-level parity with gymnasium's SyncVectorEnv over the single shell,
    across autoreset boundaries (short 1 s episodes force several)."""
    kwargs = dict(episode_len_sec=1.0)
    vec = VecAviary(n_envs, env_class, **kwargs)
    ref = SyncVectorEnv(
        [lambda: env_class(**kwargs) for _ in range(n_envs)],
        autoreset_mode=AutoresetMode.SAME_STEP,
    )
    obs_v, _ = vec.reset(seed=0)
    obs_r, _ = ref.reset(seed=0)
    np.testing.assert_allclose(obs_v, obs_r, rtol=0, atol=0)

    rng = np.random.default_rng(7)
    steps = int(1.5 * 30)  # crosses the 1 s truncation boundary
    saw_done = False
    for t in range(steps):
        # Drive toward hover so termination logic (not just truncation) is
        # exercised identically; small random dither differentiates envs.
        acts = rng.uniform(-0.3, 0.3,
                           size=vec.action_space.shape).astype(np.float32)
        obs_v, rew_v, term_v, trunc_v, inf_v = vec.step(acts)
        obs_r, rew_r, term_r, trunc_r, inf_r = ref.step(acts)
        np.testing.assert_array_equal(term_v, term_r, err_msg=f"step {t}")
        np.testing.assert_array_equal(trunc_v, trunc_r, err_msg=f"step {t}")
        np.testing.assert_allclose(rew_v, rew_r, atol=1e-5, err_msg=f"step {t}")
        np.testing.assert_allclose(obs_v, obs_r, atol=1e-5, err_msg=f"step {t}")
        done = term_v | trunc_v
        if done.any():
            saw_done = True
            assert "final_obs" in inf_v and "final_obs" in inf_r
            np.testing.assert_array_equal(inf_v["_final_obs"], done)
            for i in range(n_envs):
                if done[i]:
                    np.testing.assert_allclose(
                        inf_v["final_obs"][i], inf_r["final_obs"][i],
                        atol=1e-5, err_msg=f"step {t} env {i}")
                else:
                    assert inf_v["final_obs"][i] is None
    assert saw_done  # the run really crossed an episode boundary
    vec.close()
    ref.close()


def test_make_vec_registration():
    vec = gym.make_vec("hover-aviary-v0", num_envs=4)
    obs, _ = vec.reset(seed=0)
    assert obs.shape[0] == 4
    obs, rew, term, trunc, _ = vec.step(
        np.zeros(vec.action_space.shape, dtype=np.float32))
    assert rew.shape == (4,)
    vec.close()


def test_make_vec_env_helper():
    vec = make_vec_env(HoverAviary, n_envs=2)
    assert isinstance(vec, VecAviary) and vec.num_envs == 2
    vec.close()


def test_ctrl_aviary_vector_smoke():
    vec = VecAviary(2, CtrlAviary, num_drones=3)
    obs, _ = vec.reset()
    assert obs.shape == (2, 3, 20)
    hover = np.full(vec.action_space.shape, vec.template.HOVER_RPM,
                    dtype=np.float32)
    obs, rew, term, trunc, _ = vec.step(hover)
    assert obs.shape == (2, 3, 20)
    assert not term.any() and not trunc.any()
    vec.close()


def test_domain_rand_envs_diverge():
    """With per-env randomized plants, identical actions must produce
    different trajectories across envs (and identical ones without)."""
    vec = VecAviary(4, HoverAviary, domain_rand={"m": 0.1})
    obs, _ = vec.reset()
    acts = np.zeros(vec.action_space.shape, dtype=np.float32)
    for _ in range(5):
        obs, *_ = vec.step(acts)
    z = obs[:, 0, 2]
    assert np.ptp(z) > 1e-6, "randomized plants should diverge"

    nom = VecAviary(4, HoverAviary)
    obs, _ = nom.reset()
    for _ in range(5):
        obs, *_ = nom.step(acts)
    z = obs[:, 0, 2]
    assert np.ptp(z) == 0.0, "nominal lockstep envs must stay identical"
    vec.close()
    nom.close()
