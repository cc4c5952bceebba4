"""Packaging sanity: import every subpackage (reference tests/test_build.py:1-6)."""


def test_imports():
    import gym_pybullet_drones_tpu
    import gym_pybullet_drones_tpu.core.dynamics
    import gym_pybullet_drones_tpu.core.params
    import gym_pybullet_drones_tpu.control
    import gym_pybullet_drones_tpu.envs.base
    import gym_pybullet_drones_tpu.runtime.rollout
    import gym_pybullet_drones_tpu.runtime.mesh
    import gym_pybullet_drones_tpu.rl.ppo
    import gym_pybullet_drones_tpu.compat.gym
    import gym_pybullet_drones_tpu.utils
    import gym_pybullet_drones_tpu.examples.pid
    import gym_pybullet_drones_tpu.examples.learn


def test_gym_registration():
    import gymnasium as gym
    import gym_pybullet_drones_tpu  # noqa: F401  (registers ids)

    env = gym.make("hover-aviary-v0")
    obs, info = env.reset(seed=7)
    assert obs.shape == env.observation_space.shape
