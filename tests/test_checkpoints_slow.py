"""Nightly FULL-PROTOCOL checkpoint gates (VERDICT r2 item #7).

Every committed checkpoint is evaluated under the SB3-equivalent protocol —
10 CONSECUTIVE deterministic episodes on ONE env (the action buffer persists
across auto-resets, reference BaseRLAviary.py:153-155, so consecutive
episodes genuinely differ) — including the RGB pixel policies whose default
gates in test_checkpoints.py run a single episode for CPU-budget reasons.
One command reproduces every solve claim in docs/ROUND2.md / ROUND3.md:

    python -m pytest tests/test_checkpoints_slow.py -m slow -q

Deselected from the default suite (pyproject addopts); the CI cron job runs
them weekly (.github/workflows/test.yml `slow-gates`).
"""

import os

import numpy as np
import pytest

import jax

from gym_pybullet_drones_tpu.envs.base import (
    AviaryConfig,
    TASK_HOVER,
    TASK_MULTIHOVER,
)
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    evaluate_policy,
    ppo_init,
)

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "checkpoints")

pytestmark = pytest.mark.slow


def _cfg(n, act, obs=ObservationType.KIN, frame_stack=1):
    return AviaryConfig(
        num_drones=n, task=TASK_MULTIHOVER if n > 1 else TASK_HOVER,
        action_type=act, obs_type=obs, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=frame_stack,
    )


# (checkpoint, env_cfg, ppo_cfg-or-None, threshold). Thresholds are the
# reference's learn.py:79-82 bars where reachable, the documented trained
# bars otherwise (test_checkpoints.py docstrings carry the provenance).
_GATES = [
    ("one_d_rpm_hover.msgpack", _cfg(1, ActionType.ONE_D_RPM), None, 474.0),
    ("one_d_rpm_multihover.msgpack", _cfg(2, ActionType.ONE_D_RPM), None,
     949.5),
    ("one_d_pid_hover.msgpack", _cfg(1, ActionType.ONE_D_PID), None, 467.0),
    ("one_d_pid_multihover.msgpack", _cfg(2, ActionType.ONE_D_PID), None,
     920.0),
    ("pid_hover.msgpack", _cfg(1, ActionType.PID), None, 467.0),
    ("pid_multihover.msgpack", _cfg(2, ActionType.PID), None, 920.0),
    ("vel_hover.msgpack", _cfg(1, ActionType.VEL), None, 467.0),
    ("vel_multihover.msgpack", _cfg(2, ActionType.VEL), None, 920.0),
    ("rpm4_hover.msgpack", _cfg(1, ActionType.RPM), None, 467.0),
    ("rpm4_multihover.msgpack", _cfg(2, ActionType.RPM),
     PPOConfig(num_envs=1, hidden=(256, 256)), 920.0),
    ("rgb_hover_fs4.msgpack",
     _cfg(1, ActionType.ONE_D_RPM, ObservationType.RGB, 4), None, 472.0),
    ("rgb_multihover_fs4.msgpack",
     _cfg(2, ActionType.ONE_D_RPM, ObservationType.RGB, 4),
     PPOConfig(num_envs=1, hidden=(128, 128)), 945.0),
]


@pytest.mark.parametrize("name,env_cfg,ppo_cfg,threshold",
                         _GATES, ids=[g[0].split(".")[0] for g in _GATES])
def test_full_protocol_gate(name, env_cfg, ppo_cfg, threshold):
    from flax import serialization

    runner, aux = ppo_init(env_cfg, ppo_cfg or PPOConfig(num_envs=1),
                           jax.random.key(0))
    with open(os.path.join(CKPT, name), "rb") as f:
        params = serialization.from_bytes(runner.params, f.read())
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600,
                             num_envs=1)
    assert n >= 10, (name, n)
    assert ret >= threshold, (name, float(ret), threshold)
