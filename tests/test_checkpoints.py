"""Committed policy checkpoints keep solving their tasks (docs/ROUND2.md
items 3-4). These are regression gates on checkpoints/, not training tests."""

import os

import numpy as np
import pytest

import jax

from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
from gym_pybullet_drones_tpu.envs.spec import ActionType, ObservationType
from gym_pybullet_drones_tpu.rl.ppo import (
    PPOConfig,
    evaluate_policy,
    ppo_init,
)

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "checkpoints")


def _load(env_cfg, name, ppo_cfg=None):
    from flax import serialization

    runner, aux = ppo_init(env_cfg, ppo_cfg or PPOConfig(num_envs=1),
                           jax.random.key(0))
    with open(os.path.join(CKPT, name), "rb") as f:
        params = serialization.from_bytes(runner.params, f.read())
    return params, aux


def test_rpm4_checkpoint_solves_threshold():
    """4-dim RPM Hover: >= 467 (learn.py:82) over 10 CONSECUTIVE
    deterministic episodes on one env — the SB3-equivalent protocol (the
    action buffer persists across auto-resets, so episodes differ)."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "rpm4_hover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 467.0, ret


def test_rgb_checkpoint_solves_optimum():
    """RGB pixel Hover (frame_stack=4): one full deterministic episode must
    reach the reference's 474-threshold region (474.16 recorded over 10
    consecutive episodes under the 242-step episode). Single episode keeps
    the CNN-on-CPU cost test-suite-friendly; the 10-episode number is
    recorded in ROUND2.md."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=4,
    )
    params, aux = _load(env_cfg, "rgb_hover_fs4.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=260, num_envs=1)
    assert n >= 1
    assert ret >= 472.0, ret


def test_one_d_rpm_checkpoint_solves_reference_threshold():
    """ONE_D_RPM Hover: >= 474 — the reference's OWN learn.py:79 threshold,
    reachable only with the correct 242-step episode (pre-increment timeout,
    BaseAviary.py:376-382); the DP-certified optimum is 474.28
    (scripts/one_d_rpm_dp.py), so the trained 474.04 sits 0.24 under it."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "one_d_rpm_hover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 474.0, ret


def test_one_d_rpm_multiagent_checkpoint_solves_reference_threshold():
    """ONE_D_RPM MultiHover: >= 949.5 (learn.py:80); DP-certified joint
    optimum 467.34 + 483.27 = 950.61 under the 242-step episode."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "one_d_rpm_multihover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 949.5, ret


def test_pid_checkpoint_solves_threshold():
    """ActionType.PID Hover (3-dim waypoint offsets through the embedded
    DSLPID, reference BaseRLAviary.py:221-240): >= 467 over 10 consecutive
    deterministic episodes. Trained by plain annealed PPO (no warm-start) —
    CPU re-verified 472.84/10 eps under the 242-step episode."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.PID,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "pid_hover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 467.0, ret


def test_pid_multiagent_checkpoint_solves_threshold():
    """ActionType.PID MultiHover (2 drones): >= 920 (learn.py:82) over 10
    consecutive deterministic episodes. Plain annealed PPO, 12M steps, best
    checkpoint selected on a 30-episode TPU eval (947.1) and CPU re-verified
    947.66/10 eps, 947.35/22 eps, 947.42/43 eps."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER, action_type=ActionType.PID,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "pid_multihover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 920.0, ret


def test_vel_checkpoint_solves_threshold():
    """ActionType.VEL Hover (velocity commands through the embedded DSLPID,
    reference BaseRLAviary.py:228-239): >= 467 over 10 consecutive
    deterministic episodes. The DP certificate (scripts/vel_pid_dp.py) puts
    the vertical-command optimum at 470.45 (242-step episode) — the policy's
    470.34 sits within 0.11 of it; the D-term terminal velocity (~0.25 m/s) is what caps the
    climb, not the learner."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.VEL,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "vel_hover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 467.0, ret


def test_vel_multiagent_checkpoint_solves_threshold():
    """ActionType.VEL MultiHover (2 drones): >= 920 over 10 consecutive
    deterministic episodes (DP joint optimum 942.68, 242-step episode)."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER, action_type=ActionType.VEL,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "vel_multihover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 920.0, ret


def test_one_d_pid_checkpoint_solves_threshold():
    """ActionType.ONE_D_PID Hover: >= 467 over 10 consecutive deterministic
    episodes. TIGHT by construction: the exact 3-state DP optimum over ALL
    policies is 470.72 (scripts/vel_pid_dp.py, 242-step episode) — the
    policy's 469.04 is within 1.7 of the certified optimum."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_PID,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "one_d_pid_hover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 467.0, ret


def test_one_d_pid_multiagent_checkpoint_solves_threshold():
    """ActionType.ONE_D_PID MultiHover (2 drones): >= 920 over 10 consecutive
    deterministic episodes (DP joint optimum 943.23, 242-step episode)."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER, action_type=ActionType.ONE_D_PID,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "one_d_pid_multihover.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 920.0, ret


def test_rpm4_multiagent_checkpoint_solves_threshold():
    """Multi-agent (2-drone) 4-dim RPM MultiHover: >= 920 (learn.py:82) over
    10 consecutive deterministic episodes. Policy uses a 256-wide MLP (the
    SB3-default 64 underfits the doubled obs/action dims; the threshold is a
    reward bar, not an architecture constraint) trained via DAgger warm-start
    + annealed PPO — per-drone expert feasibility bound 942.6."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER, action_type=ActionType.RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
    )
    params, aux = _load(env_cfg, "rpm4_multihover.msgpack",
                        PPOConfig(num_envs=1, hidden=(256, 256)))
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 920.0, ret


def test_rgb_multiagent_checkpoint_solves_reference_threshold():
    """RGB pixel MultiHover (2 drones, frame_stack=4, 128-wide heads):
    >= 949.5 (learn.py:80) from PIXELS — one full deterministic episode as
    the CPU-budget gate; the 10-consecutive-episode number (949.78) is
    recorded in ROUND2.md."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=4,
    )
    params, aux = _load(env_cfg, "rgb_multihover_fs4.msgpack",
                        PPOConfig(num_envs=1, hidden=(128, 128)))
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=260, num_envs=1)
    assert n >= 1
    assert ret >= 945.0, ret


def test_rgb_from_scratch_distilled_solves_reference_threshold():
    """Round-5 (VERDICT r4 #3 CLOSED): RGB Hover from RANDOM init at the
    reference's own threshold. Pipeline entirely inside this framework
    with no warm start anywhere in its lineage: the from-scratch KIN
    ONE_D_RPM policy (PPO, 474.04) is DAgger-distilled into the CNN on
    rendered frames (scripts/rgb_distill.py — one 96-episode round, 6000
    BC steps, ~3 min on the v5e) to 474.07 >= 474 on the
    10-consecutive-episode protocol (CPU re-verify 474.06; DP optimum
    474.28). This gate holds the from-scratch pixel policy at the full
    reference threshold (the round-4 interim >= 400 gate is retired)."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=4,
    )
    params, aux = _load(env_cfg, "rgb_hover_distilled.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600,
                             num_envs=1)
    assert n >= 10
    assert ret >= 474.0, ret


def test_rgb_from_scratch_direct_ppo_record():
    """Round-5 direct-PPO from-scratch record: anchor + det_frac +
    KL-adaptive LR CURE the round-4 collapse (probes oscillate 276-436
    for 350 updates, never the 103.4 attractor) and hold 436.0 on the
    protocol — +11 over round 4's 425 early-stop transient, but short of
    474 (slow climb; scripts/rgb_scratch.py stage-1/2 curves in
    results/). The distillation pipeline above closes the gap; this gate
    pins the best DIRECT-PPO artifact at >= 430."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=4,
    )
    params, aux = _load(env_cfg, "rgb_hover_scratch_ppo436.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600,
                             num_envs=1)
    assert n >= 10
    assert ret >= 430.0, ret


def test_one_d_rpm_contact_checkpoint_solves_threshold():
    """Round-5 (VERDICT r4 #2): ONE_D_RPM Hover trained AND evaluated the
    way the reference trains — collisions=True with the Bullet-faithful
    impulse solver and the landmark obstacles as real collision bodies
    (reference BaseAviary.py:370 stepSimulation always resolves contact;
    BaseRLAviary.py:99-128 loads the obstacles for RL). >= 474 over 10
    consecutive deterministic episodes; the trained 474.23 sits 0.05 under
    the 474.28 DP optimum — contact-on physics costs nothing on this task
    (the hover path never touches the landmarks), which is exactly the
    parity point: the reference pays the contact solve every step too."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
        collisions=True, contact_mode="impulse",
    )
    params, aux = _load(env_cfg, "one_d_rpm_hover_contact.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 474.0, ret


def test_one_d_rpm_multiagent_contact_checkpoint_solves_threshold():
    """Round-5 (VERDICT r4 #2): ONE_D_RPM MultiHover trained AND evaluated
    with collisions=True + the impulse solver — drone-drone contact live
    between the two agents plus the landmark obstacle bodies (reference
    BaseAviary.py:370). >= 949.5 over 10 consecutive deterministic
    episodes (949.92 trained; DP joint optimum 950.61)."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER,
        action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
        collisions=True, contact_mode="impulse",
    )
    params, aux = _load(env_cfg, "one_d_rpm_multihover_contact.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 949.5, ret


def test_rpm4_contact_checkpoint_solves_threshold():
    """Round-5 (VERDICT r4 #2): 4-dim RPM Hover evaluated AND fine-tuned
    (20 PPO updates, 0.33M env-steps, warm-started from the committed
    rpm4_hover params) under collisions=True + the impulse solver with the
    landmark obstacle bodies. >= 467 (learn.py:82) over 10 consecutive
    deterministic episodes; the contact-finetuned 474.13 beats the
    no-contact parent's 470."""
    env_cfg = AviaryConfig(
        num_drones=1, task=TASK_HOVER, action_type=ActionType.RPM,
        obs_type=ObservationType.KIN, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0,
        collisions=True, contact_mode="impulse",
    )
    params, aux = _load(env_cfg, "rpm4_hover_contact.msgpack")
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600, num_envs=1)
    assert n >= 10
    assert ret >= 467.0, ret


def test_rgb_multiagent_from_scratch_distilled_solves_threshold():
    """Round-5: MultiHover RGB from RANDOM init at the reference threshold
    — same in-framework pipeline as the single-agent case (the from-scratch
    KIN multihover teacher, 950.17, DAgger-distilled into the hidden-128
    CNN on rendered frames in one 96-episode round): 950.15 >= 949.5 on
    the 10-consecutive-episode protocol (CPU re-verify 950.13; DP joint
    optimum 950.61, 0.02 below its own teacher)."""
    from gym_pybullet_drones_tpu.envs.base import TASK_MULTIHOVER

    env_cfg = AviaryConfig(
        num_drones=2, task=TASK_MULTIHOVER,
        action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, pyb_freq=240, ctrl_freq=30,
        action_buffer_size=15, episode_len_sec=8.0, frame_stack=4,
    )
    params, aux = _load(env_cfg, "rgb_multihover_distilled.msgpack",
                        PPOConfig(num_envs=1, hidden=(128, 128)))
    ret, n = evaluate_policy(env_cfg, aux, params, num_steps=2600,
                             num_envs=1)
    assert n >= 10
    assert ret >= 949.5, ret
