"""The reference's subclassing protocol on the Gymnasium shell.

Users of the reference extend BaseAviary/BaseRLAviary by overriding the
camelCase hooks (_computeObs/_computeReward/_computeTerminated/
_computeTruncated/_computeInfo/_actionSpace/_observationSpace/
_preprocessAction — abstract at BaseAviary.py:1020-1106). These tests port a
reference-style custom aviary onto the shell unchanged and check every hook
is honored, plus the kinematic attribute mirrors (pos/quat/rpy/vel/ang_v,
BaseAviary.py:468-481) and the URDF parameter parser.
"""

import numpy as np
import pytest
from gymnasium import spaces

from gym_pybullet_drones_tpu.compat.gym import (
    BaseAviaryEnv,
    CtrlAviary,
    HoverAviary,
)


class _WaypointAviary(CtrlAviary):
    """A reference-style custom aviary: distance-based reward, custom obs,
    custom termination — written exactly as a user would against the
    reference's BaseAviary hooks."""

    TARGET = np.array([0.0, 0.0, 0.5])

    def _observationSpace(self):
        return spaces.Box(low=-np.inf, high=np.inf, shape=(3,),
                          dtype=np.float32)

    def _computeObs(self):
        return (self.pos[0] - self.TARGET).astype(np.float32)

    def _computeReward(self):
        return -float(np.linalg.norm(self.pos[0] - self.TARGET))

    def _computeTerminated(self):
        return bool(np.linalg.norm(self.pos[0] - self.TARGET) < 0.05)

    def _computeTruncated(self):
        return bool(self.step_counter / self.PYB_FREQ > 2.0)

    def _computeInfo(self):
        return {"dist": float(np.linalg.norm(self.pos[0] - self.TARGET))}


def test_custom_hooks_drive_step_and_reset():
    env = _WaypointAviary(num_drones=1)
    assert env.observation_space.shape == (3,)
    obs, info = env.reset(seed=0)
    assert obs.shape == (3,) and "dist" in info
    obs, reward, term, trunc, info = env.step(np.zeros((1, 4)))
    # reward is the custom distance (drone near spawn, ~0.4 m from target)
    assert reward == -info["dist"] and reward < -0.1
    assert not term and not trunc
    # custom truncation: step past 2 s of sim time
    for _ in range(2 * env.CTRL_FREQ):
        obs, reward, term, trunc, info = env.step(np.zeros((1, 4)))
        if trunc:
            break
    assert trunc
    env.close()


class _RawRPMHover(CtrlAviary):
    """Overrides _preprocessAction (the BaseAviary.py:1080 hook): ignores the
    action and commands exact hover RPM on all motors."""

    def _preprocessAction(self, action):
        return np.full((self.NUM_DRONES, 4), self.HOVER_RPM)


def test_custom_preprocess_action_injects_rpms():
    env = _RawRPMHover(num_drones=1, initial_xyzs=np.array([[0.0, 0.0, 1.0]]))
    env.reset(seed=0)
    for _ in range(env.CTRL_FREQ):  # 1 s at exact hover thrust
        env.step(np.zeros((1, 4)))  # the zero action would otherwise free-fall
    # at hover RPM the drone holds altitude (mm-scale numeric drift)
    assert abs(env.pos[0, 2] - 1.0) < 5e-3, env.pos
    # the applied RPMs are visible through the reference mirror
    np.testing.assert_allclose(env.last_clipped_action,
                               np.full((1, 4), env.HOVER_RPM), rtol=1e-6)
    env.close()


def test_zero_action_without_override_free_falls():
    """Control: the same zero action through the built-in pipeline cuts the
    motors, so the custom-hook test above genuinely proves RPM injection."""
    env = CtrlAviary(num_drones=1, initial_xyzs=np.array([[0.0, 0.0, 1.0]]))
    env.reset(seed=0)
    for _ in range(env.CTRL_FREQ):
        env.step(np.zeros((1, 4)))
    assert env.pos[0, 2] < 0.5
    env.close()


def test_kinematic_mirrors_live_and_preconstruction():
    from gym_pybullet_drones_tpu.envs.spec import ActionType

    env = HoverAviary(act=ActionType.ONE_D_RPM)
    # inspectable before the first reset (reference construction-time
    # housekeeping, BaseAviary.py:205-211)
    assert env.pos.shape == (1, 3) and env.quat.shape == (1, 4)
    np.testing.assert_allclose(env.pos, env.INIT_XYZS, atol=1e-6)
    env.reset(seed=0)
    p0 = env.pos.copy()
    for _ in range(5):
        env.step(np.full((1, 1), -1.0))  # min RPM: fall
    assert env.pos[0, 2] < p0[0, 2]
    assert env.vel[0, 2] < 0
    assert env.rpy.shape == (1, 3) and env.ang_v.shape == (1, 3)
    assert env.last_clipped_action.shape == (1, 4)
    env.close()


def test_parse_urdf_parameters_matches_constants():
    env = CtrlAviary(num_drones=1)
    (m, arm, t2w, J, J_inv, kf, km, col_h, col_r, col_z, max_kmh,
     gnd_eff, prop_r, drag, dw1, dw2, dw3) = env._parseURDFParameters()
    assert m == pytest.approx(env.M)
    assert arm == pytest.approx(env.L)
    assert t2w == pytest.approx(env.THRUST2WEIGHT_RATIO)
    np.testing.assert_allclose(J, env.J, rtol=1e-6)
    assert kf == pytest.approx(env.KF) and km == pytest.approx(env.KM)
    assert col_r == pytest.approx(env.COLLISION_R)
    np.testing.assert_allclose(drag, env.DRAG_COEFF, rtol=1e-6)
    assert dw1 == pytest.approx(env.DW_COEFF_1)
    env.close()


def test_calculate_next_step_caps_distance():
    env = CtrlAviary(num_drones=1)
    cur = np.zeros(3)
    far = np.array([10.0, 0.0, 0.0])
    step = env._calculateNextStep(cur, far, step_size=1)
    np.testing.assert_allclose(step, [1.0, 0.0, 0.0], atol=1e-6)
    near = np.array([0.2, 0.0, 0.0])
    np.testing.assert_allclose(env._calculateNextStep(cur, near, 1),
                               near, atol=1e-6)
    env.close()


def test_default_hooks_preserve_builtin_behavior():
    """Un-overridden camelCase hooks fall back to the device task signals:
    HoverAviary still produces its reference reward."""
    env = HoverAviary()
    obs, _ = env.reset(seed=0)
    _, reward, term, trunc, info = env.step(np.zeros((1, 4)))
    err = np.linalg.norm(np.array([0, 0, 1]) - env.pos[0])
    assert reward == pytest.approx(max(0.0, 2.0 - err**4), rel=1e-5)
    assert info == {"answer": 42}
    # base hooks reflect the same values
    assert env._computeReward() == pytest.approx(reward)
    assert env._computeTerminated() == term
    assert env._computeTruncated() == trunc
    env.close()


def test_physics_term_probes():
    """The per-drone physics methods (BaseAviary.py:679-892) exist as probe
    shims returning the values the fused kernel applies."""
    env = CtrlAviary(num_drones=2, initial_xyzs=np.array([[0, 0, 0.05],
                                                          [0, 0, 1.0]]))
    env.reset(seed=0)
    rpm = np.full(4, env.HOVER_RPM)

    forces, z_torque = env._physics(rpm, 0)
    np.testing.assert_allclose(forces, env.KF * rpm**2, rtol=1e-5)
    assert z_torque == pytest.approx(0.0, abs=1e-9)  # equal RPMs cancel

    ge = env._groundEffect(rpm, 0)
    assert ge.shape == (4,) and np.all(ge > 0)  # near the ground
    ge_high = env._groundEffect(rpm, 1)
    assert np.all(ge_high < ge)  # decays with height

    drag = env._drag(rpm, 0)
    np.testing.assert_allclose(drag, 0.0, atol=1e-9)  # zero velocity

    dw = env._downwash(0)  # drone 1 hovers directly above drone 0
    assert dw[2] < 0 and dw[0] == dw[1] == 0
    assert env._downwash(1)[2] == 0  # nothing above the top drone

    pos, quat, vel, rates = env._dynamics(rpm, 0)
    assert pos.shape == (3,) and quat.shape == (4,)
    assert abs(vel[2]) < 0.01  # hover RPM: near-zero vertical accel

    q = env._integrateQ(np.array([0, 0, 0, 1.0]),
                        np.array([0, 0, np.pi / 2]), 1.0)
    np.testing.assert_allclose(np.abs(q), [0, 0, np.sqrt(0.5), np.sqrt(0.5)],
                               atol=1e-6)  # quarter-turn about z
    env.close()


class _ScalarThrottleAviary(CtrlAviary):
    """Custom action SHAPE: a reference-style subclass that overrides BOTH
    _actionSpace (a single scalar throttle per drone) and _preprocessAction —
    the size no longer matches the built-in (N, 4) layout."""

    def _actionSpace(self):
        from gymnasium import spaces

        return spaces.Box(low=0.0, high=1.0, shape=(self.NUM_DRONES,),
                          dtype=np.float32)

    def _preprocessAction(self, action):
        return np.tile((np.asarray(action) * self.MAX_RPM)[:, None], (1, 4))


def test_custom_action_shape_steps_without_builtin_reshape():
    env = _ScalarThrottleAviary(num_drones=2,
                                initial_xyzs=np.array([[0.0, 0.0, 1.0],
                                                       [1.0, 0.0, 1.0]]))
    env.reset(seed=0)
    hover_frac = env.HOVER_RPM / env.MAX_RPM
    for _ in range(env.CTRL_FREQ):
        obs, reward, term, trunc, info = env.step(
            np.full(2, hover_frac, dtype=np.float32))
    assert abs(env.pos[0, 2] - 1.0) < 5e-3, env.pos
    np.testing.assert_allclose(env.last_clipped_action,
                               np.full((2, 4), env.HOVER_RPM), rtol=1e-6)
    env.close()
