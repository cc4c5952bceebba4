"""Functional aviary environments: pure reset/step over explicit pytree state.

This is the TPU-native replacement for the reference's `BaseAviary` class tree
(envs/BaseAviary.py, envs/CtrlAviary.py, envs/VelocityAviary.py,
envs/BaseRLAviary.py, envs/HoverAviary.py, envs/MultiHoverAviary.py): instead of
a stateful gym.Env driving a C++ engine through per-drone Python loops, an env
is a static ``AviaryConfig`` plus two pure functions

    reset(cfg) -> (AviaryState, obs)
    step(cfg, state, action) -> (AviaryState, obs, reward, terminated, truncated)

that jit, vmap over env batches, and shard over device meshes. The Gymnasium
shell in ``compat/gym.py`` wraps these for drop-in API parity.

Every behavioral detail (action pipelines, 20-dim state vector layout, reward/
termination rules, the 0.5 s action buffer in RL observations) follows the
reference, with file:line citations at each site.
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gym_pybullet_drones_tpu.control.dsl_pid import (
    DSLPIDParams,
    DSLPIDState,
    dsl_pid_control,
    dsl_pid_params,
    dsl_pid_reset,
)
from gym_pybullet_drones_tpu.core.dynamics import (
    KinState,
    init_kin_state,
    state_rpy,
    step_physics,
)
from gym_pybullet_drones_tpu.core.params import DroneParams, drone_params
from gym_pybullet_drones_tpu.core.rotations import euler_xyz_to_quat
from gym_pybullet_drones_tpu.envs.spec import (
    ActionType,
    DroneModel,
    ObservationType,
    Physics,
)

# Task identifiers (reward/termination/truncation rules)
TASK_CTRL = "ctrl"  # CtrlAviary: dummy reward -1, never done (CtrlAviary.py:144-200)
TASK_VELOCITY = "velocity"  # VelocityAviary: same dummy signals
TASK_HOVER = "hover"  # HoverAviary.py:68-132
TASK_MULTIHOVER = "multihover"  # MultiHoverAviary.py:75-145


@dataclasses.dataclass(frozen=True)
class AviaryConfig:
    """Static environment configuration (hashable; closed over at trace time)."""

    drone_model: DroneModel = DroneModel.CF2X
    num_drones: int = 1
    physics: Physics = Physics.PYB
    pyb_freq: int = 240
    ctrl_freq: int = 240
    task: str = TASK_CTRL
    action_type: ActionType = ActionType.RPM
    obs_type: ObservationType = ObservationType.KIN
    # RL obs action buffer (BaseRLAviary.py:66-67); 0 disables (non-RL envs)
    action_buffer_size: int = 0
    episode_len_sec: float = 8.0
    neighbourhood_radius: float = float("inf")
    # None -> reference default grid (BaseAviary.py:194-197)
    initial_xyzs: Optional[tuple] = None
    initial_rpys: Optional[tuple] = None
    dtype: str = "float32"
    # Contact physics beyond the ground plane (core/collisions.py): drone-drone
    # sphere contact, plus the four RL landmark obstacles as static bodies when
    # obs_type is RGB (the reference loads them physically only then,
    # BaseRLAviary._addObstacles :99-128). Off by default: the reference's
    # *default* spawn grid and tasks never collide, and Bullet-parity of
    # non-contact trajectories is bit-exact only without the extra pass.
    collisions: bool = False
    # Ground/pair contact model: "clamp" = fast plane clamp + Jacobi pair
    # projection (throughput mode, bit-anchored by the round-1/2 goldens);
    # "impulse" = Bullet-faithful sequential-impulse solver with Coulomb
    # friction and Baumgarte correction (core/contact.py) covering tumble,
    # slide and collision regimes (anchored by the contact goldens,
    # tests/golden/tumble_pyb.npz et al.). Matches what stepSimulation's
    # sequential-impulse LCP does in the reference (BaseAviary.py:370).
    contact_mode: str = "clamp"
    # Scene obstacles for camera views: the reference's RL base always loads
    # the four landmark bodies (BaseRLAviary.py:89, :99-128) and they appear
    # in every camera; obstacles=False removes them from the rendered scene
    # (BaseAviary leaves the world empty). Controls RENDER content only —
    # contact with them additionally needs `collisions`.
    obstacles: bool = True
    # Which obstacle world: "rl" = the four BaseRLAviary landmarks
    # (:99-128); "base" = BaseAviary's own samurai/duck/cube/sphere scene
    # (BaseAviary._addObstacles, :958-981 — round 4, core/collisions.
    # base_obstacles + render/camera scene="base").
    obstacle_scene: str = "rl"
    # RGB frame stacking (SB3 VecFrameStack analogue, channel-wise): the held
    # frame slot keeps the last K captures as (N, H, W, 4K). K=1 is the
    # reference's raw single-frame observation (BaseRLAviary.py:293-306); a
    # single 24 FPS frame carries no velocity information, so pixel-only
    # training needs K>1 (docs/ROUND1.md RGB finding).
    frame_stack: int = 1
    # Renormalize quaternions every substep. The reference's DYN pipeline never
    # does (BaseAviary._integrateQ is norm-preserving only in exact arithmetic),
    # so parity tests disable this; float32 production runs keep it on.
    renormalize_quat: bool = True

    def __post_init__(self):
        if self.pyb_freq % self.ctrl_freq != 0:
            raise ValueError("pyb_freq must be a multiple of ctrl_freq (BaseAviary.py:79-80)")

    @property
    def steps_per_ctrl(self) -> int:
        return self.pyb_freq // self.ctrl_freq

    @property
    def ctrl_timestep(self) -> float:
        return 1.0 / self.ctrl_freq

    @property
    def pyb_timestep(self) -> float:
        return 1.0 / self.pyb_freq

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def action_dim(self) -> int:
        """Per-drone action width (BaseRLAviary._actionSpace, :140-149)."""
        if self.action_type in (ActionType.RPM, ActionType.VEL):
            return 4
        if self.action_type == ActionType.PID:
            return 3
        return 1  # ONE_D_RPM / ONE_D_PID

    @property
    def uses_pid_controller(self) -> bool:
        return self.action_type in (ActionType.PID, ActionType.VEL, ActionType.ONE_D_PID) or (
            self.task == TASK_VELOCITY
        )

    @property
    def obs_dim(self) -> int:
        """Per-drone KIN observation width."""
        if self.task in (TASK_CTRL, TASK_VELOCITY):
            return 20
        return 12 + self.action_buffer_size * self.action_dim

    @property
    def img_capture_freq(self) -> int:
        """Physics substeps between onboard-camera captures: the reference
        grabs frames at 24 FPS of sim time and HOLDS them in between
        (IMG_FRAME_PER_SEC/IMG_CAPTURE_FREQ, BaseAviary.py:135-136;
        capture gate BaseRLAviary.py:294). Clamped to >= 1 (a pyb_freq
        below 24 Hz would otherwise gate captures on `count % 0`)."""
        return max(1, int(self.pyb_freq / 24))


@struct.dataclass
class AviaryState:
    """Complete dynamic state of one aviary instance (batched over N drones)."""

    kin: KinState
    last_rpm: jax.Array  # (N, 4) last clipped RPM action (BaseAviary.py:372)
    ctrl: DSLPIDState  # (N, 3) leaves; zeros when unused
    action_buffer: jax.Array  # (B, N, A) raw actions, oldest first; B may be 0
    step_count: jax.Array  # int32 scalar, counts pyb substeps (BaseAviary.py:382)
    # Held onboard-camera frames (N, 48, 64, 4*frame_stack) uint8, refreshed
    # every `img_capture_freq` substeps and held in between
    # (BaseRLAviary.py:293-306); None for non-RGB configs (absent pytree leaf —
    # a zero-sized array here would alias under buffer donation).
    rgb_frames: Optional[jax.Array] = None


def default_init_xyzs(cfg: AviaryConfig, params: DroneParams) -> np.ndarray:
    """Reference default spawn grid (BaseAviary.py:194-197)."""
    n = cfg.num_drones
    L = float(params.arm)
    z = float(params.collision_h) / 2 - float(params.collision_z_offset) + 0.1
    return np.stack(
        [4 * L * np.arange(n), 4 * L * np.arange(n), np.full(n, z)], axis=1
    )


def build_params(cfg: AviaryConfig) -> DroneParams:
    return drone_params(cfg.drone_model, dtype=cfg.jnp_dtype)


def build_ctrl_params(cfg: AviaryConfig) -> DSLPIDParams:
    # Reference quirk: BOTH the RL aviaries (BaseRLAviary.py:76) and
    # VelocityAviary (VelocityAviary.py:61-62) always instantiate the embedded
    # controller with the CF2X mixer, regardless of the actual drone model.
    return dsl_pid_params(DroneModel.CF2X, dtype=cfg.jnp_dtype)


def _initial_pose(cfg: AviaryConfig, params: DroneParams):
    if cfg.initial_xyzs is None:
        xyzs = default_init_xyzs(cfg, params)
    else:
        xyzs = np.asarray(cfg.initial_xyzs, dtype=np.float64).reshape(cfg.num_drones, 3)
    if cfg.initial_rpys is None:
        rpys = np.zeros((cfg.num_drones, 3))
    else:
        rpys = np.asarray(cfg.initial_rpys, dtype=np.float64).reshape(cfg.num_drones, 3)
    return xyzs, rpys


def _render_frames(cfg: AviaryConfig, kin: KinState, params: DroneParams):
    """Fresh onboard-camera frames (N, 48, 64, 4) uint8."""
    from gym_pybullet_drones_tpu.render.camera import CameraConfig, render_drone_views

    rgba, _, _ = render_drone_views(
        kin.pos, kin.quat, params.arm,
        CameraConfig(with_landmarks=cfg.obstacles, scene=cfg.obstacle_scene,
                     frame_angle_deg=(0.0 if cfg.drone_model == DroneModel.CF2P
                                      else 45.0)))
    return rgba


def reset(cfg: AviaryConfig, params: DroneParams) -> AviaryState:
    """Fresh episode state (reference reset is deterministic, BaseAviary.py:220-255)."""
    dtype = cfg.jnp_dtype
    xyzs, rpys = _initial_pose(cfg, params)
    quats = euler_xyz_to_quat(jnp.asarray(rpys, dtype=dtype))
    kin = init_kin_state(jnp.asarray(xyzs, dtype=dtype), quats)
    n = cfg.num_drones
    if cfg.obs_type == ObservationType.RGB:
        # reset's obs captures immediately (step_counter == 0 passes the gate);
        # a K-stack starts with the first capture repeated K times.
        rgb_frames = jnp.tile(_render_frames(cfg, kin, params),
                              (1, 1, 1, cfg.frame_stack))
    else:
        rgb_frames = None
    return AviaryState(
        kin=kin,
        last_rpm=jnp.zeros((n, 4), dtype=dtype),
        ctrl=dsl_pid_reset((n,), dtype=dtype),
        action_buffer=jnp.zeros((cfg.action_buffer_size, n, cfg.action_dim), dtype=dtype),
        step_count=jnp.zeros((), dtype=jnp.int32),
        rgb_frames=rgb_frames,
    )


################################################################################
# Action pipelines (reference: CtrlAviary.py:121-140, VelocityAviary.py:129-168,
# BaseRLAviary._preprocessAction :160-239)
################################################################################


def speed_limit(params: DroneParams):
    """0.03 * MAX_SPEED_KMH in m/s (VelocityAviary.py:78, BaseRLAviary.py:96)."""
    return 0.03 * params.max_speed_kmh * (1000.0 / 3600.0)


def _calculate_next_step(current_position, destination, step_size=1.0):
    """Waypoint capping for ActionType.PID (BaseAviary._calculateNextStep, :1108-1150)."""
    direction = destination - current_position
    distance = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    safe = jnp.maximum(distance, 1e-12)
    capped = current_position + direction / safe * step_size
    return jnp.where(distance <= step_size, destination, capped)


def _vel_pipeline(cfg, params, ctrl_params, state: AviaryState, action, speed_limit):
    """Shared by VelocityAviary and ActionType.VEL: PID toward a velocity target."""
    rpy = state_rpy(state.kin)
    v = action[..., 0:3]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v_unit = jnp.where(vnorm > 0, v / jnp.maximum(vnorm, 1e-12), 0.0)
    target_vel = speed_limit * jnp.abs(action[..., 3:4]) * v_unit
    target_rpy = jnp.concatenate(
        [jnp.zeros_like(rpy[..., 0:2]), rpy[..., 2:3]], -1
    )  # keep current yaw
    rpm, new_ctrl, _, _ = dsl_pid_control(
        ctrl_params, state.ctrl, cfg.ctrl_timestep,
        state.kin.pos, state.kin.quat, state.kin.vel,
        state.kin.pos, target_rpy, target_vel,
    )
    return rpm, new_ctrl


def preprocess_action(
    cfg: AviaryConfig,
    params: DroneParams,
    ctrl_params: DSLPIDParams,
    state: AviaryState,
    action,
):
    """action (N, A) -> (rpm (N,4), new DSLPIDState)."""
    if cfg.task == TASK_CTRL:
        # Raw RPM clip (CtrlAviary.py:121-140)
        return jnp.clip(action, 0.0, params.max_rpm), state.ctrl
    if cfg.task == TASK_VELOCITY:
        return _vel_pipeline(cfg, params, ctrl_params, state, action,
                             speed_limit(params))

    # RL pipelines (BaseRLAviary.py:160-239)
    at = cfg.action_type
    if at == ActionType.RPM:
        return params.hover_rpm * (1.0 + 0.05 * action), state.ctrl
    if at == ActionType.ONE_D_RPM:
        return params.hover_rpm * (1.0 + 0.05 * jnp.repeat(action, 4, axis=-1)), state.ctrl
    if at == ActionType.PID:
        next_pos = _calculate_next_step(state.kin.pos, action, 1.0)
        rpm, new_ctrl, _, _ = dsl_pid_control(
            ctrl_params, state.ctrl, cfg.ctrl_timestep,
            state.kin.pos, state.kin.quat, state.kin.vel, next_pos,
        )
        return rpm, new_ctrl
    if at == ActionType.VEL:
        return _vel_pipeline(cfg, params, ctrl_params, state, action,
                             speed_limit(params))
    if at == ActionType.ONE_D_PID:
        target = state.kin.pos + 0.1 * jnp.concatenate(
            [jnp.zeros_like(action), jnp.zeros_like(action), action], -1
        )
        rpm, new_ctrl, _, _ = dsl_pid_control(
            ctrl_params, state.ctrl, cfg.ctrl_timestep,
            state.kin.pos, state.kin.quat, state.kin.vel, target,
        )
        return rpm, new_ctrl
    raise ValueError(f"unsupported action type {at}")


################################################################################
# Observations
################################################################################


def drone_state_vector(cfg: AviaryConfig, state: AviaryState):
    """The reference 20-dim per-drone state (BaseAviary._getDroneStateVector, :541-561):
    [pos(3), quat(4), rpy(3), vel(3), ang_v(3), last_clipped_action(4)]."""
    kin = state.kin
    return jnp.concatenate(
        [kin.pos, kin.quat, state_rpy(kin), kin.vel, kin.ang_v, state.last_rpm], -1
    )


def compute_obs(cfg: AviaryConfig, state: AviaryState):
    if cfg.task in (TASK_CTRL, TASK_VELOCITY):
        return drone_state_vector(cfg, state)  # (N, 20)
    if cfg.obs_type == ObservationType.RGB:
        # Drone-POV RGBA frames (BaseRLAviary._computeObs RGB path, :293-306),
        # rendered by the on-device ray-caster instead of PyBullet's camera.
        # The obs is the HELD frame slot — refreshed in step() only on
        # img_capture_freq boundaries, exactly the reference's 24 FPS cadence.
        return state.rgb_frames  # (N, 48, 64, 4) uint8
    # RL KIN obs: 12-dim kinematics + flattened action buffer, oldest first
    # (BaseRLAviary._computeObs, :307-319)
    full = drone_state_vector(cfg, state)
    obs12 = jnp.concatenate([full[..., 0:3], full[..., 7:16]], -1)
    if cfg.action_buffer_size == 0:
        return obs12
    buf = jnp.moveaxis(state.action_buffer, 0, -2)  # (N, B, A)
    flat = buf.reshape(buf.shape[:-2] + (-1,))
    return jnp.concatenate([obs12, flat], -1)


################################################################################
# Task rules (reward / terminated / truncated)
################################################################################


def hover_target_pos(cfg: AviaryConfig, params: DroneParams) -> jnp.ndarray:
    """HoverAviary.py:51 (single: [0,0,1]); MultiHoverAviary.py:71
    (INIT_XYZS + [0,0,1/(i+1)])."""
    if cfg.task == TASK_HOVER:
        return jnp.asarray([[0.0, 0.0, 1.0]], dtype=cfg.jnp_dtype)
    xyzs, _ = _initial_pose(cfg, params)
    offs = np.stack(
        [np.zeros(cfg.num_drones), np.zeros(cfg.num_drones),
         1.0 / (np.arange(cfg.num_drones) + 1.0)], 1
    )
    return jnp.asarray(xyzs + offs, dtype=cfg.jnp_dtype)


def compute_reward(cfg: AviaryConfig, state: AviaryState, target_pos):
    if cfg.task in (TASK_CTRL, TASK_VELOCITY):
        return jnp.asarray(-1.0, dtype=cfg.jnp_dtype)
    # max(0, 2 - ||e||^4), summed over drones (HoverAviary.py:77-79,
    # MultiHoverAviary.py:84-88)
    err = jnp.linalg.norm(target_pos - state.kin.pos, axis=-1)
    return jnp.sum(jnp.maximum(0.0, 2.0 - err**4), axis=-1)


def compute_terminated(cfg: AviaryConfig, state: AviaryState, target_pos):
    if cfg.task in (TASK_CTRL, TASK_VELOCITY):
        return jnp.asarray(False)
    err = jnp.linalg.norm(target_pos - state.kin.pos, axis=-1)
    if cfg.task == TASK_HOVER:
        return err[..., 0] < 1e-4  # HoverAviary.py:92-96
    return jnp.sum(err, axis=-1) < 1e-4  # MultiHoverAviary.py:101-108


def compute_truncated(cfg: AviaryConfig, state: AviaryState):
    if cfg.task in (TASK_CTRL, TASK_VELOCITY):
        return jnp.asarray(False)
    pos = state.kin.pos
    rpy = state_rpy(state.kin)
    bound = 1.5 if cfg.task == TASK_HOVER else 2.0  # HoverAviary.py:109 / MultiHover.py:121
    out = (
        (jnp.abs(pos[..., 0]) > bound)
        | (jnp.abs(pos[..., 1]) > bound)
        | (pos[..., 2] > 2.0)
        | (jnp.abs(rpy[..., 0]) > 0.4)
        | (jnp.abs(rpy[..., 1]) > 0.4)
    )
    # Reference ordering: _computeTruncated reads step_counter BEFORE the
    # step advances it (BaseAviary.step computes the signals at :376-380 and
    # increments at :382), so the timeout uses the PRE-increment count — the
    # same gate convention as the RGB capture (step() below). An 8 s episode
    # at 240/30 therefore spans 242 reward-bearing control steps, not 241:
    # the first call with 8*(k-1)/240 > 8 is k = 242 (HoverAviary.py:115).
    pre_count = state.step_count - cfg.steps_per_ctrl
    timeout = pre_count / cfg.pyb_freq > cfg.episode_len_sec
    return jnp.any(out, axis=-1) | timeout


################################################################################
# The fused step
################################################################################


def step(
    cfg: AviaryConfig,
    params: DroneParams,
    ctrl_params: DSLPIDParams,
    target_pos,
    state: AviaryState,
    action,
    preprocessed_rpm=None,
):
    """One control-period step: action pipeline -> physics substeps -> signals.

    Mirrors BaseAviary.step (BaseAviary.py:259-383). Pure; jit/vmap/shard-safe.
    Returns (state, obs, reward, terminated, truncated).

    ``preprocessed_rpm`` (N, 4), when given, bypasses `preprocess_action`
    with externally-computed motor RPMs (clipped to [0, MAX_RPM]) while the
    task's obs/reward/termination rules still apply — the hook for user
    subclasses that override the reference's ``_preprocessAction``
    (BaseAviary.py:349-372 feeds `_physics` whatever that override returns).
    On that path ``action`` may have ANY shape (a custom ``_actionSpace``)
    and the action buffer is NOT updated: the reference's buffer append
    lives INSIDE BaseRLAviary._preprocessAction (BaseRLAviary.py:185-188),
    so an override replaces it — appending here would put rows in the KIN
    observations that the reference never would.
    """
    action = jnp.asarray(action, dtype=cfg.jnp_dtype)
    builtin_layout = action.size == cfg.num_drones * cfg.action_dim
    if builtin_layout:
        action = action.reshape(cfg.num_drones, cfg.action_dim)
    elif preprocessed_rpm is None:
        raise ValueError(
            f"action of size {action.size} does not fit the "
            f"({cfg.num_drones}, {cfg.action_dim}) action layout; custom "
            "action shapes require preprocessed_rpm (_preprocessAction hook)")
    if (cfg.action_buffer_size > 0 and builtin_layout
            and preprocessed_rpm is None):
        buf = jnp.concatenate([state.action_buffer[1:], action[None]], axis=0)
        state = state.replace(action_buffer=buf)
    if preprocessed_rpm is None:
        rpm, new_ctrl = preprocess_action(cfg, params, ctrl_params, state, action)
    else:
        rpm = jnp.clip(
            jnp.asarray(preprocessed_rpm, dtype=cfg.jnp_dtype).reshape(cfg.num_drones, 4),
            0.0, params.max_rpm)
        new_ctrl = state.ctrl
    obstacles = None
    if cfg.collisions and cfg.obstacles:
        from gym_pybullet_drones_tpu.core.collisions import (
            base_obstacles,
            rl_obstacles,
        )

        obstacles = (base_obstacles(cfg.jnp_dtype)
                     if cfg.obstacle_scene == "base"
                     else rl_obstacles(cfg.jnp_dtype))
    kin, last_rpm = step_physics(
        state.kin, rpm, state.last_rpm, params, cfg.pyb_timestep,
        cfg.steps_per_ctrl, cfg.physics, renormalize_quat=cfg.renormalize_quat,
        collisions=cfg.collisions, obstacles=obstacles,
        contact_mode=cfg.contact_mode,
    )
    state = state.replace(
        kin=kin,
        last_rpm=last_rpm,
        ctrl=new_ctrl,
        step_count=state.step_count + cfg.steps_per_ctrl,
    )
    if cfg.obs_type == ObservationType.RGB:
        # Capture gate: the reference checks the PRE-increment step counter
        # (obs computed at BaseAviary.py:376, counter advanced at :382) but
        # renders from the post-physics kinematics. Frames are held between
        # captures. lax.cond skips the renderer on hold steps only in the
        # UNBATCHED path; under vmap (batched training) it lowers to select
        # and both branches run — per-env capture phases desynchronize after
        # auto-resets, so that cost is unavoidable for correct cadence.
        pre_count = state.step_count - cfg.steps_per_ctrl
        capture = (pre_count % cfg.img_capture_freq) == 0

        def _fresh(kin):
            new = _render_frames(cfg, kin, params)
            if cfg.frame_stack == 1:
                return new
            # channel-wise ring: drop the oldest capture, append the newest
            return jnp.concatenate([state.rgb_frames[..., 4:], new], axis=-1)

        frames = jax.lax.cond(capture, _fresh, lambda kin: state.rgb_frames, kin)
        state = state.replace(rgb_frames=frames)
    obs = compute_obs(cfg, state)
    reward = compute_reward(cfg, state, target_pos)
    terminated = compute_terminated(cfg, state, target_pos)
    truncated = compute_truncated(cfg, state)
    return state, obs, reward, terminated, truncated


def adjacency_matrix(pos, neighbourhood_radius):
    """(…, N, N) 0/1 adjacency by Euclidean distance
    (BaseAviary._getAdjacencyMatrix, :658-675)."""
    d = jnp.linalg.norm(pos[..., :, None, :] - pos[..., None, :, :], axis=-1)
    n = pos.shape[-2]
    return jnp.where(d < neighbourhood_radius, 1.0, 0.0) * (1 - jnp.eye(n)) + jnp.eye(n)


class Aviary:
    """Convenience bundle: config + parameter pytrees + jitted reset/step.

    ``step`` has signature (state, action) -> (state, obs, reward, term, trunc);
    use ``jax.vmap(av.step_fn, ...)`` or the rollout helpers for batching.
    """

    def __init__(self, cfg: AviaryConfig):
        self.cfg = cfg
        self.params = build_params(cfg)
        self.ctrl_params = build_ctrl_params(cfg)
        self.target_pos = (
            hover_target_pos(cfg, self.params)
            if cfg.task in (TASK_HOVER, TASK_MULTIHOVER)
            else jnp.zeros((cfg.num_drones, 3), dtype=cfg.jnp_dtype)
        )
        self.step_fn = partial(step, cfg, self.params, self.ctrl_params, self.target_pos)
        self.reset_fn = lambda: reset(cfg, self.params)
        self._jit_step = jax.jit(self.step_fn)

    def reset(self) -> tuple[AviaryState, jax.Array]:
        state = self.reset_fn()
        obs = compute_obs(self.cfg, state)
        if self.cfg.obs_type == ObservationType.RGB:
            # compute_obs returns state.rgb_frames ITSELF for RGB configs;
            # handing callers two pytrees sharing one device buffer trips
            # "donate the same buffer twice" under donate_argnums (the
            # CLAUDE.md aliasing class, patched ad hoc in ppo_init before
            # this copy lived here).
            obs = jnp.array(obs)
        return state, obs

    def step(self, state: AviaryState, action):
        return self._jit_step(state, action)
