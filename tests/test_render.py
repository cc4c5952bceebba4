"""On-device camera tests: geometry, depth convention, segmentation, RGB obs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.spec import ActionType, ImageType, ObservationType
from gym_pybullet_drones_tpu.render.camera import (
    CameraConfig,
    export_image,
    render_drone_views,
)


def _level_pose(n=1, z=1.0):
    pos = np.zeros((n, 3))
    pos[:, 2] = z
    quat = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    return jnp.asarray(pos), jnp.asarray(quat)


def test_shapes_and_dtypes():
    pos, quat = _level_pose(2)
    rgba, dep, seg = jax.jit(
        lambda p, q: render_drone_views(p, q, 0.0397))(pos, quat)
    assert rgba.shape == (2, 48, 64, 4) and rgba.dtype == jnp.uint8
    assert dep.shape == (2, 48, 64) and dep.dtype == jnp.float32
    assert seg.shape == (2, 48, 64) and seg.dtype == jnp.int32
    assert np.all(np.asarray(rgba)[..., 3] == 255)


def test_level_view_sees_sky_above_and_ground_below():
    pos, quat = _level_pose(1, z=0.5)
    rgba, dep, seg = render_drone_views(pos, quat, 0.0397,
                                        CameraConfig(with_landmarks=False))
    seg = np.asarray(seg)[0]
    # Top rows look over the horizon -> sky (-1); bottom rows -> ground (0)
    assert np.all(seg[0, :] == -1)
    assert np.all(seg[-1, :] == 0)
    dep = np.asarray(dep)[0]
    assert np.all(dep >= 0) and np.all(dep <= 1)
    assert dep[0, 0] == 1.0  # sky at far plane
    # Ground directly below the bottom row is much closer than the horizon
    assert dep[-1, 32] < dep[24, 32] or seg[24, 32] == -1


def test_sees_other_drone_ahead():
    # Drone 1 hovers 1 m ahead (+x) of drone 0 at the same height
    pos = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 1.0]])
    quat = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 1))
    rgba, dep, seg = render_drone_views(pos, quat, 0.0397,
                                        CameraConfig(with_landmarks=False))
    seg0 = np.asarray(seg)[0]
    assert np.any(seg0 == 2)  # drone index 1 -> seg id 2
    # And never itself
    assert not np.any(seg0 == 1)
    # The other drone is roughly centered (camera looks along +x)
    ys, xs = np.where(seg0 == 2)
    assert abs(xs.mean() - 32) < 6 and abs(ys.mean() - 24) < 8


def test_landmark_ahead_is_visible():
    pos, quat = _level_pose(1, z=0.3)  # landmark block at [1, 0, .1]
    rgba, dep, seg = render_drone_views(pos, quat, 0.0397)
    assert np.any(np.asarray(seg)[0] == 2)  # N=1 -> landmark ids start at 2


def test_rgb_observation_pipeline(tmp_path):
    from gym_pybullet_drones_tpu.compat.gym import HoverAviary

    env = HoverAviary(obs=ObservationType.RGB, act=ActionType.ONE_D_RPM)
    obs, info = env.reset(seed=0)
    assert obs.shape == (1, 48, 64, 4) and obs.dtype == np.uint8
    assert env.observation_space.contains(obs)
    obs, r, t, tr, _ = env.step(np.zeros((1, 1)))
    assert obs.dtype == np.uint8

    out = export_image(ImageType.RGB, obs[0], str(tmp_path), 0)
    assert out.endswith("frame_0.png")
    rgba, dep, seg = render_drone_views(
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
        0.0397)
    export_image(ImageType.DEP, np.asarray(dep)[0], str(tmp_path), 1)
    export_image(ImageType.SEG, np.asarray(seg)[0], str(tmp_path), 2)
    export_image(ImageType.BW, np.asarray(rgba)[0], str(tmp_path), 3)


def test_rgb_capture_frequency_holds_frames():
    """RGB obs refresh only on IMG_CAPTURE_FREQ boundaries and are HELD in
    between (BaseRLAviary.py:293-306 with the pre-increment counter gate,
    BaseAviary.py:376-382): at 240 Hz physics / 30 Hz control the capture
    period is 240/24 = 10 substeps vs 8 substeps per control step, so fresh
    frames appear on control steps where (8*t) % 40 == 0 -> every 5th."""
    import jax
    import jax.numpy as jnp
    from gym_pybullet_drones_tpu.envs import base as envbase
    from gym_pybullet_drones_tpu.envs.base import AviaryConfig, TASK_HOVER
    from gym_pybullet_drones_tpu.envs.spec import (
        ActionType, ObservationType, Physics,
    )

    cfg = AviaryConfig(
        num_drones=1, physics=Physics.PYB, pyb_freq=240, ctrl_freq=30,
        task=TASK_HOVER, action_type=ActionType.ONE_D_RPM,
        obs_type=ObservationType.RGB, action_buffer_size=15,
    )
    params = envbase.build_params(cfg)
    ctrl_params = envbase.build_ctrl_params(cfg)
    target = envbase.hover_target_pos(cfg, params)
    state = envbase.reset(cfg, params)
    obs0 = envbase.compute_obs(cfg, state)
    step = jax.jit(lambda s, a: envbase.step(cfg, params, ctrl_params,
                                             target, s, a))
    action = jnp.asarray([[0.4]])  # climb -> the view changes between captures
    prev = np.asarray(obs0)
    changes = []
    for t in range(12):
        state, obs, *_ = step(state, action)
        cur = np.asarray(obs)
        changes.append(bool((cur != prev).any()))
        prev = cur
    # pre-increment counters at obs time: 0, 8, 16, ... -> capture (i.e. a
    # possible change) only at t=0, 5, 10 (counter 0, 40, 80); t=0's capture
    # re-renders the reset pose so may equal obs0; all other steps MUST hold.
    for t, changed in enumerate(changes):
        if t % 5 != 0:
            assert not changed, f"frame changed on hold step {t}"
    assert changes[5] and changes[10], "no fresh frame on capture steps"


def test_compat_drone_images_and_export(tmp_path):
    """BaseAviaryEnv._getDroneImages / _exportImage (BaseAviary.py:565-654):
    reference shapes/dtypes and the frame_<n>.png export for every
    ImageType."""
    import os

    from gym_pybullet_drones_tpu.compat.gym import CtrlAviary
    from gym_pybullet_drones_tpu.envs.spec import ImageType

    env = CtrlAviary(num_drones=2)
    env.reset(seed=0)
    rgb, dep, seg = env._getDroneImages(1)
    w, h = env.IMG_RES
    assert rgb.shape == (h, w, 4) and rgb.dtype == np.uint8
    assert dep.shape == (h, w)
    assert seg.shape == (h, w)
    for i, (img_type, img) in enumerate(
            ((ImageType.RGB, rgb), (ImageType.DEP, dep),
             (ImageType.SEG, seg), (ImageType.BW, rgb))):
        env._exportImage(img_type, img, str(tmp_path), i)
        assert os.path.exists(tmp_path / f"frame_{i}.png")
    env.close()


def test_cam_indices_subset_matches_full_render():
    """render_drone_views(cam_indices=k) == full render's k-th view, with
    global segmentation ids and all drones present in the scene."""
    import jax.numpy as jnp

    from gym_pybullet_drones_tpu.core.params import drone_params
    from gym_pybullet_drones_tpu.core.rotations import euler_xyz_to_quat
    from gym_pybullet_drones_tpu.render.camera import render_drone_views
    from gym_pybullet_drones_tpu.envs.spec import DroneModel

    params = drone_params(DroneModel.CF2X)
    pos = jnp.asarray([[0.0, 0.0, 0.5], [1.0, 0.0, 0.5], [0.3, 0.0, 0.5]])
    quat = euler_xyz_to_quat(jnp.zeros((3, 3)))
    full = render_drone_views(pos, quat, params.arm)
    one = render_drone_views(pos, quat, params.arm, cam_indices=2)
    for f, o in zip(full, one):
        np.testing.assert_array_equal(np.asarray(f[2]), np.asarray(o[0]))
    # drone 2 looks along +x: drone 1 (global seg id 2) must be in view
    assert (np.asarray(one[2][0]) == 2).any()


def test_drone_proxy_tracks_attitude():
    """Round-3 X-frame proxy: a scene drone's yaw changes its silhouette
    (the round-2 sphere proxy was rotation-invariant — no attitude signal
    in pixels; the reference renders the cf2.dae mesh, BaseAviary.py:565)."""
    from gym_pybullet_drones_tpu.core.rotations import euler_xyz_to_quat

    pos = jnp.asarray([[0.0, 0.0, 0.3], [0.25, 0.0, 0.3]], jnp.float32)
    masks = []
    for yaw in (0.0, np.pi / 4):
        quat = euler_xyz_to_quat(
            jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, yaw]], jnp.float32))
        _, _, seg = render_drone_views(pos, quat, 0.0397,
                                       CameraConfig(with_landmarks=False))
        masks.append(np.asarray(seg)[0] == 2)
    assert masks[0].any() and masks[1].any()  # visible in both
    assert (masks[0] != masks[1]).any()  # silhouette rotated with the body


def test_block_landmark_renders_as_box():
    """The block landmark is a flat 5x15x5 cm box (BaseRLAviary.py:108:
    block.urdf is a literal box): seen from the -y side its silhouette is
    ~3x wider than tall — a sphere stand-in would be ~1:1."""
    from gym_pybullet_drones_tpu.core.rotations import euler_xyz_to_quat

    # the long (y) axis must be transverse to the view: camera west of the
    # block looking along +x (the drone camera looks along body +x)
    pos = jnp.asarray([[0.4, 0.0, 0.1]], jnp.float32)
    quat = euler_xyz_to_quat(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32))
    cfg = CameraConfig(width=128, height=96)
    _, _, seg = render_drone_views(pos, quat, 0.0397, cfg)
    m = np.asarray(seg)[0] == 2  # N=1 -> block id 2
    assert m.any()
    ys, xs = np.where(m)
    w = xs.max() - xs.min() + 1
    h = ys.max() - ys.min() + 1
    assert w / h > 1.8, (w, h)


def test_mesh_rendering_round4():
    """Round-4 mesh fidelity (VERDICT r3 item #4): the cf2 silhouette and the
    duck/teddy landmark meshes are visible in seg, and the drone's pixels
    change with its attitude (the property the X-frame proxy introduced and
    the mesh must preserve)."""
    import math

    from gym_pybullet_drones_tpu.render.camera import (
        CameraConfig, render_drone_views)

    # cam drone 0 looks along +x at drone 1 (id 2 in seg)
    pos = jnp.asarray([[0.0, 0.0, 0.3], [0.5, 0.0, 0.3]], jnp.float32)
    quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]] * 2, jnp.float32)
    rgba0, _, seg0 = render_drone_views(pos, quat, 0.0397, CameraConfig(),
                                        cam_indices=0)
    assert (np.asarray(seg0) == 2).sum() > 3

    # tilt the scene drone: silhouette pixels must change
    s, c = math.sin(0.2), math.cos(0.2)
    quat_t = quat.at[1].set(jnp.asarray([s, 0.0, 0.0, c], jnp.float32))
    rgba1, _, seg1 = render_drone_views(pos, quat_t, 0.0397, CameraConfig(),
                                        cam_indices=0)
    m = (np.asarray(seg0) == 2) | (np.asarray(seg1) == 2)
    assert (np.asarray(rgba0)[m] != np.asarray(rgba1)[m]).any()

    # duck (id N+3) from a drone at [-2,0,.2] facing +x; teddy (id N+4)
    # from [0,-2,.2] facing +y (landmark poses BaseRLAviary.py:108-126)
    _, _, seg_d = render_drone_views(
        jnp.asarray([[-2.0, 0.0, 0.2]], jnp.float32),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), 0.0397,
        CameraConfig())
    assert (np.asarray(seg_d) == 4).sum() > 3  # duck
    q90 = jnp.asarray([[0.0, 0.0, math.sin(math.pi / 4),
                        math.cos(math.pi / 4)]], jnp.float32)
    _, _, seg_t = render_drone_views(
        jnp.asarray([[0.0, -2.0, 0.2]], jnp.float32), q90, 0.0397,
        CameraConfig())
    assert (np.asarray(seg_t) == 5).sum() > 3  # teddy

    # xframe proxy still available and auto kicks in above 8 scene drones
    N = 12
    posn = jnp.asarray(np.stack([np.linspace(0, 3, N), np.zeros(N),
                                 np.full(N, 0.3)], -1), jnp.float32)
    quatn = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32), (N, 1))
    _, _, seg_x = render_drone_views(posn, quatn, 0.0397, CameraConfig(),
                                     cam_indices=0)
    assert (np.asarray(seg_x) > 0).sum() > 3


def test_base_obstacle_scene_round4():
    """BaseAviary's own obstacle world (_addObstacles, BaseAviary.py:958-981)
    — previously scoped out as reference dead code, replicated in round 4:
    obstacles=True on a NON-RL env renders and collides the duck / 1 m cube
    / sphere2 / samurai-gate stand-in (core/collisions.base_obstacles)."""
    import math

    from gym_pybullet_drones_tpu.compat.gym import CtrlAviary
    from gym_pybullet_drones_tpu.envs import base as eb

    # render: -y view from [0,1,.6] sees cube (id 3), gate (5..7)
    q = jnp.asarray([[0.0, 0.0, -math.sin(math.pi / 4),
                      math.cos(math.pi / 4)]], jnp.float32)
    _, _, seg = render_drone_views(
        jnp.asarray([[0.0, 1.0, 0.6]], jnp.float32), q, 0.0397,
        CameraConfig(scene="base"))
    s = np.asarray(seg)
    assert (s == 3).sum() > 10          # cube_no_rotation
    assert ((s >= 5) & (s <= 7)).any()  # samurai gate stand-in

    # compat surface: non-RL env with obstacles exposes the 6-body spec
    env = CtrlAviary(num_drones=1, obstacles=True)
    assert env.cfg.obstacle_scene == "base"
    assert env._addObstacles().shape == (6, 7)
    env.close()

    # physics: free fall onto the cube top (z=1.0) comes to rest on it
    cfg = eb.AviaryConfig(
        task=eb.TASK_CTRL, pyb_freq=240, ctrl_freq=30, collisions=True,
        obstacles=True, obstacle_scene="base",
        initial_xyzs=((-0.5, -2.5, 1.2),))
    params, cp = eb.build_params(cfg), eb.build_ctrl_params(cfg)
    state = eb.reset(cfg, params)
    step = jax.jit(lambda st, a: eb.step(
        cfg, params, cp, np.zeros((1, 3), np.float32), st, a))
    a = jnp.zeros((1, 4))
    for _ in range(60):
        state, *_ = step(state, a)
    z = float(state.kin.pos[0, 2])
    assert 0.98 < z < 1.1, z
