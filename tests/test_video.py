"""Video export: MJPEG-AVI muxer + record=True end-to-end
(utils/video.py; reference MP4 capture BaseAviary.py:523-537,
assets/ffmpeg_png2mp4.sh)."""

import os
import struct

import numpy as np

from gym_pybullet_drones_tpu.utils.video import (
    encode_video,
    png_dir_to_video,
    write_mjpeg_avi,
)


def _gradient_frames(n=10, h=48, w=64):
    frames = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = int(255 * i / max(1, n - 1))
        f[:, i:i + 6, 1] = 255  # moving bar
        frames.append(f)
    return frames


def test_mjpeg_avi_structure_and_decodability(tmp_path):
    path = str(tmp_path / "out.avi")
    write_mjpeg_avi(_gradient_frames(), path, fps=24)
    data = open(path, "rb").read()
    # RIFF/AVI container sanity
    assert data[0:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data and b"movi" in data and b"idx1" in data
    # Each frame chunk is a decodable JPEG: walk the movi chunks
    import io

    from PIL import Image

    pos = data.find(b"movi") + 4
    count = 0
    while data[pos:pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        jpg = data[pos + 8:pos + 8 + size]
        with Image.open(io.BytesIO(jpg)) as im:
            assert im.size == (64, 48)
        count += 1
        pos += 8 + size + (size % 2)
    assert count == 10


def test_encode_video_fallback_names_avi(tmp_path):
    out = encode_video(_gradient_frames(4), str(tmp_path / "clip.mp4"), fps=12)
    # no ffmpeg in this image -> MJPEG AVI fallback
    assert out.endswith((".mp4", ".avi")) and os.path.getsize(out) > 1000


def test_record_true_produces_playable_video(tmp_path):
    """compat record=True -> PNG frames -> muxed video on close()."""
    from gym_pybullet_drones_tpu.compat.gym import CtrlAviary

    env = CtrlAviary(record=True, output_folder=str(tmp_path))
    obs, _ = env.reset()
    hover = np.full((1, 4), env.HOVER_RPM * 1.02, np.float32)
    for _ in range(30):
        env.step(hover)
    env.close()
    rec_dirs = [d for d in os.listdir(tmp_path) if d.startswith("recording_")]
    assert rec_dirs
    files = os.listdir(os.path.join(tmp_path, rec_dirs[0]))
    assert any(f.endswith((".avi", ".mp4")) for f in files), files


def test_png_dir_to_video(tmp_path):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i, f in enumerate(_gradient_frames(5)):
        Image.fromarray(f).save(str(d / f"frame_{i}.png"))
    out = png_dir_to_video(str(d), fps=10)
    assert os.path.getsize(out) > 500


def test_gui_live_viewer_headless_captures_frames(tmp_path):
    """gui=True on a headless (Agg) backend: the LiveViewer stand-in for the
    PyBullet window captures RGB frames instead of drawing a window."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from gym_pybullet_drones_tpu.compat.gym import CtrlAviary

    env = CtrlAviary(gui=True)
    env.reset()
    hover = np.full((1, 4), env.HOVER_RPM, np.float32)
    for _ in range(30):
        env.step(hover)
    assert env._viewer is not None
    frames = env._viewer.frames
    assert len(frames) >= 1
    assert frames[0].ndim == 3 and frames[0].shape[2] == 3
    env.close()
    assert env._viewer is None


def test_float_frames_rescale_not_black(tmp_path):
    """Float frames in matplotlib's [0,1] convention must encode as real
    intensities, not clip to 0/1-of-255 (a black video)."""
    import numpy as np

    from gym_pybullet_drones_tpu.utils.video import _jpeg_bytes

    frame = np.full((32, 32, 3), 0.5, dtype=np.float64)
    data = _jpeg_bytes(frame)
    from io import BytesIO

    from PIL import Image

    arr = np.asarray(Image.open(BytesIO(data)))
    assert 100 < arr.mean() < 155, arr.mean()  # ~127, not ~0
