"""Logger schema parity: npz keys, channel reordering, CSV series set."""

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")

from gym_pybullet_drones_tpu.utils.logger import Logger


def _state20(i):
    s = np.zeros(20)
    s[0:3] = [i, 2 * i, 3 * i]          # pos
    s[3:7] = [0, 0, 0, 1]               # quat
    s[7:10] = [0.1 * i, 0.2 * i, 0.3]   # rpy
    s[10:13] = [1, 2, 3]                # vel
    s[13:16] = [4, 5, 6]                # ang_v
    s[16:20] = [100, 200, 300, 400]     # rpm
    return s


def test_log_reordering_and_save(tmp_path):
    lg = Logger(logging_freq_hz=10, num_drones=2, output_folder=str(tmp_path))
    for t in range(5):
        for d in range(2):
            lg.log(d, t / 10, _state20(t), np.arange(12))
    # Channel layout (Logger.py:117): [pos, vel, rpy, ang_v, rpm]
    assert lg.states[0, 0, 3] == 3          # x at t=3
    assert lg.states[0, 3, 2] == 1          # vx
    assert lg.states[0, 6, 2] == 0.2        # roll
    assert lg.states[0, 9, 1] == 4          # wx
    assert lg.states[0, 12, 1] == 100       # rpm0
    path = lg.save()
    data = np.load(path)
    assert set(data.files) == {"timestamps", "states", "controls"}
    assert data["states"].shape == (2, 16, 5)


def test_bulk_equals_scalar_logging(tmp_path):
    states = np.stack([np.stack([_state20(t) for _ in range(2)]) for t in range(7)])
    a = Logger(logging_freq_hz=10, num_drones=2, output_folder=str(tmp_path))
    b = Logger(logging_freq_hz=10, num_drones=2, output_folder=str(tmp_path))
    for t in range(7):
        for d in range(2):
            a.log(d, t / 10, states[t, d])
    b.log_trajectory(states)
    np.testing.assert_allclose(a.states[:, :, :7], b.states[:, :, :7])
    np.testing.assert_allclose(a.timestamps[:, :7], b.timestamps[:, :7])


def test_csv_series_names(tmp_path):
    lg = Logger(logging_freq_hz=10, num_drones=1, output_folder=str(tmp_path))
    for t in range(3):
        lg.log(0, t / 10, _state20(t))
    csv_dir = lg.save_as_csv("test")
    names = sorted(os.listdir(csv_dir))
    # The reference's 23 per-drone series (Logger.py:146-201)
    expected = {"x0.csv", "y0.csv", "z0.csv", "r0.csv", "p0.csv", "ya0.csv",
                "rr0.csv", "pr0.csv", "yar0.csv", "vx0.csv", "vy0.csv", "vz0.csv",
                "wx0.csv", "wy0.csv", "wz0.csv",
                "rpm0-0.csv", "rpm1-0.csv", "rpm2-0.csv", "rpm3-0.csv",
                "pwm0-0.csv", "pwm1-0.csv", "pwm2-0.csv", "pwm3-0.csv"}
    assert expected.issubset(set(names))


def test_plot_renders(tmp_path):
    lg = Logger(logging_freq_hz=10, num_drones=2, output_folder=str(tmp_path),
                colab=True)
    for t in range(4):
        for d in range(2):
            lg.log(d, t / 10, _state20(t))
    os.makedirs("results", exist_ok=True)
    lg.plot()  # colab=True -> saves png instead of showing
    assert os.path.exists(os.path.join("results", "output_figure.png"))


def test_animate_trajectory_gif(tmp_path):
    from gym_pybullet_drones_tpu.utils.viz import animate_trajectory

    T, n = 30, 2
    states = np.zeros((n, 16, T))
    t = np.linspace(0, 2 * np.pi, T)
    states[0, 0] = np.cos(t)
    states[0, 1] = np.sin(t)
    states[0, 2] = 1.0
    states[1, 2] = 0.5 + 0.2 * np.sin(t)
    out = animate_trajectory(states, str(tmp_path / "flight.gif"), stride=3)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
