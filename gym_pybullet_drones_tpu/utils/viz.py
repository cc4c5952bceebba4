"""Trajectory visualization: 3-D flight animation from logged states.

The reference's visual output is the PyBullet OpenGL GUI plus MP4 capture
(BaseAviary.py:523-537, assets/ffmpeg_png2mp4.sh). Headless equivalents here:
drone-POV PNG frames from the ray-cast camera (`compat` record=True) and this
module's third-person 3-D animation of the whole fleet, rendered with
matplotlib and saved as an animated GIF (the pillow writer is always
available; no ffmpeg needed).
"""

import numpy as np


def animate_trajectory(states, path: str, fps: int = 24, stride: int = 2,
                       trail: int = 60, elev: float = 25.0, azim: float = -60.0):
    """Render a (drones, 16, T) Logger state array — or a Logger — to a GIF.

    Shows each drone as a marker with a fading trail; axes auto-fit the
    flight volume. Returns the output path.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    if hasattr(states, "states"):  # Logger instance
        states = states.states
    states = np.asarray(states)
    n, _, T = states.shape
    xyz = states[:, 0:3, :]  # (N, 3, T)

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.view_init(elev=elev, azim=azim)
    lo = xyz.min(axis=(0, 2)) - 0.2
    hi = xyz.max(axis=(0, 2)) + 0.2
    span = np.maximum(hi - lo, 0.5)
    mid = (hi + lo) / 2
    half = span.max() / 2
    ax.set_xlim(mid[0] - half, mid[0] + half)
    ax.set_ylim(mid[1] - half, mid[1] + half)
    ax.set_zlim(max(0.0, mid[2] - half), mid[2] + half)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_zlabel("z (m)")

    colors = plt.cm.tab10(np.arange(n) % 10)
    dots = [ax.plot([], [], [], "o", color=colors[j], markersize=6)[0]
            for j in range(n)]
    trails = [ax.plot([], [], [], "-", color=colors[j], alpha=0.5, lw=1)[0]
              for j in range(n)]

    frames = range(0, T, stride)

    def update(t):
        for j in range(n):
            dots[j].set_data([xyz[j, 0, t]], [xyz[j, 1, t]])
            dots[j].set_3d_properties([xyz[j, 2, t]])
            t0 = max(0, t - trail)
            trails[j].set_data(xyz[j, 0, t0:t + 1], xyz[j, 1, t0:t + 1])
            trails[j].set_3d_properties(xyz[j, 2, t0:t + 1])
        return dots + trails

    anim = animation.FuncAnimation(fig, update, frames=frames, blit=False)
    anim.save(path, writer="pillow", fps=fps)
    plt.close(fig)
    return path


class LiveViewer:
    """Interactive third-person 3-D fleet view — the stand-in for the
    reference's PyBullet OpenGL window (`gui=True`, BaseAviary.py:148-168).

    On an interactive matplotlib backend the window redraws in place
    (non-blocking, `plt.pause`); on headless backends (Agg) each update is
    captured as an RGB frame instead, retrievable via `frames` and muxable
    with utils.video.encode_video — so `gui=True` is useful even over SSH.
    """

    def __init__(self, num_drones: int, bounds: float = 2.0,
                 keep_frames: int = 300):
        import matplotlib

        # Window path only on backends that can actually show one; any other
        # non-GUI backend (agg, pdf, svg, ps, cairo, inline, template, ...)
        # falls back to frame capture.
        backend = matplotlib.get_backend().lower()
        self._interactive = any(
            gui in backend
            for gui in ("qt", "gtk", "tk", "wx", "macosx", "nbagg", "webagg"))
        import matplotlib.pyplot as plt

        self._plt = plt
        self.frames = []
        self._keep = keep_frames
        self.fig = plt.figure(figsize=(6, 5))
        self.ax = self.fig.add_subplot(projection="3d")
        self.ax.set_xlim(-bounds, bounds)
        self.ax.set_ylim(-bounds, bounds)
        self.ax.set_zlim(0, bounds)
        self.ax.set_xlabel("x [m]")
        self.ax.set_ylabel("y [m]")
        self.ax.set_zlabel("z [m]")
        cmap = plt.get_cmap("tab10")
        self._dots = [self.ax.plot([], [], [], "o", color=cmap(j % 10),
                                   markersize=6)[0]
                      for j in range(num_drones)]
        self._trails = [self.ax.plot([], [], [], "-", color=cmap(j % 10),
                                     alpha=0.5, lw=1)[0]
                        for j in range(num_drones)]
        self._hist = [[] for _ in range(num_drones)]
        if self._interactive:
            plt.ion()
            self.fig.show()
        elif not hasattr(self.fig.canvas, "buffer_rgba"):
            # Vector backends (pdf/svg/ps) have no pixel buffer — swap in an
            # Agg canvas so frame capture works under any non-GUI backend.
            from matplotlib.backends.backend_agg import FigureCanvasAgg

            FigureCanvasAgg(self.fig)

    def update(self, pos, trail: int = 60):
        """pos: (N, 3) world positions."""
        import numpy as _np

        pos = _np.asarray(pos)
        for j, dot in enumerate(self._dots):
            self._hist[j].append(pos[j])
            self._hist[j] = self._hist[j][-trail:]
            h = _np.asarray(self._hist[j])
            dot.set_data([pos[j, 0]], [pos[j, 1]])
            dot.set_3d_properties([pos[j, 2]])
            self._trails[j].set_data(h[:, 0], h[:, 1])
            self._trails[j].set_3d_properties(h[:, 2])
        if self._interactive:
            self.fig.canvas.draw_idle()
            self._plt.pause(0.001)
        else:
            self.fig.canvas.draw()
            buf = _np.asarray(self.fig.canvas.buffer_rgba())[:, :, :3]
            self.frames.append(buf.copy())
            self.frames = self.frames[-self._keep:]

    def close(self):
        self._plt.close(self.fig)
