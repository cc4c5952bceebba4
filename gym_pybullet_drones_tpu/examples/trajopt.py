"""Gradient-based trajectory optimization through the simulator (10th
example, beyond the reference's nine: PyBullet is not differentiable, this
framework is — tests/test_differentiability.py pins the property).

Optimizes an open-loop per-control-step collective-RPM schedule with Adam
so a CF2X reaches a target altitude at rest, back-propagating through the
full PYB physics (5 substeps per control period, 240/48 Hz). No controller,
no RL — just `jax.grad` through `core.dynamics.step_physics`. (Collective
thrust only: open-loop ATTITUDE trajectories are unstable over horizons this
long, so lateral waypoints need feedback in the loop — wrap the controller
in the rollout and differentiate through both if you want gains tuning.)

    python -m gym_pybullet_drones_tpu.examples.trajopt --duration_sec 1.0
"""

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
# The gradient chain spans ~240 substeps: float32 drifts (CLAUDE.md budget
# notes); enable x64 when run standalone (tests get it from conftest).
jax.config.update("jax_enable_x64", True)

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, step_physics
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics
from gym_pybullet_drones_tpu.utils.utils import str2bool

DEFAULT_DURATION_SEC = 1.0
DEFAULT_TARGET = (0.0, 0.0, 1.2)
DEFAULT_ITERS = 200
DEFAULT_OUTPUT_FOLDER = "results"


def run(
    duration_sec=DEFAULT_DURATION_SEC,
    target=DEFAULT_TARGET,
    iters=DEFAULT_ITERS,
    control_freq_hz=48,
    simulation_freq_hz=240,
    plot=True,
    output_folder=DEFAULT_OUTPUT_FOLDER,
    **_ignored,
):
    import optax

    params = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    hover = float(params.hover_rpm)
    steps = int(duration_sec * control_freq_hz)
    sub = simulation_freq_hz // control_freq_hz
    dt = 1.0 / simulation_freq_hz
    tgt = jnp.asarray(target, jnp.float64)

    def rollout(sched):
        """sched: (steps,) collective RPM offsets -> (final kin, path)."""
        kin = init_kin_state(jnp.asarray([[0.0, 0.0, 0.1]], jnp.float64),
                             jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float64))
        last = jnp.full((1, 4), hover, jnp.float64)

        def body(carry, r):
            kin, last = carry
            rpm = jnp.full((1, 4), hover + r, jnp.float64)
            kin, last = step_physics(kin, rpm, last, params, dt, sub,
                                     Physics.PYB)
            return (kin, last), kin.pos[0]

        (kin, _), path = jax.lax.scan(body, (kin, last), sched)
        return kin, path

    def loss(sched):
        kin, _ = rollout(sched)
        return (jnp.sum((kin.pos[0] - tgt) ** 2)
                + 0.1 * jnp.sum(kin.vel[0] ** 2))

    sched = jnp.zeros(steps, jnp.float64)
    opt = optax.adam(150.0)
    state = opt.init(sched)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    for k in range(iters):
        val, g = grad_fn(sched)
        updates, state = opt.update(g, state, sched)
        sched = optax.apply_updates(sched, updates)
        if (k + 1) % max(1, iters // 10) == 0:
            print(f"[{time.time()-t0:6.2f}s] iter {k+1}/{iters} "
                  f"loss {float(val):.6f}", flush=True)
    kin, path = rollout(sched)
    err = float(jnp.linalg.norm(kin.pos[0] - tgt))
    vel = float(jnp.linalg.norm(kin.vel[0]))
    print(f"[DONE] final position error {err*1000:.1f} mm, "
          f"residual speed {vel*100:.1f} cm/s "
          f"({steps}-step schedule, {iters} Adam iterations)")
    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        p = np.asarray(path)
        fig, ax = plt.subplots(figsize=(6, 4))
        t_ax = np.arange(len(p)) / control_freq_hz
        ax.plot(t_ax, p[:, 2], "-o", ms=2, label="optimized altitude")
        ax.axhline(target[2], color="r", ls="--", label="target")
        ax.set_xlabel("t [s]")
        ax.set_ylabel("z [m]")
        ax.legend()
        os.makedirs(output_folder, exist_ok=True)
        out = os.path.join(output_folder, "trajopt.png")
        fig.savefig(out, dpi=120)
        print(f"[INFO] plot saved to {out}")
    return err, vel


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Gradient-based trajectory optimization through the sim")
    parser.add_argument("--duration_sec", default=DEFAULT_DURATION_SEC,
                        type=float)
    parser.add_argument("--iters", default=DEFAULT_ITERS, type=int)
    parser.add_argument("--plot", default=True, type=str2bool)
    parser.add_argument("--output_folder", default=DEFAULT_OUTPUT_FOLDER,
                        type=str)
    run(**vars(parser.parse_args()))
