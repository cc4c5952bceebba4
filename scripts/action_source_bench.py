"""Per-step-DISTINCT action throughput (VERDICT r4 #6).

The headline bench (bench.py) holds one action fixed across the chunk; the
honest host-threaded number (new action array shipped per 200-step
dispatch) is 24.8M env-steps/s — dispatch-latency-bound, not compute-bound.
The reference's sim loop consumes per-step actions (BaseAviary.py:259), so
the realistic question is: what does the chip sustain when every step's
action is DIFFERENT but device-resident? Three sources, most-to-least
structured:

  scripted — velocity commands computed on-device from the step index
             (circular formation sweep, pid_velocity.py analogue); chunk
             size unconstrained.
  staged   — a pre-staged (CHUNK, E, 4) action array streamed from HBM as
             the lax.scan xs (the "upload a plan, then fly it" pattern);
             chunk bounded by HBM.
  policy   — an SB3-shaped tanh-64-64 MLP mapping the 12-dim kinematic
             state to the velocity command INSIDE the scanned step (the
             RL-serving workload: closed-loop policy at 4096 envs).

Each prints a JSON line; run on the TPU chip:
  python scripts/action_source_bench.py [scripted|staged|policy|all]
"""

import json
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs.base import (
    AviaryConfig,
    TASK_VELOCITY,
    build_ctrl_params,
    build_params,
)
from gym_pybullet_drones_tpu.ops.velocity_soa import (
    soa_consts,
    soa_from_state,
    velocity_step_soa,
)
from gym_pybullet_drones_tpu.runtime.rollout import batch_reset

E = 4096
REPEATS = 4


def _time(run, s, *args):
    out = run(s, *args)
    jax.block_until_ready(out)
    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = run(s, *args)
        jax.block_until_ready(out)
        best = max(best, 1.0 / (time.perf_counter() - t0))
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = AviaryConfig(task=TASK_VELOCITY, pyb_freq=240, ctrl_freq=48)
    params = build_params(cfg)
    state = batch_reset(cfg, params, E)
    s0 = soa_from_state(state)
    consts = soa_consts(build_ctrl_params(cfg), params)
    n_sub = cfg.steps_per_ctrl
    ctrl_dt, pyb_dt = cfg.ctrl_timestep, cfg.pyb_timestep
    sl = 0.03 * float(params.max_speed_kmh) * (1000.0 / 3600.0)
    phase = jnp.linspace(0.0, 2.0 * jnp.pi, E, endpoint=False)

    def step(s, ax, ay, az, amag):
        return velocity_step_soa(consts, ctrl_dt, pyb_dt, n_sub, sl,
                                 s, ax, ay, az, amag)

    if which in ("scripted", "all"):
        chunk = 102400

        @jax.jit
        def run(s):
            def body(carry, t):
                ang = phase + 0.05 * t.astype(jnp.float32)
                return step(carry, jnp.cos(ang), jnp.sin(ang),
                            jnp.zeros(E), jnp.full(E, 0.25)), None
            s, _ = jax.lax.scan(body, s, jnp.arange(chunk))
            return s

        rate = _time(run, s0) * E * chunk
        print(json.dumps({"metric": "env_steps_per_s_scripted_actions",
                          "value": rate, "unit": "env-steps/s",
                          "chunk": chunk}), flush=True)

    if which in ("staged", "all"):
        chunk = 8192
        rng = np.random.default_rng(0)
        plan = jnp.asarray(rng.uniform(-1, 1, (chunk, 4, E)).astype(np.float32))
        plan = plan.at[:, 3].set(jnp.abs(plan[:, 3]))

        @jax.jit
        def run(s, plan):
            def body(carry, a):
                return step(carry, a[0], a[1], a[2], a[3]), None
            s, _ = jax.lax.scan(body, s, plan)
            return s

        rate = _time(run, s0, plan) * E * chunk
        print(json.dumps({"metric": "env_steps_per_s_staged_actions",
                          "value": rate, "unit": "env-steps/s",
                          "chunk": chunk}), flush=True)

    if which in ("policy", "all"):
        chunk = 25600
        # SB3-shaped tanh 64-64 policy over the 12-dim kinematic state
        rng = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        W1 = jax.random.normal(k1, (12, 64)) * 0.3
        W2 = jax.random.normal(k2, (64, 64)) * 0.3
        W3 = jax.random.normal(k3, (64, 4)) * 0.3
        b1 = jnp.zeros(64); b2 = jnp.zeros(64); b3 = jnp.zeros(4)

        def policy(s):
            from gym_pybullet_drones_tpu.core.rotations import quat_to_euler_xyz
            quat = jnp.stack([s["qx"], s["qy"], s["qz"], s["qw"]], -1)
            rpy = quat_to_euler_xyz(quat)
            obs = jnp.stack([s["px"], s["py"], s["pz"],
                             rpy[..., 0], rpy[..., 1], rpy[..., 2],
                             s["vx"], s["vy"], s["vz"],
                             s["wx"], s["wy"], s["wz"]], -1)  # (E, 12)
            h = jnp.tanh(obs @ W1 + b1)
            h = jnp.tanh(h @ W2 + b2)
            a = jnp.tanh(h @ W3 + b3)
            return a[:, 0], a[:, 1], a[:, 2], jnp.abs(a[:, 3])

        @jax.jit
        def run(s):
            def body(carry, _):
                ax, ay, az, am = policy(carry)
                return step(carry, ax, ay, az, am), None
            s, _ = jax.lax.scan(body, s, None, length=chunk)
            return s

        rate = _time(run, s0) * E * chunk
        print(json.dumps({"metric": "env_steps_per_s_policy_actions",
                          "value": rate, "unit": "env-steps/s",
                          "chunk": chunk}), flush=True)


if __name__ == "__main__":
    main()
