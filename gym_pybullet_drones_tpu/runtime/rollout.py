"""On-device rollouts: vmapped env batches + `lax.scan` over time with auto-reset.

This is the TPU-native replacement for the reference's host-side simulation
loops (examples/pid.py:132-167) and for SB3's `VecEnv`/`make_vec_env` plumbing
(examples/learn.py:54-66, used with n_envs=1 there): instead of Python `for`
loops stepping a stateful env object, a whole batch of environments advances as
one fused XLA program — `vmap` over the env axis, `lax.scan` over the time
axis, with per-env auto-reset masks implementing the VecEnv convention
(reset-on-done, where the obs returned at a done step is the *new* episode's
first obs, matching SB3's auto-reset semantics).

The env batch axis is also the sharding axis: `runtime/mesh.py` places these
same functions on a `jax.sharding.Mesh` so batches span chips and hosts.
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.envs import base as envbase
from gym_pybullet_drones_tpu.envs.base import AviaryConfig, AviaryState


class StepOutput(NamedTuple):
    """Per-step signals; leaves gain a leading time axis after a rollout scan.

    `final_obs` is the TRUE post-step observation even on auto-reset steps
    (where `obs` is already the fresh episode's first obs) — the analogue of
    Gymnasium's `final_observation` info, needed for correct time-limit value
    bootstrapping."""

    obs: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    final_obs: jax.Array = None


def tree_where(mask, a, b):
    """Select pytree `a` where per-env bool `mask` else `b` (mask broadcasts
    over each leaf's trailing dims)."""

    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


def params_are_batched(params) -> bool:
    """True for a per-env randomized DroneParams pytree
    (`core.params.randomize_params`): mass carries a leading env axis."""
    return jnp.ndim(params.m) > 0


def nominal_params(params):
    """Env-0 slice of a batched params pytree (identity when unbatched).
    Randomization never touches geometry, so env 0's spawn grid / camera
    constants stand in for the whole batch."""
    if not params_are_batched(params):
        return params
    return jax.tree.map(lambda x: x[0], params)


def batch_reset(cfg: AviaryConfig, params, num_envs: int) -> AviaryState:
    """A batch of `num_envs` freshly-reset envs (leaves shaped (E, ...)).

    The reference reset is deterministic (BaseAviary.py:220-255 ignores the
    seed for state randomization), so the batched reset is a broadcast of the
    single initial state. Domain-randomized (batched) params reset from the
    nominal geometry — the initial pose depends only on never-randomized
    fields (arm, collision shape).
    """
    # One jitted call: eager reset is tens of small dispatches, and on the
    # remote-TPU tunnel each costs ~1 s — measured 40-96 s of every
    # training-script ppo_init before this (docs/PERF.md round-4 notes).
    # reset() reads host scalars off params (float(params.arm)), so params
    # ride as CONCRETE closure constants (a few dozen scalars), not jit
    # arguments — and nominal_params must run eagerly for the same reason
    # (its slice of batched domain-rand params would otherwise be a tracer).
    nom = nominal_params(params)
    single = jax.jit(lambda: envbase.reset(cfg, nom))()
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), single
    )


def env_health(state: AviaryState) -> jax.Array:
    """Per-env bool: all kinematic leaves finite (NaN/Inf guard, SURVEY §5 —
    the reference has no failure detection; a diverged PyBullet sim just
    poisons the run). Leaves have shape (E, N, d); reduces over all but E."""
    kin = state.kin

    def finite(x):
        return jnp.all(jnp.isfinite(x), axis=tuple(range(1, x.ndim)))

    return (finite(kin.pos) & finite(kin.quat) & finite(kin.vel)
            & finite(kin.ang_v) & finite(kin.rpy_rates))


def make_batched_step(cfg: AviaryConfig, params, ctrl_params, target_pos,
                      auto_reset: bool = True, reset_on_nan: bool = True):
    """Build `step(state, action) -> (state, StepOutput)` over an env batch.

    `state` leaves carry a leading env axis; `action` is (E, N, A). With
    `auto_reset=True`, envs that finish (terminated | truncated) are replaced
    by the initial state and the returned obs is the fresh episode's first
    obs — the VecEnv convention the reference relies on through SB3
    (learn.py:83-95). With `reset_on_nan`, a non-finite env is TERMINATED
    (not truncated) and reset in place of propagating NaNs through the batch:
    termination ends the return, so a policy that blows up the sim eats the
    full loss of future reward, whereas a truncation would hand it the
    time-limit bootstrap gamma*V(obs) (rl/ppo.py) and make divergence nearly
    reward-neutral in the GAE targets.
    """
    if params_are_batched(params):
        # Domain randomization (core.params.randomize_params): each env steps
        # its own perturbed plant; the controller/task constants stay nominal.
        vstep = jax.vmap(
            lambda p, s, a: envbase.step(cfg, p, ctrl_params, target_pos, s, a),
            in_axes=(0, 0, 0))
        vstep = partial(vstep, params)
    else:
        vstep = jax.vmap(partial(envbase.step, cfg, params, ctrl_params,
                                 target_pos))
    init_state = envbase.reset(cfg, nominal_params(params))
    init_obs = envbase.compute_obs(cfg, init_state)

    def step(state: AviaryState, action):
        new_state, obs, reward, term, trunc = vstep(state, action)
        if reset_on_nan:
            unhealthy = ~env_health(new_state)
            term = term | unhealthy
            reward = jnp.where(unhealthy, jnp.zeros_like(reward), reward)
            # The NaN state's observation must not leak anywhere — not even as
            # final_obs, which PPO feeds through the value network for the
            # time-limit bootstrap (rl/ppo.py).
            obs = tree_where(unhealthy, jnp.broadcast_to(init_obs, obs.shape), obs)
        if not auto_reset:
            if reset_on_nan:
                # Health must restore state sanity even without episode
                # auto-reset: otherwise a NaN env would FREEZE (masked obs,
                # terminated=True on every later step), silently corrupting
                # episode statistics. Normal terminations stay un-reset —
                # auto_reset=False keeps its meaning for episode logic.
                unhealthy = ~env_health(new_state)
                fresh = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (obs.shape[0],) + x.shape),
                    init_state)
                new_state = tree_where(unhealthy, fresh, new_state)
            return new_state, StepOutput(obs, reward, term, trunc, obs)
        done = term | trunc
        fresh = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (obs.shape[0],) + x.shape), init_state
        )
        persisted_buffer = new_state.action_buffer
        new_state = tree_where(done, fresh, new_state)
        # Reference parity: BaseRLAviary's action deque is filled with zeros
        # once at construction and NEVER cleared on reset
        # (BaseRLAviary.py:153-155), so it persists across episodes.
        new_state = new_state.replace(action_buffer=persisted_buffer)
        final_obs = obs
        if cfg.action_buffer_size > 0 and obs.dtype != jnp.uint8:
            # Post-reset KIN obs = fresh kinematics + the persisted buffer
            reset_obs = jax.vmap(partial(envbase.compute_obs, cfg))(new_state)
            obs = tree_where(done, reset_obs, obs)
        else:
            obs = tree_where(done, jnp.broadcast_to(init_obs, obs.shape), obs)
        return new_state, StepOutput(obs, reward, term, trunc, final_obs)

    return step


def rollout(
    step_fn: Callable,
    policy_fn: Callable,
    state: AviaryState,
    policy_state,
    obs,
    num_steps: int,
    rng: Optional[jax.Array] = None,
):
    """Scan `num_steps` of (policy -> env step) entirely on device.

    `policy_fn(policy_state, obs, key) -> (action, new_policy_state)`. The
    carried policy state holds e.g. DSLPID memory or network params + RNG.
    Returns `((state, policy_state, obs), StepOutput)` where StepOutput leaves
    have a leading time axis.

    This replaces the reference's host loop (pid.py:132-167): one jitted
    program, zero host<->device syncs inside the trajectory.
    """
    # With rng=None the rollout is still deterministic, but each step gets a
    # DISTINCT key (split of a fixed seed) — a constant all-zeros key would
    # silently collapse a stochastic policy's exploration noise to the same
    # sample at every timestep.
    keys = jax.random.split(
        jax.random.PRNGKey(0) if rng is None else rng, num_steps)

    def body(carry, key):
        env_state, pol_state, cur_obs = carry
        action, pol_state = policy_fn(pol_state, cur_obs, key)
        env_state, out = step_fn(env_state, action)
        return (env_state, pol_state, out.obs), out

    return jax.lax.scan(body, (state, policy_state, obs), keys)


def episode_stats(rewards, dones):
    """Per-env episode accumulation over (T, E) reward/done columns: returns
    (running, total, count) — the return still accruing in each env, the sum
    of COMPLETED episode returns, and how many completed."""

    def body(carry, inp):
        running, total, count = carry
        r, d = inp
        running = running + r
        total = total + jnp.where(d, running, 0.0)
        count = count + d.astype(jnp.int32)
        running = jnp.where(d, 0.0, running)
        return (running, total, count), None

    zeros = jnp.zeros_like(rewards[0])
    (running, total, count), _ = jax.lax.scan(
        body, (zeros, zeros, jnp.zeros_like(zeros, dtype=jnp.int32)),
        (rewards, dones),
    )
    return running, total, count


def episode_returns(outputs: StepOutput):
    """Undiscounted per-episode returns from a rollout's stacked signals.

    Sums rewards between done flags per env column (time axis leading). Returns
    (returns, counts): total return of *completed* episodes and their number,
    for parity checks against SB3's `evaluate_policy` (learn.py:149-152).
    """
    _, total, count = episode_stats(outputs.reward,
                                    outputs.terminated | outputs.truncated)
    return total, count
