"""Behavior-cloning warm-start for hard action types.

The 4-dim ``ActionType.RPM`` Hover task is a knife-edge stabilization problem:
plain PPO learns a noise-leaning policy whose deterministic eval collapses
(271 best over 16M steps in round 1). The DSLPID controller squeezed into the
±5% RPM action band (a = (rpm/hover − 1)/0.05, clipped) scores 470.3 > 467
deterministically at 30 Hz — proof the threshold is reachable — so training
starts from a DAgger-style clone of that expert: rollouts execute
expert+noise for state coverage, labels are the expert's noiseless action at
each visited state (the expert's own PID integrators ride along the noisy
path), then PPO fine-tunes with the log-std annealing cap
(`PPOConfig.log_std_anneal_to`). Solved at 471.9 over the 10-consecutive-
episode deterministic protocol in 4M env steps (docs/ROUND2.md item 4).
"""

import jax
import jax.numpy as jnp
import optax

from gym_pybullet_drones_tpu.control.dsl_pid import (
    dsl_pid_control,
    dsl_pid_reset,
)
from gym_pybullet_drones_tpu.envs import base as envbase


def dslpid_in_band_expert(env_cfg, aux):
    """Build `expert(env_state, pid_state) -> (action, pid_state)`: DSLPID
    output mapped into the RPM action band of BaseRLAviary.py:192."""
    ctrl_params = aux["ctrl_params"]
    target = aux["target_pos"]
    hover = aux["params_env"].hover_rpm

    def expert(env_state, cs):
        rpm, cs, _, _ = dsl_pid_control(
            ctrl_params, cs, env_cfg.ctrl_timestep, env_state.kin.pos,
            env_state.kin.quat, env_state.kin.vel, target)
        return jnp.clip((rpm / hover - 1.0) / 0.05, -1.0, 1.0), cs

    return expert


def bc_pretrain(env_cfg, runner, aux, rng, *, episodes=768, noise=0.25,
                bc_steps=20000, bc_batch=4096, log_std=-1.0,
                dagger_rounds=0, verbose=True):
    """Clone the DSLPID-in-band expert into `runner.params`; returns the
    updated runner (policy trunk + mean head fitted, log_std set) and rng.

    With ``dagger_rounds`` > 0, after the initial expert-rollout fit the
    classic DAgger loop runs: collect episodes executing the CURRENT policy
    (plus noise), label every visited state with the expert (whose PID state
    rides along the policy's trajectory), aggregate into the dataset, refit.
    This attacks the covariate shift that plain BC suffers on knife-edge
    stabilization (good MSE, compounding closed-loop error)."""
    params_env = aux["params_env"]
    ctrl_params = aux["ctrl_params"]
    target = aux["target_pos"]
    expert = dslpid_in_band_expert(env_cfg, aux)
    net = aux["network"]
    steps = int(env_cfg.episode_len_sec * env_cfg.ctrl_freq)

    # Policy params are a traced ARGUMENT, not a closure capture: closing over
    # them would bake them in as compiled constants and force a full retrace
    # of the vmapped-scan collection every DAgger round (~10 min each over the
    # TPU tunnel, CLAUDE.md). `use_policy` selects expert vs policy drive; the
    # policy forward always runs (a small MLP, negligible next to the scan).
    def one_episode(policy_params, use_policy, key):
        env_state = envbase.reset(env_cfg, params_env)
        cs = dsl_pid_reset((env_cfg.num_drones,))

        def body(carry, k):
            env_state, cs = carry
            obs = envbase.compute_obs(env_cfg, env_state)
            a_exp, cs = expert(env_state, cs)
            mean, _, _ = net.apply(policy_params, obs.reshape(1, -1))
            a_drive = jnp.where(use_policy, mean.reshape(a_exp.shape), a_exp)
            a_exec = jnp.clip(
                a_drive + noise * jax.random.normal(k, a_exp.shape),
                -1.0, 1.0)
            env_state, *_ = envbase.step(env_cfg, params_env, ctrl_params,
                                         target, env_state, a_exec)
            return (env_state, cs), (obs.reshape(-1), a_exp.reshape(-1))

        _, (obs, acts) = jax.lax.scan(body, (env_state, cs),
                                      jax.random.split(key, steps))
        return obs, acts

    collect = jax.jit(jax.vmap(one_episode, in_axes=(None, None, 0)))

    def fit(params, X, Y, n_steps, rng):
        tx = optax.adam(optax.linear_schedule(1e-3, 5e-5, n_steps))
        opt = tx.init(params)

        # X/Y are jit ARGUMENTS, not closure captures: a closed-over dataset
        # becomes an embedded constant in the compiled program — hundreds of
        # MB once DAgger aggregates, which overflows remote-compile requests.
        # Updates run as scanned CHUNKS, not one dispatch per step: over the
        # TPU tunnel each dispatch costs ~30 ms (docs/PERF.md), so 20k
        # individual bc_step calls would be ~10 min of pure launch latency
        # for a 64-wide-MLP workload; a handful of scans removes all of it.
        def bc_step(carry, key, X, Y):
            params, opt = carry
            idx = jax.random.randint(key, (bc_batch,), 0, X.shape[0])
            xb, yb = X[idx], Y[idx]

            def loss_fn(p):
                mean, _, _ = net.apply(p, xb)
                return jnp.mean((mean - yb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, upd), opt), loss

        @jax.jit
        def bc_chunk(params, opt, keys, X, Y):
            (params, opt), losses = jax.lax.scan(
                lambda c, k: bc_step(c, k, X, Y), (params, opt), keys)
            return params, opt, losses[-1]

        chunk = 2000
        done = 0
        while done < n_steps:
            n = min(chunk, n_steps - done)
            rng, k = jax.random.split(rng)
            params, opt, loss = bc_chunk(params, opt,
                                         jax.random.split(k, n), X, Y)
            done += n
            if verbose:
                print(f"[bc] step {done}/{n_steps} mse {float(loss):.5f}",
                      flush=True)
        return params, rng

    rng, k = jax.random.split(rng)
    obs, acts = collect(runner.params, jnp.asarray(False),
                        jax.random.split(k, episodes))
    X = obs.reshape(-1, obs.shape[-1])
    Y = acts.reshape(-1, acts.shape[-1])
    if verbose:
        print(f"[bc] dataset {X.shape[0]} samples", flush=True)
    params, rng = fit(runner.params, X, Y, bc_steps, rng)

    for r in range(dagger_rounds):
        rng, k = jax.random.split(rng)
        obs, acts = collect(params, jnp.asarray(True),
                            jax.random.split(k, max(1, episodes // 2)))
        X = jnp.concatenate([X, obs.reshape(-1, obs.shape[-1])])
        Y = jnp.concatenate([Y, acts.reshape(-1, acts.shape[-1])])
        if verbose:
            print(f"[dagger {r+1}/{dagger_rounds}] dataset {X.shape[0]}",
                  flush=True)
        params, rng = fit(params, X, Y, bc_steps // 2, rng)

    params = {**params,
              "params": {**params["params"],
                         "log_std": jnp.full_like(
                             params["params"]["log_std"], log_std)}}
    return runner.replace(params=params), rng
