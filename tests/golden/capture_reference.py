"""Capture TRUE engine trajectories from the reference package.

This script cannot run in the build image (PyBullet is not installable there);
it exists so that any environment with ``pip install pybullet gymnasium scipy``
and the reference repo on PYTHONPATH can regenerate the golden npz files in
this directory **from the actual engine** instead of the NumPy oracle
(tests/oracle.py). The npz schemas match tests/golden/generate.py exactly, so
tests/test_golden_pyb.py runs unchanged against engine-derived files — flipping
the tolerance spec from oracle-derived to engine-derived (docs/PYB_DERIVATION.md §6).

Engine captures are written to tests/golden/engine/ (NOT over the oracle
files): the oracle goldens anchor this repo's kernels at float64 round-off,
while engine files anchor *behavior* — the dedicated comparison suite
(tests/test_engine_parity.py, auto-skipped when engine/ is absent) asserts
coarse physical bounds and PRINTS the measured oracle-vs-engine deviations,
so the first networked run produces the calibration table for
docs/PYB_DERIVATION.md instead of tripping round-off-scale asserts.

Usage:
    PYTHONPATH=/path/to/gym-pybullet-drones python tests/golden/capture_reference.py

Self-test (no pybullet needed — guards this harness against bit-rot):
    python tests/golden/capture_reference.py --selftest [outdir]
installs shim modules that satisfy the exact import surface this script uses
(`pybullet.resetBaseVelocity`, `gym_pybullet_drones.envs.*`,
`.control.DSLPIDControl`, `.utils.enums`) backed by THIS repo's compat shell
(gym_pybullet_drones_tpu.compat.gym / control.compat), then runs the full
capture main() at reduced duration. The npz files it writes flow through the
same schema the engine job produces, so tests/test_capture_selftest.py can
validate the capture -> test_engine_parity.py path end to end in the normal
suite (VERDICT r3 item 7).

Config geometry mirrors generate.py: pid.py helix (PYB), HoverAviary /
MultiHoverAviary learn configs (ONE_D_RPM scripted actions), the downwash.py
suite (PYB_DW, PYB_GND_DRAG_DW), and a 4-drone VelocityAviary slice.
"""

import os

import numpy as np

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "engine")


def _require_reference():
    try:
        import pybullet  # noqa: F401
        from gym_pybullet_drones.envs.CtrlAviary import CtrlAviary  # noqa: F401
    except ImportError as e:  # pragma: no cover - informational
        raise SystemExit(
            "capture_reference.py needs pybullet + the reference package "
            f"(gym_pybullet_drones) importable; missing: {e}"
        )


def capture_waypoint(name, physics_name, init_xyzs, init_rpys, targets_fn,
                     duration_s=4.0, ctrl_hz=48, pyb_hz=240, extra=None):
    """CtrlAviary + DSLPIDControl, physics-first loop (matches generate._fly_pyb)."""
    from gym_pybullet_drones.control.DSLPIDControl import DSLPIDControl
    from gym_pybullet_drones.envs.CtrlAviary import CtrlAviary
    from gym_pybullet_drones.utils.enums import DroneModel, Physics

    n = len(init_xyzs)
    env = CtrlAviary(
        drone_model=DroneModel.CF2X, num_drones=n,
        initial_xyzs=np.array(init_xyzs), initial_rpys=np.array(init_rpys),
        physics=getattr(Physics, physics_name),
        pyb_freq=pyb_hz, ctrl_freq=ctrl_hz, gui=False,
    )
    ctrl = [DSLPIDControl(drone_model=DroneModel.CF2X) for _ in range(n)]
    env.reset(seed=42)
    steps = int(duration_s * ctrl_hz)
    action = np.zeros((n, 4))
    out = {k: np.zeros((steps, n, d)) for k, d in
           [("pos", 3), ("quat", 4), ("vel", 3), ("ang_v", 3), ("rpm", 4)]}
    for t in range(steps):
        obs, *_ = env.step(action)
        for j in range(n):
            tgt, trpy = targets_fn(t, j)
            action[j], _, _ = ctrl[j].computeControlFromState(
                control_timestep=env.CTRL_TIMESTEP, state=obs[j],
                target_pos=tgt, target_rpy=trpy)
            out["pos"][t, j] = obs[j][0:3]
            out["quat"][t, j] = obs[j][3:7]
            out["vel"][t, j] = obs[j][10:13]
            out["ang_v"][t, j] = obs[j][13:16]
            out["rpm"][t, j] = action[j]
    env.close()
    np.savez(os.path.join(HERE, name), **out, **(extra or {}))
    print("captured", name)


def capture_rl(name, env_cls_name, n, action_fn, duration_s, init_xyzs):
    """Hover/MultiHover learn config under scripted ONE_D_RPM actions."""
    from gym_pybullet_drones.utils.enums import ActionType, ObservationType

    if env_cls_name == "hover":
        from gym_pybullet_drones.envs.HoverAviary import HoverAviary as Env
        kwargs = {}
    else:
        from gym_pybullet_drones.envs.MultiHoverAviary import (
            MultiHoverAviary as Env,
        )
        kwargs = {"num_drones": n}
    env = Env(obs=ObservationType.KIN, act=ActionType.ONE_D_RPM,
              initial_xyzs=np.array(init_xyzs), **kwargs)
    env.reset(seed=42)
    steps = int(round(duration_s * env.CTRL_FREQ))
    out = dict(pos=np.zeros((steps, n, 3)), quat=np.zeros((steps, n, 4)),
               vel=np.zeros((steps, n, 3)), ang_v=np.zeros((steps, n, 3)),
               reward=np.zeros(steps), terminated=np.zeros(steps, bool),
               truncated=np.zeros(steps, bool), action=np.zeros((steps, n, 1)))
    for t in range(steps):
        a = np.asarray(action_fn(t), dtype=float).reshape(n, 1)
        _, reward, terminated, truncated, _ = env.step(a)
        for j in range(n):
            s = env._getDroneStateVector(j)
            out["pos"][t, j], out["quat"][t, j] = s[0:3], s[3:7]
            out["vel"][t, j], out["ang_v"][t, j] = s[10:13], s[13:16]
        out["reward"][t] = reward
        out["terminated"][t], out["truncated"][t] = terminated, truncated
        out["action"][t] = a
        # NOTE: no reset on done — the golden records raw dynamics continuation
    env.close()
    np.savez(os.path.join(HERE, name), **out)
    print("captured", name)


def capture_velocity(name, init_xyzs, action_fn, duration_s=4.0):
    from gym_pybullet_drones.envs.VelocityAviary import VelocityAviary

    n = len(init_xyzs)
    env = VelocityAviary(num_drones=n, initial_xyzs=np.array(init_xyzs),
                         gui=False)
    env.reset(seed=42)
    steps = int(duration_s * env.CTRL_FREQ)
    out_obs = np.zeros((steps, n, 20))
    out_act = np.zeros((steps, n, 4))
    for t in range(steps):
        a = np.asarray(action_fn(t), dtype=float).reshape(n, 4)
        obs, *_ = env.step(a)
        out_obs[t] = obs
        out_act[t] = a
    env.close()
    np.savez(os.path.join(HERE, name), obs=out_obs, action=out_act,
             init_xyzs=np.array(init_xyzs))
    print("captured", name)


def capture_contact(name, init_xyzs, init_rpys, init_vels, duration_s,
                    rpm_mode, drone_drone=False, ctrl_hz=48, pyb_hz=240,
                    physics_name="PYB"):
    """Contact-regime capture (tumble / slide / collide2 goldens): CtrlAviary
    stepped with scripted RPMs after poking initial velocities straight into
    Bullet via resetBaseVelocity (the reference constructor cannot set them).
    The engine's own sequential-impulse solver supplies ground/drone contact
    (BaseAviary.py:370) — these files anchor core/contact.py's impulse mode."""
    import pybullet as p
    from gym_pybullet_drones.envs.CtrlAviary import CtrlAviary
    from gym_pybullet_drones.utils.enums import DroneModel, Physics

    n = len(init_xyzs)
    env = CtrlAviary(
        drone_model=DroneModel.CF2X, num_drones=n,
        initial_xyzs=np.array(init_xyzs), initial_rpys=np.array(init_rpys),
        physics=getattr(Physics, physics_name),
        pyb_freq=pyb_hz, ctrl_freq=ctrl_hz, gui=False,
    )
    env.reset(seed=42)
    for j in range(n):
        p.resetBaseVelocity(env.DRONE_IDS[j],
                            linearVelocity=list(init_vels[j]),
                            physicsClientId=env.CLIENT)
    hover = env.HOVER_RPM
    steps = int(duration_s * ctrl_hz)
    out = {k: np.zeros((steps, n, d)) for k, d in
           [("pos", 3), ("quat", 4), ("vel", 3), ("ang_v", 3), ("rpm", 4)]}
    for t in range(steps):
        if rpm_mode == "hover":
            rpm = np.full((n, 4), hover)
        elif isinstance(rpm_mode, float):
            rpm = np.full((n, 4), rpm_mode * hover)
        else:
            rpm = np.zeros((n, 4))
        obs, *_ = env.step(rpm)
        for j in range(n):
            out["pos"][t, j] = obs[j][0:3]
            out["quat"][t, j] = obs[j][3:7]
            out["vel"][t, j] = obs[j][10:13]
            out["ang_v"][t, j] = obs[j][13:16]
            out["rpm"][t, j] = rpm[j]
    env.close()
    np.savez(os.path.join(HERE, name), **out,
             init_xyzs=np.array(init_xyzs), init_rpys=np.array(init_rpys),
             init_vel=np.array(init_vels))
    print("captured", name)


def install_selftest_shims():
    """Install stand-in `pybullet` + `gym_pybullet_drones` modules backed by
    this repo's compat shell, covering exactly the surface main() imports.

    Returns the registry dict used by the pybullet shim (client id -> env)."""
    import dataclasses
    import sys
    import types

    import jax.numpy as jnp

    from gym_pybullet_drones_tpu.compat import gym as _cg
    from gym_pybullet_drones_tpu.control.compat import DSLPIDControl
    from gym_pybullet_drones_tpu.envs import base as _envbase
    from gym_pybullet_drones_tpu.envs import spec as _spec

    registry = {}

    def _registered(cls):
        class Shim(cls):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                # The real engine always runs its sequential-impulse solver
                # (BaseAviary.py:370); make the stand-in engine do the same
                # so contact captures exercise core/contact.py. The compat
                # step closures read cfg/params through `self`, so swapping
                # them here retargets the jitted step.
                self.cfg = dataclasses.replace(
                    self.cfg, contact_mode="impulse",
                    collisions=self.cfg.num_drones > 1)
                self.params = _envbase.build_params(self.cfg)
                self.ctrl_params = _envbase.build_ctrl_params(self.cfg)
                self.CLIENT = id(self)
                registry[self.CLIENT] = self

        Shim.__name__ = cls.__name__
        return Shim

    pyb = types.ModuleType("pybullet")

    def resetBaseVelocity(body_id, linearVelocity=None, angularVelocity=None,
                          physicsClientId=0):
        env = registry[physicsClientId]
        j = int(np.flatnonzero(np.asarray(env.DRONE_IDS) == body_id)[0])
        kin = env._state.kin
        upd = {}
        if linearVelocity is not None:
            vel = np.asarray(kin.vel).copy()
            vel[j] = linearVelocity
            upd["vel"] = jnp.asarray(vel, kin.vel.dtype)
        if angularVelocity is not None:
            ang = np.asarray(kin.ang_v).copy()
            ang[j] = angularVelocity
            upd["ang_v"] = jnp.asarray(ang, kin.ang_v.dtype)
        env._state = env._state.replace(kin=kin.replace(**upd))

    pyb.resetBaseVelocity = resetBaseVelocity
    sys.modules["pybullet"] = pyb

    pkg = types.ModuleType("gym_pybullet_drones")
    mods = {"gym_pybullet_drones": pkg}
    for sub, attrs in {
        "envs.CtrlAviary": {"CtrlAviary": _registered(_cg.CtrlAviary)},
        "envs.VelocityAviary": {
            "VelocityAviary": _registered(_cg.VelocityAviary)},
        "envs.HoverAviary": {"HoverAviary": _registered(_cg.HoverAviary)},
        "envs.MultiHoverAviary": {
            "MultiHoverAviary": _registered(_cg.MultiHoverAviary)},
        "control.DSLPIDControl": {"DSLPIDControl": DSLPIDControl},
        "utils.enums": {
            "DroneModel": _spec.DroneModel, "Physics": _spec.Physics,
            "ActionType": _spec.ActionType,
            "ObservationType": _spec.ObservationType},
    }.items():
        parts = sub.split(".")
        parent, path = pkg, "gym_pybullet_drones"
        for part in parts[:-1]:
            path += "." + part
            mod = mods.get(path)
            if mod is None:
                mod = types.ModuleType(path)
                mods[path] = mod
                setattr(parent, part, mod)
            parent = mod
        leaf = types.ModuleType(path + "." + parts[-1])
        for k, v in attrs.items():
            setattr(leaf, k, v)
        setattr(parent, parts[-1], leaf)
        mods[path + "." + parts[-1]] = leaf
    sys.modules.update(mods)
    return registry


def main(duration_scale=1.0):
    os.makedirs(HERE, exist_ok=True)
    _require_reference()
    ds = duration_scale
    # Geometry/scripts identical to generate.py main() — keep in sync.
    H, H_STEP, R_ = 0.1, 0.05, 0.3
    n = 3
    init_xyzs = [[R_ * np.cos((i / 6) * 2 * np.pi + np.pi / 2),
                  R_ * np.sin((i / 6) * 2 * np.pi + np.pi / 2) - R_,
                  H + i * H_STEP] for i in range(n)]
    init_rpys = [[0, 0, i * (np.pi / 2) / n] for i in range(n)]
    ctrl_hz, period = 48, 10
    NUM_WP = ctrl_hz * period
    idx = np.arange(NUM_WP)
    txy = np.stack([
        R_ * np.cos((idx / NUM_WP) * 2 * np.pi + np.pi / 2) + init_xyzs[0][0],
        R_ * np.sin((idx / NUM_WP) * 2 * np.pi + np.pi / 2) - R_ + init_xyzs[0][1],
    ], 1)
    wp = [int((i * NUM_WP / 6) % NUM_WP) for i in range(n)]
    wp0 = list(wp)

    def helix_target(t, j):
        k = wp[j]
        tgt = np.array([txy[k, 0], txy[k, 1], init_xyzs[j][2]])
        if j == n - 1:
            for jj in range(n):
                wp[jj] = wp[jj] + 1 if wp[jj] < NUM_WP - 1 else 0
        return tgt, np.array(init_rpys[j])

    capture_waypoint("helix_pyb.npz", "PYB", init_xyzs, init_rpys,
                     helix_target, duration_s=4.0 * ds,
                     extra=dict(txy=txy, wp0=np.array(wp0),
                                init_xyzs=np.array(init_xyzs),
                                init_rpys=np.array(init_rpys)))

    z0 = 0.025 / 2 + 0.1

    def hover_action(t):
        if t < 30:
            return np.array([-0.9])
        return np.array([0.0 + 0.5 * np.sin(2 * np.pi * (t - 30) / 60.0)])

    capture_rl("hover_learn_pyb.npz", "hover", 1, hover_action, 8.2 * ds,
               [[0.0, 0.0, z0]])

    arm = 0.0397
    mh_init = [[0.0, 0.0, z0], [4 * arm, 4 * arm, z0]]

    def mh_action(t):
        return np.array([
            [0.3 + 0.4 * np.sin(2 * np.pi * t / 50.0)],
            [0.2 + 0.5 * np.cos(2 * np.pi * t / 70.0)],
        ])

    capture_rl("multihover_pyb.npz", "multi", 2, mh_action, 4.0 * ds, mh_init)

    dw_init = [[0.5, 0.0, 1.0], [-0.5, 0.0, 0.5]]
    DW_NUM_WP = 48 * 5
    dw_x = 0.5 * np.cos(2 * np.pi * np.arange(DW_NUM_WP) / DW_NUM_WP)
    for mode, fname in [("PYB_DW", "downwash_pyb.npz"),
                        ("PYB_GND_DRAG_DW", "downwash_gdd.npz")]:
        dw_wp = [0, DW_NUM_WP // 2]

        def dw_target(t, j):
            k = dw_wp[j]
            tgt = np.array([dw_x[k], 0.0, dw_init[j][2]])
            if j == 1:
                for jj in range(2):
                    dw_wp[jj] = dw_wp[jj] + 1 if dw_wp[jj] < DW_NUM_WP - 1 else 0
            return tgt, np.zeros(3)

        capture_waypoint(fname, mode, dw_init, [[0, 0, 0], [0, 0, 0]],
                         dw_target, duration_s=4.0 * ds,
                         extra=dict(x=dw_x, wp0=np.array([0, DW_NUM_WP // 2]),
                                    init_xyzs=np.array(dw_init)))

    v_init = [[0.0, 0.0, 0.3], [0.3, 0.0, 0.3], [0.0, 0.3, 0.3], [0.3, 0.3, 0.3]]
    DIRS = np.array([[1, 0, 0], [0, 1, 0], [-1, 0, 0.5], [0, -1, 0.5]],
                    dtype=float)

    def vel_action(t):
        leg = (t // 48) % 4
        a = np.zeros((4, 4))
        for j in range(4):
            d = DIRS[(j + leg) % 4]
            a[j, 0:3] = d
            a[j, 3] = 0.25 * (leg + 1)
        return a

    capture_velocity("velocity_pyb.npz", v_init, vel_action,
                     duration_s=4.0 * ds)

    # contact-regime goldens (engine sequential-impulse solver) — geometry
    # mirrors generate.py's _fly_contact configs
    capture_contact("tumble_pyb.npz", [[0.0, 0.0, 0.3]], [[0.5, 0.2, 0.0]],
                    [[0.0, 0.0, 0.0]], 2.0 * ds, "zero")
    capture_contact("slide_pyb.npz", [[0.0, 0.0, 0.5]], [[0.0, 0.0, 0.0]],
                    [[1.0, 0.0, 0.0]], 2.0 * ds, "zero")
    capture_contact("collide2_pyb.npz",
                    [[-0.2, 0.0, 0.5], [0.2, 0.0, 0.5]],
                    [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
                    [[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]], 2.0 * ds, "hover",
                    drone_drone=True)
    capture_contact("land_gnd_pyb.npz", [[0.0, 0.0, 0.5]],
                    [[0.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]], 2.5 * ds, 0.95,
                    physics_name="PYB_GND")
    print("ALL engine-derived goldens written to", HERE)


if __name__ == "__main__":
    import sys

    if "--selftest" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--selftest"]
        if args:
            HERE = args[0]
        install_selftest_shims()
        main(duration_scale=0.25)
    else:
        main()
