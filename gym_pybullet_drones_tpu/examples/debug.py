"""Physics sandbox: raw kernel probes without any aviary (TPU-native analogue
of reference examples/debug.py, which pokes PyBullet directly with external
forces/torques on free bodies :13-100). Here the probes exercise the pure
`substep_pyb`/`substep_dyn` kernels: zero-gravity coast, constant force,
constant torque, and prints the resulting state evolution.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.core.dynamics import init_kin_state, substep_dyn, substep_pyb
from gym_pybullet_drones_tpu.core.params import drone_params
from gym_pybullet_drones_tpu.envs.spec import DroneModel


def main():
    params = drone_params(DroneModel.CF2X)
    dt = 1.0 / 240.0

    print("--- hover thrust probe (DYN): rpm = HOVER_RPM, expect z steady ---")
    kin = init_kin_state(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.full((1, 4), params.hover_rpm)
    for i in range(240):
        kin = substep_dyn(kin, rpm, params, dt)
    print("after 1 s:", np.asarray(kin.pos[0]), "vel", np.asarray(kin.vel[0]))

    print("--- asymmetric thrust probe (PYB): motor 0 +5% -> roll/pitch rates ---")
    kin = init_kin_state(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    rpm = jnp.asarray([[1.05, 1.0, 1.0, 1.0]]) * params.hover_rpm
    last = rpm
    for i in range(24):
        kin = substep_pyb(kin, rpm, last, params, dt, contact=False)
    print("after 0.1 s: ang_v", np.asarray(kin.ang_v[0]), "rpy_rates", np.asarray(kin.rpy_rates[0]))

    print("--- free fall probe: rpm = 0 -> a = -g ---")
    kin = init_kin_state(jnp.array([[0.0, 0.0, 10.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]))
    zero = jnp.zeros((1, 4))
    for i in range(240):
        kin = substep_pyb(kin, zero, zero, params, dt, contact=False)
    print("after 1 s: z", float(kin.pos[0, 2]), "(expect ~%.3f)" % (10.0 - 0.5 * 9.8))


if __name__ == "__main__":
    main()
