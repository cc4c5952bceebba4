"""Stateful controller shells with the reference's `computeControlFromState` API.

The reference exposes controllers as mutable classes
(control/BaseControl.py:55-93: `computeControlFromState(control_timestep,
state, target_pos, ...) -> (rpm, pos_e, yaw_e)` slicing the 20-dim state
vector). These shells hold the pure-function controller state on the host and
call the jitted kernels, so scripts written against the reference port
unchanged. For on-device fleets use the pure functions directly
(`dsl_pid_control` under vmap/scan).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.control.ctbr import ctbr_control, ctbr_params
from gym_pybullet_drones_tpu.control.mrac import mrac_control, mrac_params, mrac_reset
from gym_pybullet_drones_tpu.control.dsl_pid import (
    dsl_pid_control,
    dsl_pid_params,
    dsl_pid_reset,
)
from gym_pybullet_drones_tpu.envs.spec import DroneModel
from gym_pybullet_drones_tpu.core.params import G


class BaseControl:
    """API anchor (reference control/BaseControl.py): subclasses implement
    `computeControl`; `computeControlFromState` slices the 20-dim state."""

    def __init__(self, drone_model: DroneModel, g: float = G):
        self.DRONE_MODEL = drone_model
        self.GRAVITY = None  # set by subclasses from params
        self.control_counter = 0

    def reset(self):
        self.control_counter = 0

    def computeControlFromState(self, control_timestep, state, target_pos,
                                target_rpy=np.zeros(3), target_vel=np.zeros(3),
                                target_rpy_rates=np.zeros(3)):
        """Slice the 20-dim state (BaseControl.py:84-93) and delegate."""
        state = np.asarray(state)
        return self.computeControl(
            control_timestep=control_timestep,
            cur_pos=state[0:3], cur_quat=state[3:7], cur_vel=state[10:13],
            cur_ang_vel=state[13:16], target_pos=np.asarray(target_pos),
            target_rpy=np.asarray(target_rpy), target_vel=np.asarray(target_vel),
            target_rpy_rates=np.asarray(target_rpy_rates),
        )


class DSLPIDControl(BaseControl):
    """Reference control/DSLPIDControl.py as a host shell over the pure kernel."""

    def __init__(self, drone_model: DroneModel = DroneModel.CF2X, g: float = G):
        super().__init__(drone_model, g)
        self.params = dsl_pid_params(drone_model, g=g, dtype=jnp.float32)
        self._jit = jax.jit(
            lambda st, dt, pos, quat, vel, tp, tr, tv, trr: dsl_pid_control(
                self.params, st, dt, pos, quat, vel, tp, tr, tv, trr
            )
        )
        self.reset()

    def setPIDCoefficients(self, p_coeff_pos=None, i_coeff_pos=None,
                           d_coeff_pos=None, p_coeff_att=None,
                           i_coeff_att=None, d_coeff_att=None):
        """Swap PID gains (BaseControl.setPIDCoefficients, :138-177); the
        params pytree is rebuilt and the kernel retraces on next call."""
        import numpy as _np

        def pick(new, old):
            return jnp.asarray(_np.asarray(new), jnp.float32) if new is not None else old

        self.params = self.params.replace(
            p_for=pick(p_coeff_pos, self.params.p_for),
            i_for=pick(i_coeff_pos, self.params.i_for),
            d_for=pick(d_coeff_pos, self.params.d_for),
            p_tor=pick(p_coeff_att, self.params.p_tor),
            i_tor=pick(i_coeff_att, self.params.i_tor),
            d_tor=pick(d_coeff_att, self.params.d_tor),
        )
        params = self.params
        self._jit = jax.jit(
            lambda st, dt, pos, quat, vel, tp, tr, tv, trr: dsl_pid_control(
                params, st, dt, pos, quat, vel, tp, tr, tv, trr
            )
        )

    def reset(self):
        super().reset()
        self.state = dsl_pid_reset(())

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        self.control_counter += 1
        rpm, self.state, pos_e, yaw_e = self._jit(
            self.state, jnp.float32(control_timestep),
            jnp.asarray(cur_pos, jnp.float32), jnp.asarray(cur_quat, jnp.float32),
            jnp.asarray(cur_vel, jnp.float32), jnp.asarray(target_pos, jnp.float32),
            jnp.asarray(target_rpy, jnp.float32), jnp.asarray(target_vel, jnp.float32),
            jnp.asarray(target_rpy_rates, jnp.float32),
        )
        return np.asarray(rpm), np.asarray(pos_e), float(yaw_e)


class CTBRControl(BaseControl):
    """Reference control/CTBRControl.py: collective thrust + body rates."""

    def __init__(self, drone_model: DroneModel = DroneModel.CF2X, g: float = G):
        super().__init__(drone_model, g)
        self.params = ctbr_params(drone_model, g=g)
        self._jit = jax.jit(
            lambda pos, quat, vel, tp, tv: ctbr_control(
                self.params, pos, quat, vel, tp, tv
            )
        )

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        self.control_counter += 1
        out = self._jit(
            jnp.asarray(cur_pos, jnp.float32), jnp.asarray(cur_quat, jnp.float32),
            jnp.asarray(cur_vel, jnp.float32), jnp.asarray(target_pos, jnp.float32),
            jnp.asarray(target_vel, jnp.float32),
        )
        thrust, p, q, r = np.asarray(out)
        return thrust, p, q, r


class MRAC(BaseControl):
    """Reference control/MRAC.py: model-reference adaptive control shell."""

    def __init__(self, drone_model: DroneModel = DroneModel.CF2X, g: float = G):
        super().__init__(drone_model, g)
        self.params = mrac_params(drone_model, g=g)
        self._jit = jax.jit(
            lambda st, dt, pos, quat, vel, av, tp, tr, tv, trr: mrac_control(
                self.params, st, dt, pos, quat, vel, av, tp, tr, tv, trr
            )
        )
        self.reset()

    def reset(self):
        # Reference MRAC.reset only zeroes the counter (MRAC.py:106-107):
        # the adapted gains Kx/Kr persist across flights; Xm re-snaps to the
        # measured state on the next call via the `initialized` flag.
        super().reset()
        if not hasattr(self, "state"):
            self.state = mrac_reset(self.params)
        else:
            self.state = self.state.replace(
                initialized=jnp.zeros_like(self.state.initialized))

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        self.control_counter += 1
        rpm, self.state, pos_e, rpy_e = self._jit(
            self.state, jnp.float32(control_timestep),
            jnp.asarray(cur_pos, jnp.float32), jnp.asarray(cur_quat, jnp.float32),
            jnp.asarray(cur_vel, jnp.float32), jnp.asarray(cur_ang_vel, jnp.float32),
            jnp.asarray(target_pos, jnp.float32), jnp.asarray(target_rpy, jnp.float32),
            jnp.asarray(target_vel, jnp.float32), jnp.asarray(target_rpy_rates, jnp.float32),
        )
        return np.asarray(rpm), np.asarray(pos_e), np.asarray(rpy_e)
