"""Stateful controller shells with the reference's `computeControlFromState` API.

The reference exposes controllers as mutable classes
(control/BaseControl.py:55-93: `computeControlFromState(control_timestep,
state, target_pos, ...) -> (rpm, pos_e, yaw_e)` slicing the 20-dim state
vector). These shells hold the pure-function controller state on the host and
call the jitted kernels, so scripts written against the reference port
unchanged. For on-device fleets use the pure functions directly
(`dsl_pid_control` under vmap/scan).
"""

import os
import xml.etree.ElementTree as etxml

import numpy as np

import jax
import jax.numpy as jnp

from gym_pybullet_drones_tpu.control.ctbr import ctbr_control, ctbr_params
from gym_pybullet_drones_tpu.control.mrac import mrac_control, mrac_params, mrac_reset
from gym_pybullet_drones_tpu.control.dsl_pid import (
    _attitude_control,
    _position_control,
    dsl_pid_control,
    dsl_pid_params,
    dsl_pid_reset,
    one23d_interface,
)
from gym_pybullet_drones_tpu.envs.spec import DroneModel
from gym_pybullet_drones_tpu.core.params import G

_ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "assets")


class BaseControl:
    """API anchor (reference control/BaseControl.py): subclasses implement
    `computeControl`; `computeControlFromState` slices the 20-dim state."""

    def __init__(self, drone_model: DroneModel, g: float = G):
        self.DRONE_MODEL = drone_model
        # Reference BaseControl.__init__ derives these from the URDF (:32-41)
        self.GRAVITY = g * self._getURDFParameter("m")
        self.KF = self._getURDFParameter("kf")
        self.KM = self._getURDFParameter("km")
        self.control_counter = 0

    def reset(self):
        self.control_counter = 0

    def computeControl(self, control_timestep, cur_pos, cur_quat, cur_vel,
                       cur_ang_vel, target_pos, target_rpy=np.zeros(3),
                       target_vel=np.zeros(3), target_rpy_rates=np.zeros(3)):
        """Abstract per-drone control step (BaseControl.computeControl, :97-134)."""
        raise NotImplementedError

    def setPIDCoefficients(self, p_coeff_pos=None, i_coeff_pos=None,
                           d_coeff_pos=None, p_coeff_att=None,
                           i_coeff_att=None, d_coeff_att=None):
        """Swap PID gains by attribute (BaseControl.setPIDCoefficients,
        :138-177). Errors out, like the reference, when the instantiated
        controller has no PID coefficient attributes (e.g. CTBR, MRAC)."""
        ATTR_LIST = ["P_COEFF_FOR", "I_COEFF_FOR", "D_COEFF_FOR",
                     "P_COEFF_TOR", "I_COEFF_TOR", "D_COEFF_TOR"]
        if not all(hasattr(self, attr) for attr in ATTR_LIST):
            print("[ERROR] in BaseControl.setPIDCoefficients(), not all PID "
                  "coefficients exist as attributes in the instantiated "
                  "control class.")
            raise SystemExit(1)
        # Assign only the gains actually supplied: each attribute write on
        # DSLPIDControl swaps the params pytree and invalidates the compiled
        # kernel (a full retrace at the next control step), so a None
        # (keep-current) argument must not touch the attribute.
        for attr, value in zip(ATTR_LIST, (p_coeff_pos, i_coeff_pos,
                                           d_coeff_pos, p_coeff_att,
                                           i_coeff_att, d_coeff_att)):
            if value is not None:
                setattr(self, attr, value)

    def _getURDFParameter(self, parameter_name: str) -> float:
        """Positional-XML URDF parameter read (BaseControl._getURDFParameter,
        :181-216), against this package's generated URDFs (same element
        layout as the reference assets, tests/test_params.py round-trip)."""
        path = os.path.join(_ASSETS, self.DRONE_MODEL.value + ".urdf")
        root = etxml.parse(path).getroot()
        if parameter_name == "m":
            return float(root[1][0][1].attrib["value"])
        if parameter_name in ("ixx", "iyy", "izz"):
            return float(root[1][0][2].attrib[parameter_name])
        if parameter_name in ("arm", "thrust2weight", "kf", "km", "max_speed_kmh",
                              "gnd_eff_coeff", "prop_radius", "drag_coeff_xy",
                              "drag_coeff_z", "dw_coeff_1", "dw_coeff_2",
                              "dw_coeff_3"):
            return float(root[0].attrib[parameter_name])
        if parameter_name in ("length", "radius"):
            return float(root[1][2][1][0].attrib[parameter_name])
        if parameter_name == "collision_z_offset":
            offsets = [float(s) for s in root[1][2][0].attrib["xyz"].split(" ")]
            return offsets[2]
        raise KeyError(parameter_name)

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
        # Reference constant attributes (DSLPIDControl.py:43-60)
        self.PWM2RPM_SCALE = float(self.params.pwm2rpm_scale)
        self.PWM2RPM_CONST = float(self.params.pwm2rpm_const)
        self.MIN_PWM = float(self.params.min_pwm)
        self.MAX_PWM = float(self.params.max_pwm)
        self.MIXER_MATRIX = np.asarray(self.params.mixer)
        self._rebuild_jit()
        self.reset()

    def _rebuild_jit(self):
        params = self.params
        self._jit = jax.jit(
            lambda st, dt, pos, quat, vel, tp, tr, tv, trr: dsl_pid_control(
                params, st, dt, pos, quat, vel, tp, tr, tv, trr
            )
        )

    def _set_gain(self, field, value):
        self.params = self.params.replace(
            **{field: jnp.asarray(np.asarray(value), jnp.float32)})
        self._rebuild_jit()

    # Reference gain attributes (DSLPIDControl.py:37-42). Properties backed by
    # the params pytree so the base setPIDCoefficients works unchanged and
    # direct attribute writes retune the jitted kernel.
    P_COEFF_FOR = property(lambda s: np.asarray(s.params.p_for),
                           lambda s, v: s._set_gain("p_for", v))
    I_COEFF_FOR = property(lambda s: np.asarray(s.params.i_for),
                           lambda s, v: s._set_gain("i_for", v))
    D_COEFF_FOR = property(lambda s: np.asarray(s.params.d_for),
                           lambda s, v: s._set_gain("d_for", v))
    P_COEFF_TOR = property(lambda s: np.asarray(s.params.p_tor),
                           lambda s, v: s._set_gain("p_tor", v))
    I_COEFF_TOR = property(lambda s: np.asarray(s.params.i_tor),
                           lambda s, v: s._set_gain("i_tor", v))
    D_COEFF_TOR = property(lambda s: np.asarray(s.params.d_tor),
                           lambda s, v: s._set_gain("d_tor", v))

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

    def _dslPIDPositionControl(self, control_timestep, cur_pos, cur_quat,
                               cur_vel, target_pos, target_rpy, target_vel):
        """Position loop only (DSLPIDControl._dslPIDPositionControl, :149-209).
        Mutates the carried position integral; returns
        (thrust [PWM units], computed_target_rpy, pos_e)."""
        thrust, target_euler, pos_e, integral_pos_e = _position_control(
            self.params, self.state.integral_pos_e, jnp.float32(control_timestep),
            jnp.asarray(cur_pos, jnp.float32), jnp.asarray(cur_quat, jnp.float32),
            jnp.asarray(cur_vel, jnp.float32), jnp.asarray(target_pos, jnp.float32),
            jnp.asarray(target_rpy, jnp.float32), jnp.asarray(target_vel, jnp.float32),
        )
        self.state = self.state.replace(integral_pos_e=integral_pos_e)
        return float(thrust), np.asarray(target_euler), np.asarray(pos_e)

    def _dslPIDAttitudeControl(self, control_timestep, thrust, cur_quat,
                               target_euler, target_rpy_rates):
        """Attitude loop only (DSLPIDControl._dslPIDAttitudeControl, :212-259).
        Mutates last_rpy and the attitude integral; returns (4,) RPMs."""
        rpm, cur_rpy, integral_rpy_e = _attitude_control(
            self.params, self.state.last_rpy, self.state.integral_rpy_e,
            jnp.float32(control_timestep), jnp.asarray(thrust, jnp.float32),
            jnp.asarray(cur_quat, jnp.float32),
            jnp.asarray(target_euler, jnp.float32),
            jnp.asarray(target_rpy_rates, jnp.float32),
        )
        self.state = self.state.replace(last_rpy=cur_rpy,
                                        integral_rpy_e=integral_rpy_e)
        return np.asarray(rpm)

    def _one23DInterface(self, thrust):
        """1/2/4-dim desired thrust -> (4,) per-motor PWM
        (DSLPIDControl._one23DInterface, :263-287)."""
        thrust = np.atleast_1d(np.asarray(thrust, np.float32))
        return np.asarray(one23d_interface(self.params, jnp.asarray(thrust)))


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
        self.g = g
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

    def _compute_K(self, psi=0):
        """Linearized-model gain design (MRAC._compute_K, :56-104): pole
        placement at -1..-12 plus the Lyapunov solve. Sets the reference-named
        linear-algebra attributes and returns the initial (Kx, Kr)."""
        params = mrac_params(self.DRONE_MODEL, g=self.g, psi=float(psi))
        self.Am = np.asarray(params.Am)
        self.Bm = np.asarray(params.Bm)
        self.P = np.asarray(params.P)
        self.Kr_ref_gain = np.asarray(params.Kr_ref_gain)
        self.Gamma_x = np.eye(12) * float(params.gamma_x)
        self.Gamma_r = np.eye(4) * float(params.gamma_r)
        return np.asarray(params.Kx0), np.asarray(params.Kr0)
