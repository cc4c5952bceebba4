"""CFAviary: Crazyflie-firmware-in-the-loop environment.

Behavioral port of the reference envs/CFAviary.py (803 LoC), driving the
native C++ firmware subset in `bridges/cffirmware` (instead of the external
`pycffirmware` bindings, CFAviary.py:10-13) against the JAX physics kernels:

* 500 Hz firmware (Mellinger) or 1000 Hz (PID), single drone (CFAviary.py:80-83)
* 2nd-order LPFs on gyro (80 Hz) and acc (30 Hz) (CFAviary.py:24-25, 127-131)
* `step(i)` runs firmware ticks until sim time reaches `t + 1/ctrl_freq`
  (CFAviary.py:187-261): finite-difference rates and Gs-normalized acc
  (:215-217), state + sensor updates (:221-235), controller gating — position
  PID at 100 Hz, attitude at 500 Hz via `_tick` (:388-398)
* tumble detection: acc.z < -0.5 for 30 ticks kills motors (:376-386)
* QUAD_FORMATION_X power distribution (:633-652) and the brushed-motor PWM
  nonlinearity volts = -0.0006239 t^2 + 0.088 t (:615-622)
* high-level command queue: sendFullStateCmd / sendTakeoffCmd / sendLandCmd /
  sendGotoCmd / sendStopCmd / notifySetpointStop + yaw/vel variants
  (:435-606) feeding the native septic-spline planner

The firmware is stateful C, so this env is a host-side shell over the jitted
physics step — the hot path (physics) stays on device; firmware ticks are
microseconds of host work each.
"""

import math

import numpy as np

from scipy.spatial.transform import Rotation as R

import gym_pybullet_drones_tpu.bridges.cffirmware as firm
from gym_pybullet_drones_tpu.compat.gym import BaseAviaryEnv
from gym_pybullet_drones_tpu.envs.base import TASK_CTRL
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics


class CFAviary(BaseAviaryEnv):
    ACTION_DELAY = 0
    SENSOR_DELAY = 0
    CONTROLLER = "mellinger"

    GYRO_LPF_CUTOFF_FREQ = 80
    ACCEL_LPF_CUTOFF_FREQ = 30
    QUAD_FORMATION_X = True
    MOTOR_SET_ENABLE = True
    BRUSHED = True
    SUPPLY_VOLTAGE = 3

    RAD_TO_DEG = 180 / math.pi

    def __init__(self, drone_model: DroneModel = DroneModel.CF2X,
                 num_drones: int = 1, physics: Physics = Physics.PYB,
                 pyb_freq: int = 500, ctrl_freq: int = 25,
                 initial_xyzs=None, initial_rpys=None, verbose=False, **kwargs):
        firmware_freq = 500 if self.CONTROLLER == "mellinger" else 1000
        assert pyb_freq % firmware_freq == 0, (
            f"pyb_freq ({pyb_freq}) must be a multiple of firmware_freq "
            f"({firmware_freq}) for CFAviary.")
        if num_drones != 1:
            raise NotImplementedError("CFAviary is single-drone (CFAviary.py:82-83)")
        super().__init__(
            drone_model=drone_model, num_drones=1, physics=physics,
            pyb_freq=pyb_freq, ctrl_freq=firmware_freq, task=TASK_CTRL,
            initial_xyzs=initial_xyzs, initial_rpys=initial_rpys, **kwargs)
        self.firmware_freq = firmware_freq
        self.ctrl_freq = ctrl_freq
        self.PWM2RPM_SCALE, self.PWM2RPM_CONST = 0.2685, 4070.3
        self.MIN_PWM, self.MAX_PWM = 20000, 65535
        self.verbose = verbose
        self.firmware_dt = 1.0 / firmware_freq
        self.ctrl_dt = 1.0 / ctrl_freq

    # -- action/observation spaces: full-state like CtrlAviary ----------------

    def _action_space(self):
        from gymnasium import spaces
        return spaces.Box(low=0.0, high=self.MAX_RPM, shape=(1, 4), dtype=np.float32)

    def _observation_space(self):
        return self._state_obs_bounds()

    # -- lifecycle -------------------------------------------------------------

    def reset(self, seed=None, options=None):
        obs, info = super().reset(seed=seed, options=options)
        self._initialize_firmware(obs)
        return obs, info

    def _initialize_firmware(self, init_obs):
        # Per-instance firmware state: every CFAviary owns an opaque context in
        # the native library, activated around each call burst, so two live
        # envs never corrupt each other's integrators/planner.
        if not hasattr(self, "_firm_ctx") or self._firm_ctx._handle is None:
            self._firm_ctx = firm.FirmwareContext()
        self._firm_ctx.activate()
        self.states = []
        self.takeoff_sent = False
        # Hardware-latency buffers (CFAviary.py:121-124): zero-filled
        # histories of length {ACTION,SENSOR}_DELAY ticks.
        self.action_history = [[0, 0, 0, 0] for _ in range(self.ACTION_DELAY)]
        self.sensor_history = [[[0, 0, 0], [0, 0, 0]]
                               for _ in range(self.SENSOR_DELAY)]
        self.acclpf = [firm.lpf2pData() for _ in range(3)]
        self.gyrolpf = [firm.lpf2pData() for _ in range(3)]
        for i in range(3):
            # Reference quirk replicated: CFAviary.py:130-131 initializes the
            # ACC filters with GYRO_LPF_CUTOFF_FREQ (80 Hz) and the GYRO
            # filters with ACCEL_LPF_CUTOFF_FREQ (30 Hz) — the constants are
            # swapped upstream, and parity means flying with that swap.
            firm.lpf2pInit(self.acclpf[i], self.firmware_freq, self.GYRO_LPF_CUTOFF_FREQ)
            firm.lpf2pInit(self.gyrolpf[i], self.firmware_freq, self.ACCEL_LPF_CUTOFF_FREQ)
        self.control = firm.control_t()
        self.setpoint = firm.setpoint_t()
        self.sensorData = firm.sensorData_t()
        self.state = firm.state_t()
        self.tick = 0
        self.pwms = [0.0, 0.0, 0.0, 0.0]
        self.action = np.zeros((1, 4))
        self.command_queue = []
        self.tumble_counter = 0
        self.prev_vel = np.array(init_obs[0][10:13])
        self.prev_rpy = np.array(init_obs[0][7:10])
        self.last_pos_pid_call = 0.0
        self.last_att_pid_call = 0.0
        self._error = False
        self.full_state_cmd_override = True
        self.first_motor_killed_print = True

        if self.CONTROLLER == "pid":
            firm.controllerPidInit()
        else:
            firm.controllerMellingerInit()
            assert self.firmware_freq == 500, "Mellinger requires 500 Hz firmware"

        firm.crtpCommanderHighLevelInit()
        init_pos = np.array(init_obs[0][0:3])
        init_vel = np.array(init_obs[0][10:13])
        init_rpy = np.array(init_obs[0][7:10])
        self._update_state(0, init_pos, init_vel, np.array([0.0, 0.0, 1.0]),
                           init_rpy * self.RAD_TO_DEG)
        firm.crtpCommanderHighLevelTellState(self.state)

    # -- main loop -------------------------------------------------------------

    def step(self, i):
        """Advance to sim time (i+1)/ctrl_freq, ticking the firmware
        (CFAviary.step, :187-261). Returns the usual 5-tuple."""
        t = i / self.ctrl_freq
        self._firm_ctx.activate()
        self._process_command_queue(t)

        obs = reward = terminated = truncated = info = None
        while self.tick / self.firmware_freq < t + self.ctrl_dt:
            obs, reward, terminated, truncated, info = super().step(self.action)
            cur_pos = np.array(obs[0][0:3])
            cur_vel = np.array(obs[0][10:13])
            cur_rpy = np.array(obs[0][7:10])
            body_rot = R.from_euler("XYZ", cur_rpy).inv()
            if self.takeoff_sent:
                self.states.append([self.tick / self.firmware_freq, *cur_pos])

            cur_rotation_rates = (cur_rpy - self.prev_rpy) / self.firmware_dt
            self.prev_rpy = cur_rpy
            cur_acc = (cur_vel - self.prev_vel) / self.firmware_dt / 9.8 + np.array([0, 0, 1])
            self.prev_vel = cur_vel

            state_timestamp = int(self.tick / self.firmware_freq * 1e3)
            self._update_state(state_timestamp, cur_pos, cur_vel, cur_acc,
                               cur_rpy * self.RAD_TO_DEG)
            sensor_timestamp = int(self.tick / self.firmware_freq * 1e6)
            if self.SENSOR_DELAY:
                # Hardware sensing latency (CFAviary.py:230-233): feed the
                # firmware the reading from SENSOR_DELAY ticks ago.
                self._update_sensor_data(sensor_timestamp,
                                         *self.sensor_history[0])
                self.sensor_history = self.sensor_history[1:] + [
                    [body_rot.apply(cur_acc),
                     cur_rotation_rates * self.RAD_TO_DEG]]
            else:
                self._update_sensor_data(sensor_timestamp,
                                         body_rot.apply(cur_acc),
                                         cur_rotation_rates * self.RAD_TO_DEG)
            self._update_setpoint(self.tick / self.firmware_freq)
            self._step_controller()

            new_action = self.PWM2RPM_SCALE * np.clip(
                np.array(self.pwms), self.MIN_PWM, self.MAX_PWM) + self.PWM2RPM_CONST
            if self.ACTION_DELAY:
                # Hardware response latency (CFAviary.py:254-257): apply the
                # command issued ACTION_DELAY ticks ago.
                delayed = np.asarray(self.action_history[0], dtype=float)
                self.action_history = self.action_history[1:] + [new_action]
                new_action = delayed
            if self._error:
                new_action = np.zeros(4)
                if self.first_motor_killed_print:
                    print("[WARNING] CFAviary: firmware error, motors killed.")
                    self.first_motor_killed_print = False
            self.action = new_action.reshape(1, 4)
        return obs, reward, terminated, truncated, info

    # -- firmware data plumbing ------------------------------------------------

    def _update_sensor_data(self, timestamp, acc_vals, gyro_vals):
        self.sensorData.acc.x = firm.lpf2pApply(self.acclpf[0], acc_vals[0])
        self.sensorData.acc.y = firm.lpf2pApply(self.acclpf[1], acc_vals[1])
        self.sensorData.acc.z = firm.lpf2pApply(self.acclpf[2], acc_vals[2])
        self.sensorData.gyro.x = firm.lpf2pApply(self.gyrolpf[0], gyro_vals[0])
        self.sensorData.gyro.y = firm.lpf2pApply(self.gyrolpf[1], gyro_vals[1])
        self.sensorData.gyro.z = firm.lpf2pApply(self.gyrolpf[2], gyro_vals[2])
        self.sensorData.interruptTimestamp = timestamp

    def _update_state(self, timestamp, pos, vel, acc, rpy_deg):
        att = self.state.attitude
        att.timestamp = timestamp
        att.roll = rpy_deg[0]
        att.pitch = -rpy_deg[1]  # legacy CF2 inverted pitch (CFAviary.py:363)
        att.yaw = rpy_deg[2]
        if self.CONTROLLER == "mellinger":
            q = R.from_euler("xyz", np.asarray(rpy_deg) / self.RAD_TO_DEG).as_quat()
            aq = self.state.attitudeQuaternion
            aq.timestamp = timestamp
            aq.x, aq.y, aq.z, aq.w = map(float, q)
        for target, vals in ((self.state.position, pos),
                             (self.state.velocity, vel), (self.state.acc, acc)):
            target.timestamp = timestamp
            target.x, target.y, target.z = map(float, vals)

    # -- reference-named plumbing surface (CFAviary.py:112-361) ----------------
    # The main code paths above use snake_case internally; these carry the
    # reference's exact method names and decompositions so downstream code
    # written against CFAviary keeps working.

    def _initalize_cffirmware(self):  # sic — the reference's spelling (:112)
        """Reset the firmware wrapper from the live sim state."""
        self._initialize_firmware(self._getDroneStateVector(0).reshape(1, -1))

    def _update_initial_state(self, obs):
        """(CFAviary.py:263-265): seed the finite-difference memory."""
        self.prev_vel = np.array(obs[10:13])
        self.prev_rpy = np.array(obs[7:10])

    def _update_sensorData(self, timestamp, acc_vals, gyro_vals,
                           baro_vals=(1013.25, 25)):
        """(CFAviary.py:272-291). The native firmware subset has no barometer
        input (neither controller reads it), so ``baro_vals`` is accepted for
        signature parity and ignored."""
        self._update_sensor_data(timestamp, acc_vals, gyro_vals)

    def _update_gyro(self, x, y, z):
        self.sensorData.gyro.x = firm.lpf2pApply(self.gyrolpf[0], x)
        self.sensorData.gyro.y = firm.lpf2pApply(self.gyrolpf[1], y)
        self.sensorData.gyro.z = firm.lpf2pApply(self.gyrolpf[2], z)

    def _update_acc(self, x, y, z):
        self.sensorData.acc.x = firm.lpf2pApply(self.acclpf[0], x)
        self.sensorData.acc.y = firm.lpf2pApply(self.acclpf[1], y)
        self.sensorData.acc.z = firm.lpf2pApply(self.acclpf[2], z)

    @staticmethod
    def _update_baro(baro, pressure, temperature):
        """(CFAviary.py:303-311): barometric altitude from pressure [hPa] and
        temperature [C], written onto any object with the baro_t fields."""
        baro.pressure = pressure
        baro.temperature = temperature
        # Reference parity: the formula hard-codes 25 C (298.15 K) regardless
        # of the temperature argument (CFAviary.py:311).
        baro.asl = (((1015.7 / baro.pressure) ** 0.1902630958 - 1)
                    * (25 + 273.15)) / 0.0065

    @staticmethod
    def _update_3D_vec(point, timestamp, x, y, z):
        point.x, point.y, point.z = x, y, z
        point.timestamp = timestamp

    def _update_attitudeQuaternion(self, quaternion_t, timestamp, qx, qy, qz,
                                   qw=None):
        """(CFAviary.py:341-355): xyzw quat, or roll/pitch/yaw in DEG when
        ``qw`` is omitted."""
        quaternion_t.timestamp = timestamp
        if qw is None:
            q = R.from_euler(
                "xyz", np.array([qx, qy, qz]) / self.RAD_TO_DEG).as_quat()
            qx, qy, qz, qw = map(float, q)
        quaternion_t.x, quaternion_t.y = qx, qy
        quaternion_t.z, quaternion_t.w = qz, qw

    def _update_attitude_t(self, attitude_t, timestamp, roll, pitch, yaw):
        """(CFAviary.py:357-361): legacy CF2 frame — pitch inverted."""
        attitude_t.timestamp = timestamp
        attitude_t.roll = roll
        attitude_t.pitch = -pitch
        attitude_t.yaw = yaw

    def _updateSetpoint(self, timestep):
        self._update_setpoint(timestep)

    def _powerDistribution(self, control):
        self._power_distribution(control)

    def _motorsGetPWM(self, thrust):
        return self._motors_get_pwm(thrust)

    @staticmethod
    def _limitThrust(val):
        return CFAviary._limit_thrust(val)

    def _step_controller(self):
        # Tumble detection (CFAviary.py:376-386)
        if self.state.acc.z < -0.5:
            self.tumble_counter += 1
        else:
            self.tumble_counter = 0
        if self.tumble_counter >= 30:
            print("[WARNING] CFAviary: tumble detected, killing motors.")
            self.pwms = [0, 0, 0, 0]
            self.tick += 1
            self._error = True
            return

        # Rate gating (CFAviary.py:388-398)
        cur_time = self.tick / self.firmware_freq
        if (cur_time - self.last_att_pid_call > 0.002
                and cur_time - self.last_pos_pid_call > 0.01):
            _tick = 0
            self.last_pos_pid_call = cur_time
            self.last_att_pid_call = cur_time
        elif cur_time - self.last_att_pid_call > 0.002:
            self.last_att_pid_call = cur_time
            _tick = 2
        else:
            _tick = 1

        if self.CONTROLLER == "pid":
            firm.controllerPid(self.control, self.setpoint, self.sensorData,
                               self.state, _tick)
        else:
            firm.controllerMellinger(self.control, self.setpoint, self.sensorData,
                                     self.state, _tick)
        self._power_distribution(self.control)
        self.tick += 1

    def _update_setpoint(self, timestep):
        if not self.full_state_cmd_override:
            firm.crtpCommanderHighLevelTellState(self.state)
            firm.crtpCommanderHighLevelUpdateTime(timestep)
            firm.crtpCommanderHighLevelGetSetpoint(self.setpoint, self.state)

    # -- power stage (CFAviary.py:609-652) ------------------------------------

    def _motors_get_pwm(self, thrust):
        if not self.BRUSHED:
            raise NotImplementedError("brushless motors not supported")
        thrust = thrust / 65536 * 60
        volts = -0.0006239 * thrust**2 + 0.088 * thrust
        percentage = min(1.0, volts / self.SUPPLY_VOLTAGE)
        return percentage * self.MAX_PWM

    @staticmethod
    def _limit_thrust(val):
        return float(np.clip(val, 0, 65535))

    def _power_distribution(self, control):
        if self.QUAD_FORMATION_X:
            r = control.roll / 2
            p = control.pitch / 2
            pwms = [
                self._motors_get_pwm(self._limit_thrust(control.thrust - r + p + control.yaw)),
                self._motors_get_pwm(self._limit_thrust(control.thrust - r - p - control.yaw)),
                self._motors_get_pwm(self._limit_thrust(control.thrust + r - p + control.yaw)),
                self._motors_get_pwm(self._limit_thrust(control.thrust + r + p - control.yaw)),
            ]
        else:
            pwms = [
                self._motors_get_pwm(self._limit_thrust(control.thrust + control.pitch + control.yaw)),
                self._motors_get_pwm(self._limit_thrust(control.thrust - control.roll - control.yaw)),
                self._motors_get_pwm(self._limit_thrust(control.thrust - control.pitch + control.yaw)),
                self._motors_get_pwm(self._limit_thrust(control.thrust + control.roll - control.yaw)),
            ]
        self.pwms = pwms if self.MOTOR_SET_ENABLE else np.clip(pwms, self.MIN_PWM, None).tolist()

    # -- command queue (CFAviary.py:428-606) ----------------------------------

    def _process_command_queue(self, sim_time):
        if self.command_queue:
            firm.crtpCommanderHighLevelStop()
            firm.crtpCommanderHighLevelUpdateTime(sim_time)
            command, args = self.command_queue.pop(0)
            getattr(self, command)(*args)

    def sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        self.command_queue.append(["_sendFullStateCmd", [pos, vel, acc, yaw, rpy_rate, timestep]])

    def _sendFullStateCmd(self, pos, vel, acc, yaw, rpy_rate, timestep):
        sp = self.setpoint
        sp.position.x, sp.position.y, sp.position.z = map(float, pos)
        sp.velocity.x, sp.velocity.y, sp.velocity.z = map(float, vel)
        sp.acceleration.x, sp.acceleration.y, sp.acceleration.z = map(float, acc)
        sp.attitudeRate.roll = rpy_rate[0] * self.RAD_TO_DEG
        sp.attitudeRate.pitch = rpy_rate[1] * self.RAD_TO_DEG
        sp.attitudeRate.yaw = rpy_rate[2] * self.RAD_TO_DEG
        q = R.from_euler("xyz", [0, 0, yaw]).as_quat()
        sp.attitudeQuaternion.x, sp.attitudeQuaternion.y = float(q[0]), float(q[1])
        sp.attitudeQuaternion.z, sp.attitudeQuaternion.w = float(q[2]), float(q[3])
        sp.mode.x = sp.mode.y = sp.mode.z = firm.modeAbs
        sp.mode.quat = firm.modeAbs
        sp.mode.roll = sp.mode.pitch = sp.mode.yaw = firm.modeDisable
        sp.timestamp = int(timestep * 1000)
        self.full_state_cmd_override = True

    def sendTakeoffCmd(self, height, duration):
        self.command_queue.append(["_sendTakeoffCmd", [height, duration]])

    def _sendTakeoffCmd(self, height, duration):
        self.takeoff_sent = True
        firm.crtpCommanderHighLevelTakeoff(height, duration)
        self.full_state_cmd_override = False

    def sendTakeoffYawCmd(self, height, duration, yaw):
        self.command_queue.append(["_sendTakeoffYawCmd", [height, duration, yaw]])

    def _sendTakeoffYawCmd(self, height, duration, yaw):
        firm.crtpCommanderHighLevelTakeoffYaw(height, duration, yaw)
        self.full_state_cmd_override = False

    def sendTakeoffVelCmd(self, height, vel, relative):
        self.command_queue.append(["_sendTakeoffVelCmd", [height, vel, relative]])

    def _sendTakeoffVelCmd(self, height, vel, relative):
        firm.crtpCommanderHighLevelTakeoffWithVelocity(height, vel, relative)
        self.full_state_cmd_override = False

    def sendLandCmd(self, height, duration):
        self.command_queue.append(["_sendLandCmd", [height, duration]])

    def _sendLandCmd(self, height, duration):
        firm.crtpCommanderHighLevelLand(height, duration)
        self.full_state_cmd_override = False

    def sendLandYawCmd(self, height, duration, yaw):
        self.command_queue.append(["_sendLandYawCmd", [height, duration, yaw]])

    def _sendLandYawCmd(self, height, duration, yaw):
        firm.crtpCommanderHighLevelLandYaw(height, duration, yaw)
        self.full_state_cmd_override = False

    def sendLandVelCmd(self, height, vel, relative):
        self.command_queue.append(["_sendLandVelCmd", [height, vel, relative]])

    def _sendLandVelCmd(self, height, vel, relative):
        firm.crtpCommanderHighLevelLandWithVelocity(height, vel, relative)
        self.full_state_cmd_override = False

    def sendStopCmd(self):
        self.command_queue.append(["_sendStopCmd", []])

    def _sendStopCmd(self):
        firm.crtpCommanderHighLevelStop()
        self.full_state_cmd_override = False

    def sendGotoCmd(self, pos, yaw, duration_s, relative):
        self.command_queue.append(["_sendGotoCmd", [pos, yaw, duration_s, relative]])

    def _sendGotoCmd(self, pos, yaw, duration_s, relative):
        firm.crtpCommanderHighLevelGoTo(*pos, yaw, duration_s, relative)
        self.full_state_cmd_override = False

    def notifySetpointStop(self):
        self.command_queue.append(["_notifySetpointStop", []])

    def _notifySetpointStop(self):
        firm.crtpCommanderHighLevelTellState(self.state)
        self.full_state_cmd_override = False

    def close(self):
        """Release the native firmware context (safe to call repeatedly)."""
        if hasattr(self, "_firm_ctx"):
            self._firm_ctx.close()
        super().close()
