"""BetaAviary: Betaflight-SITL-in-the-loop environment.

Behavioral port of the reference envs/BetaAviary.py over the C++ UDP bridge
(`bridges/betaflight`): per-drone channel triple at ports 9002/9003/9004 +10i
(BetaAviary.py:14-16, :104), the 18-double FDM packet with ENU->NED gyro sign
flips (:126-137), the 16-channel RC packet with arming at t > ARM_TIME via
aux1 (:149-159), non-blocking PWM receive keeping the stale action on a miss
(:161-170), `ctbr2beta` channel mapping (:176-188), and the SITL motor-order
remap [2,1,3,0] with pwm-fraction -> RPM conversion
rpm = sqrt(MAX_THRUST/(4 kf) * a) (:258-266).

The SITL itself stays an external artifact: pass `sitl_paths` to spawn real
`betaflight_SITL.elf` binaries (the reference builds them with
assets/clone_bfs.sh), or run `bridges.betaflight.MockSITL` instances (used by
the tests and the default example) on the same wire protocol.
"""

import subprocess
import time

import numpy as np

from gym_pybullet_drones_tpu.bridges.betaflight import BetaBridge
from gym_pybullet_drones_tpu.compat.gym import BaseAviaryEnv
from gym_pybullet_drones_tpu.envs.base import TASK_CTRL
from gym_pybullet_drones_tpu.envs.spec import DroneModel, Physics


class BetaAviary(BaseAviaryEnv):
    def __init__(self, drone_model: DroneModel = DroneModel.CF2X,
                 num_drones: int = 1, physics: Physics = Physics.PYB,
                 pyb_freq: int = 240, ctrl_freq: int = 240,
                 initial_xyzs=None, initial_rpys=None,
                 udp_ip: str = "127.0.0.1", sitl_paths=None, **kwargs):
        super().__init__(
            drone_model=drone_model, num_drones=num_drones, physics=physics,
            pyb_freq=pyb_freq, ctrl_freq=ctrl_freq, task=TASK_CTRL,
            initial_xyzs=initial_xyzs, initial_rpys=initial_rpys, **kwargs)
        self.UDP_IP = udp_ip
        self.ARM_TIME = 1.0
        self.TRAJ_TIME = 1.5
        self._sitl_procs = []
        if sitl_paths:
            for path in sitl_paths:
                self._sitl_procs.append(
                    subprocess.Popen([path], stdout=subprocess.DEVNULL,
                                     stderr=subprocess.DEVNULL))
            time.sleep(2)
        self.bridges = [BetaBridge(i, udp_ip) for i in range(num_drones)]
        self.beta_action = np.zeros((num_drones, 4))

    def close(self):
        for b in self.bridges:
            b.close()
        for p in self._sitl_procs:
            p.terminate()
        super().close()

    # -- step: sim advances on last received PWM, then exchange packets --------

    def step(self, action, i):
        """`action` is (N, 4) CTBR [thrust, p, q, r] (BetaAviary.py:111-174)."""
        rpm = self._beta_pwm_to_rpm(self.beta_action)
        obs, reward, terminated, truncated, info = super().step(rpm)
        t = i / self.CTRL_FREQ

        for j in range(self.NUM_DRONES):
            o = np.asarray(obs[j])
            quat_xyzw = np.asarray(o[3:7], dtype=float)
            w_world = np.asarray(o[13:16], dtype=float)
            # World -> body frame: rotate by the conjugate quaternion.
            # Pure numpy on purpose: this per-drone host loop must not
            # dispatch eager device ops (CLAUDE.md: ~1 s each over the TPU
            # tunnel) for a 3-vector rotate.
            x, y, z, w = -quat_xyzw[0], -quat_xyzw[1], -quat_xyzw[2], quat_xyzw[3]
            t2 = 2.0 * np.cross([x, y, z], w_world)
            w_body = w_world + w * t2 + np.cross([x, y, z], t2)

            self.bridges[j].send_fdm(t, w_body)

            thro, roll, pitch, yaw = 1000.0, 1500.0, 1500.0, 1500.0
            if t > self.TRAJ_TIME:
                thro, roll, pitch, yaw = self.ctbr2beta(*action[j])
            aux1 = 1000 if t < self.ARM_TIME else 1500
            channels = np.array(
                [round(roll), round(pitch), round(thro), round(yaw), aux1]
                + [1000] * 11, dtype=np.uint16)
            self.bridges[j].send_rc(t, channels)

            pwm, fresh = self.bridges[j].recv_pwm()
            self.beta_action[j] = pwm

        return obs, reward, terminated, truncated, info

    def _action_space(self):
        """CTBR action box; the reference reuses the raw-RPM bounds
        (BetaAviary.py:200-204)."""
        from gymnasium import spaces
        n = self.NUM_DRONES
        return spaces.Box(low=np.zeros((n, 4), dtype=np.float32),
                          high=np.full((n, 4), self.MAX_RPM, dtype=np.float32),
                          dtype=np.float32)

    def _observation_space(self):
        return self._state_obs_bounds()

    def ctbr2beta(self, thrust, roll, pitch, yaw):
        """CTBR (N-normalized thrust, rad/s body rates) -> 1000-2000 RC
        channels (BetaAviary.py:176-188)."""
        MIN_CHANNEL, MAX_CHANNEL = 1000, 2000
        MAX_RATE, MAX_THRUST = 360.0, 40.9
        mid = (MAX_CHANNEL + MIN_CHANNEL) / 2
        d = (MAX_CHANNEL - MIN_CHANNEL) / 2
        thrust = thrust / MAX_THRUST * d * 2 + MIN_CHANNEL
        rates = np.array([roll, pitch, -yaw]) / np.pi * 180 / MAX_RATE * d + mid
        return (float(np.clip(thrust, MIN_CHANNEL, MAX_CHANNEL)),
                *np.clip(rates, MIN_CHANNEL, MAX_CHANNEL))

    def _beta_pwm_to_rpm(self, beta_action):
        """SITL motor remap [2,1,3,0] + pwm fraction -> RPM
        (BetaAviary._preprocessAction, :258-266)."""
        remapped = beta_action[:, [2, 1, 3, 0]]
        return np.sqrt(self.MAX_THRUST / 4 / self.KF * np.maximum(remapped, 0.0))
