"""Opt-in integration test against a REAL betaflight_SITL.elf.

Auto-skipped unless the binaries exist: build them outside this image with
`scripts/build_betaflight_sitl.sh 1` (needs network + gcc), then run

    BETAFLIGHT_SITL_DIR=betaflight_sitl python -m pytest tests/test_betaflight_sitl.py

The wire protocol itself (18-double FDM packet, 16-channel RC, 4-float PWM,
ENU->NED sign flips, stale-action policy) is unit-tested against MockSITL in
tests/test_betaflight.py; this test closes the loop with the actual firmware.
"""

import os

import numpy as np
import pytest

_DIR = os.environ.get("BETAFLIGHT_SITL_DIR", "betaflight_sitl")
_ELF = os.path.join(_DIR, "bf0", "obj", "main", "betaflight_SITL.elf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_ELF),
    reason=f"real Betaflight SITL not built ({_ELF} missing); "
           "run scripts/build_betaflight_sitl.sh",
)


def test_real_sitl_arms_and_flies_csv_trajectory(tmp_path):
    from gym_pybullet_drones_tpu.examples.beta import run

    logger = run(num_drones=1, duration_sec=6, plot=False,
                 output_folder=str(tmp_path), use_mock_sitl=False,
                 sitl_paths=[_ELF])
    states = np.asarray(logger.states)  # (1, 16, T)
    z = states[0, 2, :]
    # After arming + trajectory start the drone must actually fly: it left
    # the ground and did not diverge.
    assert z.max() > 0.3, "SITL never produced climbing thrust"
    assert np.isfinite(states).all()
    assert np.abs(states[0, 0:3, -1]).max() < 10.0, "diverged"
