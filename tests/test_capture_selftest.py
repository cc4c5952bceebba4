"""Self-test of the engine-capture machinery (VERDICT r3 item 7).

The `engine-goldens` CI job (`tests/golden/capture_reference.py` on a
pybullet-capable machine) can bit-rot unseen because this image cannot run
it. This suite runs the SAME capture main() against a stand-in engine — this
repo's own compat shell with the impulse contact solver enabled, wired in by
`install_selftest_shims()` — then validates the full downstream path:

1. every npz the engine job would produce is written,
2. its key set and trailing shapes match the oracle golden schema exactly
   (so tests/test_golden_pyb.py and docs/PYB_DERIVATION.md §6 consume it
   unchanged), and
3. tests/test_engine_parity.py's comparison logic runs on the captures and
   passes its coarse physical bounds (captures are short — the comparison
   truncates to the common prefix, exactly as it does for real engine files).

This makes Missing-item #1 (engine anchoring) executable on first networked
contact instead of failing on schema drift.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")

# Files main() captures, with the (T, N, d) comparison key + coarse bound
# from tests/test_engine_parity.py (contact configs get the wider band).
_CAPTURED = [
    ("helix_pyb.npz", "pos", 0.25),
    ("downwash_pyb.npz", "pos", 0.25),
    ("downwash_gdd.npz", "pos", 0.25),
    ("hover_learn_pyb.npz", "pos", 0.25),
    ("multihover_pyb.npz", "pos", 0.25),
    ("tumble_pyb.npz", "pos", 1.0),
    ("slide_pyb.npz", "pos", 1.0),
    ("collide2_pyb.npz", "pos", 1.0),
    ("land_gnd_pyb.npz", "pos", 1.0),
]


def _load_capture_module():
    spec = importlib.util.spec_from_file_location(
        "capture_reference", os.path.join(GOLDEN, "capture_reference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def captures(tmp_path_factory):
    """Run the full capture main() once against the shimmed stand-in engine."""
    out = str(tmp_path_factory.mktemp("engine_selftest"))
    mod = _load_capture_module()
    mod.HERE = out
    saved = {k: sys.modules.get(k) for k in list(sys.modules)
             if k == "pybullet" or k.startswith("gym_pybullet_drones.")
             or k == "gym_pybullet_drones"}
    try:
        mod.install_selftest_shims()
        # 1/8 duration: 0.5-1 s trajectories — enough steps to exercise the
        # ground-contact regime in the contact captures (impact at ~0.25 s)
        # while keeping the suite cost compile-dominated.
        mod.main(duration_scale=0.125)
    finally:
        for k in [k for k in sys.modules
                  if k == "pybullet" or k.startswith("gym_pybullet_drones.")
                  or k == "gym_pybullet_drones"]:
            del sys.modules[k]
        sys.modules.update({k: v for k, v in saved.items() if v is not None})
    return out


def test_all_engine_files_written(captures):
    missing = [n for n, _, _ in _CAPTURED + [("velocity_pyb.npz", "obs", 0)]
               if not os.path.exists(os.path.join(captures, n))]
    assert not missing, missing


@pytest.mark.parametrize(
    "name", [c[0] for c in _CAPTURED] + ["velocity_pyb.npz"])
def test_schema_matches_oracle_golden(captures, name):
    """Key sets identical, per-step trailing shapes identical (time axis is
    shorter by the duration scale), dtypes compatible."""
    cap = np.load(os.path.join(captures, name))
    ora = np.load(os.path.join(GOLDEN, name))
    assert sorted(cap.keys()) == sorted(ora.keys()), name
    for k in ora.keys():
        a, b = cap[k], ora[k]
        if a.ndim and b.ndim and a.shape[0] != b.shape[0]:
            # time-major arrays: trailing dims must agree
            assert a.shape[1:] == b.shape[1:], (name, k, a.shape, b.shape)
        else:
            assert a.shape == b.shape, (name, k, a.shape, b.shape)
        assert a.dtype.kind == b.dtype.kind, (name, k, a.dtype, b.dtype)
        assert np.all(np.isfinite(a)) or a.dtype.kind == "b", (name, k)


def test_engine_parity_suite_runs_on_captures(captures):
    """Drive tests/test_engine_parity.py's own comparison function against
    the selftest captures — the exact code path the first real engine run
    will take."""
    import test_engine_parity as tep

    orig = tep.ENGINE
    tep.ENGINE = captures
    try:
        for name, key, bound in _CAPTURED:
            tep.test_engine_vs_oracle_deviation(name, key, bound)
    finally:
        tep.ENGINE = orig
