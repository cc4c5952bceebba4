"""Engine-vs-oracle calibration suite (auto-skipped without engine captures).

`tests/golden/capture_reference.py` (run on any pybullet-capable machine, or
by the CI `engine-goldens` job) writes TRUE PyBullet trajectories to
tests/golden/engine/ with the same schema as the oracle goldens. This suite
compares the two recording sets directly: it PRINTS the measured deviation
per config (the calibration table docs/PYB_DERIVATION.md §6 asks for) and
asserts only coarse physical bounds — the oracle goldens keep anchoring the
kernels at round-off, while these bounds anchor the MODEL against the engine
without betting round-off-scale tolerances on unverifiable solver internals
(warm starting, manifold point placement, iteration order).

Budgets: smooth closed-loop configs amplify round-off chaotically
(documented Lyapunov growth, tests/test_golden.py), so the bound is a
trajectory-envelope scale, not a round-off scale; contact configs add the
rim-sampling and friction-direction approximations of core/contact.py
(PYB_DERIVATION.md §5) on top.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
ENGINE = os.path.join(GOLDEN, "engine")

# (file, key of the (T, N, d) position-like array, coarse bound in meters)
_CONFIGS = [
    ("helix_pyb.npz", "pos", 0.25),
    ("downwash_pyb.npz", "pos", 0.25),
    ("downwash_gdd.npz", "pos", 0.25),
    ("hover_learn_pyb.npz", "pos", 0.25),
    ("multihover_pyb.npz", "pos", 0.25),
    ("cf2p_pyb.npz", "pos", 0.25),
    ("race_pyb.npz", "pos", 0.25),
    ("tumble_pyb.npz", "pos", 1.0),
    ("slide_pyb.npz", "pos", 1.0),
    ("collide2_pyb.npz", "pos", 1.0),
    ("land_gnd_pyb.npz", "pos", 1.0),
]


def _engine_file(name):
    path = os.path.join(ENGINE, name)
    if not os.path.exists(path):
        pytest.skip(f"no engine capture {name} (run capture_reference.py "
                    "on a pybullet-capable machine)")
    return np.load(path)


@pytest.mark.parametrize("name,key,bound", _CONFIGS,
                         ids=[c[0].split(".")[0] for c in _CONFIGS])
def test_engine_vs_oracle_deviation(name, key, bound):
    eng = _engine_file(name)
    ora = np.load(os.path.join(GOLDEN, name))
    a, b = np.asarray(eng[key]), np.asarray(ora[key])
    t = min(len(a), len(b))
    a, b = a[:t], b[:t]
    d = np.linalg.norm(a - b, axis=-1)  # (T, N)
    per_second = d[:: max(1, t // 8)].max(axis=-1)
    print(f"\n[engine-parity] {name}: max {d.max():.4f} m, "
          f"final {d[-1].max():.4f} m, envelope {np.round(per_second, 4)}")
    assert np.isfinite(d).all()
    assert d.max() < bound, (name, float(d.max()))
