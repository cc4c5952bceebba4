"""Pipeline smoke for the from-scratch RGB distillation harness
(scripts/rgb_distill.py — the round-5 474-solver). Guards the script's
API against bit-rot the same way test_capture_selftest guards the engine
capture machinery: a subprocess run at toy scale must verify its teacher,
collect, fit, eval, and write both artifacts. Solve quality is gated
separately on the committed checkpoints (tests/test_checkpoints.py)."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def test_rgb_distill_pipeline_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "rgb_distill.py"),
         "--episodes", "2", "--rounds", "1", "--bc_steps", "40",
         "--bc_batch", "32", "--threshold", "1e9",
         "--out", str(tmp_path)],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "[teacher]" in proc.stdout and "protocol" in proc.stdout
    log = json.load(open(tmp_path / "rgb_distill.json"))
    assert log["teacher"] >= 474.0  # the committed KIN teacher still solves
    assert log["rounds"] and log["rounds"][0]["episodes"] >= 10
    assert (tmp_path / "rgb_distill.msgpack").exists()
