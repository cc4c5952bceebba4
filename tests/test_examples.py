"""Example smoke tests (reference tests/test_examples.py:1-15): each example's
`run()` entry point executes headless without raising — plus light numeric
sanity checks the reference never had."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from gym_pybullet_drones_tpu.examples import downwash, learn, mrac, pid, pid_velocity


def test_pid(tmp_path):
    logger = pid.run(gui=False, plot=False, output_folder=str(tmp_path),
                     duration_sec=4)
    st = logger.states
    # Drones hold their assigned altitudes on the helix (pid.py:64: H + i*0.05)
    assert np.allclose(st[:, 2, -1], [0.1, 0.15, 0.2], atol=0.02)
    assert (tmp_path / "save-flight-pid-" != "")  # csv dir created below
    assert any(p.name.startswith("save-flight") for p in tmp_path.iterdir())


def test_pid_velocity(tmp_path):
    logger = pid_velocity.run(gui=False, plot=False, output_folder=str(tmp_path))
    st = logger.states
    assert st.shape[0] == 4 and st.shape[2] == 48 * 5
    assert np.all(np.isfinite(st))


def test_downwash(tmp_path):
    logger = downwash.run(gui=False, plot=False, output_folder=str(tmp_path),
                          duration_sec=4)
    st = logger.states
    # Both drones survive the wake crossings near their start altitudes
    assert abs(st[0, 2, -1] - 1.0) < 0.1
    assert abs(st[1, 2, -1] - 0.5) < 0.15


def test_learn_ci_budget(tmp_path):
    # local=False shrinks the budget like the reference CI path (learn.py:93)
    evals = learn.run(gui=False, plot=False, output_folder=str(tmp_path),
                      local=False, num_envs=4)
    assert len(evals) >= 1
    assert np.isfinite(evals[-1][1])
    assert (tmp_path / "best_model.msgpack").exists()


def test_play_roundtrip(tmp_path):
    from gym_pybullet_drones_tpu.examples import play

    learn.run(gui=False, plot=False, output_folder=str(tmp_path),
              local=False, num_envs=4)
    total = play.play(output_folder=str(tmp_path), plot=False)
    assert np.isfinite(total)


def test_mrac(tmp_path):
    final_pos = mrac.run(plot=False, output_folder=str(tmp_path), duration_sec=10)
    assert abs(final_pos[2] - 1.0) < 0.05


def test_beta_example(tmp_path):
    from gym_pybullet_drones_tpu.examples import beta

    logger = beta.run(gui=False, plot=False, output_folder=str(tmp_path),
                      duration_sec=5)
    st = logger.states
    assert np.all(np.isfinite(st))
    assert st[0, 2, -1] > 0.5  # airborne after climb-out


def test_cf_example(tmp_path):
    from gym_pybullet_drones_tpu.examples import cf

    logger = cf.run(plot=False, output_folder=str(tmp_path), duration_sec=8)
    st = logger.states
    assert np.all(np.isfinite(st))
    assert abs(st[0, 2, -1] - 0.5) < 0.15  # holding the square's altitude


def test_learn_multiagent_ci_budget(tmp_path):
    evals = learn.run(gui=False, plot=False, output_folder=str(tmp_path),
                      local=False, num_envs=4, multiagent=True)
    assert len(evals) >= 1 and np.isfinite(evals[-1][1])


def test_trajopt_example(tmp_path):
    """10th example (beyond-reference): gradient-based trajectory
    optimization through the simulator converges to the target at rest."""
    from gym_pybullet_drones_tpu.examples import trajopt

    # 1 s horizon: a 1.1 m climb-to-rest in 0.5 s exceeds the CF2X's
    # 2.25 thrust-to-weight envelope (infeasible optimum, not an optimizer
    # failure)
    err, vel = trajopt.run(duration_sec=1.0, iters=200, plot=False,
                           output_folder=str(tmp_path))
    assert err < 0.01, err  # within 1 cm of the target altitude
    assert vel < 0.05, vel  # at rest
