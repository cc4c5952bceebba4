"""Parameter tables and derived constants."""

import jax.numpy as jnp
import numpy as np

from gym_pybullet_drones_tpu.core.params import drone_params, from_urdf
from gym_pybullet_drones_tpu.envs.spec import DroneModel


def test_cf2x_derived_constants():
    p = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    g = 9.8 * 0.027
    np.testing.assert_allclose(float(p.gravity), g)
    np.testing.assert_allclose(float(p.hover_rpm), np.sqrt(g / (4 * 3.16e-10)))
    np.testing.assert_allclose(float(p.max_rpm), np.sqrt(2.25 * g / (4 * 3.16e-10)))
    np.testing.assert_allclose(float(p.max_thrust), 4 * 3.16e-10 * float(p.max_rpm) ** 2)
    np.testing.assert_allclose(
        float(p.max_xy_torque), 2 * 0.0397 * 3.16e-10 * float(p.max_rpm) ** 2 / np.sqrt(2)
    )
    np.testing.assert_allclose(float(p.max_z_torque), 2 * 7.94e-12 * float(p.max_rpm) ** 2)
    np.testing.assert_allclose(
        float(p.gnd_eff_h_clip),
        0.25 * 2.31348e-2 * np.sqrt(15 * float(p.max_rpm) ** 2 * 3.16e-10 * 11.36859 / float(p.max_thrust)),
    )


def test_racer_yaw_sign_flipped():
    assert float(drone_params(DroneModel.RACE).yaw_sign) == -1.0
    assert float(drone_params(DroneModel.CF2X).yaw_sign) == 1.0


def test_inertia_tables():
    p = drone_params(DroneModel.CF2P, dtype=jnp.float64)
    np.testing.assert_allclose(np.diag(np.asarray(p.J)), [2.3951e-5, 2.3951e-5, 3.2347e-5])
    np.testing.assert_allclose(np.asarray(p.J @ p.J_inv), np.eye(3), atol=1e-12)


def test_urdf_loader_matches_builtin():
    import os

    urdf = "/root/reference/gym_pybullet_drones/assets/cf2x.urdf"
    if not os.path.exists(urdf):
        return
    a = drone_params(DroneModel.CF2X, dtype=jnp.float64)
    b = from_urdf(urdf, DroneModel.CF2X, dtype=jnp.float64)
    for name in ("m", "arm", "kf", "km", "hover_rpm", "max_rpm", "gnd_eff_h_clip"):
        np.testing.assert_allclose(float(getattr(a, name)), float(getattr(b, name)))
    np.testing.assert_allclose(np.asarray(a.prop_offsets), np.asarray(b.prop_offsets))


def test_from_urdf_roundtrips_builtin_tables():
    """The generated URDF assets parse back to the built-in parameter pytrees
    (reference-format <properties> compatibility, BaseAviary.py:985-1017)."""
    import os
    import jax
    import numpy as np
    from gym_pybullet_drones_tpu.core.params import drone_params, from_urdf
    from gym_pybullet_drones_tpu.envs.spec import DroneModel

    assets = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "gym_pybullet_drones_tpu", "assets")
    for model in DroneModel:
        path = os.path.join(assets, f"{model.value}.urdf")
        a = from_urdf(path, model)
        b = drone_params(model)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-12)
