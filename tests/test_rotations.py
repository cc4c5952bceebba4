"""Rotation utilities vs scipy ground truth."""

import numpy as np
from scipy.spatial.transform import Rotation

from gym_pybullet_drones_tpu.core import rotations as rot


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_matrix_matches_scipy():
    q = random_quats(64)
    got = np.asarray(rot.quat_to_matrix(q))
    want = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_euler_xyz_matches_scipy_extrinsic():
    q = random_quats(64, seed=1)
    got = np.asarray(rot.quat_to_euler_xyz(q))
    want = Rotation.from_quat(q).as_euler("xyz")
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_euler_xyz_roundtrip():
    rng = np.random.default_rng(2)
    rpy = rng.uniform(low=[-np.pi, -np.pi / 2 + 0.01, -np.pi], high=[np.pi, np.pi / 2 - 0.01, np.pi], size=(64, 3))
    q = np.asarray(rot.euler_xyz_to_quat(rpy))
    want = Rotation.from_euler("xyz", rpy).as_quat()
    sign = np.sign(np.sum(q * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, want * sign, atol=1e-12)


def test_intrinsic_xyz_matches_scipy():
    q = random_quats(64, seed=3)
    R = Rotation.from_quat(q).as_matrix()
    got = np.asarray(rot.matrix_to_euler_intrinsic_xyz(R))
    want = Rotation.from_matrix(R).as_euler("XYZ")
    np.testing.assert_allclose(got, want, atol=1e-9)
    back = np.asarray(rot.euler_intrinsic_xyz_to_matrix(got))
    np.testing.assert_allclose(back, R, atol=1e-9)


def test_quat_rotate_matches_matrix():
    q = random_quats(32, seed=4)
    v = np.random.default_rng(5).normal(size=(32, 3))
    got = np.asarray(rot.quat_rotate(q, v))
    want = np.einsum("nij,nj->ni", Rotation.from_quat(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_integrate_quat_matches_oracle():
    from oracle import integrate_q

    q = random_quats(16, seed=6)
    rng = np.random.default_rng(7)
    omega = rng.normal(size=(16, 3)) * 5.0
    dt = 1.0 / 240.0
    got = np.asarray(rot.integrate_quat(q, omega, dt))
    for i in range(16):
        want = integrate_q(q[i], omega[i], dt)
        np.testing.assert_allclose(got[i], want, atol=1e-14)


def test_integrate_quat_zero_rate():
    q = random_quats(4, seed=8)
    got = np.asarray(rot.integrate_quat(q, np.zeros((4, 3)), 1 / 240))
    np.testing.assert_array_equal(got, q)
