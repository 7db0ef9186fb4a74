"""Property tests for SO(3) primitives (SURVEY.md §4: hat/vee inverses,
orthonormality bounds, Euler round-trips)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.ops import so3


def rand_w(key, batch=()):
    return jax.random.normal(key, batch + (3,), jnp.float64)


def test_hat_vee_roundtrip():
    w = rand_w(jax.random.PRNGKey(0), (16,))
    np.testing.assert_array_equal(so3.vee(so3.hat(w)), w)


def test_hat_antisymmetric_and_cross():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a, b = rand_w(k1, (8,)), rand_w(k2, (8,))
    H = so3.hat(a)
    np.testing.assert_allclose(H + jnp.swapaxes(H, -1, -2), 0.0, atol=0)
    hv = jnp.einsum("...ij,...j->...i", H, b)
    np.testing.assert_allclose(hv, so3.cross(a, b), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(so3.cross(a, b), np.cross(a, b), rtol=1e-12, atol=1e-12)


def test_euler_roundtrip():
    key = jax.random.PRNGKey(2)
    euler = jax.random.uniform(
        key, (32, 3), jnp.float64,
        minval=jnp.array([-1.4, -1.4, -3.1]), maxval=jnp.array([1.4, 1.4, 3.1]),
    )
    R = so3.euler_to_rot(euler)
    # R must be a rotation
    RtR = jnp.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)
    back = so3.rot_to_euler(R)
    np.testing.assert_allclose(back, euler, rtol=1e-9, atol=1e-9)


def test_euler_matches_scipy_convention():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    euler = rng.uniform(-1.0, 1.0, (10, 3))
    R_scipy = Rotation.from_euler("xyz", euler).as_matrix()
    R_ours = np.asarray(so3.euler_to_rot(jnp.asarray(euler)))
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-12)


@pytest.mark.parametrize("drift", [1e-6, 1e-4, 1e-3])
def test_polar_fast_matches_svd_projection(drift):
    key = jax.random.PRNGKey(4)
    euler = jax.random.uniform(key, (16, 3), jnp.float64, -1.0, 1.0)
    R = so3.euler_to_rot(euler)
    noise = jax.random.normal(jax.random.PRNGKey(5), R.shape, jnp.float64) * drift
    Rd = R + noise
    fast = so3.polar_fast(Rd, iters=3)
    exact = so3.project_so3_svd(Rd)
    np.testing.assert_allclose(fast, exact, atol=1e-11)
    RtR = jnp.swapaxes(fast, -1, -2) @ fast
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-11)


def test_ensure_exact_noop_when_orthonormal():
    R = so3.euler_to_rot(jnp.array([0.3, -0.2, 1.0], jnp.float64))
    out = so3.ensure_so3_exact(R)
    np.testing.assert_array_equal(out, R)  # bitwise passthrough


def test_ensure_exact_repairs_drift():
    R = so3.euler_to_rot(jnp.array([0.3, -0.2, 1.0], jnp.float64))
    Rd = R + 1e-3
    out = so3.ensure_so3_exact(Rd)
    RtR = out.T @ out
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(out), 1.0, atol=1e-12)


def test_norm_ang_btw_two_vectors_matches_reference_semantics():
    # The signed normalized angle should be antisymmetric and live in [-1, 1)
    a = jnp.array([1.0, 0.0, 0.0])
    for th in np.linspace(-3.1, 3.1, 21):
        b = jnp.array([np.cos(th), np.sin(th), 0.0])
        ang = float(so3.norm_ang_btw_two_vectors(a, b))
        assert abs(ang - th / np.pi) < 1e-9


def test_inv3_matches_linalg():
    key = jax.random.PRNGKey(6)
    M = jax.random.normal(key, (8, 3, 3), jnp.float64) + 3 * jnp.eye(3)
    np.testing.assert_allclose(so3.inv3(M), jnp.linalg.inv(M), rtol=1e-9, atol=1e-10)


def test_integral_helpers_match_reference_semantics():
    """Functional IntegralState/DerivativeState vs a direct transcription of
    the reference classes (quad_utils.py:38-77)."""
    from gym_rotor_tpu.envs import integrals

    rng = np.random.default_rng(0)
    dt = 0.005
    s = integrals.IntegralState.zero((3,), jnp.float64)
    err_ref, int_ref = np.zeros(3), np.zeros(3)
    for _ in range(50):
        cur = rng.normal(size=3)
        s = integrals.integrate(s, jnp.asarray(cur), dt)
        err_ref = err_ref + (int_ref + cur) * dt / 2.0
        int_ref = cur
        np.testing.assert_allclose(np.asarray(s.error), err_ref, rtol=1e-12)

    d = integrals.DerivativeState.zero((3,), jnp.float64)
    prev = np.zeros(3)
    for _ in range(10):
        y = rng.normal(size=3)
        d = integrals.derivative(d, jnp.asarray(y), dt)
        np.testing.assert_allclose(np.asarray(d.y_dot), (y - prev) / dt,
                                   rtol=1e-12)
        prev = y
