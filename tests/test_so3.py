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


# ------------------------------------------------------------- psvd retry
def test_psvd_healthy_path_unperturbed():
    """On convergent inputs the retry machinery must be a no-op: psvd
    factors reconstruct A and are proper (det +1)."""
    import jax
    from gym_rotor_tpu.ops import so3
    rng = np.random.default_rng(5)
    A = jnp.asarray(rng.normal(size=(8, 3, 3)))
    U, s, V = so3.psvd(A)
    recon = U @ (s[..., None] * jnp.swapaxes(V, -1, -2))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=1e-10)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(U)), 1.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(V)), 1.0, atol=1e-10)


def test_psvd_retry_substitutes_perturbed_decomposition():
    """When the primary SVD yields non-finite factors, the per-matrix retry
    must swap in the perturbed decomposition for that element only
    (reference quad_utils.py:229-233 semantics under XLA's NaN signaling)."""
    from gym_rotor_tpu.ops import so3
    rng = np.random.default_rng(6)
    A = jnp.asarray(rng.normal(size=(4, 3, 3)))
    U0, s0, Vh0 = jnp.linalg.svd(A)
    # simulate non-convergence of element 2 (XLA reports it via NaNs)
    U_bad = U0.at[2].set(jnp.nan)
    calls = {"n": 0}
    real_svd = jnp.linalg.svd

    def fake_svd(M, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            return U_bad, s0, Vh0
        return real_svd(M, *a, **k)

    orig = so3.jnp.linalg.svd
    so3.jnp.linalg.svd = fake_svd
    try:
        U, s, Vh = so3._svd_with_retry(A)
    finally:
        so3.jnp.linalg.svd = orig
    assert np.isfinite(np.asarray(U)).all()
    # untouched elements keep the primary factors bitwise
    np.testing.assert_array_equal(np.asarray(U[0]), np.asarray(U0[0]))
    # the failed element reconstructs A[2] to the perturbation scale
    recon2 = U[2] @ (s[2][:, None] * Vh[2])
    np.testing.assert_allclose(np.asarray(recon2), np.asarray(A[2]),
                               atol=1e-4)


def test_oracle_psvd_retry_on_linalg_error(monkeypatch):
    """The NumPy oracle mirrors the reference's try/except retry
    (quad_utils.py:226-240)."""
    from gym_rotor_tpu.envs import oracle
    rng = np.random.default_rng(7)
    A = rng.normal(size=(3, 3))
    calls = {"n": 0}
    real = np.linalg.svd

    def flaky(M, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise np.linalg.LinAlgError("SVD did not converge")
        return real(M, *a, **k)

    monkeypatch.setattr(np.linalg, "svd", flaky)
    U, s, V = oracle.psvd(A.copy())
    assert calls["n"] == 2
    recon = U @ np.diag(s) @ V.T
    np.testing.assert_allclose(recon, A, atol=1e-4)
