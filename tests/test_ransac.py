import pytest
import jax
import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.config import MotionEstimationSettings
from livevisionkit_tpu.models.homography import Homography
from livevisionkit_tpu.vision import ransac


def _make_matches(rng, n=400, outlier_frac=0.3, noise=0.3, model="homography"):
    src = rng.uniform([10, 10], [470, 260], size=(n, 2)).astype(np.float32)
    if model == "homography":
        m = np.array(
            [[1.02, 0.01, 3.0], [-0.008, 0.99, -2.0], [1e-5, -2e-5, 1.0]],
            np.float32,
        )
    else:
        c, s = np.cos(0.03), np.sin(0.03)
        m = np.array([[c, -s, 4.0], [s, c, -1.5], [0, 0, 1.0]], np.float32)
    ph = np.concatenate([src, np.ones((n, 1), np.float32)], -1) @ m.T
    dst = ph[:, :2] / ph[:, 2:3]
    dst += rng.normal(0, noise, size=dst.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] += rng.uniform(20, 80, size=(n_out, 2)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.choice(n, n // 10, replace=False)] = False  # some untracked
    return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), m, out_idx


def _max_grid_error(m_est, m_true):
    pts = np.stack(
        np.meshgrid(np.linspace(0, 480, 7), np.linspace(0, 270, 5)), -1
    ).reshape(-1, 2)
    h_est = Homography.from_matrix(jnp.asarray(m_est))
    h_true = Homography.from_matrix(jnp.asarray(m_true))
    e = np.asarray(h_est.transform(jnp.asarray(pts.astype(np.float32))))
    t = np.asarray(h_true.transform(jnp.asarray(pts.astype(np.float32))))
    return np.abs(e - t).max()


@pytest.mark.slow
def test_homography_with_outliers(rng):
    src, dst, valid, m_true, out_idx = _make_matches(rng)
    est = ransac.estimate(
        src, dst, valid, jax.random.key(0), MotionEstimationSettings()
    )
    assert bool(est.ok)
    assert _max_grid_error(np.asarray(est.homography.m), m_true) < 1.0
    # outliers that were valid must be flagged out
    inl = np.asarray(est.inliers)
    assert inl[out_idx].mean() < 0.05
    assert 0.4 < float(est.stability) < 0.8


def test_similarity_model(rng):
    src, dst, valid, m_true, _ = _make_matches(rng, model="similarity")
    est = ransac.estimate(
        src,
        dst,
        valid,
        jax.random.key(1),
        MotionEstimationSettings(),
        use_homography=False,
    )
    assert bool(est.ok)
    assert _max_grid_error(np.asarray(est.homography.m), m_true) < 1.0
    # similarity structure preserved: m00 == m11, m01 == -m10, no perspective
    m = np.asarray(est.homography.m)
    np.testing.assert_allclose(m[0, 0], m[1, 1], atol=1e-4)
    np.testing.assert_allclose(m[0, 1], -m[1, 0], atol=1e-4)
    np.testing.assert_allclose(m[2, :2], 0.0, atol=1e-7)


@pytest.mark.slow
def test_too_few_points_not_ok(rng):
    src = jnp.asarray(rng.uniform(0, 100, size=(50, 2)).astype(np.float32))
    valid = jnp.zeros(50, bool).at[:4].set(True)
    est = ransac.estimate(
        src, src + 1.0, valid, jax.random.key(2), MotionEstimationSettings()
    )
    assert not bool(est.ok)
    np.testing.assert_allclose(np.asarray(est.homography.m), np.eye(3))


def test_clean_data_high_stability(rng):
    src, dst, valid, m_true, _ = _make_matches(rng, outlier_frac=0.0, noise=0.1)
    est = ransac.estimate(
        src, dst, valid, jax.random.key(3), MotionEstimationSettings()
    )
    assert bool(est.ok)
    assert float(est.stability) > 0.95
    assert _max_grid_error(np.asarray(est.homography.m), m_true) < 0.5


def test_jit_compatible(rng):
    src, dst, valid, _, _ = _make_matches(rng)
    f = jax.jit(
        lambda s, d, v, k: ransac.estimate(
            s, d, v, k, MotionEstimationSettings(), use_homography=jnp.bool_(True)
        )
    )
    est = f(src, dst, valid, jax.random.key(0))
    assert bool(est.ok)
