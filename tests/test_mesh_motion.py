import pytest
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import (
    FeatureDetectorSettings,
    FrameTrackerSettings,
    MeshMotionSettings,
    PathSmootherSettings,
    StabilizationFilterSettings,
)
from livevisionkit_tpu.models.warp_field import WarpField
from livevisionkit_tpu.vision import mesh_motion

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated

SIZE = (96, 120)
MESH = (9, 11)


def _grid_points(rng, n=300):
    xs = rng.uniform(2, SIZE[1] - 3, n)
    ys = rng.uniform(2, SIZE[0] - 3, n)
    return np.stack([xs, ys], -1).astype(np.float32)


def _field_displacement(pts, field: WarpField):
    """Backward offsets (dx, dy) of `field` sampled at (x, y) points."""
    hm, wm = field.field_shape
    idx, w4 = mesh_motion._bilinear_weights(
        jnp.asarray(pts), (hm, wm), SIZE
    )
    scale = jnp.array([SIZE[0] - 1, SIZE[1] - 1]).reshape(2, 1, 1)
    d = mesh_motion._sample(field.offsets * scale, idx, w4)  # (N, 2) (dy, dx)
    return np.asarray(d)


def _make_gt_field():
    off = np.zeros((2, *MESH), np.float32)
    yy = np.linspace(0, 1, MESH[0])[:, None]
    xx = np.linspace(0, 1, MESH[1])[None, :]
    off[0] = 0.02 * np.sin(2 * np.pi * xx) * (0.5 + 0.5 * yy)
    off[1] = 0.015 * np.cos(2 * np.pi * yy) - 0.01 * xx
    return WarpField(offsets=jnp.asarray(off))


def test_mesh_recovers_smooth_field(rng):
    gt = _make_gt_field()
    pts = _grid_points(rng)
    d = _field_displacement(pts, gt)  # (N, 2) (dy, dx) px
    src = pts + d[:, ::-1]  # src = dst + backward offset
    est, inliers, res = mesh_motion.estimate(
        jnp.asarray(src),
        jnp.asarray(pts),
        jnp.ones(len(pts)),
        WarpField.identity(MESH),
        SIZE,
        MeshMotionSettings(temporal_weight=0.01, rigidity_weight=0.3),
    )
    err_px = np.abs(
        np.asarray(est.offsets - gt.offsets)
        * np.array([SIZE[0] - 1, SIZE[1] - 1]).reshape(2, 1, 1)
    )
    # Interior nodes well constrained.
    assert err_px[:, 1:-1, 1:-1].max() < 0.5, err_px.max()
    assert float(res) < 0.3
    assert np.asarray(inliers).mean() > 0.95


def test_mesh_irls_rejects_outliers(rng):
    gt = _make_gt_field()
    pts = _grid_points(rng)
    d = _field_displacement(pts, gt)
    src = pts + d[:, ::-1]
    n_out = 60
    bad = rng.choice(len(pts), n_out, replace=False)
    src[bad] += rng.uniform(8, 20, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    est, inliers, _ = mesh_motion.estimate(
        jnp.asarray(src),
        jnp.asarray(pts),
        jnp.ones(len(pts)),
        WarpField.identity(MESH),
        SIZE,
        MeshMotionSettings(temporal_weight=0.01, rigidity_weight=0.3, irls_rounds=3),
    )
    inl = np.asarray(inliers)
    assert inl[bad].mean() < 0.1
    err_px = np.abs(
        np.asarray(est.offsets - gt.offsets)
        * np.array([SIZE[0] - 1, SIZE[1] - 1]).reshape(2, 1, 1)
    )
    assert err_px[:, 1:-1, 1:-1].max() < 1.0


def test_mesh_no_features_returns_warm_start():
    warm = _make_gt_field()
    est, inliers, _ = mesh_motion.estimate(
        jnp.zeros((10, 2)),
        jnp.zeros((10, 2)),
        jnp.zeros(10),
        warm,
        SIZE,
        MeshMotionSettings(),
    )
    # With zero feature weight the solve is (lam_r * R + lam_t) x = lam_t x0:
    # smoothness flattens the field but it stays finite and bounded.
    assert bool(jnp.isfinite(est.offsets).all())
    assert not np.asarray(inliers).any()


def test_stabilizer_mesh_mode_reduces_jitter(rng):
    base = fixtures.make_texture(320, 320, rng)
    size = (120, 160)
    n = 24
    poses, _ = fixtures.shaky_path(n, rng, margin=80.0, drift_px=0.4, shake_px=2.5)
    frames = jnp.stack([fixtures.render_frame(base, p, size) for p in poses])

    from livevisionkit_tpu.data.frame import Frame, PixelFormat
    from livevisionkit_tpu.filters.base import FrameSpec
    from livevisionkit_tpu.filters.stabilization import StabilizationFilter

    settings = StabilizationFilterSettings(
        tracker=FrameTrackerSettings(
            detection_size=(96, 120),
            motion_resolution=(9, 11),  # mesh mode
            detector=FeatureDetectorSettings(
                grid_shape=(8, 10), fast_threshold_init=0.06
            ),
            min_motion_samples=15,
        ),
        smoother=PathSmootherSettings(predictive_samples=5),
    )
    filt = StabilizationFilter(settings=settings)
    spec = FrameSpec(size[0], size[1], 1, PixelFormat.GRAY)

    def step(state, x):
        gray, ts = x
        state, out = filt.step(
            state, Frame.create(gray[None], timestamp=ts, fmt=PixelFormat.GRAY)
        )
        return state, (out.pixels[0], out.valid)

    ts = jnp.arange(n, dtype=jnp.float32) / 30.0
    _, (out_px, out_valid) = jax.jit(lambda s, xs: jax.lax.scan(step, s, xs))(
        filt.init(spec), (frames, ts)
    )
    valid = np.asarray(out_valid)
    assert valid[5:].all()

    def jitter(a):
        return np.abs(np.diff(a[:, 24:-24, 30:-30], axis=0)).mean()

    j_in = jitter(np.asarray(frames))
    j_out = jitter(np.asarray(out_px)[valid])
    assert j_out < 0.65 * j_in, (j_in, j_out)
