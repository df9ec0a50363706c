import pytest
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import OpticalFlowSettings
from livevisionkit_tpu.vision import optical_flow


def _shifted_pair(rng, shift_xy, size=(96, 128)):
    base = fixtures.make_texture(size[0] + 64, size[1] + 64, rng)
    p0 = fixtures.camera_pose(32.0, 32.0)
    p1 = fixtures.camera_pose(32.0 + shift_xy[0], 32.0 + shift_xy[1])
    f0 = fixtures.render_frame(base, p0, size)
    f1 = fixtures.render_frame(base, p1, size)
    return f0, f1


def _interior_points(size, n=40, margin=20, rng=None):
    ys = rng.uniform(margin, size[0] - margin, n)
    xs = rng.uniform(margin, size[1] - margin, n)
    return jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))


def test_lk_subpixel_translation(rng):
    # Camera moves (+2.3, -1.6): scene content shifts by (-2.3, +1.6).
    f0, f1 = _shifted_pair(rng, (2.3, -1.6))
    pts = _interior_points(f0.shape, rng=rng)
    s = OpticalFlowSettings()
    p0 = optical_flow.Pyramid.build(f0, s.pyramid_levels)
    p1 = optical_flow.Pyramid.build(f1, s.pyramid_levels)
    new_pts, tracked = optical_flow.track(p0, p1, pts, jnp.ones(len(pts), bool), s)
    flow = np.asarray(new_pts - pts)[np.asarray(tracked)]
    assert np.asarray(tracked).mean() > 0.6
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [-2.3, 1.6], atol=0.25)


def test_lk_large_motion_needs_pyramid(rng):
    f0, f1 = _shifted_pair(rng, (-9.0, 6.0))
    pts = _interior_points(f0.shape, rng=rng)
    s = OpticalFlowSettings(pyramid_levels=3)
    p0 = optical_flow.Pyramid.build(f0, s.pyramid_levels)
    p1 = optical_flow.Pyramid.build(f1, s.pyramid_levels)
    new_pts, tracked = optical_flow.track(p0, p1, pts, jnp.ones(len(pts), bool), s)
    flow = np.asarray(new_pts - pts)[np.asarray(tracked)]
    assert np.asarray(tracked).mean() > 0.5
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [9.0, -6.0], atol=0.5)


@pytest.mark.slow
def test_lk_flat_region_rejected(rng):
    flat = jnp.full((96, 128), 0.5)
    s = OpticalFlowSettings()
    p = optical_flow.Pyramid.build(flat, s.pyramid_levels)
    pts = _interior_points((96, 128), n=10, rng=rng)
    _, tracked = optical_flow.track(p, p, pts, jnp.ones(10, bool), s)
    assert not np.asarray(tracked).any()


def test_lk_respects_input_mask(rng):
    f0, f1 = _shifted_pair(rng, (1.0, 1.0))
    s = OpticalFlowSettings()
    p0 = optical_flow.Pyramid.build(f0, s.pyramid_levels)
    p1 = optical_flow.Pyramid.build(f1, s.pyramid_levels)
    pts = _interior_points(f0.shape, n=10, rng=rng)
    mask = jnp.zeros(10, bool)
    _, tracked = optical_flow.track(p0, p1, pts, mask, s)
    assert not np.asarray(tracked).any()
