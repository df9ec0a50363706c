import pytest
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import FeatureDetectorSettings
from livevisionkit_tpu.vision import features


SETTINGS = FeatureDetectorSettings(grid_shape=(8, 10))  # small grids for speed


@pytest.mark.slow
def test_fast_detects_square_corners():
    # A bright square on dark background: FAST-9 fires near its corners.
    img = jnp.zeros((48, 48)).at[16:32, 16:32].set(1.0)
    score = features.fast_score_map(img, jnp.full((48, 48), 0.1))
    ys, xs = np.nonzero(np.asarray(score))
    assert len(ys) > 0
    corners = np.array([[16, 16], [16, 31], [31, 16], [31, 31]])
    for y, x in zip(ys, xs):
        d = np.min(np.abs(corners - [y, x]).sum(axis=1))
        assert d <= 4, f"corner response far from square corners: {(y, x)}"


def test_fast_blank_image_no_corners():
    img = jnp.full((48, 48), 0.5)
    score = features.fast_score_map(img, jnp.full((48, 48), 0.05))
    assert float(score.max()) == 0.0


@pytest.mark.slow
def test_detect_grid_capacity_and_validity(rng):
    tex = fixtures.make_texture(64, 80, rng)
    s = FeatureDetectorSettings(grid_shape=(8, 10), fast_threshold_init=0.08)
    feats, thresh = features.detect(tex, features.initial_thresholds(s), s)
    assert feats.capacity == 80
    assert int(feats.count()) > 10
    pts = np.asarray(feats.points)
    ok = np.asarray(feats.valid)
    assert (pts[ok, 0] >= 0).all() and (pts[ok, 0] < 80).all()
    assert (pts[ok, 1] >= 0).all() and (pts[ok, 1] < 64).all()
    # one feature per cell by construction
    cell = (pts[ok, 1] // 8).astype(int) * 10 + (pts[ok, 0] // 8).astype(int)
    assert len(np.unique(cell)) == ok.sum()


def test_threshold_servo_direction(rng):
    s = FeatureDetectorSettings(grid_shape=(8, 10))
    t0 = features.initial_thresholds(s)
    # blank image: no features -> thresholds must drop
    blank = jnp.full((64, 80), 0.5)
    _, t1 = features.detect(blank, t0, s)
    assert (np.asarray(t1) < np.asarray(t0)).all()
    # dense corners + tiny threshold: overloaded -> thresholds must rise
    tex = fixtures.make_texture(64, 80, rng)
    _, t2 = features.detect(tex, jnp.full(s.region_shape, 0.02), s)
    assert (np.asarray(t2) >= 0.02).all()


def test_distribution_quality():
    # uniform spread -> high quality; one cluster -> low quality
    g = np.stack(np.meshgrid(np.linspace(5, 75, 8), np.linspace(5, 59, 8)), -1)
    pts_u = jnp.asarray(g.reshape(-1, 2).astype(np.float32))
    ok = jnp.ones(pts_u.shape[0], bool)
    q_u = float(features.distribution_quality(pts_u, ok, (64, 80)))
    pts_c = jnp.asarray(np.full((64, 2), 10.0, np.float32))
    q_c = float(features.distribution_quality(pts_c, jnp.ones(64, bool), (64, 80)))
    assert q_u > 0.9
    assert q_c < 0.2


def test_rebin_propagation(rng):
    s = FeatureDetectorSettings(grid_shape=(4, 5))
    size = (40, 50)
    pts = np.array(
        [[12.0, 8.0], [14.0, 9.0], [33.0, 22.0], [49.0, 39.0], [2.0, 2.0]],
        np.float32,
    )
    scores = np.array([0.5, 0.9, 0.3, 0.4, 0.2], np.float32)
    valid = np.array([True, True, True, True, False])
    g = features.rebin(
        jnp.asarray(pts), jnp.asarray(scores), jnp.asarray(valid), s, size
    )
    ok = np.asarray(g.valid)
    assert ok.sum() == 3  # two points share cell (12,8)/(14,9); invalid dropped
    # The shared cell kept the stronger feature (score 0.9 at (14, 9)).
    got_pts = np.asarray(g.points)[ok]
    assert any(np.allclose(p, [14.0, 9.0]) for p in got_pts)
    assert not any(np.allclose(p, [12.0, 8.0]) for p in got_pts)
    assert not any(np.allclose(p, [2.0, 2.0]) for p in got_pts)


def test_detect_respects_propagated(rng):
    s = FeatureDetectorSettings(grid_shape=(8, 10), fast_threshold_init=0.06)
    tex = fixtures.make_texture(64, 80, rng)
    prev = features.rebin(
        jnp.asarray(np.array([[41.0, 33.0]], np.float32)),
        jnp.asarray(np.array([99.0], np.float32)),
        jnp.asarray(np.array([True])),
        s,
        (64, 80),
    )
    feats, _ = features.detect(tex, features.initial_thresholds(s), s, prev)
    # The propagated feature keeps its exact position in its cell slot.
    cell = (33 // 8) * 10 + (41 // 8)
    np.testing.assert_allclose(np.asarray(feats.points[cell]), [41.0, 33.0])
    assert bool(feats.valid[cell])
