"""Numerics parity against OpenCV — the reference's actual compute library.

The reference delegates FAST, pyramidal LK, RANSAC homography and remap to
OpenCV (SURVEY.md §2.1); these tests run OUR implementations against
OpenCV's on identical inputs to quantify behavioral parity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fixtures

cv2 = pytest.importorskip("cv2")

from livevisionkit_tpu.config import (  # noqa: E402
    FeatureDetectorSettings,
    MotionEstimationSettings,
    OpticalFlowSettings,
)
from livevisionkit_tpu.models.homography import Homography  # noqa: E402
from livevisionkit_tpu.ops import remap as remap_ops  # noqa: E402
from livevisionkit_tpu.vision import features, optical_flow, ransac  # noqa: E402


def _pair(rng, shift=(3.3, -2.1), size=(120, 160)):
    base = fixtures.make_texture(size[0] + 80, size[1] + 80, rng)
    p0 = fixtures.camera_pose(40.0, 40.0)
    p1 = fixtures.camera_pose(40.0 + shift[0], 40.0 + shift[1])
    f0 = np.asarray(fixtures.render_frame(base, p0, size))
    f1 = np.asarray(fixtures.render_frame(base, p1, size))
    return f0, f1


@pytest.mark.slow
def test_lk_matches_opencv(rng):
    f0, f1 = _pair(rng)
    u80, u81 = (f0 * 255).astype(np.uint8), (f1 * 255).astype(np.uint8)
    pts = np.stack(
        [rng.uniform(25, 135, 40), rng.uniform(25, 95, 40)], -1
    ).astype(np.float32)

    cv_pts, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        u80, u81, pts.reshape(-1, 1, 2), None,
        winSize=(11, 11), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_COUNT, 5, 0.01),
    )
    cv_pts = cv_pts.reshape(-1, 2)
    cv_st = cv_st.reshape(-1).astype(bool)

    s = OpticalFlowSettings(window_size=11, pyramid_levels=3, iterations=5)
    p0 = optical_flow.Pyramid.build(jnp.asarray(f0), 3)
    p1 = optical_flow.Pyramid.build(jnp.asarray(f1), 3)
    our_pts, our_st = optical_flow.track(
        p0, p1, jnp.asarray(pts), jnp.ones(len(pts), bool), s
    )
    our_pts = np.asarray(our_pts)
    our_st = np.asarray(our_st)

    both = cv_st & our_st
    assert both.sum() >= 20
    diff = np.linalg.norm(our_pts[both] - cv_pts[both], axis=1)
    # Median agreement well below half a pixel; tails from features OpenCV
    # refines with its eps-criterion.
    assert np.median(diff) < 0.3, np.median(diff)
    assert np.quantile(diff, 0.8) < 0.75, np.quantile(diff, 0.8)


def test_fast_corners_match_opencv(rng):
    f0, _ = _pair(rng)
    u8 = (f0 * 255).astype(np.uint8)
    thr = 40
    det = cv2.FastFeatureDetector_create(
        threshold=thr, nonmaxSuppression=False,
        type=cv2.FastFeatureDetector_TYPE_9_16,
    )
    cv_pts = np.array([k.pt for k in det.detect(u8)]).reshape(-1, 2)
    score = np.asarray(
        features.fast_score_map(jnp.asarray(f0), jnp.full(f0.shape, thr / 255.0))
    )
    ours = np.stack(np.nonzero(score > 0), -1)[:, ::-1]  # (N, 2) (x, y)
    # Keep comparisons away from the border (cv detects there, we suppress).
    def interior(p):
        return (
            (p[:, 0] >= 4) & (p[:, 0] < f0.shape[1] - 4)
            & (p[:, 1] >= 4) & (p[:, 1] < f0.shape[0] - 4)
        )

    cv_set = {tuple(p) for p in cv_pts[interior(cv_pts)].astype(int)}
    our_set = {tuple(p) for p in ours[interior(ours)].astype(int)}
    if not cv_set:
        pytest.skip("no OpenCV corners at this threshold")
    inter = len(cv_set & our_set)
    union = len(cv_set | our_set)
    assert inter / union > 0.9, (inter, union)


def test_ransac_homography_matches_opencv(rng):
    src = rng.uniform([10, 10], [470, 260], size=(300, 2)).astype(np.float32)
    m = np.array(
        [[1.01, 0.02, 4.0], [-0.015, 0.99, -2.5], [2e-5, -1e-5, 1.0]], np.float32
    )
    ph = np.concatenate([src, np.ones((300, 1), np.float32)], -1) @ m.T
    dst = ph[:, :2] / ph[:, 2:]
    dst += rng.normal(0, 0.2, dst.shape).astype(np.float32)
    out_idx = rng.choice(300, 60, replace=False)
    dst[out_idx] += rng.uniform(15, 60, (60, 2)).astype(np.float32)

    cv_h, cv_mask = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    import jax

    est = ransac.estimate(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(300, bool),
        jax.random.key(0), MotionEstimationSettings(),
    )
    pts = np.stack(
        np.meshgrid(np.linspace(0, 480, 7), np.linspace(0, 270, 5)), -1
    ).reshape(-1, 2).astype(np.float32)
    ours = np.asarray(Homography(m=est.homography.m).transform(jnp.asarray(pts)))
    cvs = np.asarray(
        Homography.from_matrix(jnp.asarray(cv_h.astype(np.float32))).transform(
            jnp.asarray(pts)
        )
    )
    assert np.abs(ours - cvs).max() < 0.75, np.abs(ours - cvs).max()
    # Agreement on the outlier set.
    inl = np.asarray(est.inliers)
    assert inl[out_idx].mean() < 0.05


def test_remap_matches_opencv(rng):
    f0, _ = _pair(rng)
    h, w = f0.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    my = yy + 3.3 * np.sin(xx / 23.0)
    mx = xx - 2.7 * np.cos(yy / 17.0)
    cv_out = cv2.remap(
        f0, mx, my, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
        borderValue=0.25,
    )
    ours = np.asarray(
        remap_ops.remap(jnp.asarray(f0), jnp.stack([jnp.asarray(my), jnp.asarray(mx)]),
                        fill=0.25)
    )
    # cv2.remap uses 5-bit fixed-point interpolation weights; bound loosely.
    # Compare only samples whose full bilinear support is inside the image:
    # for partial-tap positions cv2 blends BORDER_CONSTANT into the missing
    # taps while we fill — a border-semantics difference, not an error.
    full_support = (my >= 0) & (my <= h - 2) & (mx >= 0) & (mx <= w - 2)
    diff = np.abs(ours - cv_out)[full_support]
    assert diff.max() < 0.02, diff.max()
    assert full_support.mean() > 0.9  # the comparison actually covers the frame
