import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.models.homography import Homography
from livevisionkit_tpu.models.warp_field import WarpField


def _translation(tx, ty):
    return Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(tx), jnp.float32(ty)
    )


def test_identity_field_is_noop(rng):
    # Bilinear is interpolatory: identity field == identity on pixels.  (The
    # "easu" default is NOT interpolatory at integer positions on busy
    # content — negative Lanczos-like lobes — matching the reference, whose
    # apply always EASU-resamples, WarpMesh.cpp:183-223.)
    img = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
    out = WarpField.identity((4, 4)).apply(img, filter_mode="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # EASU output stays within the de-ring clamp of each 2x2 neighbourhood.
    out_e = np.asarray(WarpField.identity((4, 4)).apply(img))
    assert out_e.shape == img.shape and np.isfinite(out_e).all()


def test_homography_round_trip_2x2():
    h = _translation(3.0, -2.0)
    f = WarpField.from_homography(h, (2, 2), (32, 32))
    h2 = f.to_homography((32, 32)).normalized()
    np.testing.assert_allclose(np.asarray(h2.m), np.asarray(h.m), atol=1e-4)


def test_2x2_apply_matches_homography_warp(rng):
    img = jnp.asarray(rng.uniform(size=(24, 24)).astype(np.float32))
    h = Homography.from_similarity(
        jnp.float32(1.02), jnp.float32(0.03), jnp.float32(1.5), jnp.float32(-0.5)
    )
    f = WarpField.from_homography(h, (2, 2), (24, 24))
    np.testing.assert_allclose(
        np.asarray(f.apply(img)), np.asarray(h.warp(img)), atol=1e-3
    )


def test_dense_field_translation(rng):
    # A uniform-translation field must shift content like the homography warp.
    img = jnp.zeros((20, 20)).at[10, 10].set(1.0)
    h = _translation(2.0, 3.0)
    f = WarpField.from_homography(h, (8, 8), (20, 20))
    out = np.asarray(f.apply(img, exact_2x2=False))
    assert out[13, 12] == out.max()
    np.testing.assert_allclose(out[13, 12], 1.0, atol=1e-4)


def test_algebra():
    a = WarpField(offsets=jnp.full((2, 4, 4), 0.1))
    b = WarpField(offsets=jnp.full((2, 4, 4), 0.05))
    np.testing.assert_allclose(np.asarray((a + b).offsets), 0.15, atol=1e-6)
    np.testing.assert_allclose(np.asarray((a - b).offsets), 0.05, atol=1e-6)
    np.testing.assert_allclose(np.asarray((a * 2.0).offsets), 0.2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.lerp(b, 0.5).offsets), 0.075, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.clamp(0.07, 0.2).offsets[0]), 0.07, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.clamp(0.07, 0.2).offsets[1]), 0.1, atol=1e-6
    )


def test_compose_translations():
    size = (40, 40)
    fa = WarpField.from_homography(_translation(2.0, 0.0), (4, 4), size)
    fb = WarpField.from_homography(_translation(0.0, 3.0), (4, 4), size)
    fc = fa.compose(fb)
    expected = WarpField.from_homography(_translation(2.0, 3.0), (4, 4), size)
    np.testing.assert_allclose(
        np.asarray(fc.offsets), np.asarray(expected.offsets), atol=1e-4
    )


def test_resize_preserves_uniform_field():
    f = WarpField(offsets=jnp.full((2, 4, 4), 0.03))
    g = f.resize((9, 9))
    np.testing.assert_allclose(np.asarray(g.offsets), 0.03, atol=1e-6)


def test_scale_matches_homography_zoom():
    """WarpField.scale (WarpMesh.cpp:370-377): equals the homography zoom
    about the origin evaluated at the control points."""
    size = (40, 60)
    f = WarpField.identity((5, 5)).scale((2.0, 2.0))
    h = Homography.from_similarity(
        jnp.float32(2.0), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)
    )
    want = WarpField.from_homography(h, (5, 5), size)
    np.testing.assert_allclose(
        np.asarray(f.offsets), np.asarray(want.offsets), atol=1e-5
    )


def test_crop_in_maps_span_onto_region(rng):
    """crop_in (WarpMesh.cpp:381-392): warping by the cropped identity field
    samples exactly the normalized region across the output span."""
    f = WarpField.identity((4, 4)).crop_in((0.1, 0.2), (0.5, 0.6))
    # Control point (0,0) samples (0.1, 0.2); control point (1,1) normalized
    # samples tl + region_size.
    smap_like = f.offsets  # normalized offsets at control points
    u0 = np.asarray(smap_like[:, 0, 0])
    np.testing.assert_allclose(u0, [0.1, 0.2], atol=1e-6)
    u1 = np.asarray(smap_like[:, -1, -1]) + 1.0  # u_n + offset at u_n = 1
    np.testing.assert_allclose(u1, [0.6, 0.8], atol=1e-6)


def test_rotate_small_angle_rotates_samples():
    """rotate (WarpMesh.cpp:396-410): the sampling arm about the centre turns
    by the angle in the reference's /size normalization."""
    hm = wm = 5
    f = WarpField.identity((hm, wm)).rotate(90.0)
    o = np.asarray(f.offsets)
    # Centre point must not move.
    np.testing.assert_allclose(o[:, 2, 2], 0.0, atol=1e-6)
    # Point right of centre (arm x = 2/5) rotates to straight down:
    # dx = -arm_x, dy = +arm_x (y' = x sin90 = arm_x).
    np.testing.assert_allclose(o[1, 2, 4], -(2 / 5), atol=1e-6)
    np.testing.assert_allclose(o[0, 2, 4], +(2 / 5), atol=1e-6)


def test_covers_crop_validity():
    """Mesh-warp crop-validity (the general form of the reference's
    BoundingQuad::encloses, BoundingQuad.hpp:27-43)."""
    size = (60, 80)
    ident = WarpField.identity((4, 4))
    assert bool(ident.covers((0.0, 0.0), (1.0, 1.0), size))
    # A +5% pan pushes right-edge samples out of frame: full-frame crop
    # invalid, a 10%-inset crop still valid.
    pan = WarpField(offsets=jnp.stack([jnp.zeros((4, 4)), jnp.full((4, 4), 0.05)]))
    assert not bool(pan.covers((0.0, 0.0), (1.0, 1.0), size))
    assert bool(pan.covers((0.1, 0.1), (0.9, 0.9), size))
    # Local deformation: only one interior control point bulges out of
    # frame; an interior crop away from the bulge stays valid.
    local = WarpField.identity((4, 4))
    local = WarpField(offsets=local.offsets.at[0, 0, 1].set(-0.2))
    assert not bool(local.covers((0.0, 0.0), (1.0, 1.0), size))
    assert bool(local.covers((0.5, 0.5), (0.9, 0.9), size))


def test_quad_encloses():
    """Quad half-plane tests (reference BoundingQuad.cpp:49-83)."""
    from livevisionkit_tpu.models.quad import Quad

    q = Quad.from_rect((10.0, 20.0))  # (h, w)
    assert bool(q.encloses_rect((0.0, 0.0), (20.0, 10.0)))
    assert bool(q.encloses_rect((2.0, 2.0), (18.0, 8.0)))
    assert not bool(q.encloses_rect((2.0, 2.0), (21.0, 8.0)))
    pts = jnp.array([[5.0, 5.0], [25.0, 5.0], [-1.0, 0.0]], jnp.float32)
    got = np.asarray(q.encloses_points(pts))
    assert got.tolist() == [True, False, False]
    # Shrinking homography: the warped quad no longer encloses the frame.
    h = Homography.from_similarity(
        jnp.float32(0.8), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(1.0)
    )
    q2 = Quad.from_rect((10.0, 20.0), h)
    assert not bool(q2.encloses_rect((0.0, 0.0), (20.0, 10.0)))
    assert bool(q2.encloses_quad(Quad.from_rect((4.0, 12.0)).transform(
        Homography.from_similarity(jnp.float32(1.0), jnp.float32(0.0),
                                   jnp.float32(3.0), jnp.float32(2.0)))))
