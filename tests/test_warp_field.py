import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.models.homography import Homography
from livevisionkit_tpu.models.warp_field import WarpField


def _translation(tx, ty):
    return Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(tx), jnp.float32(ty)
    )


def test_identity_field_is_noop(rng):
    img = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
    out = WarpField.identity((4, 4)).apply(img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


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
