import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.models.homography import Homography


def test_identity_transform(rng):
    pts = jnp.asarray(rng.uniform(size=(10, 2), high=100).astype(np.float32))
    out = Homography.identity().transform(pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_from_quad_exact(rng):
    src = jnp.asarray(
        np.array([[0, 0], [100, 0], [0, 100], [100, 100]], np.float32)
    )
    dst = src + jnp.asarray(rng.uniform(-10, 10, size=(4, 2)).astype(np.float32))
    h = Homography.from_quad(src, dst)
    np.testing.assert_allclose(np.asarray(h.transform(src)), np.asarray(dst), atol=1e-3)


def test_compose_and_inverse(rng):
    a = Homography.from_similarity(
        jnp.float32(1.1), jnp.float32(0.1), jnp.float32(3.0), jnp.float32(-2.0)
    )
    b = Homography.from_similarity(
        jnp.float32(0.9), jnp.float32(-0.05), jnp.float32(-1.0), jnp.float32(4.0)
    )
    pts = jnp.asarray(rng.uniform(size=(7, 2), high=50).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray((a @ b).transform(pts)),
        np.asarray(a.transform(b.transform(pts))),
        atol=1e-3,
    )
    round_trip = (a @ a.inverse()).normalized()
    np.testing.assert_allclose(np.asarray(round_trip.m), np.eye(3), atol=1e-5)


def test_warp_translation_moves_content():
    # H = translate by (+3, +2) in (x, y): warpPerspective moves content +3 px
    # right, +2 px down.
    img = jnp.zeros((16, 16)).at[5, 7].set(1.0)
    h = Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(3.0), jnp.float32(2.0)
    )
    out = np.asarray(h.warp(img))
    assert out[7, 10] == np.max(out)
    np.testing.assert_allclose(out[7, 10], 1.0, atol=1e-5)


def test_warp_fill_value():
    img = jnp.ones((8, 8))
    h = Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(6.0), jnp.float32(0.0)
    )
    out = np.asarray(h.warp(img, fill=0.0))
    # Left 6 columns sample outside the source -> filled with 0.
    np.testing.assert_allclose(out[:, :5], 0.0)
    np.testing.assert_allclose(out[:, 6:], 1.0)
