import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.ops import resample


def test_corner_aligned_resize_hits_corners():
    x = jnp.array([[0.0, 1.0], [2.0, 3.0]])
    out = resample.resize_corner_aligned(x, (5, 5))
    assert out.shape == (5, 5)
    np.testing.assert_allclose(float(out[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out[0, -1]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(out[-1, 0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(out[-1, -1]), 3.0, atol=1e-6)
    # Bilinear interior: centre = mean of corners.
    np.testing.assert_allclose(float(out[2, 2]), 1.5, atol=1e-6)


def test_corner_aligned_resize_linear_ramp():
    # A linear ramp must stay exactly linear under corner-aligned bilinear.
    x = jnp.linspace(0.0, 1.0, 4)[None, :] * jnp.ones((3, 1))
    out = resample.resize_corner_aligned(x, (3, 10))
    np.testing.assert_allclose(
        np.asarray(out[0]), np.linspace(0, 1, 10), atol=1e-6
    )


def test_pyr_down_shapes_and_dc():
    x = jnp.full((1, 64, 48), 0.5)
    y = resample.pyr_down(x)
    assert y.shape == (1, 32, 24)
    # Blur kernel is normalized: DC preserved.
    np.testing.assert_allclose(np.asarray(y), 0.5, atol=1e-6)
    # Odd sizes round up like cv::pyrDown.
    assert resample.pyr_down(jnp.zeros((1, 7, 9))).shape == (1, 4, 5)


def test_scharr_on_ramp():
    # f(x, y) = 2x + 3y -> dx = 2, dy = 3 (interior).
    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = jnp.asarray(2 * xx + 3 * yy)
    dx, dy = resample.scharr_gradients(img)
    np.testing.assert_allclose(np.asarray(dx[4:-4, 4:-4]), 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy[4:-4, 4:-4]), 3.0, atol=1e-4)


def test_median_blur_matches_numpy(rng):
    x = rng.uniform(size=(9, 11)).astype(np.float32)
    out = np.asarray(resample.median_blur(jnp.asarray(x), 3))
    padded = np.pad(x, 1, mode="reflect")
    expected = np.empty_like(x)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            expected[i, j] = np.median(padded[i : i + 3, j : j + 3])
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_avg_pool():
    x = jnp.arange(16.0).reshape(4, 4)
    out = resample.avg_pool(x, 2)
    np.testing.assert_allclose(np.asarray(out), [[2.5, 4.5], [10.5, 12.5]])


def test_median_select_network_exact(rng):
    """The pruned Batcher selection network is exactly the median (the
    deblocker's cv::medianBlur parity depends on it)."""
    from livevisionkit_tpu.ops.resample import median_select

    for n in (3, 5, 9, 25):
        x = rng.standard_normal((n, 11, 13)).astype(np.float32)
        got = np.asarray(median_select(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.median(x, axis=0).astype(np.float32))


def test_median_blur_matches_jnp_median(rng):
    from livevisionkit_tpu.ops import resample as rs

    img = jnp.asarray(rng.uniform(size=(2, 18, 22)).astype(np.float32))
    got = np.asarray(rs.median_blur(img, 5))
    # Reference formulation: full sort over the 25 shifted planes.
    r = 2
    x = jnp.pad(img, ((0, 0), (r, r), (r, r)), mode="reflect")
    stacks = jnp.stack(
        [x[:, dy : dy + 18, dx : dx + 22] for dy in range(5) for dx in range(5)]
    )
    want = np.asarray(jnp.median(stacks, axis=0))
    np.testing.assert_array_equal(got, want)
