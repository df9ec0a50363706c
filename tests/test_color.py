import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.ops import color
from livevisionkit_tpu.types import PixelFormat


def _rand_img(rng, c=3, h=8, w=16):
    return jnp.asarray(rng.uniform(size=(c, h, w)).astype(np.float32))


def test_rgb_yuv_round_trip(rng):
    x = _rand_img(rng)
    y = color.convert(x, PixelFormat.RGB, PixelFormat.YUV)
    back = color.convert(y, PixelFormat.YUV, PixelFormat.RGB)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_yuv_matches_opencv_constants():
    # Pure red (1, 0, 0): Y = 0.299, U = 0.492*(0-Y)+0.5, V = 0.877*(1-Y)+0.5
    red = jnp.zeros((3, 2, 2)).at[0].set(1.0)
    yuv = color.convert(red, PixelFormat.RGB, PixelFormat.YUV)
    np.testing.assert_allclose(float(yuv[0, 0, 0]), 0.299, atol=1e-6)
    np.testing.assert_allclose(float(yuv[1, 0, 0]), 0.492 * (0 - 0.299) + 0.5, atol=1e-6)
    np.testing.assert_allclose(float(yuv[2, 0, 0]), 0.877 * (1 - 0.299) + 0.5, atol=1e-6)


def test_bgr_is_flipped_rgb(rng):
    x = _rand_img(rng)
    a = color.convert(x, PixelFormat.RGB, PixelFormat.YUV)
    b = color.convert(x[::-1], PixelFormat.BGR, PixelFormat.YUV)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gray_to_yuv_mid_chroma():
    g = jnp.full((1, 4, 4), 0.25)
    yuv = color.convert(g, PixelFormat.GRAY, PixelFormat.YUV)
    assert yuv.shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(yuv[0]), 0.25)
    np.testing.assert_allclose(np.asarray(yuv[1:]), 0.5)


def test_luma_gray_round_trip(rng):
    x = _rand_img(rng)
    g = color.convert(x, PixelFormat.RGB, PixelFormat.GRAY)
    direct = color.luma(x, PixelFormat.RGB)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(direct), atol=1e-6)


def test_conversion_filter_channel_extraction(rng):
    """ConversionFilter's output_channels / channel-extraction option
    (reference ConversionFilter.hpp:29-33): convert then keep one plane."""
    from livevisionkit_tpu.data.frame import Frame
    from livevisionkit_tpu.filters.base import ConversionFilter, FrameSpec

    x = _rand_img(rng)
    frame = Frame.create(x, fmt=PixelFormat.RGB)
    filt = ConversionFilter(PixelFormat.YUV, extract_channel=0)
    _, out = filt.step((), frame)
    assert out.pixels.shape == (1, x.shape[1], x.shape[2])
    assert out.format is PixelFormat.GRAY
    want = color.convert(x, PixelFormat.RGB, PixelFormat.YUV)[0]
    np.testing.assert_allclose(np.asarray(out.pixels[0]), np.asarray(want), atol=1e-6)
    spec = filt.output_spec(FrameSpec(x.shape[1], x.shape[2], 3, PixelFormat.RGB))
    assert (spec.channels, spec.format) == (1, PixelFormat.GRAY)
    # Out-of-range extraction is a configuration error.
    try:
        ConversionFilter(PixelFormat.YUV, extract_channel=5).step((), frame)
        assert False
    except ValueError:
        pass
