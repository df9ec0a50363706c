"""Alpha-plane ingest + end-to-end carry (FrameIngest alpha-format parity).

Reference: FrameIngest::Select routes I40A/I42A/YUVA (planar + alpha), AYUV
(packed 4:4:4) and RGBA/BGRX/BGRA (direct) — FrameIngest.cpp:38-77.  The
reference drops alpha during processing and restores an opaque plane on
download; here alpha rides Frame.alpha end to end, including through the
stabilizer's warp.
"""

import pytest
import numpy as np

import fixtures
import livevisionkit_tpu as lvk
from livevisionkit_tpu.runtime import ingest


def _alpha_plane(rng, h, w):
    return rng.integers(0, 255, size=(h, w)).astype(np.uint8)


def test_i40a_upload_carries_alpha(rng):
    h, w = 48, 64
    y = rng.integers(0, 255, size=(h, w)).astype(np.uint8)
    u = rng.integers(0, 255, size=(h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 255, size=(h // 2, w // 2)).astype(np.uint8)
    a = _alpha_plane(rng, h, w)
    f = ingest.upload_i40a(y, u, v, a)
    assert f.alpha is not None and f.alpha.shape == (h, w)
    np.testing.assert_allclose(
        np.asarray(f.alpha), a.astype(np.float32) / 255.0, atol=1e-6
    )
    # Colour planes identical to the alpha-less ingest.
    g = ingest.upload_i420(y, u, v)
    np.testing.assert_array_equal(np.asarray(f.pixels), np.asarray(g.pixels))
    # Round trip: alpha comes back exactly, and an alpha-less frame
    # downloads as opaque (reference fill_plane(255)).
    y2, u2, v2, a2 = ingest.download_i40a(f)
    np.testing.assert_array_equal(a2, a)
    assert (ingest.download_i40a(g)[3] == 255).all()


def test_ayuv_round_trip(rng):
    h, w = 32, 40
    packed = rng.integers(0, 255, size=(h, w, 4)).astype(np.uint8)
    f = ingest.upload_ayuv(packed)
    assert f.format is lvk.PixelFormat.YUV
    # Byte order [A Y U V]: channel 1 is luma (P444Ingest mixChannels
    # {1,0, 2,1, 3,2}, FrameIngest.cpp:686).
    np.testing.assert_allclose(
        np.asarray(f.pixels[0]), packed[:, :, 1].astype(np.float32) / 255, atol=1e-6
    )
    np.testing.assert_array_equal(ingest.download_ayuv(f), packed)


def test_rgba_bgra_bgrx(rng):
    h, w = 24, 32
    packed = rng.integers(0, 255, size=(h, w, 4)).astype(np.uint8)
    f = ingest.upload_rgba(packed)
    assert f.format is lvk.PixelFormat.RGB and f.alpha is not None
    np.testing.assert_allclose(
        np.asarray(f.pixels[2]), packed[:, :, 2].astype(np.float32) / 255, atol=1e-6
    )
    np.testing.assert_array_equal(ingest.download_rgba(f), packed)

    b = ingest.upload_bgra(packed)
    assert b.format is lvk.PixelFormat.BGR and b.alpha is not None

    x = ingest.upload_bgrx(packed)
    assert x.format is lvk.PixelFormat.BGR and x.alpha is None
    # Alpha-less download is opaque.
    assert (ingest.download_rgba(x)[:, :, 3] == 255).all()


def test_reformat_and_extraction_preserve_alpha(rng):
    h, w = 20, 28
    packed = rng.integers(0, 255, size=(h, w, 4)).astype(np.uint8)
    f = ingest.upload_rgba(packed)
    g = f.reformat(lvk.PixelFormat.YUV)
    np.testing.assert_array_equal(np.asarray(g.alpha), np.asarray(f.alpha))


@pytest.mark.slow
def test_scaling_resamples_alpha(rng):
    from livevisionkit_tpu.config import ScalingFilterSettings
    from livevisionkit_tpu.filters.scaling import ScalingFilter

    h, w = 32, 48
    packed = rng.integers(0, 255, size=(h, w, 4)).astype(np.uint8)
    f = ingest.upload_rgba(packed)
    filt = ScalingFilter(settings=ScalingFilterSettings(output_size=(2 * h, 2 * w)))
    _, out = filt.step(filt.init(lvk.FrameSpec.of(f)), f)
    assert out.pixels.shape[-2:] == (2 * h, 2 * w)
    assert out.alpha is not None and out.alpha.shape == (2 * h, 2 * w)
    # Constant-alpha regions survive the resample exactly.
    opaque = ingest.upload_rgba(
        np.dstack([packed[:, :, :3], np.full((h, w), 255, np.uint8)])
    )
    _, out2 = filt.step(filt.init(lvk.FrameSpec.of(opaque)), opaque)
    np.testing.assert_allclose(np.asarray(out2.alpha), 1.0, atol=1e-6)


@pytest.mark.slow
def test_stabilizer_warps_alpha_with_pixels(rng):
    """Alpha must ride the same corrective warp as the colour planes: feed a
    stream whose luma plane equals its alpha plane and check they remain
    equal after stabilization (same gather, same fill)."""
    import jax.numpy as jnp

    from livevisionkit_tpu import presets
    from livevisionkit_tpu.filters.stabilization import StabilizationFilter

    h, w = 96, 128
    filt = StabilizationFilter(
        settings=presets.stabilization_preset(model="homography")
    )
    tex = np.asarray(fixtures.make_texture(h, w, rng))
    spec = lvk.FrameSpec(height=h, width=w, channels=3,
                         format=lvk.PixelFormat.YUV, has_alpha=True)
    state = filt.init(spec)
    out = None
    for t in range(filt.delay + 3):
        shift = np.roll(tex, t % 3, axis=1)  # jitter to stabilize away
        pix = jnp.stack([jnp.asarray(shift)] * 3)
        fr = lvk.Frame.create(
            pix, timestamp=t / 30.0, fmt=lvk.PixelFormat.YUV,
            alpha=jnp.asarray(shift),
        )
        state, out = filt.step(state, fr)
    assert bool(out.valid)
    np.testing.assert_allclose(
        np.asarray(out.alpha), np.asarray(out.pixels[0]), atol=1e-5
    )
