"""Pixel-format ingest round trips (FrameIngest parity)."""

import numpy as np

import fixtures
from livevisionkit_tpu.runtime import ingest


def _yuv_planes(rng, h=48, w=64):
    y = (np.asarray(fixtures.make_texture(h, w, rng)) * 255).astype(np.uint8)
    # Smooth chroma (real chroma is low-frequency; bilinear resampling of
    # noise would legitimately deviate).
    gy, gx = np.mgrid[0 : h // 2, 0 : w // 2]
    u = (128 + 60 * np.sin(gx / 5.0)).astype(np.uint8)
    v = (128 + 60 * np.cos(gy / 4.0)).astype(np.uint8)
    return y, u, v


def test_i420_upload(rng):
    y, u, v = _yuv_planes(rng)
    f = ingest.upload_i420(y, u, v)
    assert f.pixels.shape == (3, 48, 64)
    np.testing.assert_allclose(
        np.asarray(f.pixels[0]), y.astype(np.float32) / 255.0, atol=1e-6
    )
    # Chroma upsampled: block means should be close to the source values.
    up = np.asarray(f.pixels[1])
    block = up.reshape(24, 2, 32, 2).mean((1, 3)) * 255.0
    assert np.abs(block[2:-2, 2:-2] - u[2:-2, 2:-2]).max() < 8

def test_nv12_matches_i420(rng):
    y, u, v = _yuv_planes(rng)
    uv = np.stack([u, v], axis=-1)
    a = ingest.upload_i420(y, u, v)
    b = ingest.upload_nv12(y, uv)
    np.testing.assert_allclose(np.asarray(a.pixels), np.asarray(b.pixels))


def test_yuy2_and_uyvy(rng):
    h, w = 32, 48
    y = rng.integers(0, 255, size=(h, w)).astype(np.uint8)
    u = rng.integers(0, 255, size=(h, w // 2)).astype(np.uint8)
    v = rng.integers(0, 255, size=(h, w // 2)).astype(np.uint8)
    yuy2 = np.zeros((h, w, 2), np.uint8)
    yuy2[:, :, 0] = y
    yuy2[:, 0::2, 1] = u
    yuy2[:, 1::2, 1] = v
    f = ingest.upload_yuy2(yuy2)
    np.testing.assert_allclose(
        np.asarray(f.pixels[0]), y.astype(np.float32) / 255.0, atol=1e-6
    )
    uyvy = np.zeros((h, w, 2), np.uint8)
    uyvy[:, :, 1] = y
    uyvy[:, 0::2, 0] = u
    uyvy[:, 1::2, 0] = v
    g = ingest.upload_uyvy(uyvy)
    np.testing.assert_allclose(np.asarray(f.pixels), np.asarray(g.pixels))


def test_i420_round_trip(rng):
    y, u, v = _yuv_planes(rng)
    f = ingest.upload_i420(y, u, v)
    y2, u2, v2 = ingest.download_i420(f)
    np.testing.assert_array_equal(y2, y)
    assert u2.shape == u.shape and v2.shape == v.shape
    # Up/down-sampling round trip keeps chroma close (interior).
    assert np.abs(u2[2:-2, 2:-2].astype(int) - u[2:-2, 2:-2].astype(int)).mean() < 12


def test_nv12_round_trip(rng):
    """Ingest -> egress round trip for the semi-planar format the reference
    writes back in NV12Ingest's download half (FrameIngest.cpp:145-217)."""
    y, u, v = _yuv_planes(rng)
    f = ingest.upload_nv12(y, np.stack([u, v], axis=-1))
    y2, uv2 = ingest.download_nv12(f)
    np.testing.assert_array_equal(y2, y)
    assert uv2.shape == (24, 32, 2)
    assert np.abs(
        uv2[2:-2, 2:-2, 0].astype(int) - u[2:-2, 2:-2].astype(int)
    ).mean() < 12
    assert np.abs(
        uv2[2:-2, 2:-2, 1].astype(int) - v[2:-2, 2:-2].astype(int)
    ).mean() < 12


def test_yuy2_uyvy_round_trip(rng):
    """Packed 4:2:2 egress (reference P422Ingest download half).  Luma is
    exact; smooth chroma round-trips through the half-width resample within
    a couple of LSB on the interior."""
    h, w = 48, 64
    y = (np.asarray(fixtures.make_texture(h, w, rng)) * 255).astype(np.uint8)
    gy, gx = np.mgrid[0:h, 0 : w // 2]
    u = (128 + 60 * np.sin(gx / 5.0)).astype(np.uint8)
    v = (128 + 60 * np.cos(gy / 4.0)).astype(np.uint8)
    yuy2 = np.zeros((h, w, 2), np.uint8)
    yuy2[:, :, 0] = y
    yuy2[:, 0::2, 1] = u
    yuy2[:, 1::2, 1] = v
    f = ingest.upload_yuy2(yuy2)
    back = ingest.download_yuy2(f)
    assert back.shape == yuy2.shape
    np.testing.assert_array_equal(back[:, :, 0], y)
    d = back[:, :, 1].astype(int) - yuy2[:, :, 1].astype(int)
    assert np.abs(d[2:-2, 4:-4]).mean() < 3, np.abs(d).mean()

    g = ingest.upload_uyvy(ingest.download_uyvy(f))
    # YUY2 and UYVY egress carry identical samples, only byte order differs.
    np.testing.assert_allclose(
        np.asarray(g.pixels[0]), np.asarray(f.pixels[0]), atol=1.0 / 255.0
    )


def test_gray_and_bgr(rng):
    g = (np.asarray(fixtures.make_texture(20, 30, rng)) * 255).astype(np.uint8)
    f = ingest.upload_gray(g)
    assert f.pixels.shape == (1, 20, 30)
    bgr = rng.integers(0, 255, size=(20, 30, 3)).astype(np.uint8)
    fb = ingest.upload_bgr(bgr)
    assert fb.pixels.shape == (3, 20, 30)
    np.testing.assert_allclose(
        np.asarray(fb.pixels[2]), bgr[:, :, 2].astype(np.float32) / 255, atol=1e-6
    )
