"""Native host library vs numpy fallbacks."""

import numpy as np
import pytest

from livevisionkit_tpu.runtime import native_host


def test_native_lib_builds():
    lib = native_host.get_lib()
    assert lib is not None, "native build failed (g++ available in CI image)"


def test_yuy2_native_matches_numpy(rng):
    packed = rng.integers(0, 255, size=(48, 64, 2)).astype(np.uint8)
    y, u, v = native_host.unpack_yuy2(packed)
    np.testing.assert_array_equal(y, packed[:, :, 0])
    np.testing.assert_array_equal(u, packed[:, 0::2, 1])
    np.testing.assert_array_equal(v, packed[:, 1::2, 1])


def test_uyvy_native_matches_numpy(rng):
    packed = rng.integers(0, 255, size=(32, 48, 2)).astype(np.uint8)
    y, u, v = native_host.unpack_uyvy(packed)
    np.testing.assert_array_equal(y, packed[:, :, 1])
    np.testing.assert_array_equal(u, packed[:, 0::2, 0])
    np.testing.assert_array_equal(v, packed[:, 1::2, 0])


def test_nv12_split(rng):
    uv = rng.integers(0, 255, size=(24, 32, 2)).astype(np.uint8)
    u, v = native_host.split_nv12(uv)
    np.testing.assert_array_equal(u, uv[..., 0])
    np.testing.assert_array_equal(v, uv[..., 1])


def test_pack_unpack_inverse(rng):
    """Egress packers invert the ingest unpackers exactly (bytes)."""
    h, w = 32, 48
    y = rng.integers(0, 255, size=(h, w)).astype(np.uint8)
    u = rng.integers(0, 255, size=(h, w // 2)).astype(np.uint8)
    v = rng.integers(0, 255, size=(h, w // 2)).astype(np.uint8)
    for pack, unpack in (
        (native_host.pack_yuy2, native_host.unpack_yuy2),
        (native_host.pack_uyvy, native_host.unpack_uyvy),
    ):
        packed = pack(y, u, v)
        y2, u2, v2 = unpack(packed)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(u2, u)
        np.testing.assert_array_equal(v2, v)
    cu = rng.integers(0, 255, size=(h // 2, w // 2)).astype(np.uint8)
    cv = rng.integers(0, 255, size=(h // 2, w // 2)).astype(np.uint8)
    uv = native_host.interleave_nv12(cu, cv)
    bu, bv = native_host.split_nv12(uv)
    np.testing.assert_array_equal(bu, cu)
    np.testing.assert_array_equal(bv, cv)


def test_planar_f32_to_hwc(rng):
    x = rng.uniform(-0.1, 1.1, size=(3, 20, 30)).astype(np.float32)
    out = native_host.planar_f32_to_hwc_u8(x)
    ref = (np.clip(x, 0, 1).transpose(1, 2, 0) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_frame_ring(rng):
    ring = native_host.FrameRing(capacity=3, frame_bytes=24)
    frames = [rng.integers(0, 255, size=24).astype(np.uint8) for _ in range(5)]
    assert ring.pop() is None
    assert ring.push(frames[0])
    assert ring.push(frames[1])
    assert ring.push(frames[2])
    assert not ring.push(frames[3])  # full
    np.testing.assert_array_equal(ring.pop(), frames[0])
    assert ring.push(frames[3])
    for i in (1, 2, 3):
        np.testing.assert_array_equal(ring.pop(), frames[i])
    assert len(ring) == 0


def test_frame_ring_threaded(rng):
    import threading

    ring = native_host.FrameRing(capacity=8, frame_bytes=128)
    n = 500
    frames = rng.integers(0, 255, size=(n, 128)).astype(np.uint8)
    got = []

    def producer():
        for f in frames:
            while not ring.push(f):
                pass

    t = threading.Thread(target=producer)
    t.start()
    while len(got) < n:
        f = ring.pop()
        if f is not None:
            got.append(f)
    t.join()
    np.testing.assert_array_equal(np.stack(got), frames)
