"""Pixel-format ingest codecs: host video formats -> device YUV planes.

Reference parity: the OBS plugin's FrameIngest subsystem (reference
Modules/OBS-Plugin/Interop/FrameIngest.cpp): one codec per pixel-format
family chosen by `Select` (:38-77) — planar I420/I422/I444 (`I4XXIngest`),
semi-planar NV12 (`NV12Ingest`), packed YUY2/UYVY (`P422Ingest`), and direct
Y800/BGR/RGBA (`DirectIngest`) — uploading planes in bulk, upsampling chroma
to full resolution, and merging to the packed working format
(upload_planes/split/merge, FrameIngest.cpp:145-217+).

TPU-native: the host only reshapes/strides the encoded bytes (numpy views);
every pixel transform (normalization, chroma up/down-sampling, plane merge)
runs on device in one fused jitted program per format — the `device_put` is
the single upload the reference achieves with its chain-start detection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.ops import resample
from livevisionkit_tpu.types import PixelFormat


@functools.partial(jax.jit, static_argnames=("size",))
def _merge_yuv(y: jax.Array, u: jax.Array, v: jax.Array, size) -> jax.Array:
    """Upsample chroma planes to `size` and stack (3, H, W) float [0,1]."""
    h, w = size
    y = y.astype(jnp.float32) * (1.0 / 255.0)
    planes = [y]
    for c in (u, v):
        c = c.astype(jnp.float32) * (1.0 / 255.0)
        if c.shape != (h, w):
            c = resample.resize(c, (h, w), antialias=False)
        planes.append(c)
    return jnp.stack(planes)


def upload_i420(y: np.ndarray, u: np.ndarray, v: np.ndarray, ts=0.0) -> Frame:
    """Planar 4:2:0 (also covers I422/I444: pass the planes as-is)."""
    h, w = y.shape
    return Frame.create(
        _merge_yuv(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), (h, w)),
        timestamp=ts,
        fmt=PixelFormat.YUV,
    )


def upload_nv12(y: np.ndarray, uv: np.ndarray, ts=0.0) -> Frame:
    """Semi-planar 4:2:0: uv is (H/2, W/2, 2) interleaved (or (H/2, W))."""
    from livevisionkit_tpu.runtime import native_host

    if uv.ndim == 2:
        uv = uv.reshape(uv.shape[0], uv.shape[1] // 2, 2)
    h, w = y.shape
    u, v = native_host.split_nv12(uv)
    return Frame.create(
        _merge_yuv(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), (h, w)),
        timestamp=ts,
        fmt=PixelFormat.YUV,
    )


def upload_yuy2(packed: np.ndarray, ts=0.0) -> Frame:
    """Packed 4:2:2 YUYV: (H, W, 2) uint8 [Y0 U Y1 V ...] or (H, 2W)."""
    from livevisionkit_tpu.runtime import native_host

    if packed.ndim == 2:
        packed = packed.reshape(packed.shape[0], packed.shape[1] // 2, 2)
    y, u, v = native_host.unpack_yuy2(packed)
    h, w = y.shape
    return Frame.create(
        _merge_yuv(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), (h, w)),
        timestamp=ts,
        fmt=PixelFormat.YUV,
    )


def upload_uyvy(packed: np.ndarray, ts=0.0) -> Frame:
    """Packed 4:2:2 UYVY."""
    from livevisionkit_tpu.runtime import native_host

    if packed.ndim == 2:
        packed = packed.reshape(packed.shape[0], packed.shape[1] // 2, 2)
    y, u, v = native_host.unpack_uyvy(packed)
    h, w = y.shape
    return Frame.create(
        _merge_yuv(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), (h, w)),
        timestamp=ts,
        fmt=PixelFormat.YUV,
    )


def upload_gray(y: np.ndarray, ts=0.0) -> Frame:
    return Frame.create(
        jnp.asarray(y).astype(jnp.float32)[None] * (1.0 / 255.0),
        timestamp=ts,
        fmt=PixelFormat.GRAY,
    )


def upload_bgr(hwc: np.ndarray, ts=0.0) -> Frame:
    x = jnp.asarray(hwc).astype(jnp.float32).transpose(2, 0, 1) * (1.0 / 255.0)
    return Frame.create(x, timestamp=ts, fmt=PixelFormat.BGR)


@jax.jit
def _split_420(pixels: jax.Array):
    h, w = pixels.shape[-2:]
    y = jnp.clip(pixels[0] * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    u = resample.resize(pixels[1], (h // 2, w // 2), antialias=True)
    v = resample.resize(pixels[2], (h // 2, w // 2), antialias=True)
    u = jnp.clip(u * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    v = jnp.clip(v * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return y, u, v


def download_i420(frame: Frame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Device YUV frame -> host I420 planes (chroma subsampled on device),
    the reverse of the ingest (FrameIngest.cpp download path)."""
    assert frame.format is PixelFormat.YUV, "download_i420 needs a YUV frame"
    y, u, v = _split_420(frame.pixels)
    return np.asarray(y), np.asarray(u), np.asarray(v)
