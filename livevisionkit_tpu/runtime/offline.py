"""Offline (batch) clip processing: the whole loop on device via lax.scan.

Live streaming (runtime/stream.py) optimizes per-frame latency; offline
editing wants throughput.  Here the entire clip (or a chunk of it) is
processed as ONE device program — `lax.scan` over the per-frame step with
the filter state as carry — so there is zero host round-trip per frame.
This is also the measurement harness bench.py uses: scan-length differencing
isolates true per-frame device time from dispatch/readback latency.

The reference has no equivalent (its throughput mode is the same 3-thread
pipeline); this is a TPU-native addition enabled by the functional step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.filters.base import FrameSpec, VideoFilter
from livevisionkit_tpu.types import PixelFormat


def process_clip(
    filt: VideoFilter,
    pixels: jax.Array,  # (T, C, H, W) float planes
    fmt: PixelFormat,
    timestamps: jax.Array | None = None,
    state: Any | None = None,
) -> tuple[Any, Frame]:
    """Run `filt` over a whole clip on device.

    Returns (final_state, outputs) where outputs is a Frame pytree with a
    leading T axis (pixels (T, C, H', W'), valid (T,), timestamp (T,)).
    Invalid entries (warm-up delay) are flagged, not removed — filter the
    batch on the host with `outputs.valid`.
    """
    t_frames, c, h, w = pixels.shape
    if timestamps is None:
        timestamps = jnp.arange(t_frames, dtype=jnp.float32) / 30.0
    if state is None:
        state = filt.init(FrameSpec(height=h, width=w, channels=c, format=fmt))

    def body(carry, xs):
        px, ts = xs
        frame = Frame.create(px, timestamp=ts, fmt=fmt)
        carry, out = filt.step(carry, frame)
        return carry, out

    return jax.lax.scan(body, state, (pixels, timestamps))
