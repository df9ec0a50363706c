"""Headline benchmark: 1080p60-class stabilization latency per frame per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): < 8 ms/frame/chip at 1080p.
vs_baseline = 8.0 / measured_ms  (>1 means better than target).

Runs on whatever the default JAX backend is (the real TPU chip under the
driver). The state carry is donated so the frame delay queue updates in
place instead of copying ~270 MB per step.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import livevisionkit_tpu as lvk
    from __graft_entry__ import _flagship_filter

    filt = _flagship_filter()
    spec = lvk.FrameSpec(
        height=1080, width=1920, channels=3, format=lvk.PixelFormat.YUV
    )
    state = filt.init(spec)

    # A small ring of realistic-entropy frames, resident on device.
    rng = np.random.default_rng(0)
    n_input = 8
    base = rng.uniform(0.1, 0.9, size=(1, 1, 1080, 1920)).astype(np.float32)
    drift = np.cumsum(rng.uniform(-2, 2, size=(n_input, 2)), axis=0)
    clips = []
    for t in range(n_input):
        shifted = np.roll(
            np.roll(base[0], int(drift[t, 0]), axis=-2), int(drift[t, 1]), axis=-1
        )
        clips.append(np.broadcast_to(shifted, (3, 1080, 1920)))
    frames_np = np.stack(clips)
    frames_dev = jax.device_put(jnp.asarray(frames_np))

    step = jax.jit(filt.step, donate_argnums=0)

    def make_frame(t):
        return lvk.Frame.create(
            frames_dev[t % n_input],
            timestamp=jnp.float32(t / 60.0),
            fmt=lvk.PixelFormat.YUV,
        )

    # Warm-up: compile + fill the delay queue.
    for t in range(14):
        state, out = step(state, make_frame(t))
    jax.block_until_ready(out.pixels)

    # Steady-state timing.
    iters = 60
    t0 = time.perf_counter()
    for t in range(iters):
        state, out = step(state, make_frame(t))
    jax.block_until_ready(out.pixels)
    dt = time.perf_counter() - t0

    ms = dt / iters * 1000.0
    print(
        json.dumps(
            {
                "metric": "1080p_stabilization_latency",
                "value": round(ms, 3),
                "unit": "ms/frame/chip",
                "vs_baseline": round(8.0 / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
