"""Stage-level decomposition of the S=8 1080p serving step (vmap_1chip).

The EASU-parity serving gap (r5): full step 19.9 ms (easu) vs the 16.67 ms
60-fps budget.  The warp itself is profiled by profile_easu_serving.py; this
tool measures the REST of the vmapped step so optimization effort lands on
the real costs.

Usage: python tools/profile_serving_stages.py [S]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import scan_time


def main():
    from livevisionkit_tpu.utils import compile_cache

    compile_cache.enable_default()

    import livevisionkit_tpu as lvk
    from __graft_entry__ import _flagship_filter
    from livevisionkit_tpu.vision import frame_tracker

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w = 1080, 1920
    print(f"backend: {jax.default_backend()}  S={S} {h}x{w}", flush=True)

    rng = np.random.default_rng(0)
    pix = rng.uniform(0.1, 0.9, size=(3, h, w)).astype(np.float32)
    batch = jnp.asarray(np.stack([pix * (1.0 + 0.01 * i) for i in range(S)]))
    spec = lvk.FrameSpec(height=h, width=w, channels=3,
                         format=lvk.PixelFormat.YUV)

    for wf in ("easu", "bilinear"):
        filt = _flagship_filter(warp_filter=wf)
        state = jax.vmap(lambda _: filt.init(spec))(jnp.arange(S))

        def body(st, t):
            frames = lvk.Frame.create(
                batch + 1e-9 * t,
                timestamp=jnp.broadcast_to(
                    t.astype(jnp.float32) / 60.0, (S,)
                ),
                fmt=lvk.PixelFormat.YUV,
            )
            frames = frames.replace(valid=jnp.ones((S,), jnp.bool_))
            st, out = jax.vmap(filt.step)(st, frames)
            return st, jnp.sum(out.pixels[..., ::128, ::128])

        ms = scan_time(body, state, stat="median")
        print(f"full step ({wf:8s}): {ms:7.3f} ms", flush=True)

    filt = _flagship_filter()
    s = filt.settings
    tstate = jax.vmap(lambda _: frame_tracker.init(s.tracker))(jnp.arange(S))

    def track_body(st, t):
        st, res = jax.vmap(
            lambda a, b: frame_tracker.track(a, b, s.tracker)
        )(st, batch[:, 0] + 1e-9 * t)
        return st, res.stability

    ms = scan_time(track_body, tstate, stat="median")
    print(f"tracker.track (S={S}): {ms:7.3f} ms", flush=True)

    # Delay-queue quantize -> push -> oldest -> dequantize round trip.
    from livevisionkit_tpu.data.stream_buffer import StreamBuffer
    from livevisionkit_tpu.filters import stabilization as stab

    def mk_frame(p):
        return lvk.Frame.create(p, timestamp=0.0, fmt=lvk.PixelFormat.YUV)

    frames0 = jax.vmap(mk_frame)(batch)
    template = jax.vmap(
        lambda f: f.replace(pixels=f.pixels.astype(jnp.uint8))
    )(frames0)
    queue = jax.vmap(
        lambda tf: StreamBuffer.create(tf, s.smoother.predictive_samples + 1),
        in_axes=0,
    )(template)

    def queue_body(q, t):
        fr = jax.vmap(mk_frame)(batch + 1e-9 * t)
        q = jax.vmap(lambda qq, ff: qq.push(stab._quantize_u8(ff)))(q, fr)
        old = jax.vmap(lambda qq: stab._dequantize_u8(qq.oldest()))(q)
        return q, jnp.sum(old.pixels[..., ::128, ::128])

    ms = scan_time(queue_body, queue, stat="median")
    print(f"queue quant/push/deq : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
