"""Isolate the S=8 1080p corrective-warp cost by filter mode.

The serving gap (BENCH_SCALING): EASU-parity step 19.9 ms vs bilinear
16.5 ms at S=8/1080p.  This measures the warp alone, u8 frames (the
delay-queue dtype), via scan differencing:

  * batched bilinear (pallas_remap_batched)
  * sequential solo EASU (the current custom_vmap fallback: lax.map)
  * batched EASU kernel (once it exists)

Usage: python tools/profile_easu_serving.py [S ...]
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
from profile_warp_batched import make_inputs


def make_inputs_realistic(S, h=1080, w=1920, c=3):
    """Correction-scale warps: the stabilizer's residual corrections are
    sub-degree rotations + few-px translations (the big shifts are removed
    by the mean-shift machinery), so shift-select trip counts are small.
    The default make_inputs poses (up to 0.016 rad) overstate serving-shape
    trip counts ~4x."""
    from livevisionkit_tpu.models.homography import Homography

    rng = np.random.default_rng(0)
    src = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(S, c, h, w)).astype(np.float32)
    )
    smaps = []
    for s in range(S):
        pose = Homography.from_similarity(
            jnp.float32(1.0 + 0.0005 * (s % 3)),
            jnp.float32(0.001 * (s - S / 2)),
            jnp.float32(30.0 * (s - S / 2)),  # translation: mean-shifted away
            jnp.float32(-20.0 * s),
        )
        smaps.append(pose.sample_map((h, w)))
    return src, jnp.stack(smaps)


def main():
    from livevisionkit_tpu.ops.tpu_kernels import warp as pwarp
    from livevisionkit_tpu.types import PixelFormat

    print(f"backend: {jax.default_backend()}")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    realistic = "--realistic" in sys.argv[1:]
    sizes = [int(a) for a in args] or [8]

    ablate_only = "--ablate-only" in sys.argv

    for S in sizes:
        src_f, smaps = (
            make_inputs_realistic(S) if realistic else make_inputs(S)
        )
        src = jnp.clip(src_f * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

        if ablate_only:
            def make_body(ablate):
                def body_easu_b(carry, t):
                    out = pwarp.pallas_remap_batched(
                        src, smaps + 1e-6 * t, filter_mode="easu",
                        fmt=PixelFormat.YUV, _ablate=ablate,
                    )
                    return carry, jnp.sum(
                        out[:, :, ::256, ::256].astype(jnp.int32)
                    )
                return body_easu_b

            for ab in (
                (), ("weights",), ("chroma_h",), ("luma_h",),
                ("luma_h", "chroma_h"), ("vert",),
                ("vert", "luma_h", "chroma_h", "weights"),
            ):
                ms = scan_time(make_body(ab), jnp.float32(0), stat="median")
                print(
                    f"S={S} easu batched -{','.join(ab):34s}: {ms:7.3f} ms",
                    flush=True,
                )
            continue

        def body_bilinear(carry, t):
            out = pwarp.pallas_remap_batched(src, smaps + 1e-6 * t)
            return carry, jnp.sum(out[:, :, ::256, ::256].astype(jnp.int32))

        ms = scan_time(body_bilinear, jnp.float32(0), stat="median")
        print(f"S={S} bilinear batched : {ms:7.3f} ms ({ms / S:6.3f}/stream)",
              flush=True)

        def body_easu_map(carry, t):
            out = jax.lax.map(
                lambda args: pwarp.pallas_remap(
                    args[0], args[1], fill=None, fill_mode=False,
                    filter_mode="easu", fmt=PixelFormat.YUV,
                ),
                (src, smaps + 1e-6 * t),
            )
            return carry, jnp.sum(out[:, :, ::256, ::256].astype(jnp.int32))

        ms = scan_time(body_easu_map, jnp.float32(0), stat="median")
        print(f"S={S} easu lax.map    : {ms:7.3f} ms ({ms / S:6.3f}/stream)",
              flush=True)

        def body_bil_map(carry, t):
            out = jax.lax.map(
                lambda args: pwarp.pallas_remap(
                    args[0], args[1], fill=None, fill_mode=False,
                ),
                (src, smaps + 1e-6 * t),
            )
            return carry, jnp.sum(out[:, :, ::256, ::256].astype(jnp.int32))

        ms = scan_time(body_bil_map, jnp.float32(0), stat="median")
        print(f"S={S} bilinear lax.map: {ms:7.3f} ms ({ms / S:6.3f}/stream)",
              flush=True)

        if hasattr(pwarp, "_easu_kernel_batched"):
            def make_body(ablate):
                def body_easu_b(carry, t):
                    out = pwarp.pallas_remap_batched(
                        src, smaps + 1e-6 * t, filter_mode="easu",
                        fmt=PixelFormat.YUV, _ablate=ablate,
                    )
                    return carry, jnp.sum(
                        out[:, :, ::256, ::256].astype(jnp.int32)
                    )
                return body_easu_b

            ms = scan_time(make_body(()), jnp.float32(0), stat="median")
            print(f"S={S} easu batched    : {ms:7.3f} ms ({ms / S:6.3f}/stream)",
                  flush=True)
            if "--ablate" in sys.argv:
                for ab in (
                    ("weights",), ("chroma_h",), ("luma_h",),
                    ("luma_h", "chroma_h"), ("vert",),
                    ("vert", "luma_h", "chroma_h", "weights"),
                ):
                    ms = scan_time(make_body(ab), jnp.float32(0), stat="median")
                    print(
                        f"S={S} easu batched -{','.join(ab):30s}: {ms:7.3f} ms",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
