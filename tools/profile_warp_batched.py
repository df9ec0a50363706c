"""Device-level profile of pallas_remap_batched: the 8x1080p60 serving fix.

r3 measured per-stream step cost rising 0.56 -> 1.40 ms from solo to batch 8
inside the batched warp (BENCH_SCALING vmap rows); this script isolates the
warp kernel from the rest of the step and attributes the growth:
  * S sweep x {channel-fused, per-channel-grid} kernels
  * XLA pre-pass cost (the big edge-pad + vg/xg strip builds) measured alone
  * tile sweep

Usage: python tools/profile_warp_batched.py [--easu]
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


def make_inputs(S, h=1080, w=1920, c=3):
    from livevisionkit_tpu.models.homography import Homography

    rng = np.random.default_rng(0)
    src = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(S, c, h, w)).astype(np.float32)
    )
    smaps = []
    for s in range(S):
        pose = Homography.from_similarity(
            jnp.float32(1.0 + 0.002 * (s % 3)),
            jnp.float32(0.004 * (s - S / 2)),
            jnp.float32(7.0 * (s - S / 2)),
            jnp.float32(-4.0 * s),
        )
        smaps.append(pose.sample_map((h, w)))
    return src, jnp.stack(smaps)


def main():
    from livevisionkit_tpu.ops.tpu_kernels import warp as pwarp

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    for S in (1, 2, 4, 8):
        src, smaps = make_inputs(S)

        for fused in (True, False):
            for tile in (256,):
                def body(carry, t, fused=fused, tile=tile):
                    out = pwarp.pallas_remap_batched(
                        src, smaps + 1e-6 * t, tile=tile, fuse_channels=fused
                    )
                    return carry, jnp.sum(out[:, :, ::256, ::256])

                try:
                    ms = scan_time(body, jnp.float32(0), stat="median")
                    print(
                        f"S={S} fused={int(fused)} tile={tile}: "
                        f"{ms:7.3f} ms  ({ms / S:6.3f} ms/stream)"
                    )
                except Exception as e:
                    print(f"S={S} fused={int(fused)} tile={tile}: FAILED {e}")

        # XLA pre-pass cost proxy: the big edge pad at the layout extents.
        b = 128
        n0 = 2
        gh, gw = 5, 8
        hbig = b * (2 * gh + 2 * n0 + 2)
        wbig = b * (2 * gw + 2 * n0 + 2)
        p0 = 97 + n0 * b

        def body_pad(carry, t):
            big = jnp.pad(
                src + t * 1e-6,
                ((0, 0), (0, 0), (p0, hbig - 1080 - p0), (p0, wbig - 1920 - p0)),
                mode="edge",
            )
            return carry, jnp.sum(big[:, :, ::512, ::512])

        ms = scan_time(body_pad, jnp.float32(0), stat="median")
        print(f"S={S} big-pad alone: {ms:7.3f} ms  ({ms / S:6.3f} ms/stream)")


if __name__ == "__main__":
    main()
