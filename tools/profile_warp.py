"""Micro-benchmark of the Pallas warp kernel variants on the real chip."""

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
    from livevisionkit_tpu.models.warp_field import WarpField
    from livevisionkit_tpu.ops.tpu_kernels import warp as pwarp

    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.uniform(0.1, 0.9, size=(3, 1080, 1920)).astype(np.float32))
    wf = WarpField.identity((17, 30))
    wf = wf.replace(offsets=wf.offsets + 0.01)
    smap = wf.sample_map((1080, 1920))

    def body_apply(c, t):
        out = wf.replace(offsets=wf.offsets + 1e-6 * t).apply(pix, fill=0.0)
        return c, jnp.sum(out[:, ::256, ::256])

    print(f"warpfield.apply 1080p: {scan_time(body_apply, jnp.float32(0)):7.3f} ms")

    for tile in ((128, 128), (128, 256), (256, 256)):
        for margin in (32,):
            try:
                def body(c, t, tile=tile, margin=margin):
                    out = pwarp.pallas_remap(
                        pix, smap + 1e-6 * t, fill=0.0, tile=tile, margin=margin
                    )
                    return c, jnp.sum(out[:, ::256, ::256])

                ms = scan_time(body, jnp.float32(0))
                print(f"pallas tile={tile} m={margin}:  {ms:7.3f} ms")
            except Exception as e:
                print(f"pallas tile={tile} m={margin}:  FAILED {type(e).__name__}: {e}")

    # How much do the XLA pre-passes (mean shift + layout pads) cost alone?
    def body_pre(c, t):
        out = pwarp.pallas_remap(
            pix, smap + 1e-6 * t, fill=0.0, fill_mode=False
        )
        return c, jnp.sum(out[:, ::256, ::256])

    print(f"pallas no-fill:        {scan_time(body_pre, jnp.float32(0)):7.3f} ms")

    def body_ms(c, t):
        out = pwarp.pallas_remap(
            pix, smap + 1e-6 * t, fill=0.0, max_shift=64
        )
        return c, jnp.sum(out[:, ::256, ::256])

    print(f"pallas max_shift=64:   {scan_time(body_ms, jnp.float32(0)):7.3f} ms")


if __name__ == "__main__":
    main()
