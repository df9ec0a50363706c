"""Pallas TPU RCAS kernel: single-pass contrast-adaptive sharpening.

The XLA form (ops/rcas.py) is a 5-point stencil whose shifted views XLA
re-reads from HBM — measured 3.1 ms at 4K on v5e against a ~0.25 ms
read+write bound.  Here each grid step fetches a 2x2 block neighbourhood
(the 1-px halo rides the same shifted-layout trick as warp.py: the source is
laid out pre-shifted by one pixel, so every tile's [t*T-1, t*T+T+1) reach
lands in two consecutive blocks per axis), assembles it in VMEM, and runs
the whole limiter + resolve math in registers: HBM traffic is one source
read (x4 block overlap) plus the output write.

Reference parity: the `rcas` OpenCL kernel, Functions/OpenCL/Sources/
FSR.cl:460-537; border copy-through (:484-491) is pasted by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (128, 512) tiles overflow the 16 MB VMEM by ~1 MB once the limiter
# temporaries are live; 64-row tiles leave comfortable headroom.
_TH, _TW = 64, 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rcas_kernel(*refs, channels: int, sharpness: float):
    c = channels
    th, tw = _TH, _TW
    src_refs = refs[:4]
    out_ref, s_s = refs[4:6]

    for bi in range(2):
        for bj in range(2):
            r = src_refs[bi * 2 + bj]
            for ch in range(c):
                s_s[
                    ch, bi * th : (bi + 1) * th, bj * tw : (bj + 1) * tw
                ] = r[ch]

    # Shifted views of the assembled scratch; scratch (1, 1) is the tile's
    # (0, 0) source pixel.
    def view(dy, dx):
        return jnp.stack(
            [
                s_s[ch, 1 + dy : 1 + dy + th, 1 + dx : 1 + dx + tw]
                for ch in range(c)
            ]
        )

    e = view(0, 0)
    b = view(-1, 0)
    h = view(1, 0)
    d = view(0, -1)
    f = view(0, 1)

    mn4 = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
    mx4 = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
    # Per-channel limiters (FSR.cl:515-526), worst case across channels.
    hit_min = jnp.minimum(mn4, e) / (4.0 * jnp.maximum(mx4, 1e-6))
    hit_max = (1.0 - jnp.maximum(mx4, e)) / jnp.minimum(4.0 * mn4 - 4.0, -1e-6)
    lobe_c = jnp.maximum(-hit_min, hit_max)
    lobe = lobe_c[0]
    for ch in range(1, c):
        lobe = jnp.maximum(lobe, lobe_c[ch])
    lobe = jnp.clip(lobe, -0.1875, 0.0) * sharpness
    out_ref[...] = ((b + d + f + h) * lobe + e) * (1.0 / (4.0 * lobe + 1.0))


@functools.partial(jax.jit, static_argnames=("sharpness", "interpret"))
def pallas_rcas(
    img: jax.Array, sharpness: float = 0.8, interpret: bool = False
) -> jax.Array:
    """RCAS sharpen via the fused Pallas kernel; matches ops.rcas.rcas."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    img = img.astype(jnp.float32)
    c, h, w = img.shape
    th, tw = _TH, _TW
    gh, gw = -(-h // th), -(-w // tw)
    hs, ws = (gh + 1) * th, (gw + 1) * tw

    # 1-px-shifted layout: padded row 0 is source row -1 (edge-replicated).
    sp = jnp.pad(img, ((0, 0), (1, hs - h - 1), (1, ws - w - 1)), mode="edge")

    kernel = functools.partial(_rcas_kernel, channels=c, sharpness=sharpness)
    src_specs = [
        pl.BlockSpec(
            (c, th, tw),
            functools.partial(
                lambda ty, tx, di, dj: (0, ty + di, tx + dj), di=bi, dj=bj
            ),
            memory_space=pltpu.VMEM,
        )
        for bi in range(2)
        for bj in range(2)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=src_specs,
        out_specs=pl.BlockSpec(
            (c, th, tw), lambda ty, tx: (0, ty, tx), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((c, 2 * th, 2 * tw), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((c, gh * th, gw * tw), jnp.float32),
        interpret=interpret,
    )(*([sp] * 4))[:, :h, :w]

    # Border copy-through (FSR.cl:484-491).
    out = out.at[:, :1, :].set(img[:, :1, :])
    out = out.at[:, -1:, :].set(img[:, -1:, :])
    out = out.at[:, :, :1].set(img[:, :, :1])
    out = out.at[:, :, -1:].set(img[:, :, -1:])
    return out[0] if squeeze else out
