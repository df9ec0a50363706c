"""Pallas TPU RCAS kernel: single-pass contrast-adaptive sharpening.

The XLA form (ops/rcas.py) is a 5-point stencil whose shifted views XLA
re-reads from HBM — measured 3.1 ms at 4K on v5e against a ~0.25 ms
read+write bound.  r4 rewrite (2.0 -> see BENCH_MATRIX):

  * **Full-width row strips** instead of the 2x2 block-neighbourhood halo:
    each grid step fetches ONE (C, TH, W) strip plus a 2-row boundary aux
    plane prepared by the wrapper (the old scheme read every source pixel
    4x).  The 1-px column halo is two `pltpu.roll` lane rotates; their
    circular wrap touches only the frame-border columns, which the wrapper
    overwrites with the reference's border copy-through anyway
    (FSR.cl:484-491).
  * **One division per pixel instead of seven.**  The per-channel limiter
    ratios -p_i/q_i (p, q >= 0; two per channel, FSR.cl:515-526) are
    max-reduced by a cross-multiplication tournament (p_a*q_b <= p_b*q_a
    picks the winner — no division), the noise clamp folds into the
    numerator (p'' = min(p, 0.1875*q)), and the resolve
    (sum4*lobe + e) / (4*lobe + 1) with lobe = -s*p''/q rearranges EXACTLY
    to (e*q - s*p''*sum4) / (q - 4*s*p'') — a single shared reciprocal.
    q - 4*s*p'' >= 0.25*q keeps it well-conditioned.

Reference parity: the `rcas` OpenCL kernel, Functions/OpenCL/Sources/
FSR.cl:460-537; border copy-through (:484-491) is pasted by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 32  # fallback strip height (used only when nothing below divides H)


def _pick_th(h: int) -> int:
    """Largest sublane-aligned strip height dividing H — when one exists the
    full-frame row pad (a 100 MB copy at 4K) disappears entirely (1080 and
    2160 both divide by 40)."""
    for th in (40, 32, 24, 16, 8):
        if h % th == 0:
            return th
    return _TH


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rcas_kernel(src_ref, aux_ref, out_ref, s_s, sum4_s, *, channels: int,
                 sharpness: float, th: int):
    c = channels
    w = src_ref.shape[-1]

    # Assemble (C, TH+2, W): aux row 0 = row above the strip, row 1 = below.
    for ch in range(c):
        s_s[ch, 0, :] = aux_ref[0, ch, 0, :]
        s_s[ch, 1 : th + 1, :] = src_ref[0, ch]
        s_s[ch, th + 1, :] = aux_ref[0, ch, 1, :]

    # Channels stream one at a time: only ~6 (TH, W) planes are ever live
    # (a fused all-channel formulation kept ~18 MB of (C, TH, W)
    # intermediates alive — spill-bound and over the 16 MB VMEM budget at
    # th=40/4K).  sum4 parks per channel in scratch for the resolve loop.
    def pick(pa, qa, pb, qb):
        # max(-p/q) over candidates == the (p, q) minimizing p/q:
        # cross-multiplication picks the winner, no division.
        a_wins = pa * qb <= pb * qa
        return jnp.where(a_wins, pa, pb), jnp.where(a_wins, qa, qb)

    p = q = None
    for ch in range(c):
        e = s_s[ch, 1 : th + 1, :]
        b = s_s[ch, 0:th, :]
        h = s_s[ch, 2 : th + 2, :]
        # Column neighbours by lane rotate; the wrap-around columns are
        # border columns the wrapper's copy-through overwrites.
        d = pltpu.roll(e, 1, axis=1)
        f = pltpu.roll(e, e.shape[1] - 1, axis=1)  # -1 (shift must be >= 0)
        mn4 = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
        mx4 = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
        sum4_s[ch] = (b + d) + (f + h)
        # Limiter ratios as (p, q) pairs with ratio = -p/q, p >= 0, q > 0
        # (FSR.cl:515-526: hitMin = min(mn4,e)/(4*mx4), hitMax =
        # (1-max(mx4,e))/(4*mn4-4); both are <= 0 for [0,1] video).
        p1 = jnp.minimum(mn4, e)
        q1 = 4.0 * jnp.maximum(mx4, 1e-6)
        p2 = 1.0 - jnp.maximum(mx4, e)
        q2 = jnp.maximum(4.0 - 4.0 * mn4, 1e-6)
        pc, qc = pick(p1, q1, p2, q2)
        p, q = (pc, qc) if p is None else pick(p, q, pc, qc)

    # Noise clamp folded into the numerator: lobe = -s * min(p, 0.1875*q)/q.
    ps = sharpness * jnp.minimum(p, 0.1875 * q)
    # Resolve with ONE shared reciprocal:
    # (sum4*lobe + e) / (4*lobe + 1) == (e*q - ps*sum4) / (q - 4*ps).
    rec = 1.0 / (q - 4.0 * ps)
    for ch in range(c):
        e = s_s[ch, 1 : th + 1, :]
        out_ref[0, ch] = (e * q - ps * sum4_s[ch]) * rec


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
    th = _pick_th(h)
    gh = -(-h // th)
    w2 = _round_up(w, 128)
    hp = gh * th
    if hp == h and w2 == w:
        sp = img
    else:
        sp = jnp.pad(img, ((0, 0), (0, hp - h), (0, w2 - w)), mode="edge")

    # Boundary aux rows: for strip ty, row above (clamped) and row below
    # (clamped) — static indices, two thin XLA gathers.
    top_idx = np.maximum(np.arange(gh) * th - 1, 0)
    bot_idx = np.minimum(np.arange(gh) * th + th, h - 1)
    aux = jnp.stack([sp[:, top_idx, :], sp[:, bot_idx, :]], axis=2)
    # aux: (C, gh, 2, W2) -> block (C, 1, 2, W2) per strip; put strip dim
    # first for a clean index map.
    aux = jnp.moveaxis(aux, 1, 0)  # (gh, C, 2, W2)

    kernel = functools.partial(
        _rcas_kernel, channels=c, sharpness=sharpness, th=th
    )
    out = pl.pallas_call(
        kernel,
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((1, c, th, w2), lambda ty: (0, 0, ty, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 2, w2), lambda ty: (ty, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, th, w2), lambda ty: (0, 0, ty, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, th + 2, w2), jnp.float32),
            pltpu.VMEM((c, th, w2), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((1, c, hp, w2), jnp.float32),
        interpret=interpret,
    )(sp[None], aux)[0, :, :h, :w]

    # Border copy-through (FSR.cl:484-491).
    out = out.at[:, :1, :].set(img[:, :1, :])
    out = out.at[:, -1:, :].set(img[:, -1:, :])
    out = out.at[:, :, :1].set(img[:, :, :1])
    out = out.at[:, :, -1:].set(img[:, :, -1:])
    return out[0] if squeeze else out
