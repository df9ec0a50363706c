"""Ablation harness for the Pallas EASU upscale kernel (dev tool).

Builds stripped-down variants of ops/tpu_kernels/easu_scale.py's kernel to
locate where the device time goes: DMA pipeline, parity assembly, tap view
creation + interleave, the MXU permutation, the filter math.

Usage: python tools/exp_easu_ablate.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_stages import scan_time
from livevisionkit_tpu.ops import easu as easu_ops
from livevisionkit_tpu.ops.tpu_kernels import easu_scale as pes
from livevisionkit_tpu.types import PixelFormat

KH, KW = pes._KH, pes._KW


def make_kernel(level: int, c: int, p: int, fmt):
    ph = 2 * p
    kh, kw = KH, KW
    consts = pes._phase_consts(p)

    def kernel(*refs):
        src_refs = refs[:4]
        perm_ref, out_ref, s_par, dp_s = refs[4:8]

        if level == 0:  # pure DMA pipeline
            out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
            return

        for bi in range(2):
            for bj in range(2):
                r = src_refs[bi * 2 + bj]
                for e in range(2):
                    for f in range(2):
                        for ch in range(c):
                            s_par[e, f, ch,
                                  bi * kh : (bi + 1) * kh,
                                  bj * kw : (bj + 1) * kw] = r[e * 2 + f, ch]
        if level == 1:  # + assembly
            out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
            return

        def par_of(g):
            return (g & 1, (g + 2) // 2)

        gys = sorted({b + d for b, _ in consts for d in (-1, 0, 1, 2)})
        tap_v = {}
        for gy in gys:
            ey, oy = par_of(gy)
            for gx in gys:
                ex, ox = par_of(gx)
                tap_v[(gy, gx)] = jnp.stack(
                    [s_par[ey, ex, ch, oy : oy + kh, ox : ox + kw]
                     for ch in range(c)])

        if level >= 4:  # dir terms
            lums = {}
            for e in range(2):
                for f in range(2):
                    lums[(e, f)] = s_par[e, f, 0]
            rh, rw = kh + 8, kw + 8
            for e in range(2):
                for f in range(2):
                    se, sf = 1 - e, 1 - f
                    ctr = lums[(e, f)][se : se + rh, sf : sf + rw]
                    above = lums[(1 - e, f)][se + e - 1 : se + e - 1 + rh, sf : sf + rw]
                    below = lums[(1 - e, f)][se + e : se + e + rh, sf : sf + rw]
                    left = lums[(e, 1 - f)][se : se + rh, sf + f - 1 : sf + f - 1 + rw]
                    right = lums[(e, 1 - f)][se : se + rh, sf + f : sf + f + rw]
                    dx, dy, ln = easu_ops._dir_terms(above, left, ctr, right, below)
                    dp_s[e, f, 0, se : se + rh, sf : sf + rw] = dx
                    dp_s[e, f, 1, se : se + rh, sf : sf + rw] = dy
                    dp_s[e, f, 2, se : se + rh, sf : sf + rw] = ln
            corner_gs = sorted({b + d for b, _ in consts for d in (0, 1)})
            dir_v = {}
            for gy in corner_gs:
                ey, oy = par_of(gy)
                for gx in corner_gs:
                    ex, ox = par_of(gx)
                    dir_v[(gy, gx)] = (
                        dp_s[ey, ex, 0, oy : oy + kh, ox : ox + kw],
                        dp_s[ey, ex, 1, oy : oy + kh, ox : ox + kw],
                        dp_s[ey, ex, 2, oy : oy + kh, ox : ox + kw])

        rows = []
        for ry in range(ph):
            by, fpy = consts[ry]
            cols = []
            for rx in range(ph):
                bx, fpx = consts[rx]
                if level >= 4:
                    dirx = jnp.zeros((kh, kw), jnp.float32)
                    diry, length = dirx, dirx
                    for dyc, dxc, wgt in (
                        (0, 0, (1 - fpx) * (1 - fpy)),
                        (0, 1, fpx * (1 - fpy)),
                        (1, 0, (1 - fpx) * fpy),
                        (1, 1, fpx * fpy)):
                        if wgt == 0.0:
                            continue
                        vx, vy, vl = dir_v[(by + dyc, bx + dxc)]
                        dirx = dirx + vx * wgt
                        diry = diry + vy * wgt
                        length = length + vl * wgt
                    px = {letter: tap_v[(by + dy, bx + dx)]
                          for letter, (dx, dy) in easu_ops._TAPS.items()}
                    cols.append(easu_ops._easu_filter(
                        px, dirx, diry, length, fpx, fpy))
                else:
                    cols.append(tap_v[(by, bx)])
            cat = jnp.concatenate(cols, axis=-1)
            if level >= 3:
                band = jax.lax.dot_general(
                    cat, perm_ref[...], (((2,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            else:
                band = cat
            rows.append(band)
        out_ref[...] = jnp.stack(rows, axis=2).reshape(c, kh * ph, kw * ph)

    return kernel


def run_level(level, img, p=2, fmt=PixelFormat.YUV):
    c, ih, iw = img.shape
    ph = 2 * p
    kh, kw = KH, KW
    th, tw = ph * kh, ph * kw
    oh, ow = p * ih, p * iw
    gh, gw = -(-oh // th), -(-ow // tw)
    prows, pcols = (gh + 1) * kh, (gw + 1) * kw
    sp = jnp.pad(img, ((0, 0), (2, 2 * prows - ih - 2), (2, 2 * pcols - iw - 2)),
                 mode="edge")
    planes = jnp.stack([sp[:, e::2, f::2] for e in range(2) for f in range(2)])
    perm = np.zeros((ph * kw, ph * kw), np.float32)
    for rx in range(ph):
        for j in range(kw):
            perm[rx * kw + j, ph * j + rx] = 1.0
    perm = jnp.asarray(perm)

    kernel = make_kernel(level, c, p, fmt)
    src_specs = [
        pl.BlockSpec((4, c, kh, kw),
                     functools.partial(lambda ty, tx, di, dj: (0, 0, ty + di, tx + dj),
                                       di=bi, dj=bj),
                     memory_space=pltpu.VMEM)
        for bi in range(2) for bj in range(2)]
    f = jax.jit(lambda pls, pm: pl.pallas_call(
        kernel, grid=(gh, gw),
        in_specs=src_specs + [pl.BlockSpec((ph * kw, ph * kw), lambda ty, tx: (0, 0),
                                           memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, th, tw), lambda ty, tx: (0, ty, tx),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 2, c, 2 * kh, 2 * kw), jnp.float32),
                        pltpu.VMEM((2, 2, 3, 2 * kh, 2 * kw), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((c, gh * th, gw * tw), jnp.float32),
    )(pls, pls, pls, pls, pm))

    ms = scan_time(
        lambda cr, i: (cr, jnp.sum(f(planes + 1e-9 * i, perm)[:, ::256, ::256])),
        jnp.float32(0))
    print(f"level {level}: {ms:7.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.1, 0.9, (3, 1080, 1920)).astype(np.float32))
    for level in (0, 1, 2, 3, 4):
        run_level(level, img)


if __name__ == "__main__":
    main()
