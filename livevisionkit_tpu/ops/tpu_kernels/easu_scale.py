"""Pallas TPU polyphase EASU upscale: the speed-of-light 2x scaler.

The XLA rational path (ops/easu._easu_scale_rational) is numerically ideal
but memory-inefficient at 4K: the 16 phase programs re-read the source via
strided selects (~12 tap planes x 16 phases), materialize 16 phase tiles,
and interleave them through HBM — measured 8.3 ms for 1080p->4K on v5e
against a ~0.2 ms read+write bound.  This kernel performs the whole upscale
in ONE pass:

  1. XLA pre-splits the (edge-padded) source into its four parity planes
     ``src[:, e::2, f::2]`` (one cheap relayout).  Because the polyphase
     source stride at q=1 is exactly 2, EVERY tap of every phase is then a
     **unit-stride static slice** of a parity plane — no strided VMEM access,
     no gathers, the same trick the XLA path plays with reshape-selects but
     resolved at the block level.
  2. Each grid step fetches a 2x2 block neighbourhood per parity plane
     (the halo trick of warp.py: tap reach < 4 rows => two consecutive
     blocks cover every slice), assembles them in VMEM, and computes the
     per-input-pixel direction/length terms once (ops/easu._dir_terms).
  3. All 2p x 2p phases evaluate in registers — taps and direction corners
     are unit slices of the assembled scratch, the sub-pixel offsets are
     compile-time constants — and interleave back with an in-VMEM
     stack+reshape.  One (C, TH, TW) store per tile; HBM traffic is
     read-source + write-output, nothing else.

Border semantics: the rational path substitutes the nearest tap where the
4x4 footprint leaves the frame (FSR.cl:385-397).  Rather than branch in the
kernel, the wrapper recomputes the thin border bands (2p rows/cols) with the
XLA rational path on 32-px source strips and pastes them — bit-exact with
the full-frame XLA result there, at negligible cost.

Reference parity: Functions/OpenCL/Sources/FSR.cl:324-358 (easu_scale),
:93-322 (filter core, shared via ops/easu._easu_filter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from livevisionkit_tpu.ops import easu as easu_ops
from livevisionkit_tpu.types import PixelFormat

# Phase-tile extents: KW fills the 128-wide lanes; KH balances VMEM between
# the four assembled parity planes, the direction scratch, the double-
# buffered in/out blocks, and the interleave temporaries (KH=64 overflows
# the 16 MB VMEM by ~3 MB at 3 channels).
_KH, _KW = 32, 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _phase_consts(p: int):
    """(floor base, sub-pixel frac) per output phase, q=1 (integer scale).

    Matches _easu_scale_rational's num/psi arithmetic: phase r of 2p has
    source base ``(2r+1-p) // 2p`` with stride 2 and fractional offset
    ``((2r+1-p) mod 2p) / 2p``.
    """
    ph = 2 * p
    return [((2 * r + 1 - p) // ph, ((2 * r + 1 - p) % ph) / ph) for r in range(ph)]


def _perm_mm(x, p_ref, dims):
    """Permutation matmul in TWO default-precision MXU passes instead of one
    HIGHEST (bf16x6) pass — measured 0.75 ms/frame at 1080p→4K (r4).

    Exactness: the permutation entries are exactly representable in bf16, so
    each pass computes 1.0 * (operand rounded to bf16) with f32
    accumulation.  Splitting x = hi + lo with hi = bf16(x) makes the hi pass
    exact and leaves only lo's bf16 rounding: |err| <= 2^-16 |x| — an order
    below f32's own epsilon budget for [0,1] video and two orders below a u8
    LSB.  (One default pass alone rounds x to bf16: ~1 u8 LSB — too lossy.)
    """
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi

    def d(v):
        return jax.lax.dot_general(
            v, p_ref, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(hi) + d(lo)


def _easu2x_kernel(*refs, channels: int, p: int, fmt: PixelFormat,
                   kh: int, kw: int,
                   ablate: frozenset = frozenset()):
    c = channels
    ph = 2 * p
    consts = _phase_consts(p)

    # refs: 4 neighbour blocks of the RAW padded source, the column
    # deinterleave + lane-interleave permutations, then out, raw, s_par, dp
    # scratch.
    src_refs = refs[:4]
    deperm_ref, perm_ref, out_ref, r_s, s_par, dp_s = refs[4:10]

    # ---- assemble the raw 2x2 neighbourhood, then parity-split IN VMEM ----
    # Every XLA-side split strategy relayouts through HBM (strided slice
    # 20.8 ms, one-hot conv 3-9 ms, reshape+transpose 9.7 ms at 1080p on
    # v5e); in VMEM the row split is a free sublane reshape and the column
    # deinterleave is one exact MXU permutation per row-parity strip.
    for bi in range(2):
        for bj in range(2):
            r = src_refs[bi * 2 + bj]
            for ch in range(c):
                r_s[
                    ch,
                    bi * 2 * kh : (bi + 1) * 2 * kh,
                    bj * 2 * kw : (bj + 1) * 2 * kw,
                ] = r[ch]
    for ch in range(c):
        v = r_s[ch].reshape(2 * kh, 2, 4 * kw)  # sublane parity split
        for e in range(2):
            if "deperm" in ablate:  # profiling only: skip column deinterleave
                s_par[e, 0, ch] = v[:, e, : 2 * kw]
                s_par[e, 1, ch] = v[:, e, 2 * kw :]
                continue
            # Column deinterleave: raw col 2j+f -> half f, col j (exact:
            # permutation entries are 1.0, and bf16x6 passes reproduce f32).
            half = _perm_mm(
                v[:, e, :], deperm_ref[...], (((1,), (0,)), ((), ()))
            )
            s_par[e, 0, ch] = half[:, : 2 * kw]
            s_par[e, 1, ch] = half[:, 2 * kw :]

    # ---- 2x-luma views ----------------------------------------------------
    def lum(e, f):
        if fmt in (PixelFormat.YUV, PixelFormat.GRAY):
            return s_par[e, f, 0]
        return (
            0.5 * s_par[e, f, 0] + s_par[e, f, 1] + 0.5 * s_par[e, f, 2]
        )

    lums = {(e, f): lum(e, f) for e in range(2) for f in range(2)}

    # ---- per-input-pixel direction terms in parity layout ----------------
    # Parity (e, f) plane index (i, j) is source pixel (2i+e-2, 2j+f-2); its
    # 4-neighbour cross lives in the opposite-parity planes at i+e-1 / i+e
    # (rows) and j+f-1 / j+f (cols).  Corners with parity 0 are only ever
    # needed from assembled index >= 1 (their taps reach one pixel further
    # up/left), so starting the e=0/f=0 computation at offset 1 keeps every
    # slice in range.
    rh, rw = kh + 8, kw + 8  # corner reach: o <= (p+2)//2 + KH
    if "dir" in ablate:  # profiling only: skip direction precompute
        dp_s[...] = jnp.zeros(dp_s.shape, dp_s.dtype)
    for e in range(2 if "dir" not in ablate else 0):
        for f in range(2):
            se = 1 - e  # first valid assembled row for this parity
            sf = 1 - f
            ctr = lums[(e, f)][se : se + rh, sf : sf + rw]
            above = lums[(1 - e, f)][se + e - 1 : se + e - 1 + rh, sf : sf + rw]
            below = lums[(1 - e, f)][se + e : se + e + rh, sf : sf + rw]
            left = lums[(e, 1 - f)][se : se + rh, sf + f - 1 : sf + f - 1 + rw]
            right = lums[(e, 1 - f)][se : se + rh, sf + f : sf + f + rw]
            dx, dy, ln = easu_ops._dir_terms(above, left, ctr, right, below)
            dp_s[e, f, 0, se : se + rh, sf : sf + rw] = dx
            dp_s[e, f, 1, se : se + rh, sf : sf + rw] = dy
            dp_s[e, f, 2, se : se + rh, sf : sf + rw] = ln

    # ---- evaluate every phase --------------------------------------------
    def par_of(g: int) -> tuple[int, int]:
        """Source offset g = base + tap-offset -> (parity, assembled index)."""
        return (g & 1, (g + 2) // 2)

    # Every (phase, tap) pair resolves to one of only ~6 shifted views PER
    # AXIS (source offset g in [-2, 3]); materialize each distinct (gy, gx)
    # view once instead of slicing per tap — 36 loads instead of 576
    # (misaligned lane slices are funnel-shift relayouts; this is the
    # difference between the kernel being slicing-bound and compute-bound).
    gys = sorted({b + d for b, _ in consts for d in (-1, 0, 1, 2)})
    gxs = gys
    tap_v: dict[tuple[int, int], jax.Array] = {}
    dir_v: dict[tuple[int, int], tuple] = {}
    for gy in gys:
        ey, oy = par_of(gy)
        for gx in gxs:
            ex, ox = par_of(gx)
            tap_v[(gy, gx)] = jnp.stack(
                [s_par[ey, ex, ch, oy : oy + kh, ox : ox + kw] for ch in range(c)]
            )
    corner_gs = sorted({b + d for b, _ in consts for d in (0, 1)})
    for gy in corner_gs:
        ey, oy = par_of(gy)
        for gx in corner_gs:
            ex, ox = par_of(gx)
            dir_v[(gy, gx)] = (
                dp_s[ey, ex, 0, oy : oy + kh, ox : ox + kw],
                dp_s[ey, ex, 1, oy : oy + kh, ox : ox + kw],
                dp_s[ey, ex, 2, oy : oy + kh, ox : ox + kw],
            )

    rows = []
    for ry in range(ph):
        by, fpy = consts[ry]
        cols = []
        for rx in range(ph):
            bx, fpx = consts[rx]

            # Direction/length: bilinear blend of the four corner pixels'
            # precomputed terms (compile-time weights).
            dirx = jnp.zeros((kh, kw), jnp.float32)
            diry, length = dirx, dirx
            for dyc, dxc, wgt in (
                (0, 0, (1 - fpx) * (1 - fpy)),
                (0, 1, fpx * (1 - fpy)),
                (1, 0, (1 - fpx) * fpy),
                (1, 1, fpx * fpy),
            ):
                if wgt == 0.0:
                    continue
                vx, vy, vl = dir_v[(by + dyc, bx + dxc)]
                dirx = dirx + vx * wgt
                diry = diry + vy * wgt
                length = length + vl * wgt

            px = {
                letter: tap_v[(by + dy, bx + dx)]
                for letter, (dx, dy) in easu_ops._TAPS.items()
            }
            if "weights" in ablate:  # profiling only: uniform-weight taps
                acc = jnp.zeros_like(px["f"])
                for letter in easu_ops._TAPS:
                    acc = acc + px[letter]
                cols.append(acc * (1.0 / 12.0) + 0.0 * (dirx + diry + length))
            elif "taps" in ablate:  # profiling only: weights but one tap
                dxx, dyx, dxy, dyy, clp, cw1, cw2, cw3, cw4 = (
                    easu_ops._shape_kernel(dirx, diry, length)
                )
                vx = (0.0 - fpx) * dxx + (0.0 - fpy) * dxy
                d2 = jnp.minimum(vx * vx, clp)
                w = 1.0 + d2 * (cw1 + d2 * (cw2 + d2 * (cw3 + d2 * cw4)))
                cols.append(px["f"] * w)
            else:
                cols.append(
                    easu_ops._easu_filter(px, dirx, diry, length, fpx, fpy)
                )
        # Lane (x) interleave: Mosaic cannot reshape across lanes, but a
        # permutation MATMUL is exact (each output is exactly one 1.0 * x
        # product; 1.0 and x round-trip any MXU pass precision) and
        # near-free on the MXU — phase-major concat -> pixel-major band.
        cat = jnp.concatenate(cols, axis=-1)  # (C, KH, ph*KW) phase-major
        if "interleave" in ablate:  # profiling only: phase-major output
            rows.append(cat)
        else:
            rows.append(_perm_mm(cat, perm_ref[...], (((2,), (0,)), ((), ()))))
    # Sublane (y) interleave: (C, KH, ph, TW) -> (C, KH*ph, TW) merges
    # sublane dims only — Mosaic supports this reshape (strided stores
    # would need a 128-wide base memref).
    out_ref[...] = jnp.stack(rows, axis=2).reshape(c, kh * ph, kw * ph)


@functools.partial(
    jax.jit, static_argnames=("p", "fmt", "interpret", "_ablate", "kh")
)
def pallas_easu_up(
    img: jax.Array,
    p: int = 2,
    fmt: PixelFormat = PixelFormat.YUV,
    interpret: bool = False,
    _ablate: tuple = (),  # profiling only: kernel stages to skip (wrong output)
    kh: int | None = None,  # phase-tile height override (default _KH)
) -> jax.Array:
    """EASU integer upscale by p via the fused Pallas kernel.

    Requires even source extents (parity split); output is (C, p*H, p*W).
    Numerically identical to ops.easu.easu_scale away from the 2p-px border
    bands, which are pasted FROM the XLA rational path (bit-exact there).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    img = img.astype(jnp.float32)
    c, ih, iw = img.shape
    assert ih % 2 == 0 and iw % 2 == 0, "parity split needs even extents"
    assert ih >= 32 and iw >= 32, "border strips need >= 32 px source extents"
    ph = 2 * p
    oh, ow = p * ih, p * iw
    kh = kh or _KH
    kw = _KW
    th, tw = ph * kh, ph * kw
    gh, gw = -(-oh // th), -(-ow // tw)

    # Parity planes of the 2-edge-padded source, padded to the (g+1)-block
    # shifted layout the 2x2 neighbourhood fetch expects.
    prows, pcols = (gh + 1) * kh, (gw + 1) * kw
    sp = jnp.pad(
        img,
        ((0, 0), (2, 2 * prows - ih - 2), (2, 2 * pcols - iw - 2)),
        mode="edge",
    )
    import numpy as np

    # Column deinterleave permutation (in-kernel parity split): raw column
    # 2j+f -> half f, column j.
    deperm = np.zeros((4 * kw, 4 * kw), np.float32)
    for j in range(2 * kw):
        for f in range(2):
            deperm[2 * j + f, f * 2 * kw + j] = 1.0
    deperm = jnp.asarray(deperm)

    # Lane-interleave permutation: phase-major column rx*KW + j -> output
    # column ph*j + rx.
    perm = np.zeros((ph * kw, ph * kw), np.float32)
    for rx in range(ph):
        for j in range(kw):
            perm[rx * kw + j, ph * j + rx] = 1.0
    perm = jnp.asarray(perm)

    kernel = functools.partial(
        _easu2x_kernel, channels=c, p=p, fmt=fmt, kh=kh, kw=kw,
        ablate=frozenset(_ablate),
    )
    src_specs = [
        pl.BlockSpec(
            (c, 2 * kh, 2 * kw),
            functools.partial(
                lambda ty, tx, di, dj: (0, ty + di, tx + dj), di=bi, dj=bj
            ),
            memory_space=pltpu.VMEM,
        )
        for bi in range(2)
        for bj in range(2)
    ]
    const_spec = lambda n: pl.BlockSpec(  # noqa: E731
        (n, n), lambda ty, tx: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=src_specs + [const_spec(4 * kw), const_spec(ph * kw)],
        out_specs=pl.BlockSpec(
            (c, th, tw), lambda ty, tx: (0, ty, tx), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, 4 * kh, 4 * kw), jnp.float32),
            pltpu.VMEM((2, 2, c, 2 * kh, 2 * kw), jnp.float32),
            pltpu.VMEM((2, 2, 3, 2 * kh, 2 * kw), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((c, gh * th, gw * tw), jnp.float32),
        interpret=interpret,
        # kh=64 needs ~19 MB of scoped VMEM (scratch + tap-view values) vs
        # the 16 MB default budget; v5e has headroom (same override as the
        # batched warp kernel).
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024)
            if kh > 32 else None
        ),
    )(sp, sp, sp, sp, deperm, perm)
    out = out[:, :oh, :ow]

    # ---- border bands from the XLA rational path (exact) ------------------
    # Bands where the 4x4 footprint leaves the frame (easu_ok false in the
    # rational path): the first ph outputs (y0 < 1 at k=0) and the last 2*ph
    # (y0 >= ih-4 spans the last two phase groups).
    band_lo, band_hi = ph, 2 * ph
    strip = 32  # source rows/cols feeding a band: ample for taps + phases

    def rational(src):
        hh, ww = src.shape[-2:]
        return easu_ops._easu_scale_rational(
            src, (p * hh, p * ww), fmt, p, 1, p, 1
        )

    top = rational(img[:, :strip, :])[:, :band_lo, :]
    bot = rational(img[:, ih - strip :, :])[:, -band_hi:, :]
    left = rational(img[:, :, :strip])[:, :, :band_lo]
    right = rational(img[:, :, iw - strip :])[:, :, -band_hi:]
    out = out.at[:, :band_lo, :].set(top)
    out = out.at[:, oh - band_hi :, :].set(bot)
    out = out.at[:, :, :band_lo].set(left)
    out = out.at[:, :, ow - band_hi :].set(right)
    return out[0] if squeeze else out
