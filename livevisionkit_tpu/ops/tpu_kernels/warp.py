"""Pallas TPU warp-resampling kernel: the speed-of-light remap.

Replaces the XLA gather path of ops/remap.py for large frames.  Measured on
TPU v5e, XLA lowers image gathers to ~10 ns/element (a 1080p 3-channel
bilinear warp costs ~70 ms); this kernel reaches the same result with zero
gathers.  Architecture (shaped by what this backend's Mosaic supports: no
dynamic-offset DMA/vector loads, but static block fetches and `pl.when`
predication are fine):

  1. The MEAN integer displacement of the warp is removed OUTSIDE the
     kernel by one edge-padded dynamic-slice of the source (XLA, ~1 pass).
     This absorbs the stabilizer's large global correction (up to the
     corrective limit) for free.
  2. The output is tiled on a (gh, gw) grid.  Each tile statically fetches
     a 2x2 block neighbourhood of the shifted source.  The inputs are laid
     out pre-shifted by `margin+1` px (top/left edge pad), so the sampling
     window [tile - margin, tile + tile + margin) of every tile lands in
     exactly TWO consecutive blocks per axis (requires 2*margin+4 <= tile):
     4 source blocks per tile instead of the 9 a 3x3 halo fetch needs —
     4x total HBM traffic instead of 9x.
  3. Sampling is a two-pass separable resample; each pass is shift-select:
     a `lax.fori_loop` over the tile's ACTUAL residual shift range
     [s_lo, s_hi] (computed in-kernel) — typical tiles execute 2-6
     iterations of masked lerps, pure VPU work.  The vertical pass slices
     rows at the dynamic shift (`pl.ds` on the sublane dim); the horizontal
     pass rotates columns with `pltpu.roll` (dynamic lane rotate) and takes
     static slices of the rolled plane.  (r4: this replaced r2's statically
     unrolled `pl.when` chain over the full +/-margin window — on v5e the
     unrolled form's cost scaled with CODE size, ~0.3 us per *skipped*
     guard region at 1080p tiles — instruction-fetch-bound, ~10 ms/frame in
     the widened batched kernel; the dynamic-trip form is ~20x faster there
     and compiles ~10x faster.)
  4. Separability is exact to first order: the vertical map is pre-warped
     by -dY/dx * dx outside the kernel, cancelling the cross term.  The
     residual is O(curvature * margin^2): zero inside mesh cells
     (piecewise-bilinear fields), <0.05 px for perspective warps.
     Sample COORDINATES are therefore exact (measured <5e-4 px at 1080p for
     similarity warps); what differs from joint bilinear is the
     interpolation FOOTPRINT — where the map rotates/shears, the two-pass
     kernel's 2x2 footprint shears with it by dY/dx (the two columns of the
     horizontal lerp carry vertical samples offset by one column's worth of
     dY).  On band-limited (real video) content this is indistinguishable
     from bilinear; it only shows on white-noise test images, as a
     value-domain difference O(dY/dx * local gradient).

The `margin` must cover the residual (post-mean-shift) displacement:
rotation/zoom reach at the frame corners plus mesh deformation.  Default 32
px covers ~1 degree of corrective roll at 1080p; raise it for extreme
stabilization settings (and the tile with it: 2*margin+4 <= tile).

Reference parity: the fused warp kernels of reference Functions/OpenCL/
Sources/FSR.cl:362-452 with bilinear filtering; background-fill border
semantics are applied by the wrapper; out-of-range samples clamp
(BORDER_REPLICATE) via edge padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from livevisionkit_tpu.ops import remap as remap_ops


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _to_f32(x):
    """VMEM-side cast to f32; Mosaic has no direct u8->f32, go via i32."""
    if x.dtype == jnp.float32:
        return x
    return x.astype(jnp.int32).astype(jnp.float32)


def _kernel(
    xmap_ref,  # (TH, TW): output-pixel source-x map (global coords)
    vmap_0_ref, vmap_1_ref,  # (TH, TW) vmap col-block pair (shifted layout)
    *refs,
    th: int,
    tw: int,
    margin: int,
    channels: int,
):
    src_refs = refs[:4]  # 2x2 neighbourhood, row-major, each (C, TH, TW)
    out_ref, s_s, v_s, tmp_s = refs[4:8]
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    m = margin

    # ---- assemble the 2x2 source neighbourhood and the vmap strip --------
    # s_s row/col 0 is global source row/col (ty*th - m - 1, tx*tw - m - 1).
    for bi in range(2):
        for bj in range(2):
            r = src_refs[bi * 2 + bj]
            for c in range(channels):
                s_s[c, bi * th : (bi + 1) * th, bj * tw : (bj + 1) * tw] = (
                    _to_f32(r[c])
                )
    v_s[:, 0:tw] = vmap_0_ref[...]
    v_s[:, tw : 2 * tw] = vmap_1_ref[...]

    twe = tw + 2 * m + 2  # tmp width: the horizontal sampling reach

    # ---- vertical pass ---------------------------------------------------
    # tmp(i, c) = S[ly(i, c), c] for source columns c in the tile's reach.
    ly = v_s[:, 0:twe]  # (TH, TWE) global source rows
    row0 = (ty * th).astype(jnp.float32) - (m + 1)  # global row of S row 0
    i_iota = lax.broadcasted_iota(jnp.int32, (th, twe), 0).astype(jnp.float32)
    s_f = ly - row0 - i_iota  # desired S-local row minus output row
    s_f = jnp.clip(s_f, 1.0, float(2 * m + 1) - 1e-3)
    s0 = jnp.floor(s_f)
    fy = s_f - s0
    s0i = s0.astype(jnp.int32)
    s_lo = jnp.min(s0i)
    s_hi = jnp.max(s0i)

    for c in range(channels):
        tmp_s[c, :, 0:twe] = jnp.zeros((th, twe), jnp.float32)

    def vbody(s, _):
        mk = (s0i == s).astype(jnp.float32)
        wa = mk * (1.0 - fy)
        wb = mk * fy
        for c in range(channels):
            # Dynamic sublane rotate (Mosaic requires dynamic slice *offsets*
            # to be 8-aligned; roll has no such constraint), static slices.
            r = pltpu.roll(s_s[c, :, :], -s, axis=0)
            tmp_s[c, :, 0:twe] += (
                wa * r[0:th, 0:twe] + wb * r[1 : th + 1, 0:twe]
            )
        return 0

    lax.fori_loop(s_lo, s_hi + 1, vbody, 0)

    # ---- horizontal pass -------------------------------------------------
    # out(i, j) = tmp(i, lx(i, j)); tmp col 0 is global col tx*TW - m - 1.
    lx = xmap_ref[...]  # (TH, TW) global source cols
    col0 = (tx * tw).astype(jnp.float32) - (m + 1)
    j_iota = lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    t_f = lx - col0 - j_iota
    t_f = jnp.clip(t_f, 1.0, float(2 * m + 1) - 1e-3)
    t0 = jnp.floor(t_f)
    fx = t_f - t0
    t0i = t0.astype(jnp.int32)
    t_lo = jnp.min(t0i)
    t_hi = jnp.max(t0i)

    u8_out = out_ref.dtype == jnp.uint8
    acc = refs[8] if u8_out else out_ref
    acc[...] = jnp.zeros(acc.shape, jnp.float32)

    def hbody(s, _):
        mk = (t0i == s).astype(jnp.float32)
        wa = mk * (1.0 - fx)
        wb = mk * fx
        for c in range(channels):
            r = pltpu.roll(tmp_s[c, :, :], -s, axis=1)
            acc[c, :, :] += wa * r[:, 0:tw] + wb * r[:, 1 : tw + 1]
        return 0

    lax.fori_loop(t_lo, t_hi + 1, hbody, 0)
    if u8_out:
        # Quantize in VMEM (round half up = reference u8 UMat stores);
        # the HBM out write is then 4x smaller.
        for c in range(channels):
            out_ref[c, :, :] = jnp.clip(acc[c] + 0.5, 0.0, 255.0).astype(
                jnp.int32
            ).astype(jnp.uint8)
    del acc


def _easu_kernel(
    xmap_ref,
    vmap_0_ref, vmap_1_ref,
    *refs,
    th: int,
    tw: int,
    margin: int,
    channels: int,
    fmt,
):
    """EASU 12-tap variant: the two shift-select passes align the 4x4
    integer tap neighbourhood (plus the fractional-offset map as an extra
    plane), then the shared EASU math (ops/easu._easu_core) runs on the
    aligned tap planes — the Pallas realization of the reference's fused
    easu_remap (FSR.cl:362-452)."""
    from livevisionkit_tpu.ops import easu as easu_ops

    src_refs = refs[:4]
    out_ref, s_s, v_s, r_s, t_s = refs[4:9]
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    m = margin

    for bi in range(2):
        for bj in range(2):
            r = src_refs[bi * 2 + bj]
            for c in range(channels):
                s_s[c, bi * th : (bi + 1) * th, bj * tw : (bj + 1) * tw] = (
                    _to_f32(r[c])
                )
    v_s[:, 0:tw] = vmap_0_ref[...]
    v_s[:, tw : 2 * tw] = vmap_1_ref[...]

    twe = tw + 2 * m + 4  # +1 left tap, +2 right taps, +1 lerp slack

    # ---- vertical alignment: 4 row-tap planes + the fy plane --------------
    ly = v_s[:, 0:twe]
    row0 = (ty * th).astype(jnp.float32) - (m + 1)
    i_iota = lax.broadcasted_iota(jnp.int32, (th, twe), 0).astype(jnp.float32)
    s_f = ly - row0 - i_iota
    s_f = jnp.clip(s_f, 1.0, float(2 * m + 1) - 1e-3)
    s0 = jnp.floor(s_f)
    fy = s_f - s0
    s0i = s0.astype(jnp.int32)
    s_lo = jnp.min(s0i)
    s_hi = jnp.max(s0i)

    # r_s layout: (4 row taps, C+1 planes, TH, TWE); plane C carries fy.
    r_s[...] = jnp.zeros(r_s.shape, r_s.dtype)

    def vbody(s, _):
        mk = (s0i == s).astype(jnp.float32)
        for c in range(channels):
            # One sublane rotate aligns row s-1 to row 0; the 4 row taps
            # are static slices of the rotated plane (dr = rt - 1).
            r = pltpu.roll(s_s[c, :, :], -(s - 1), axis=0)
            for rt in range(4):
                r_s[rt, c, :, 0:twe] += mk * r[rt : rt + th, 0:twe]
        r_s[0, channels, :, 0:twe] += mk * fy  # fy rides along row-tap 0
        return 0

    lax.fori_loop(s_lo, s_hi + 1, vbody, 0)

    # ---- horizontal alignment: 4x4 tap planes + fx -------------------------
    lx = xmap_ref[...]
    # r_s column 0 is global col tx*TW - m - 1.
    col0 = (tx * tw).astype(jnp.float32) - (m + 1)
    j_iota = lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    t_f = lx - col0 - j_iota
    t_f = jnp.clip(t_f, 1.0, float(2 * m + 1) - 1e-3)
    t0 = jnp.floor(t_f)
    fx = t_f - t0
    t0i = t0.astype(jnp.int32)
    t_lo = jnp.min(t0i)
    t_hi = jnp.max(t0i)

    # Tap letters on the 4x4 grid (rows -1..2 of floor, cols -1..2):
    #        .  b  c  .
    #        e  f  g  h
    #        i  j  k  l
    #        .  n  o  .
    grid_letters = {
        (0, 1): "b", (0, 2): "c",
        (1, 0): "e", (1, 1): "f", (1, 2): "g", (1, 3): "h",
        (2, 0): "i", (2, 1): "j", (2, 2): "k", (2, 3): "l",
        (3, 1): "n", (3, 2): "o",
    }
    slot_of = {rc: i for i, rc in enumerate(grid_letters)}

    # t_s layout: (12 EASU taps, C, TH, TW) + fy aligned in slot 12.  The
    # 4x4 corners are NOT EASU taps (FSR.cl:100-127) — accumulating them
    # was ~25% wasted h-loop work per channel (r5).
    t_s[...] = jnp.zeros(t_s.shape, t_s.dtype)

    def hbody(s, _):
        mk = (t0i == s).astype(jnp.float32)
        # One dynamic roll per (row tap, channel) aligns col s-1 to col 0;
        # the 4 column taps are then static slices of the rolled plane.
        for rt in range(4):
            for c in range(channels):
                r = pltpu.roll(r_s[rt, c, :, :], -(s - 1), axis=1)
                for ct in range(4):  # dc = ct - 1; rolled col = dc + 1
                    if (rt, ct) not in slot_of:
                        continue
                    t_s[slot_of[(rt, ct)], c, :, :] += mk * r[:, ct : ct + tw]
        rf = pltpu.roll(r_s[0, channels, :, :], -s, axis=1)
        t_s[12, 0, :, :] += mk * rf[:, 0:tw]
        return 0

    lax.fori_loop(t_lo, t_hi + 1, hbody, 0)

    # ---- EASU math on the aligned taps -------------------------------------
    px = {}
    for (rt, ct), letter in grid_letters.items():
        px[letter] = jnp.stack(
            [t_s[slot_of[(rt, ct)], c, :, :] for c in range(channels)]
        )
    ppy = t_s[12, 0, :, :]
    ppx = fx
    out = easu_ops._easu_core(px, ppx, ppy, fmt)
    if out_ref.dtype == jnp.uint8:
        out = jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.int32).astype(
            jnp.uint8
        )
    out_ref[...] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile", "margin", "max_shift", "interpret", "fill_mode", "filter_mode",
        "fmt",
    ),
)
def pallas_remap(
    src: jax.Array,  # (C, H, W) or (H, W)
    sample_map: jax.Array,  # (2, H, W) absolute (y, x)
    fill: jax.Array | float | None = 0.0,
    tile: tuple[int, int] = (128, 128),
    margin: int = 32,
    max_shift: int = 256,
    interpret: bool = False,
    fill_mode: bool = True,
    filter_mode: str = "bilinear",  # or "easu" (FSR edge-adaptive sampling)
    fmt=None,  # PixelFormat for EASU luma selection (default YUV)
) -> jax.Array:
    """Backward-warp via the Pallas kernel.  Matches ops.remap.remap
    (bilinear) / ops.easu.easu_remap (easu) for warps whose post-mean-shift
    displacement fits `margin` px (stabilization/mesh/lens warps by
    construction).

    The output grid is the sample_map's spatial shape; the source may be
    LARGER than the output (r5): `parallel/spatial.py::remap_sharded` warps
    each device's halo-padded local stripe with a map rebased into stripe
    coordinates — the stripe offset is just part of the mean displacement
    the kernel already removes (one dynamic-slice of the padded source).
    """
    squeeze = src.ndim == 2
    if squeeze:
        src = src[None]
    # uint8 sources stay u8 through the pad and the block DMAs (4x less HBM
    # traffic than pre-casting; the reference warps 8-bit UMats the same
    # way) and are cast to f32 at the in-VMEM neighbourhood assembly.  The
    # kernel output is always f32.
    if src.dtype != jnp.uint8:
        src = src.astype(jnp.float32)
    c, h_src, w_src = src.shape
    h, w = sample_map.shape[-2:]  # output grid; coords are in SOURCE frame
    th, tw = tile
    assert 2 * margin + 4 <= min(th, tw), (
        "2*margin+4 must fit in one tile (2-block window span)"
    )

    # ---- 1. remove the mean integer displacement (XLA, cheap) ------------
    idm = remap_ops.identity_map((h, w))
    disp = sample_map - idm
    mdy = jnp.clip(jnp.round(jnp.mean(disp[0])).astype(jnp.int32), -max_shift, max_shift)
    mdx = jnp.clip(jnp.round(jnp.mean(disp[1])).astype(jnp.int32), -max_shift, max_shift)
    map_y = sample_map[0] - mdy.astype(jnp.float32)
    map_x = sample_map[1] - mdx.astype(jnp.float32)

    # ---- 2. first-order separability correction --------------------------
    # Central differences; FULL one-sided differences at the boundary
    # columns (edge-padded central differences halve the slope there, which
    # costs ~0.01 px of vertical coordinate error at edge columns — visible
    # through EASU weighting when the output grid is a sharded stripe whose
    # every edge is such a column; same fix as the batched kernel, r4).
    dy_dx = jnp.concatenate(
        [
            map_y[:, 1:2] - map_y[:, 0:1],
            (map_y[:, 2:] - map_y[:, :-2]) * 0.5,
            map_y[:, -1:] - map_y[:, -2:-1],
        ],
        axis=1,
    )
    vmap_y = map_y - dy_dx * (map_x - idm[1])
    # Clamp into the halo reach (replicate semantics via edge padding).
    vmap_y = jnp.clip(vmap_y, float(2 - margin), float(h_src - 3 + margin))
    map_x = jnp.clip(map_x, float(2 - margin), float(w_src - 3 + margin))

    # ---- 3. pad into the (margin+1)-shifted tile layout -------------------
    # The source and the vmap columns are shifted by sft = margin+1, so the
    # window [t*T - m - 1, t*T + T + m + 3) of tile t is covered by blocks
    # {t, t+1} exactly (2*margin+4 <= tile).
    sft = margin + 1
    h2, w2 = _round_up(h, th), _round_up(w, tw)
    gh, gw = h2 // th, w2 // tw
    hs, ws = (gh + 1) * th, (gw + 1) * tw  # shifted-layout extents

    # Source: ONE edge pad covering both the mean shift and the tile layout,
    # then one dynamic-slice into the shifted layout (src_g[r] = src[r + mdy
    # - sft]).  Fusing the two stages keeps real frame content in the halo
    # band (a separate mean-shift pass would edge-replicate it) and saves a
    # full-frame copy.
    # Bottom/right pads cover the dynamic-slice reach for any |shift| <=
    # max_shift; a source already wider than the output grid (sharded
    # stripe) may need none (the max(0, ...)).
    src_big = jnp.pad(
        src,
        (
            (0, 0),
            (max_shift + sft, max(0, max_shift + hs - h_src - sft)),
            (max_shift + sft, max(0, max_shift + ws - w_src - sft)),
        ),
        mode="edge",
    )
    src_g = lax.dynamic_slice(
        src_big, (0, max_shift + mdy, max_shift + mdx), (c, hs, ws)
    )
    # Vertical map, indexed (output row, source col): displacement-preserving
    # pad (replicate the displacement, keep the row-identity base), columns
    # shifted right by sft.
    d_v = vmap_y - idm[0]
    d_v = jnp.pad(d_v, ((0, h2 - h), (sft, ws - w - sft)), mode="edge")
    vmap_g = lax.broadcasted_iota(jnp.float32, (h2, ws), 0) + d_v
    # Horizontal map, indexed (output row, output col): no shift, no halo.
    d_x = map_x - idm[1]
    d_x = jnp.pad(d_x, ((0, h2 - h), (0, w2 - w)), mode="edge")
    xmap_g = lax.broadcasted_iota(jnp.float32, (h2, w2), 1) + d_x

    if filter_mode == "easu":
        from livevisionkit_tpu.types import PixelFormat

        kernel = functools.partial(
            _easu_kernel, th=th, tw=tw, margin=margin, channels=c,
            fmt=fmt if fmt is not None else PixelFormat.YUV,
        )
        extra_scratch = [
            pltpu.VMEM(
                (4, c + 1, th, _round_up(tw + 2 * margin + 4, 128)), jnp.float32
            ),
            pltpu.VMEM((13, c, th, tw), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _kernel, th=th, tw=tw, margin=margin, channels=c
        )
        extra_scratch = [
            pltpu.VMEM((c, th, _round_up(tw + 2 * margin + 2, 128)), jnp.float32),
            pltpu.VMEM((c, th, tw), jnp.float32),  # u8-out accumulator
        ]
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
    vmap_specs = [
        pl.BlockSpec(
            (th, tw),
            functools.partial(lambda ty, tx, dj: (ty, tx + dj), dj=bj),
            memory_space=pltpu.VMEM,
        )
        for bj in range(2)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(
                (th, tw), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM
            ),
            *vmap_specs,
            *src_specs,
        ],
        out_specs=pl.BlockSpec(
            (c, th, tw), lambda ty, tx: (0, ty, tx), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, 2 * th, 2 * tw), jnp.float32),
            pltpu.VMEM((th, 2 * tw), jnp.float32),
            *extra_scratch,
        ],
        out_shape=jax.ShapeDtypeStruct((c, h2, w2), src.dtype),
        interpret=interpret,
    )(xmap_g, *([vmap_g] * 2), *([src_g] * 4))

    out = out[:, :h, :w]
    if fill_mode:
        out = _apply_fill(
            out, sample_map, (h_src, w_src), fill, jnp.float32,
            floor_inside=(filter_mode == "easu"),
        )
    return out[0] if squeeze else out


def _kernel_batched(
    q_ref,  # (S, 2) scalar-prefetch: per-stream block offsets (+n0), y then x
    xmap_ref,  # (1, TH, TW)
    *refs,
    th: int,
    tw: int,
    b: int,
    m_eff: int,
    n_cb: int,
):
    """Batched kernel: one (stream, tile_y, tile_x, channel) grid step.  The
    per-stream integer mean shift is applied at BLOCK granularity through the
    scalar-prefetched index maps (q_ref) that selected this step's source
    blocks, so the kernel itself only sees the residual (|residual| <= b/2),
    absorbed by the widened margin m_eff = margin + b/2.  Sources arrive as
    a 4x4 block neighbourhood of (b, b) blocks (2x2 tiles of the (th, tw) =
    (2b, 2b) output tile).

    The channel axis is innermost in the grid, so the channel-invariant vg
    strip and xmap blocks keep the same block indices across the c steps of
    a tile and are NOT re-fetched (Pallas skips same-index DMAs); only the
    cheap mask math re-runs per channel.  A channel-fused variant (grid
    (S, gh, gw)) was measured r4 and hits the 16 MB scoped-VMEM ceiling at
    tile=256/c=3 — per-channel stays ~4x under it."""
    vg_refs = refs[:n_cb]
    src_refs = refs[n_cb : n_cb + 16]  # each (1, 1, b, b)
    out_ref, s_s, tmp_s, acc_s = refs[n_cb + 16 : n_cb + 20]
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    u8_out = out_ref.dtype == jnp.uint8

    # s_s holds only the rows the shift window can read (trim saves VMEM).
    rs_rows = s_s.shape[0]
    for bi in range(4):
        lo = bi * b
        hi = min((bi + 1) * b, rs_rows)
        if lo >= rs_rows:
            continue
        for bj in range(4):
            s_s[lo:hi, bj * b : (bj + 1) * b] = _to_f32(
                src_refs[bi * 4 + bj][0, 0, 0 : hi - lo, :]
            )

    twe = tw + 2 * m_eff + 2

    # ---- vertical pass ---------------------------------------------------
    # The vg strip stages through tmp_s (scratch reuse: the mask arrays are
    # loaded into values before tmp_s is zeroed for accumulation).
    for bj in range(n_cb):
        tmp_s[:, bj * b : (bj + 1) * b] = vg_refs[bj][0]
    ly = tmp_s[:, 0:twe]
    row0 = (ty * th).astype(jnp.float32) - (m_eff + 1)
    i_iota = lax.broadcasted_iota(jnp.int32, (th, twe), 0).astype(jnp.float32)
    s_f = ly - row0 - i_iota
    s_f = jnp.clip(s_f, 1.0, float(2 * m_eff + 1) - 1e-3)
    s0 = jnp.floor(s_f)
    fy = s_f - s0
    s0i = s0.astype(jnp.int32)
    s_lo = jnp.min(s0i)
    s_hi = jnp.max(s0i)

    tmp_s[:, 0:twe] = jnp.zeros((th, twe), jnp.float32)

    def vbody(s, _):
        mk = (s0i == s).astype(jnp.float32)
        wa = mk * (1.0 - fy)
        wb = mk * fy
        # Dynamic sublane rotate (Mosaic requires dynamic slice *offsets*
        # to be 8-aligned; roll has no such constraint), static slices.
        r = pltpu.roll(s_s[...], -s, axis=0)
        tmp_s[:, 0:twe] += wa * r[0:th, 0:twe] + wb * r[1 : th + 1, 0:twe]
        return 0

    lax.fori_loop(s_lo, s_hi + 1, vbody, 0)

    # ---- horizontal pass -------------------------------------------------
    lx = xmap_ref[0]
    col0 = (tx * tw).astype(jnp.float32) - (m_eff + 1)
    j_iota = lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    t_f = lx - col0 - j_iota
    t_f = jnp.clip(t_f, 1.0, float(2 * m_eff + 1) - 1e-3)
    t0 = jnp.floor(t_f)
    fx = t_f - t0
    t0i = t0.astype(jnp.int32)
    t_lo = jnp.min(t0i)
    t_hi = jnp.max(t0i)

    if u8_out:
        acc_s[...] = jnp.zeros(acc_s.shape, acc_s.dtype)
    else:
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def hbody(s, _):
        mk = (t0i == s).astype(jnp.float32)
        r = pltpu.roll(tmp_s[...], -s, axis=1)
        v = mk * ((1.0 - fx) * r[:, 0:tw] + fx * r[:, 1 : tw + 1])
        if u8_out:
            acc_s[...] += v
        else:
            out_ref[0, 0] += v
        return 0

    lax.fori_loop(t_lo, t_hi + 1, hbody, 0)
    if u8_out:
        # Quantize in VMEM (round half up, like the reference's u8 UMat
        # stores) — the HBM out write is then 4x smaller, and the fill
        # `where` downstream reads u8 instead of f32.
        out_ref[0, 0] = jnp.clip(acc_s[...] + 0.5, 0.0, 255.0).astype(
            jnp.int32
        ).astype(jnp.uint8)


def _easu_kernel_batched(
    q_ref,  # (S, 2) scalar-prefetch: per-stream block offsets (+n0), y then x
    xmap_ref,  # (1, TH, TW)
    *refs,
    th: int,
    tw: int,
    b: int,
    m_eff: int,
    n_cb: int,
    ablate: frozenset = frozenset(),
):
    """Batched EASU warp: the reference-parity serving kernel.

    Same block-offset scalar-prefetch machinery as `_kernel_batched` (grid
    (S, gh, gw, c), per-stream mean shifts at block granularity, widened
    margin m_eff), but with EASU 12-tap sampling (FSR.cl:362-452).  The key
    fit trick vs the solo `_easu_kernel`: EASU's tap WEIGHTS depend only on
    the luma plane and the sub-pixel position — both channel-invariant.
    Plane 0 is the luma plane BY CONSTRUCTION: for YUV/GRAY it is the real
    channel 0 (ops/easu._luma), for RGB-family formats the wrapper prepends
    a synthetic luma plane (see pallas_remap_batched) and discards its
    warped output.  With the channel axis innermost in the grid, the ci==0
    (luma) step aligns the 12 luma
    tap planes, computes the 12 weight planes + the reciprocal weight sum,
    and PERSISTS them in scratch (scratch survives across sequential grid
    steps); the ci>0 (chroma) steps then fuse weighting directly into the
    horizontal shift-select — no 16-plane tap materialization — which is
    what keeps the whole kernel ~10.6 MB of scratch at tile=256 (the naive
    batched EASU at tile=256 exceeds the 16 MB VMEM budget; COVERAGE r4).

    Per-channel de-ringing (clip to min/max of f,g,j,k, FSR.cl:318-322)
    accumulates the 4 central taps alongside (chroma steps reuse the stale
    luma slots t_s[0:4] as those accumulators).
    """
    from livevisionkit_tpu.ops import easu as easu_ops

    vg_refs = refs[:n_cb]
    src_refs = refs[n_cb : n_cb + 16]  # each (1, 1, b, b)
    out_ref, s_s, r_s, fy_s, t_s, w_s, acc_s = refs[n_cb + 16 : n_cb + 23]
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    ci = pl.program_id(3)
    u8_out = out_ref.dtype == jnp.uint8

    tap_list = list(easu_ops._TAPS.items())  # fixed (letter, (dx, dy)) order
    slot = {letter: i for i, (letter, _) in enumerate(tap_list)}
    # (rt, ct) grid position of each tap: rt = dy+1, ct = dx+1.
    grid_of = {(dy + 1, dx + 1): letter for letter, (dx, dy) in tap_list}

    rs_rows = s_s.shape[0]
    for bi in range(4):
        lo = bi * b
        hi = min((bi + 1) * b, rs_rows)
        if lo >= rs_rows:
            continue
        for bj in range(4):
            s_s[lo:hi, bj * b : (bj + 1) * b] = _to_f32(
                src_refs[bi * 4 + bj][0, 0, 0 : hi - lo, :]
            )

    twe = tw + 2 * m_eff + 4  # EASU horizontal reach: -1 left, +2 right taps

    # ---- vertical alignment: 4 row-tap planes + fy ------------------------
    # The vg strip stages through fy_s; the mask planes are materialized as
    # values before fy_s is zeroed for fy accumulation.
    for bj in range(n_cb):
        fy_s[:, bj * b : (bj + 1) * b] = vg_refs[bj][0]
    ly = fy_s[:, 0:twe]
    row0 = (ty * th).astype(jnp.float32) - (m_eff + 1)
    i_iota = lax.broadcasted_iota(jnp.int32, (th, twe), 0).astype(jnp.float32)
    s_f = ly - row0 - i_iota
    s_f = jnp.clip(s_f, 1.0, float(2 * m_eff + 1) - 1e-3)
    s0 = jnp.floor(s_f)
    fy = s_f - s0
    s0i = s0.astype(jnp.int32)
    s_lo = jnp.min(s0i)
    s_hi = jnp.max(s0i)

    r_s[...] = jnp.zeros(r_s.shape, r_s.dtype)
    fy_s[:, 0:twe] = jnp.zeros((th, twe), jnp.float32)

    def vbody(s, _):
        mk = (s0i == s).astype(jnp.float32)
        # One sublane rotate aligns row s-1 to row 0; the 4 row taps are
        # static slices of the rotated plane (dr = rt - 1).
        r = pltpu.roll(s_s[...], -(s - 1), axis=0)
        for rt in range(4):
            r_s[rt, :, 0:twe] += mk * r[rt : rt + th, 0:twe]
        fy_s[:, 0:twe] += mk * fy
        return 0

    if "vert" not in ablate:
        lax.fori_loop(s_lo, s_hi + 1, vbody, 0)

    # ---- horizontal mask math (channel-invariant, cheap recompute) --------
    lx = xmap_ref[0]
    col0 = (tx * tw).astype(jnp.float32) - (m_eff + 1)
    j_iota = lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    t_f = lx - col0 - j_iota
    t_f = jnp.clip(t_f, 1.0, float(2 * m_eff + 1) - 1e-3)
    t0 = jnp.floor(t_f)
    fx = t_f - t0
    t0i = t0.astype(jnp.int32)
    t_lo = jnp.min(t0i)
    t_hi = jnp.max(t0i)

    def write_out(val):
        if u8_out:
            out_ref[0, 0] = jnp.clip(val + 0.5, 0.0, 255.0).astype(
                jnp.int32
            ).astype(jnp.uint8)
        else:
            out_ref[0, 0] = val

    @pl.when(ci == 0)
    def _luma_step():
        # Align the 12 luma tap planes + fy, then compute + persist weights.
        t_s[...] = jnp.zeros(t_s.shape, t_s.dtype)

        def hbody(s, _):
            mk = (t0i == s).astype(jnp.float32)
            for rt in range(4):
                r = pltpu.roll(r_s[rt], -(s - 1), axis=1)
                for ct in range(4):
                    letter = grid_of.get((rt, ct))
                    if letter is None:  # 4x4 corners are not EASU taps
                        continue
                    t_s[slot[letter]] += mk * r[:, ct : ct + tw]
            rf = pltpu.roll(fy_s[...], -s, axis=1)
            t_s[12] += mk * rf[:, 0:tw]
            return 0

        if "luma_h" not in ablate:
            lax.fori_loop(t_lo, t_hi + 1, hbody, 0)
        if "weights" in ablate:
            for i in range(13):
                w_s[i] = jnp.full((th, tw), 1.0 / 12.0, jnp.float32)
            write_out(t_s[5])
            return

        # Inline scratch reads (no dict of 12 live tap planes): each
        # _accumulate call's 5 loads die at the call, keeping the luma
        # step's live-value footprint ~5 planes instead of 12.
        def lum(letter):
            return t_s[slot[letter]]

        ppy = t_s[12]
        ppx = fx
        zero = jnp.zeros_like(ppx)
        dirx, diry, length = zero, zero, zero
        # Four bilinear corners f, g, j, k — same order as _easu_core.
        dirx, diry, length = easu_ops._accumulate(
            dirx, diry, length, 1 - ppx, 1 - ppy,
            lum("b"), lum("e"), lum("f"), lum("g"), lum("j"))
        dirx, diry, length = easu_ops._accumulate(
            dirx, diry, length, ppx, 1 - ppy,
            lum("c"), lum("f"), lum("g"), lum("h"), lum("k"))
        dirx, diry, length = easu_ops._accumulate(
            dirx, diry, length, 1 - ppx, ppy,
            lum("f"), lum("i"), lum("j"), lum("k"), lum("n"))
        dirx, diry, length = easu_ops._accumulate(
            dirx, diry, length, ppx, ppy,
            lum("g"), lum("j"), lum("k"), lum("l"), lum("o"))
        dxx, dyx, dxy, dyy, clp, cw1, cw2, cw3, cw4 = easu_ops._shape_kernel(
            dirx, diry, length
        )
        aw = zero
        for i, (letter, (dx, dy)) in enumerate(tap_list):
            offx = dx - ppx
            offy = dy - ppy
            vx = offx * dxx + offy * dyx
            vy = offx * dxy + offy * dyy
            d2 = jnp.minimum(vx * vx + vy * vy, clp)
            w = 1.0 + d2 * (cw1 + d2 * (cw2 + d2 * (cw3 + d2 * cw4)))
            w_s[i] = w
            aw = aw + w
        inv_aw = 1.0 / jnp.where(jnp.abs(aw) > 1e-20, aw, 1e-20)
        w_s[12] = inv_aw

        ac = zero
        for i, (letter, _) in enumerate(tap_list):
            ac = ac + t_s[slot[letter]] * w_s[i]
        mi4 = jnp.minimum(
            jnp.minimum(lum("f"), lum("g")), jnp.minimum(lum("j"), lum("k"))
        )
        ma4 = jnp.maximum(
            jnp.maximum(lum("f"), lum("g")), jnp.maximum(lum("j"), lum("k"))
        )
        write_out(jnp.clip(ac * inv_aw, mi4, ma4))

    @pl.when(ci != 0)
    def _chroma_step():
        # Weighting fused into the shift-select: no chroma tap planes, only
        # the weighted accumulator + the 4 central taps for the de-ring
        # clamp (in the stale luma slots t_s[0:4]).
        acc_s[...] = jnp.zeros(acc_s.shape, acc_s.dtype)
        cen = {"f": 0, "g": 1, "j": 2, "k": 3}
        for sl in cen.values():
            t_s[sl] = jnp.zeros((th, tw), jnp.float32)

        def hbody(s, _):
            mk = (t0i == s).astype(jnp.float32)
            for rt in range(4):
                r = pltpu.roll(r_s[rt], -(s - 1), axis=1)
                for ct in range(4):
                    letter = grid_of.get((rt, ct))
                    if letter is None:
                        continue
                    tap = mk * r[:, ct : ct + tw]
                    acc_s[...] += w_s[slot[letter]] * tap
                    if letter in cen:
                        t_s[cen[letter]] += tap
            return 0

        if "chroma_h" not in ablate:
            lax.fori_loop(t_lo, t_hi + 1, hbody, 0)
        mi4 = jnp.minimum(jnp.minimum(t_s[0], t_s[1]), jnp.minimum(t_s[2], t_s[3]))
        ma4 = jnp.maximum(jnp.maximum(t_s[0], t_s[1]), jnp.maximum(t_s[2], t_s[3]))
        write_out(jnp.clip(acc_s[...] * w_s[12], mi4, ma4))


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile", "margin", "max_shift", "interpret", "filter_mode", "fmt",
        "_ablate",
    ),
)
def pallas_remap_batched(
    src_b: jax.Array,  # (S, C, H, W)
    sample_map_b: jax.Array,  # (S, 2, H, W) absolute (y, x)
    tile: int | None = None,
    margin: int | None = None,
    max_shift: int = 256,
    interpret: bool = False,
    filter_mode: str = "bilinear",  # or "easu"
    fmt=None,  # PixelFormat for EASU luma selection (default YUV)
    _ablate: tuple = (),  # profiling only: kernel stages to skip (wrong output)
) -> jax.Array:
    """Batched (multi-stream) warp: the S-dependence fix for serving.

    The solo pallas_remap removes each warp's mean integer displacement with
    one `lax.dynamic_slice` — which under `vmap` (per-stream offsets) XLA
    lowers as a gather costing ~5.7 ms extra at S=8/1080p on v5e, even with
    lane-aligned offsets (measured r3; see ops/remap.py docstring).  Here the
    mean shift never touches XLA: the (S, 2) block offsets ride in as
    scalar-prefetch values read by the Pallas index maps, so each stream's
    tile fetches its source blocks pre-shifted at block granularity
    (b = tile/2) and the in-kernel shift-select absorbs the residual
    (|r| <= b/2) through a widened margin m_eff = margin + b/2.  The XLA
    pre-pass is then a single STATIC edge pad — batching-friendly.

    Numerics: identical to pallas_remap except (a) the shift-select clip
    range is [1, 2*m_eff+1] (wider; only affects beyond-margin degradation),
    and (b) the separability linearization point is offset by the residual
    (exact for piecewise-bilinear mesh fields; O(curvature * (margin+b/2)^2)
    for perspective warps vs O(curvature * margin^2) solo — zero for the
    similarity-dominated stabilizer corrections).

    Returns the UNFILLED warp; callers apply border fill via _apply_fill.
    """
    if filter_mode not in ("bilinear", "easu"):
        raise ValueError(f"unknown filter_mode {filter_mode!r}")
    synth_luma = False
    if filter_mode == "easu":
        from livevisionkit_tpu.types import PixelFormat

        if fmt is None:
            fmt = PixelFormat.YUV
        if fmt not in (PixelFormat.YUV, PixelFormat.GRAY):
            # RGB-family luma mixes all three channels (FSR.cl:286-297),
            # which the per-channel grid cannot see at once: prepend the
            # 2x-luma plane XLA-side so the kernel's plane-0-is-luma
            # contract holds for every format, and discard its warped
            # output.  The shift-select taps are exact source pixels (no
            # value interpolation), so sampling a precomputed luma plane
            # equals computing luma from the channel taps in-kernel.  For
            # u8 frames the plane is stored HALF-scale to stay in u8: the
            # EASU weight math is luma-scale-invariant (directions are
            # normalized, lengths are difference RATIOS) except the
            # degenerate-direction test dir_r < 1/32768, which quantized
            # content clears by >3 orders of magnitude; the u8 rounding of
            # the mix adds <=0.5 LSB of luma noise to direction estimates.
            synth_luma = True
            lum = (
                0.5 * src_b[:, 0].astype(jnp.float32)
                + src_b[:, 1].astype(jnp.float32)
                + 0.5 * src_b[:, 2].astype(jnp.float32)
            )
            if src_b.dtype == jnp.uint8:
                lum = jnp.clip(lum * 0.5 + 0.5, 0.0, 255.0).astype(jnp.uint8)
            else:
                lum = lum.astype(src_b.dtype)
            src_b = jnp.concatenate([lum[:, None], src_b], axis=1)
    if tile is None:
        tile = 256
    if margin is None:
        margin = 32
    S, c, h, w = src_b.shape
    th = tw = tile
    b = tile // 2
    assert 2 * margin + 4 <= b, "2*margin+4 must fit in one half-tile block"
    m_eff = margin + b // 2
    # Horizontal/vertical sampling reach beyond the tile: bilinear touches
    # [-1, +1] around floor (the +2 below), EASU [-1, +2] (taps) + lerp
    # slack (the +4) — both must fit the 4-block window.
    reach = 4 if filter_mode == "easu" else 2
    assert tw + 2 * m_eff + reach <= 4 * b, "sampling window exceeds 4 blocks"

    idm = remap_ops.identity_map((h, w))
    # Mean displacement as mean(map) - mean(identity): one fused reduction
    # over the map, no (S, 2, H, W) displacement tensor materialized.  (A
    # 12x-strided subsample was measured r4 at +1.6 ms/S=8 — the strided
    # read broke the map chain's fusion.)
    idm_mean = jnp.array([(h - 1) / 2.0, (w - 1) / 2.0], jnp.float32)
    md = jnp.round(jnp.mean(sample_map_b, axis=(2, 3)) - idm_mean).astype(
        jnp.int32
    )
    md = jnp.clip(md, -max_shift, max_shift)
    q = (md + b // 2) // b  # per-stream block offsets, floor div
    n0 = (max_shift + b // 2) // b
    qp = q + n0  # non-negative block offsets for the index maps

    qb = (q * b).astype(jnp.float32)  # (S, 2) removed shift in px
    res = md.astype(jnp.float32) - qb  # (S, 2) sub-block residual, |res|<=b/2
    map_y = sample_map_b[:, 0] - qb[:, 0][:, None, None]
    map_x = sample_map_b[:, 1] - qb[:, 1][:, None, None]

    # First-order separability correction (see _kernel docstring).  Note the
    # cross term uses map_x in the shift-removed frame: the horizontal
    # interpolation happens in that layout, where the sample column sits
    # res_x away from the output column — the residual belongs in the
    # linearization (exact for affine/mesh-cell fields, same as solo).
    mp = jnp.pad(map_y, ((0, 0), (0, 0), (1, 1)), mode="edge")
    dy_dx = (mp[:, :, 2:] - mp[:, :, :-2]) * 0.5
    # Full one-sided differences at the boundary columns (edge-padded
    # central differences halve the slope there, which pollutes both the
    # edge-band cross term and the halo extrapolation below).
    dy_dx = jnp.concatenate(
        [
            map_y[:, :, 1:2] - map_y[:, :, 0:1],
            dy_dx[:, :, 1:-1],
            map_y[:, :, -1:] - map_y[:, :, -2:-1],
        ],
        axis=2,
    )
    vmap_y = map_y - dy_dx * (map_x - idm[1])
    # Clamp into the halo reach, mirroring the solo kernel's bounds shifted
    # by the per-stream residual (solo removes the mean exactly, res == 0).
    ry = res[:, 0][:, None, None]
    rx = res[:, 1][:, None, None]
    vmap_y = jnp.clip(vmap_y, ry + (2.0 - margin), ry + (h - 3.0 + margin))
    map_x = jnp.clip(map_x, rx + (2.0 - margin), rx + (w - 3.0 + margin))

    h2, w2 = _round_up(h, th), _round_up(w, tw)
    gh, gw = h2 // th, w2 // tw

    # ---- static padded source in the block-offset layout ------------------
    # Stored row of original row r is r + p0y; tile ty of stream s fetches
    # row-blocks (2*ty + qp[s,0] + bi) * b, whose stored start equals the
    # shift-removed window start ty*th - m_eff - 1 + q*b + p0y exactly.
    p0y = (m_eff + 1) + n0 * b
    p0x = (m_eff + 1) + n0 * b
    hbig = b * (2 * gh + 2 * n0 + 2)
    wbig = b * (2 * gw + 2 * n0 + 2)
    if src_b.dtype != jnp.uint8:
        src_b = src_b.astype(jnp.float32)
    big = jnp.pad(
        src_b,
        ((0, 0), (0, 0), (p0y, hbig - h - p0y), (p0x, wbig - w - p0x)),
        mode="edge",
    )

    # Vertical map strip, (out row, shift-removed source col) with the col
    # origin at -(m_eff+1): tile tx reads col-blocks 2*tx + {0..n_cb-1}.
    # The window of tile tx starts exactly at strip block 2*tx (the lhalo
    # width m_eff+1 equals the window's left reach), so ceil(twe/b) blocks
    # cover it exactly — no +1 (r3 advisor: the extra block was ~20% wasted
    # vg HBM traffic per tile).
    n_cb = -(-(tw + 2 * m_eff + reach) // b)  # col-blocks covering twe
    wv = b * (2 * gw + n_cb)
    d_v = vmap_y - idm[0]
    # Column halo by LINEAR extrapolation, not replication: the strip is
    # indexed by (shift-removed) sample column, so entries up to
    # margin + |res| + 1 columns beyond the frame get read for edge-band
    # samples.  Replication there costs O(halo_depth * dy_dx) px of vertical
    # coordinate error (the solo kernel's halo is only `margin` deep, where
    # this is negligible); extrapolation makes the halo exact for affine
    # fields and first-order for general ones.
    lw = m_eff + 1
    rw = wv - w - lw
    lslope = d_v[:, :, 1:2] - d_v[:, :, 0:1]
    rslope = d_v[:, :, -1:] - d_v[:, :, -2:-1]
    lhalo = d_v[:, :, 0:1] + jnp.arange(-lw, 0, dtype=jnp.float32) * lslope
    rhalo = d_v[:, :, -1:] + jnp.arange(1, rw + 1, dtype=jnp.float32) * rslope
    d_v = jnp.concatenate([lhalo, d_v, rhalo], axis=2)
    d_v = jnp.pad(d_v, ((0, 0), (0, h2 - h), (0, 0)), mode="edge")
    vg = lax.broadcasted_iota(jnp.float32, (h2, wv), 0)[None] + d_v
    d_x = map_x - idm[1]
    d_x = jnp.pad(d_x, ((0, 0), (0, h2 - h), (0, w2 - w)), mode="edge")
    xg = lax.broadcasted_iota(jnp.float32, (h2, w2), 1)[None] + d_x

    rs_rows = min(_round_up(2 * m_eff + reach + th, 8), 4 * b)
    strip_w = max(_round_up(tw + 2 * m_eff + reach, 128), n_cb * b)
    if filter_mode == "easu":
        kernel = functools.partial(
            _easu_kernel_batched, th=th, tw=tw, b=b, m_eff=m_eff, n_cb=n_cb,
            ablate=frozenset(_ablate),
        )
        scratch_shapes = [
            pltpu.VMEM((rs_rows, 4 * b), jnp.float32),   # s_s
            pltpu.VMEM((4, th, strip_w), jnp.float32),   # r_s row taps
            pltpu.VMEM((th, strip_w), jnp.float32),      # fy_s (vg stage+fy)
            pltpu.VMEM((13, th, tw), jnp.float32),       # t_s luma taps + fy
            pltpu.VMEM((13, th, tw), jnp.float32),       # w_s weights + 1/aw
            pltpu.VMEM((th, tw), jnp.float32),           # acc_s
        ]
    else:
        kernel = functools.partial(
            _kernel_batched, th=th, tw=tw, b=b, m_eff=m_eff, n_cb=n_cb
        )
        scratch_shapes = [
            pltpu.VMEM((rs_rows, 4 * b), jnp.float32),
            pltpu.VMEM((th, strip_w), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
        ]
    vg_specs = [
        pl.BlockSpec(
            (1, th, b),
            functools.partial(
                lambda s, ty, tx, ci, q_ref, dj: (s, ty, 2 * tx + dj), dj=bj
            ),
        )
        for bj in range(n_cb)
    ]
    src_specs = [
        pl.BlockSpec(
            (1, 1, b, b),
            functools.partial(
                lambda s, ty, tx, ci, q_ref, di, dj: (
                    s, ci, 2 * ty + q_ref[s, 0] + di, 2 * tx + q_ref[s, 1] + dj
                ),
                di=bi, dj=bj,
            ),
        )
        for bi in range(4)
        for bj in range(4)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, gh, gw, c),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda s, ty, tx, ci, q_ref: (s, ty, tx)),
            *vg_specs,
            *src_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, tw),
            lambda s, ty, tx, ci, q_ref: (s, ci, ty, tx),
        ),
        scratch_shapes=scratch_shapes,
    )
    # EASU at tile=256 measures ~18.4 MB of scoped VMEM (scratch + the luma
    # step's live weight/tap value planes) vs XLA's default 16 MB scoped
    # budget — raise the kernel's limit (v5e VMEM has headroom above the
    # default); tile halving instead is blocked by Mosaic's 128-lane block
    # minimum (b=64 source blocks are not lane-aligned).
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024)
        if filter_mode == "easu"
        else None
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, c, h2, w2), src_b.dtype),
        interpret=interpret,
        compiler_params=params,
    )(qp, xg, *([vg] * n_cb), *([big] * 16))
    out = out[:, :, :h, :w]
    return out[:, 1:] if synth_luma else out


def _apply_fill(out, sample_map, size, fill, dtype, floor_inside=False):
    if fill is None:
        return out
    h, w = size
    ys, xs = sample_map[0, :h, :w], sample_map[1, :h, :w]
    if floor_inside:
        # EASU border semantics (FSR.cl:385-397): a sample is inside if its
        # integer coordinate is, and takes the nearest pixel there.
        yf, xf = jnp.floor(ys), jnp.floor(xs)
        inside = (yf >= 0) & (yf <= h - 1) & (xf >= 0) & (xf <= w - 1)
    else:
        inside = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    fill_arr = jnp.asarray(fill, dtype)
    if fill_arr.ndim == 1:
        fill_arr = fill_arr.reshape(-1, 1, 1)
    return jnp.where(inside, out, fill_arr)
