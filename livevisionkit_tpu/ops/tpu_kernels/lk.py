"""Pallas TPU kernels for sparse pyramidal Lucas-Kanade (EXPERIMENTAL, opt-in).

Everything solves inside one kernel per feature block: pyramid images load
into VMEM once, row selection is an MXU matmul against an in-register
one-hot, column selection a batched MXU contraction, and the Gauss-Newton
iterations unroll with all intermediates VMEM-resident.  `lk_level` runs one
level per launch; `lk_track` runs the whole coarse-to-fine pyramid in a
single launch.

MEASURED RESULT (TPU v5e, 510 features, 480x270, 3 levels, 5 iters): the
XLA formulation in vision/optical_flow is FASTER — 0.47 ms vs 0.56 ms
(per-level kernel) / 0.67 ms (single-launch pyramid).  XLA's fusion already
keeps the one-hot/strip intermediates on-chip, and Mosaic's N-batched
(taps, W) x (W, taps) contractions lag XLA's batched einsum.  Kept as a
tested, numerically-verified alternative (LVK_LK=pallas) and a base for
future Mosaic tuning; the XLA path is the default on every backend.

Numerics mirror _track_level (same clamped replicate-padding window
semantics, frozen-Jacobian iteration, patch-local Scharr gradients) with
bf16 MXU rounding — ~1e-4 px of flow difference on TPU.

Reference parity: cv::SparsePyrLKOpticalFlow (reference Vision/
FrameTracker.cpp:33-35,140-146) — 11x11 window, 5 iterations per level,
min-eigenvalue rejection, like the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot_rows(base, taps, h):
    """(F, taps, H) one-hot row selectors, indices clamped (replicate).

    `base` is (F, 1) — everything in-kernel stays >= 2-D (Mosaic's vector
    layout inference aborts on 1-D intermediates on this backend).
    """
    f = base.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (f, taps, h), 2)
    want = base[:, :, None] + lax.broadcasted_iota(jnp.int32, (f, taps, 1), 1)
    want = jnp.clip(want, 0, h - 1)
    return (pos == want).astype(jnp.float32)


def _extract(img_ref, bx, by, taps, f, h, w):
    """(F, taps, taps) windows of img at integer corners (bx, by), clamped.

    Rows: one (F*taps, H) @ (H, W) MXU matmul.  Columns: one batched
    (taps, W) x (W, taps) MXU contraction per feature against an in-register
    one-hot — all VMEM-resident.
    """
    rows = _onehot_rows(by, taps, h).reshape(f * taps, h)
    # bf16 MXU inputs: identical rounding to the XLA einsum path (whose
    # default matmul precision also feeds bf16), one hardware pass.
    strips = jnp.dot(
        rows.astype(jnp.bfloat16), img_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    strips = strips.reshape(f, taps, w)

    # Fine select as one batched MXU contraction over W per feature.
    pos = lax.broadcasted_iota(jnp.int32, (f, taps, w), 2)
    want = jnp.clip(
        bx[:, :, None] + lax.broadcasted_iota(jnp.int32, (f, taps, 1), 1),
        0, w - 1,
    )
    sel = (pos == want).astype(jnp.bfloat16)  # (F, taps, W)
    return lax.dot_general(
        strips.astype(jnp.bfloat16), sel,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (F, taps_rows, taps_cols)


def _bilinear(blocks, fx, fy):
    """(F, t-1, t-1) bilinear shift of (F, t, t) integer blocks; fx/fy (F, 1)."""
    b00 = blocks[:, :-1, :-1]
    b01 = blocks[:, :-1, 1:]
    b10 = blocks[:, 1:, :-1]
    b11 = blocks[:, 1:, 1:]
    fxe = fx[:, :, None]
    fye = fy[:, :, None]
    top = b00 + (b01 - b00) * fxe
    bot = b10 + (b11 - b10) * fxe
    return top + (bot - top) * fye


def _level_solve(prev_ref, next_ref, ptsx, ptsy, gux, guy,
                 f, h, w, win, iters, eig_thresh):
    """One level's template + Gauss-Newton refinement (values in/out)."""
    r = win // 2
    taps = win + 1

    # ---- template (+1 px gradient halo, single plane) ---------------------
    bx_t = jnp.floor(ptsx).astype(jnp.int32) - r - 1
    by_t = jnp.floor(ptsy).astype(jnp.int32) - r - 1
    fx_t = ptsx - jnp.floor(ptsx)
    fy_t = ptsy - jnp.floor(ptsy)
    blkt = _extract(prev_ref, bx_t, by_t, taps + 2, f, h, w)
    bwin = _bilinear(blkt, fx_t, fy_t)  # (F, win+2, win+2)
    tmpl = bwin[:, 1:-1, 1:-1]
    sv = (3.0 * bwin[:, :-2, :] + 10.0 * bwin[:, 1:-1, :] + 3.0 * bwin[:, 2:, :]) / 32.0
    gx = sv[:, :, 2:] - sv[:, :, :-2]
    dv = bwin[:, 2:, :] - bwin[:, :-2, :]
    gy = (3.0 * dv[:, :, :-2] + 10.0 * dv[:, :, 1:-1] + 3.0 * dv[:, :, 2:]) / 32.0

    gxx = jnp.sum(gx * gx, axis=2).sum(axis=1, keepdims=True)  # (F, 1)
    gxy = jnp.sum(gx * gy, axis=2).sum(axis=1, keepdims=True)
    gyy = jnp.sum(gy * gy, axis=2).sum(axis=1, keepdims=True)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) / 2.0
    good_g = (min_eig / (win * win)) >= eig_thresh
    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

    # ---- Gauss-Newton iterations (frozen Jacobian) -------------------------
    for _ in range(iters):
        jx = ptsx + gux
        jy = ptsy + guy
        bx_j = jnp.floor(jx).astype(jnp.int32) - r
        by_j = jnp.floor(jy).astype(jnp.int32) - r
        blocks = _extract(next_ref, bx_j, by_j, taps, f, h, w)
        warped = _bilinear(blocks, jx - jnp.floor(jx), jy - jnp.floor(jy))
        rr = tmpl - warped
        bxs = jnp.sum(rr * gx, axis=2).sum(axis=1, keepdims=True)
        bys = jnp.sum(rr * gy, axis=2).sum(axis=1, keepdims=True)
        gux = gux + (gyy * bxs - gxy * bys) * inv_det
        guy = guy + (gxx * bys - gxy * bxs) * inv_det

    tx = ptsx + gux
    ty = ptsy + guy
    inside = (tx >= 0.0) & (tx <= w - 1.0) & (ty >= 0.0) & (ty <= h - 1.0)
    return gux, guy, good_g & inside


def _lk_kernel(
    prev_ref, next_ref, px_ref, py_ref, gx_ref, gy_ref,
    ox_ref, oy_ref, good_ref,
    *, f: int, h: int, w: int, win: int, iters: int, eig_thresh: float,
):
    ptsx = px_ref[...]  # (F, 1) — keep >= 2-D throughout (Mosaic layouts)
    ptsy = py_ref[...]
    gux, guy, ok = _level_solve(
        prev_ref, next_ref, ptsx, ptsy, gx_ref[...], gy_ref[...],
        f, h, w, win, iters, eig_thresh,
    )
    ox_ref[...] = gux
    oy_ref[...] = guy
    good_ref[...] = ok.astype(jnp.float32)


def _lk_pyramid_kernel(
    *refs,
    f: int, shapes: tuple, win: int, iters: int, eig_thresh: float,
):
    """Whole coarse-to-fine pyramid in ONE kernel: per-level images are
    separate VMEM refs (static shapes), flow carried in-register — saves the
    per-level launch + HBM round-trip of flow/good vectors (the small levels
    are launch-bound)."""
    n_lvl = len(shapes)
    img_refs = refs[: 2 * n_lvl]  # prev0..prevL, next0..nextL
    px_ref, py_ref, gx_ref, gy_ref = refs[2 * n_lvl : 2 * n_lvl + 4]
    ox_ref, oy_ref, good_ref = refs[2 * n_lvl + 4 :]

    ptsx0 = px_ref[...]
    ptsy0 = py_ref[...]
    gux = gx_ref[...]  # at TOP level scale
    guy = gy_ref[...]
    good_all = jnp.ones(ptsx0.shape, jnp.float32) > 0.0
    for lvl in range(n_lvl - 1, -1, -1):
        h, w = shapes[lvl]
        s = float(2.0 ** lvl)
        gux, guy, ok = _level_solve(
            img_refs[lvl], img_refs[n_lvl + lvl],
            ptsx0 / s, ptsy0 / s, gux, guy,
            f, h, w, win, iters, eig_thresh,
        )
        good_all = good_all & ok
        if lvl > 0:
            gux = gux * 2.0
            guy = guy * 2.0
    ox_ref[...] = gux
    oy_ref[...] = guy
    good_ref[...] = good_all.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eig_thresh", "block", "interpret"),
)
def lk_level(
    prev_img: jax.Array,  # (H, W)
    next_img: jax.Array,  # (H, W)
    pts: jax.Array,  # (N, 2) (x, y) at this level's scale
    guess: jax.Array,  # (N, 2) incoming flow at this level's scale
    win: int,
    iters: int,
    eig_thresh: float,
    # 64 features per program: F=128 overflows the 16 MB scoped-VMEM stack
    # (the unrolled iterations keep several (F, taps, W) intermediates live).
    block: int = 64,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(flow, good) for one LK level — Pallas realization of
    vision/optical_flow._track_level."""
    n = pts.shape[0]
    h, w = prev_img.shape
    npad = _round_up(n, block)
    pad = npad - n

    def col(v):
        return jnp.pad(v, ((0, pad), (0, 0)))

    px = col(pts[:, 0:1])
    py = col(pts[:, 1:2])
    gx = col(guess[:, 0:1])
    gy = col(guess[:, 1:2])

    kernel = functools.partial(
        _lk_kernel, f=block, h=h, w=w, win=win, iters=iters,
        eig_thresh=eig_thresh,
    )
    img_spec = pl.BlockSpec((h, w), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
    ox, oy, good = pl.pallas_call(
        kernel,
        grid=(npad // block,),
        in_specs=[img_spec, img_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[vec_spec, vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(prev_img.astype(jnp.float32), next_img.astype(jnp.float32), px, py, gx, gy)
    flow = jnp.concatenate([ox[:n], oy[:n]], axis=1)
    return flow, good[:n, 0] > 0.5


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eig_thresh", "block", "interpret"),
)
def lk_track(
    prev_levels: tuple,  # pyramid level images, level 0 first
    next_levels: tuple,
    pts: jax.Array,  # (N, 2) (x, y) at level-0 scale
    init_flow: jax.Array,  # (N, 2) level-0-scale initial flow
    win: int,
    iters: int,
    eig_thresh: float,
    block: int = 64,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(flow, good) for the WHOLE pyramid — one kernel launch (the Pallas
    realization of vision/optical_flow.track's level loop)."""
    n = pts.shape[0]
    n_lvl = len(prev_levels)
    shapes = tuple(im.shape for im in prev_levels)
    npad = _round_up(n, block)
    pad = npad - n

    def col(v):
        return jnp.pad(v, ((0, pad), (0, 0)))

    scale_top = 2.0 ** (n_lvl - 1)
    px = col(pts[:, 0:1])
    py = col(pts[:, 1:2])
    gx = col(init_flow[:, 0:1]) / scale_top
    gy = col(init_flow[:, 1:2]) / scale_top

    kernel = functools.partial(
        _lk_pyramid_kernel, f=block, shapes=shapes, win=win, iters=iters,
        eig_thresh=eig_thresh,
    )
    img_specs = [
        pl.BlockSpec(s, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for s in shapes
    ] * 2
    vec_spec = pl.BlockSpec((block, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
    ox, oy, good = pl.pallas_call(
        kernel,
        grid=(npad // block,),
        in_specs=[*img_specs, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[vec_spec, vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        *[im.astype(jnp.float32) for im in prev_levels],
        *[im.astype(jnp.float32) for im in next_levels],
        px, py, gx, gy,
    )
    flow = jnp.concatenate([ox[:n], oy[:n]], axis=1)
    return flow, good[:n, 0] > 0.5
