"""Pallas warp kernel vs the XLA gather remap (interpret mode on CPU)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.models.homography import Homography
from livevisionkit_tpu.models.warp_field import WarpField
from livevisionkit_tpu.ops import remap as remap_ops
from livevisionkit_tpu.ops.tpu_kernels import warp as pwarp

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated


def _compare(src, smap, atol, crop=8, **kw):
    ref = remap_ops.remap(src, smap, fill=0.25)
    got = pwarp.pallas_remap(src, smap, fill=0.25, interpret=True, **kw)
    r = np.asarray(ref)[..., crop:-crop, crop:-crop]
    g = np.asarray(got)[..., crop:-crop, crop:-crop]
    err = np.abs(r - g)
    assert err.max() < atol, f"max err {err.max()}"
    return err


def test_identity_map(rng):
    src = fixtures.make_texture(160, 288, rng)
    smap = remap_ops.identity_map((160, 288))
    _compare(src, smap, 1e-4, tile=(64, 64), margin=16)


def test_translation_large(rng):
    # Large global translation: absorbed by per-tile bases.
    src = fixtures.make_texture(192, 320, rng)
    h = Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(37.3), jnp.float32(-21.7)
    )
    smap = h.sample_map((192, 320))
    _compare(src, smap, 1e-3, crop=48, tile=(64, 64), margin=16)


def test_rotation_scale(rng):
    src = fixtures.make_texture(192, 320, rng)
    h = Homography.from_similarity(
        jnp.float32(1.02), jnp.float32(0.03), jnp.float32(5.0), jnp.float32(-3.0)
    )
    smap = h.sample_map((192, 320))
    # First-order separability: rotation cross-terms cancel to <0.05 px;
    # on a texture that is ~1e-2 intensity.
    _compare(src, smap, 2e-2, crop=24, tile=(64, 64), margin=16)


def test_mesh_field(rng):
    src = fixtures.make_texture(192, 320, rng)
    off = np.zeros((2, 9, 11), np.float32)
    off[0] = 0.01 * np.sin(np.linspace(0, 3, 9))[:, None]
    off[1] = 0.012 * np.cos(np.linspace(0, 2, 11))[None, :]
    f = WarpField(offsets=jnp.asarray(off))
    smap = f.sample_map((192, 320))
    _compare(src, smap, 2e-2, crop=16, tile=(64, 64), margin=16)


def test_3channel_and_fill(rng):
    src = jnp.stack([fixtures.make_texture(160, 288, rng) for _ in range(3)])
    h = Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(60.0), jnp.float32(0.0)
    )
    smap = h.sample_map((160, 288))
    got = np.asarray(
        pwarp.pallas_remap(src, smap, fill=0.25, interpret=True,
                           tile=(64, 64), margin=16)
    )
    # Region sampling outside the source must be exactly the fill colour.
    assert np.allclose(got[:, :, :50], 0.25)
    ref = np.asarray(remap_ops.remap(src, smap, fill=0.25))
    err = np.abs(ref[:, 8:-8, 70:-8] - got[:, 8:-8, 70:-8])
    assert err.max() < 1e-3, err.max()


def test_remap_randomized_sizes_and_margins(rng):
    """Property sweep (r2 VERDICT #9): non-tile-multiple frame extents x
    tile shapes x margin values, against the XLA oracle.  Warps are smooth
    low-frequency fields plus a random projective component — the kernel's
    documented domain (its separable two-pass sampling is first-order exact
    in the map's cross-derivative; stabilization/mesh/lens warps are smooth
    by construction).  Exercises partial edge tiles, the shifted halo
    layout, and the per-tile base-shift path at every geometry."""
    cases = [
        ((96, 160), (64, 64), 16),
        ((100, 172), (64, 64), 16),
        ((144, 104), (64, 64), 24),
        ((68, 300), (64, 128), 16),
        ((132, 132), (128, 128), 32),
        ((200, 136), (64, 64), 16),
    ]
    for size, tile, margin in cases:
        h, w = size
        src = fixtures.make_texture(h, w, rng)
        # Smooth sinusoidal mesh (couple of px) + random similarity pose.
        gy = np.linspace(0, np.pi * rng.uniform(1, 2), 7)
        gx = np.linspace(0, np.pi * rng.uniform(1, 2), 9)
        off = np.zeros((2, 7, 9), np.float32)
        off[0] = (0.015 * rng.uniform(0.5, 1.0)) * np.sin(gy)[:, None]
        off[1] = (0.015 * rng.uniform(0.5, 1.0)) * np.cos(gx)[None, :]
        f = WarpField(offsets=jnp.asarray(off))
        pose = Homography.from_similarity(
            jnp.float32(rng.uniform(0.97, 1.03)),
            jnp.float32(rng.uniform(-0.02, 0.02)),
            jnp.float32(rng.uniform(-5, 5)),
            jnp.float32(rng.uniform(-5, 5)),
        )
        smap = f.sample_map(size) + (pose.sample_map(size)
                                     - remap_ops.identity_map(size))
        _compare(src, smap, 2e-2, crop=12, tile=tile, margin=margin)


def test_remap_dispatch_override(rng, monkeypatch):
    """LVK_REMAP=pallas routes ops.remap.remap through the Pallas kernel
    (interpreted off-TPU); =xla keeps the gather path."""
    src = fixtures.make_texture(288, 320, rng)  # >=256 so size gate passes
    h = Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(5.5), jnp.float32(-2.5)
    )
    smap = h.sample_map((288, 320))
    ref = remap_ops.remap(src, smap, fill=0.25)  # cpu default: gather
    monkeypatch.setenv("LVK_REMAP", "pallas")
    got = remap_ops.remap(src, smap, fill=0.25)
    err = np.abs(np.asarray(ref) - np.asarray(got))[16:-16, 16:-16]
    assert err.max() < 1e-3, err.max()


def _batched_case(rng, hF=96, wF=128, channels=2):
    """Three streams with distinct mean shifts (block-offset machinery) and
    distinct rotation/scale residuals (in-kernel shift-select)."""
    srcs = jnp.stack(
        [
            jnp.stack([fixtures.make_texture(hF, wF, rng) for _ in range(channels)])
            for _ in range(3)
        ]
    )
    poses = [
        Homography.from_similarity(
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(21.0), jnp.float32(-13.0)
        ),
        Homography.from_similarity(
            jnp.float32(1.01), jnp.float32(0.02), jnp.float32(-7.0), jnp.float32(4.0)
        ),
        Homography.from_similarity(
            jnp.float32(0.99), jnp.float32(-0.015), jnp.float32(0.0), jnp.float32(30.0)
        ),
    ]
    smaps = jnp.stack([p.sample_map((hF, wF)) for p in poses])
    return srcs, smaps


def test_batched_matches_oracle(rng):
    """ADVICE r3 (medium): interpret-mode parity for pallas_remap_batched —
    guards the scalar-prefetch block-offset index maps and the widened-margin
    shift-select against regression.  Per-stream translations exercise
    distinct block offsets; rotation/scale streams exercise the in-kernel
    residual path."""
    srcs, smaps = _batched_case(rng)
    got = np.asarray(
        pwarp.pallas_remap_batched(srcs, smaps, tile=64, margin=8, interpret=True)
    )
    ref = np.asarray(
        jax.vmap(
            lambda im, sm: remap_ops.bilinear_sample(im, sm[0], sm[1], fill=None)
        )(srcs, smaps)
    )
    # Outside-the-source samples take fill in real use (the batched kernel
    # returns the unfilled warp with its own clamp band) — mask to in-range.
    sm = np.asarray(smaps)
    h, w = srcs.shape[-2:]
    inside = (
        (sm[:, 0] >= 1) & (sm[:, 0] <= h - 2) & (sm[:, 1] >= 1) & (sm[:, 1] <= w - 2)
    )[:, None]
    err = (np.abs(ref - got) * inside)[..., 12:-12, 12:-12]
    # Same first-order separability bound as the solo kernel on textures.
    assert err.max() < 2e-2, err.max()


def test_batched_matches_solo(rng):
    """Batched vs solo kernel on the same rotation warp: the two mean-shift
    strategies (dynamic-slice vs block offsets) must agree."""
    srcs, smaps = _batched_case(rng)
    got = np.asarray(
        pwarp.pallas_remap_batched(srcs, smaps, tile=64, margin=8, interpret=True)
    )
    for s in range(srcs.shape[0]):
        solo = np.asarray(
            pwarp.pallas_remap(
                srcs[s], smaps[s], fill=None, fill_mode=False, interpret=True,
                tile=(64, 64), margin=16,
            )
        )
        err = np.abs(solo - got[s])[..., 12:-12, 12:-12]
        assert err.max() < 2e-2, (s, err.max())


def test_remap_batched_dispatch(rng, monkeypatch):
    """ADVICE r3 (medium): jax.vmap(ops.remap.remap) must route through the
    custom_vmap rule into pallas_remap_batched (not the default pallas vmap
    lifting), and the result must match the vmapped XLA oracle."""
    srcs, smaps = _batched_case(rng)
    calls = []
    orig = pwarp.pallas_remap_batched

    def spy(src_b, smap_b, **kw):
        calls.append(src_b.shape)
        kw.update(tile=64, margin=8)  # small blocks: fast in interpret mode
        return orig(src_b, smap_b, **kw)

    monkeypatch.setattr(pwarp, "pallas_remap_batched", spy)
    monkeypatch.setenv("LVK_REMAP", "pallas")
    monkeypatch.setenv("LVK_BATCHED_WARP", "kernel")
    got = np.asarray(
        jax.vmap(lambda im, sm: remap_ops.remap(im, sm, fill=0.25))(srcs, smaps)
    )
    assert calls == [srcs.shape], "custom_vmap rule did not dispatch batched"
    ref = np.asarray(
        jax.vmap(
            lambda im, sm: remap_ops.bilinear_sample(im, sm[0], sm[1], fill=0.25)
        )(srcs, smaps)
    )
    err = np.abs(ref - got)[..., 12:-12, 12:-12]
    assert err.max() < 2e-2, err.max()


def test_u8_source_roundtrip(rng, monkeypatch):
    """uint8 frames ride the Pallas path as u8 (pad + DMA in u8, in-VMEM
    cast, quantized u8 output = reference 8-bit UMat semantics)."""
    monkeypatch.setenv("LVK_REMAP", "pallas")
    monkeypatch.setenv("LVK_BATCHED_WARP", "kernel")
    src_f = fixtures.make_texture(96, 128, rng)
    src_u8 = jnp.asarray(
        np.clip(np.asarray(src_f) * 255 + 0.5, 0, 255).astype(np.uint8)
    )
    h = Homography.from_similarity(
        jnp.float32(1.005), jnp.float32(0.01), jnp.float32(4.0), jnp.float32(-2.5)
    )
    smap = h.sample_map((96, 128))
    got = remap_ops.remap(src_u8, smap, fill=0.0)
    assert got.dtype == jnp.uint8
    ref = remap_ops.bilinear_sample(
        src_u8.astype(jnp.float32), smap[0], smap[1], fill=0.0
    )
    err = np.abs(np.asarray(got)[8:-8, 8:-8].astype(np.float32)
                 - np.asarray(ref)[8:-8, 8:-8])
    # +-0.5 LSB quantization + the kernel's separability bound (2e-2 of the
    # value range = ~5 LSB on this rotation).
    assert err.max() <= 6.0, err.max()
    assert err.mean() < 1.0, err.mean()

    # Batched u8 (the S=8 serving path): via the custom_vmap rule.
    srcs, smaps = _batched_case(rng)
    srcs_u8 = jnp.asarray(
        np.clip(np.asarray(srcs) * 255 + 0.5, 0, 255).astype(np.uint8)
    )
    calls = []
    orig = pwarp.pallas_remap_batched

    def spy(src_b, smap_b, **kw):
        calls.append(src_b.dtype)
        kw.update(tile=64, margin=8)
        return orig(src_b, smap_b, **kw)

    monkeypatch.setattr(pwarp, "pallas_remap_batched", spy)
    got_b = jax.vmap(lambda im, sm: remap_ops.remap(im, sm, fill=0.0))(
        srcs_u8, smaps
    )
    assert calls == [jnp.uint8] and got_b.dtype == jnp.uint8
    ref_b = jax.vmap(
        lambda im, sm: remap_ops.bilinear_sample(im, sm[0], sm[1], fill=0.0)
    )(srcs_u8.astype(jnp.float32), smaps)
    sm = np.asarray(smaps)
    h2, w2 = srcs.shape[-2:]
    inside = (
        (sm[:, 0] >= 1) & (sm[:, 0] <= h2 - 2)
        & (sm[:, 1] >= 1) & (sm[:, 1] <= w2 - 2)
    )[:, None]
    err_b = (np.abs(np.asarray(got_b).astype(np.float32) - np.asarray(ref_b))
             * inside)[..., 12:-12, 12:-12]
    assert err_b.max() <= 7.0, err_b.max()


def test_easu_mode_matches_easu_remap(rng):
    from livevisionkit_tpu.ops import easu as easu_ops
    from livevisionkit_tpu.types import PixelFormat

    src = fixtures.make_texture(192, 320, rng)
    h = Homography.from_similarity(
        jnp.float32(1.0), jnp.float32(0.005), jnp.float32(20.0), jnp.float32(-10.0)
    )
    smap = h.sample_map((192, 320))
    ref = np.asarray(
        easu_ops.easu_remap(src, smap, fmt=PixelFormat.GRAY, fill=0.25)
    )
    got = np.asarray(
        pwarp.pallas_remap(
            src, smap, fill=0.25, interpret=True, tile=(64, 64), margin=16,
            filter_mode="easu", fmt=PixelFormat.GRAY,
        )
    )
    err = np.abs(ref - got)[32:-32, 32:-32]
    # Near-integer sample positions can flip floor() under the separability
    # correction's epsilon, selecting an adjacent (equally valid) EASU tap
    # grid — bound the bulk tightly and the tail loosely.
    assert np.quantile(err, 0.999) < 2e-2, np.quantile(err, 0.999)
    assert err.mean() < 1e-3, err.mean()


def test_easu_mode_3ch(rng):
    from livevisionkit_tpu.ops import easu as easu_ops
    from livevisionkit_tpu.types import PixelFormat

    src = jnp.stack([fixtures.make_texture(128, 192, rng) for _ in range(3)])
    h = Homography.from_similarity(
        jnp.float32(1.01), jnp.float32(0.0), jnp.float32(3.0), jnp.float32(2.0)
    )
    smap = h.sample_map((128, 192))
    ref = np.asarray(easu_ops.easu_remap(src, smap, fmt=PixelFormat.YUV, fill=0.0))
    got = np.asarray(
        pwarp.pallas_remap(
            src, smap, fill=0.0, interpret=True, tile=(64, 64), margin=16,
            filter_mode="easu", fmt=PixelFormat.YUV,
        )
    )
    err = np.abs(ref - got)[:, 24:-24, 24:-24]
    assert err.max() < 2e-2, err.max()


def test_easu_batched_matches_oracle(rng):
    """Batched EASU kernel (the reference-parity serving path) vs the
    vmapped XLA easu_remap oracle: guards the weight-persist scratch
    scheme (luma step computes + stores the 12 weight planes; chroma
    steps fuse weighting into the shift-select)."""
    from livevisionkit_tpu.ops import easu as easu_ops
    from livevisionkit_tpu.types import PixelFormat

    srcs, smaps = _batched_case(rng, channels=3)
    got = np.asarray(
        pwarp.pallas_remap_batched(
            srcs, smaps, tile=64, margin=8, interpret=True,
            filter_mode="easu", fmt=PixelFormat.YUV,
        )
    )
    ref = np.asarray(
        jax.vmap(
            lambda im, sm: easu_ops.easu_remap(
                im, sm, fmt=PixelFormat.YUV, fill=None
            )
        )(srcs, smaps)
    )
    sm = np.asarray(smaps)
    h, w = srcs.shape[-2:]
    inside = (
        (sm[:, 0] >= 2) & (sm[:, 0] <= h - 4)
        & (sm[:, 1] >= 2) & (sm[:, 1] <= w - 4)
    )[:, None]
    err = (np.abs(ref - got) * inside)[..., 16:-16, 16:-16]
    # Bulk/tail split as in the solo EASU kernel test (floor flips at
    # near-integer positions select an adjacent, equally valid tap grid),
    # with a wider tail bound: _batched_case's 0.015-rad rotation is 3x the
    # solo test's, and the two-pass kernel's footprint-shear difference on
    # noise textures scales with dY/dx (see the warp.py module docstring).
    # test_easu_batched_matches_solo is the strict same-semantics check.
    assert np.quantile(err, 0.999) < 4e-2, np.quantile(err, 0.999)
    assert err.mean() < 1e-3, err.mean()


def test_easu_batched_matches_solo(rng):
    """Batched vs solo EASU Pallas kernels: the weight-reuse chroma path
    must agree with the solo kernel's direct per-channel evaluation."""
    from livevisionkit_tpu.types import PixelFormat

    srcs, smaps = _batched_case(rng, channels=3)
    got = np.asarray(
        pwarp.pallas_remap_batched(
            srcs, smaps, tile=64, margin=8, interpret=True,
            filter_mode="easu", fmt=PixelFormat.YUV,
        )
    )
    for s in range(srcs.shape[0]):
        solo = np.asarray(
            pwarp.pallas_remap(
                srcs[s], smaps[s], fill=None, fill_mode=False,
                interpret=True, tile=(64, 64), margin=16,
                filter_mode="easu", fmt=PixelFormat.YUV,
            )
        )
        err = np.abs(solo - got[s])[..., 16:-16, 16:-16]
        assert np.quantile(err, 0.999) < 2e-2, (s, np.quantile(err, 0.999))
        assert err.mean() < 1e-3, (s, err.mean())


def test_easu_batched_rgb_synthetic_luma(rng):
    """r4 VERDICT #6: RGB-family batched EASU rides the batched kernel via
    a wrapper-prepended 2x-luma plane instead of serializing through
    lax.map.  The shift-select taps are exact source pixels, so sampling
    the precomputed luma plane must agree with the solo kernel's in-kernel
    per-tap luma mix to fp-reassociation error."""
    from livevisionkit_tpu.types import PixelFormat

    srcs, smaps = _batched_case(rng, channels=3)
    got = np.asarray(
        pwarp.pallas_remap_batched(
            srcs, smaps, tile=64, margin=8, interpret=True,
            filter_mode="easu", fmt=PixelFormat.BGR,
        )
    )
    assert got.shape == srcs.shape  # synthetic plane dropped
    for s in range(srcs.shape[0]):
        solo = np.asarray(
            pwarp.pallas_remap(
                srcs[s], smaps[s], fill=None, fill_mode=False,
                interpret=True, tile=(64, 64), margin=16,
                filter_mode="easu", fmt=PixelFormat.BGR,
            )
        )
        err = np.abs(solo - got[s])[..., 16:-16, 16:-16]
        assert np.quantile(err, 0.999) < 2e-2, (s, np.quantile(err, 0.999))
        assert err.mean() < 1e-3, (s, err.mean())


def test_easu_batched_rgb_u8_dispatch(rng, monkeypatch):
    """vmap(remap) with an RGB format now routes into the batched kernel
    too (the lax.map fallback is gone); u8 frames keep the u8 fast path
    with the half-scale synthetic luma plane."""
    from livevisionkit_tpu.ops import easu as easu_ops
    from livevisionkit_tpu.types import PixelFormat

    srcs, smaps = _batched_case(rng, channels=3)
    srcs_u8 = jnp.asarray(
        np.clip(np.asarray(srcs) * 255 + 0.5, 0, 255).astype(np.uint8)
    )
    calls = []
    orig = pwarp.pallas_remap_batched

    def spy(src_b, smap_b, **kw):
        calls.append(kw.get("filter_mode"))
        kw.update(tile=64, margin=8)
        return orig(src_b, smap_b, **kw)

    monkeypatch.setattr(pwarp, "pallas_remap_batched", spy)
    monkeypatch.setenv("LVK_REMAP", "pallas")
    monkeypatch.setenv("LVK_BATCHED_WARP", "kernel")
    got = jax.vmap(
        lambda im, sm: remap_ops.remap(
            im, sm, fill=0.0, filter_mode="easu", fmt=PixelFormat.BGR
        )
    )(srcs_u8, smaps)
    assert calls == ["easu"], calls
    assert got.dtype == jnp.uint8
    ref = np.asarray(
        jax.vmap(
            lambda im, sm: easu_ops.easu_remap(
                im.astype(jnp.float32), sm, fmt=PixelFormat.BGR, fill=0.0
            )
        )(srcs_u8, smaps)
    )
    sm = np.asarray(smaps)
    h, w = srcs.shape[-2:]
    inside = (
        (sm[:, 0] >= 2) & (sm[:, 0] <= h - 4)
        & (sm[:, 1] >= 2) & (sm[:, 1] <= w - 4)
    )[:, None]
    err = (np.abs(ref - np.asarray(got).astype(np.float32)) * inside)[
        ..., 16:-16, 16:-16
    ]
    # u8 path: output quantization alone floors the mean |err| at 0.25 LSB
    # (uniform rounding residual); the half-scale luma plane's u8 rounding
    # perturbs tap weights near floor-flip positions (tail).  Measured
    # mean 0.28 on this fixture.
    assert np.quantile(err, 0.99) <= 2.0, np.quantile(err, 0.99)
    assert err.mean() < 0.5, err.mean()


def test_batched_default_dispatch_lax_map(rng, monkeypatch):
    """The DEFAULT batched dispatch (r5): jax.vmap(remap) routes to solo
    pallas_remap per stream under lax.map — measured faster than the
    scalar-prefetch batched kernels at serving shapes (see the rule in
    ops/remap._pallas_core).  The batched kernels stay reachable via
    LVK_BATCHED_WARP=kernel (tests above)."""
    from livevisionkit_tpu.types import PixelFormat

    srcs, smaps = _batched_case(rng, channels=3)
    batched_calls, solo_calls = [], []
    orig_b, orig_s = pwarp.pallas_remap_batched, pwarp.pallas_remap

    def spy_b(src_b, smap_b, **kw):
        batched_calls.append(kw.get("filter_mode"))
        return orig_b(src_b, smap_b, **kw)

    def spy_s(src, smap, **kw):
        solo_calls.append(kw.get("filter_mode"))
        kw.update(tile=(64, 64), margin=16)
        return orig_s(src, smap, **kw)

    monkeypatch.setattr(pwarp, "pallas_remap_batched", spy_b)
    monkeypatch.setattr(pwarp, "pallas_remap", spy_s)
    monkeypatch.setenv("LVK_REMAP", "pallas")
    for mode in ("bilinear", "easu"):
        got = jax.vmap(
            lambda im, sm: remap_ops.remap(
                im, sm, fill=0.0, filter_mode=mode, fmt=PixelFormat.YUV
            )
        )(srcs, smaps)
        assert got.shape == srcs.shape
    assert not batched_calls, batched_calls
    # lax.map traces the solo kernel (possibly more than once per call —
    # scan body + shape pass); every trace must carry the right mode.
    assert set(solo_calls[:2]) == {"bilinear"} and "easu" in solo_calls, (
        solo_calls
    )
    assert all(m in ("bilinear", "easu") for m in solo_calls), solo_calls


def test_easu_batched_dispatch_and_u8(rng, monkeypatch):
    """jax.vmap(remap) with filter_mode='easu' + YUV must route into the
    batched EASU kernel (not the sequential lax.map fallback), preserving
    u8 in/out and border fill."""
    from livevisionkit_tpu.ops import easu as easu_ops
    from livevisionkit_tpu.types import PixelFormat

    srcs, smaps = _batched_case(rng, channels=3)
    srcs_u8 = jnp.asarray(
        np.clip(np.asarray(srcs) * 255 + 0.5, 0, 255).astype(np.uint8)
    )
    calls = []
    orig = pwarp.pallas_remap_batched

    def spy(src_b, smap_b, **kw):
        calls.append(kw.get("filter_mode"))
        kw.update(tile=64, margin=8)
        return orig(src_b, smap_b, **kw)

    monkeypatch.setattr(pwarp, "pallas_remap_batched", spy)
    monkeypatch.setenv("LVK_REMAP", "pallas")
    monkeypatch.setenv("LVK_BATCHED_WARP", "kernel")
    got = jax.vmap(
        lambda im, sm: remap_ops.remap(
            im, sm, fill=0.0, filter_mode="easu", fmt=PixelFormat.YUV
        )
    )(srcs_u8, smaps)
    assert calls == ["easu"], calls
    assert got.dtype == jnp.uint8
    ref = np.asarray(
        jax.vmap(
            lambda im, sm: easu_ops.easu_remap(
                im.astype(jnp.float32), sm, fmt=PixelFormat.YUV, fill=0.0
            )
        )(srcs_u8, smaps)
    )
    err = np.abs(np.asarray(got).astype(np.float32) - ref)[..., 16:-16, 16:-16]
    # f32 tail (4e-2 on this rotation, see the oracle test) x 255 + the
    # 0.5 LSB quantization: bound bulk + mean.
    assert np.quantile(err, 0.999) <= 11.0, np.quantile(err, 0.999)
    assert err.mean() < 1.0, err.mean()
