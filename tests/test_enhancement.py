import pytest
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import DeblockingFilterSettings, ScalingFilterSettings
from livevisionkit_tpu.data.frame import Frame, PixelFormat
from livevisionkit_tpu.filters.deblocking import DeblockingFilter
from livevisionkit_tpu.filters.scaling import ScalingFilter
from livevisionkit_tpu.ops import easu, rcas, remap as remap_ops, resample


# ---------------------------------------------------------------- deblocking


def _blocky_frame(rng, h=64, w=96, block=16):
    tex = np.asarray(fixtures.make_texture(h, w, rng))
    blocky = tex.reshape(h // block, block, w // block, block).mean((1, 3))
    blocky = np.repeat(np.repeat(blocky, block, 0), block, 1)
    return tex, blocky


@pytest.mark.slow
def test_deblocker_smooths_blocky_regions(rng):
    tex, blocky = _blocky_frame(rng)
    frame = Frame.create(jnp.asarray(blocky)[None], fmt=PixelFormat.GRAY)
    filt = DeblockingFilter()
    _, out = filt.step((), frame)
    out_np = np.asarray(out.pixels[0])
    # Blocky input: every block is flat -> measure 0 -> fully smoothed.
    # Block-boundary discontinuities must shrink.
    edge_in = np.abs(np.diff(blocky, axis=1))[:, 15::16].mean()
    edge_out = np.abs(np.diff(out_np, axis=1))[:, 15::16].mean()
    assert edge_out < 0.7 * edge_in


def test_deblocker_preserves_detail(rng):
    tex, _ = _blocky_frame(rng)
    # Boost texture detail so every block has high deviation -> keep = 1.
    detail = np.clip((tex - 0.5) * 2.0 + 0.5, 0, 1)
    frame = Frame.create(jnp.asarray(detail)[None], fmt=PixelFormat.GRAY)
    _, out = DeblockingFilter().step((), frame)
    np.testing.assert_allclose(
        np.asarray(out.pixels[0]), detail, atol=1e-3
    )


def test_deblocker_partial_border_untouched(rng):
    tex = np.asarray(fixtures.make_texture(70, 100, rng))  # not /16
    frame = Frame.create(jnp.asarray(tex)[None], fmt=PixelFormat.GRAY)
    _, out = DeblockingFilter().step((), frame)
    out_np = np.asarray(out.pixels[0])
    np.testing.assert_allclose(out_np[64:, :], tex[64:, :], atol=1e-7)
    np.testing.assert_allclose(out_np[:, 96:], tex[:, 96:], atol=1e-7)


def test_deblocker_influence_map(rng):
    _, blocky = _blocky_frame(rng)
    frame = Frame.create(jnp.asarray(blocky)[None], fmt=PixelFormat.GRAY)
    inf = np.asarray(DeblockingFilter().influence_map(frame))
    assert inf.shape == (64, 96)
    assert inf.max() > 0.9  # flat blocks fully smoothed


# ---------------------------------------------------------------------- rcas


def test_rcas_flat_unchanged():
    img = jnp.full((3, 16, 16), 0.4)
    out = rcas.rcas(img, 0.8)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-6)


def test_rcas_sharpens_edge():
    ramp = jnp.asarray(np.linspace(0.2, 0.8, 32, dtype=np.float32))
    img = jnp.broadcast_to(ramp[None, None, :], (1, 32, 32))
    soft = resample.gaussian_blur5(img)
    sharp = rcas.rcas(soft, 1.0)
    # Gradient magnitude in the interior should not decrease.
    g_soft = np.abs(np.diff(np.asarray(soft[0]), axis=1))[8:-8, 8:-8].mean()
    g_sharp = np.abs(np.diff(np.asarray(sharp[0]), axis=1))[8:-8, 8:-8].mean()
    assert g_sharp >= g_soft


def test_rcas_borders_copy():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 12, 12)).astype(np.float32))
    out = rcas.rcas(img, 0.8)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(img[0, 0]))
    np.testing.assert_allclose(np.asarray(out[0, -1]), np.asarray(img[0, -1]))
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), np.asarray(img[0, :, 0]))


# ---------------------------------------------------------------------- easu


@pytest.mark.slow
def test_easu_scale_smooth_gradient(rng):
    # On a smooth gradient EASU ~= bilinear; compare against resize.
    g = jnp.asarray(
        (np.linspace(0, 1, 40)[None, :] * np.linspace(0, 1, 30)[:, None]).astype(
            np.float32
        )
    )[None]
    up_easu = easu.easu_scale(g, (60, 80), fmt=PixelFormat.GRAY)
    up_bil = resample.resize(g, (60, 80), antialias=False)
    # Exclude the nearest-neighbour fallback ring (4 input px = 8 output px).
    diff = np.abs(np.asarray(up_easu) - np.asarray(up_bil))[:, 12:-12, 12:-12]
    assert diff.max() < 0.02


@pytest.mark.slow
def test_easu_dering_bounds(rng):
    tex = fixtures.make_texture(40, 48, rng)
    up = np.asarray(easu.easu_scale(tex[None], (80, 96), fmt=PixelFormat.GRAY))
    assert up.min() >= float(tex.min()) - 1e-5
    assert up.max() <= float(tex.max()) + 1e-5


def test_easu_remap_fill_and_nearest(rng):
    tex = fixtures.make_texture(32, 32, rng)
    # Shift far out of bounds -> fill everywhere.
    smap = remap_ops.identity_map((32, 32)) + 100.0
    out = easu.easu_remap(tex, smap, fmt=PixelFormat.GRAY, fill=0.25)
    np.testing.assert_allclose(np.asarray(out), 0.25)
    # Identity remap: interior uses EASU (close to original), border ring
    # falls back to nearest (exact copy).
    out_id = np.asarray(
        easu.easu_remap(tex, remap_ops.identity_map((32, 32)), fmt=PixelFormat.GRAY)
    )
    np.testing.assert_allclose(out_id[0], np.asarray(tex)[0], atol=1e-6)
    # EASU has negative lanczos lobes (it mildly sharpens even at integer
    # offsets): bound the mean deviation, not the max.
    assert np.abs(out_id[8:-8, 8:-8] - np.asarray(tex)[8:-8, 8:-8]).mean() < 0.03


@pytest.mark.slow
def test_easu_matches_between_remap_and_scale(rng):
    tex = fixtures.make_texture(24, 24, rng)[None]
    oh, ow = 48, 48
    yy = jnp.clip((jnp.arange(oh, dtype=jnp.float32)[:, None] + 0.5) * 0.5 - 0.5, 0, 23)
    xx = jnp.clip((jnp.arange(ow, dtype=jnp.float32)[None, :] + 0.5) * 0.5 - 0.5, 0, 23)
    smap = jnp.stack([jnp.broadcast_to(yy, (oh, ow)), jnp.broadcast_to(xx, (oh, ow))])
    a = easu.easu_scale(tex, (oh, ow), fmt=PixelFormat.GRAY)
    b = easu.easu_remap(tex, smap, fmt=PixelFormat.GRAY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ------------------------------------------------------------------- scaling


@pytest.mark.slow
def test_scaling_filter_shapes(rng):
    tex = fixtures.make_texture(36, 64, rng)
    frame = Frame.create(jnp.stack([tex, tex, tex]), fmt=PixelFormat.YUV)
    filt = ScalingFilter(ScalingFilterSettings(output_size=(72, 128), sharpness=0.8))
    _, out = filt.step((), frame)
    assert out.pixels.shape == (3, 72, 128)
    spec_out = filt.output_spec(
        __import__("livevisionkit_tpu").FrameSpec(36, 64, 3, PixelFormat.YUV)
    )
    assert (spec_out.height, spec_out.width) == (72, 128)


@pytest.mark.slow
def test_easu_scale_rational_paths_match_oracle(rng):
    """The polyphase rational fast path and the banded fallback both match
    the gather-based easu_remap on its pre-clamped map (exact for rational
    ratios; float-assoc noise for the fallback)."""
    import jax

    for (ih, iw, oh, ow, tol) in [
        (64, 96, 128, 192, 1e-6),   # 2x (polyphase)
        (64, 96, 96, 144, 1e-4),    # 3/2 (polyphase; exact-rational ppx)
        (72, 96, 96, 128, 1e-6),    # 4/3 (polyphase)
        (60, 90, 127, 191, 1e-5),   # awkward ratio -> banded fallback
    ]:
        img = jnp.asarray(rng.uniform(size=(3, ih, iw)).astype(np.float32))
        yy = (jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0) + 0.5) * (ih / oh) - 0.5
        xx = (jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1) + 0.5) * (iw / ow) - 0.5
        smap = jnp.stack([jnp.clip(yy, 0, ih - 1.0), jnp.clip(xx, 0, iw - 1.0)])
        ref = np.asarray(easu.easu_remap(img, smap, fmt=PixelFormat.YUV))
        got = np.asarray(easu.easu_scale(img, (oh, ow), fmt=PixelFormat.YUV))
        assert np.abs(ref - got).max() < tol, (ih, iw, oh, ow)


def test_upsample_helpers_match_jax_image(rng):
    from livevisionkit_tpu.ops import resample

    import jax

    img = jnp.asarray(rng.uniform(size=(3, 17, 23)).astype(np.float32))
    ref = jax.image.resize(img, (3, 68, 92), method="linear", antialias=False)
    got = resample.upsample_linear_int(img, (4, 4))
    assert np.abs(np.asarray(ref - got)).max() < 1e-6
    nn_ref = jnp.repeat(jnp.repeat(img, 4, axis=-2), 4, axis=-1)
    nn = resample.upsample_nearest_int(img, 4)
    assert np.array_equal(np.asarray(nn_ref), np.asarray(nn))
