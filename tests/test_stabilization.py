"""End-to-end stabilizer test on a synthetic shaky clip with known path."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import (
    FeatureDetectorSettings,
    FrameTrackerSettings,
    PathSmootherSettings,
    StabilizationFilterSettings,
)
from livevisionkit_tpu.data.frame import Frame, PixelFormat
from livevisionkit_tpu.filters.base import FrameSpec
from livevisionkit_tpu.filters.stabilization import StabilizationFilter


def _settings(predictive=5):
    return StabilizationFilterSettings(
        tracker=FrameTrackerSettings(
            detection_size=(96, 120),
            detector=FeatureDetectorSettings(
                grid_shape=(8, 10), fast_threshold_init=0.06
            ),
            min_motion_samples=15,
        ),
        smoother=PathSmootherSettings(predictive_samples=predictive),
    )


def _jitter(frames_np, valid=None):
    """Mean frame-to-frame abs diff over the interior (stabilization metric)."""
    sel = frames_np if valid is None else frames_np[valid]
    d = np.abs(np.diff(sel[:, 24:-24, 30:-30], axis=0))
    return d.mean()


@pytest.mark.slow
def test_stabilizer_reduces_jitter(rng):
    base = fixtures.make_texture(320, 320, rng)
    size = (120, 160)
    n = 28
    poses, _ = fixtures.shaky_path(n, rng, margin=80.0, drift_px=0.4, shake_px=2.5)
    frames = jnp.stack([fixtures.render_frame(base, p, size) for p in poses])

    filt = StabilizationFilter(settings=_settings())
    spec = FrameSpec(height=size[0], width=size[1], channels=1, format=PixelFormat.GRAY)
    state = filt.init(spec)

    def step(state, x):
        gray, ts = x
        frame = Frame.create(gray[None], timestamp=ts, fmt=PixelFormat.GRAY)
        state, out = filt.step(state, frame)
        return state, (out.pixels[0], out.valid, out.timestamp)

    ts = jnp.arange(n, dtype=jnp.float32) / 30.0
    _, (out_px, out_valid, out_ts) = jax.jit(
        lambda s, xs: jax.lax.scan(step, s, xs)
    )(state, (frames, ts))

    valid = np.asarray(out_valid)
    # Delay = predictive_samples: first 5 outputs invalid, rest valid.
    assert not valid[:5].any()
    assert valid[5:].all()
    # Output timestamps are the DELAYED frames' timestamps.
    np.testing.assert_allclose(
        np.asarray(out_ts)[5:], np.asarray(ts)[: n - 5], atol=1e-6
    )

    j_in = _jitter(np.asarray(frames))
    j_out = _jitter(np.asarray(out_px), valid)
    # Stabilization must substantially reduce frame-to-frame motion.
    assert j_out < 0.6 * j_in, f"jitter in={j_in:.4f} out={j_out:.4f}"


def test_disabled_filter_passthrough_with_delay(rng):
    base = fixtures.make_texture(320, 320, rng)
    size = (120, 160)
    poses, _ = fixtures.shaky_path(10, rng, margin=80.0)
    frames = [fixtures.render_frame(base, p, size) for p in poses]

    filt = StabilizationFilter(settings=_settings(predictive=2), enabled=False)
    spec = FrameSpec(height=size[0], width=size[1], channels=1, format=PixelFormat.GRAY)
    state = filt.init(spec)
    outs = []
    for t, f in enumerate(frames):
        state, out = filt.step(
            state, Frame.create(f[None], timestamp=float(t), fmt=PixelFormat.GRAY)
        )
        outs.append(out)
    # Frame t output == input frame t-2 (no warp on bypass) to within the
    # 8-bit delay-queue quantization — the reference's queue stores 8-bit
    # UMats, so u8-sourced inputs round-trip exactly; these synthetic float
    # frames see at most half an LSB.
    for t in range(2, 10):
        assert bool(outs[t].valid)
        np.testing.assert_allclose(
            np.asarray(outs[t].pixels[0]), np.asarray(frames[t - 2]),
            atol=0.5 / 255.0 + 1e-6,
        )
    # And with an f32 queue the bypass is bit-exact.
    import dataclasses

    filt = StabilizationFilter(
        settings=dataclasses.replace(_settings(2), queue_dtype="float32"),
        enabled=False,
    )
    state = filt.init(spec)
    for t, f in enumerate(frames[:4]):
        state, out = filt.step(
            state, Frame.create(f[None], timestamp=float(t), fmt=PixelFormat.GRAY)
        )
    np.testing.assert_allclose(
        np.asarray(out.pixels[0]), np.asarray(frames[1]), atol=1e-6
    )


@pytest.mark.slow
def test_scene_quality_gate_suppresses_correction(monkeypatch, rng):
    """A persistently LOW-quality scene (tracking works frame-to-frame but
    with mediocre stability, above the discontinuity threshold yet below
    min_scene_quality) must drag the scene-quality EMA down and ramp trust ->
    0, driving the applied correction to identity (reference gate,
    StabilizationFilter.cpp:103-115, gate at :109)."""
    from livevisionkit_tpu.filters import stabilization as stab_mod
    from livevisionkit_tpu.models.warp_field import WarpField
    from livevisionkit_tpu.vision import frame_tracker

    settings = _settings()
    real_track = frame_tracker.track

    def mediocre_track(state, luma, cfg):
        state, result = real_track(state, luma, cfg)
        # Tracking "works" (ok, above min_tracking_quality 0.3) but the scene
        # is persistently poor (below min_scene_quality 0.8), with a constant
        # pan the stabilizer would otherwise correct.
        pan = WarpField(offsets=jnp.full(result.motion.offsets.shape, 0.02))
        return state, result.replace(
            ok=jnp.asarray(True),
            stability=jnp.asarray(0.5, jnp.float32),
            motion=pan,
        )

    monkeypatch.setattr(stab_mod.frame_tracker, "track", mediocre_track)

    base = fixtures.make_texture(320, 320, rng)
    size = (120, 160)
    poses, _ = fixtures.shaky_path(40, rng, margin=80.0)
    filt = StabilizationFilter(settings=settings)
    spec = FrameSpec(height=size[0], width=size[1], channels=1,
                     format=PixelFormat.GRAY)
    state = filt.init(spec)
    trusts, corrections = [], []
    for t, p in enumerate(poses):
        f = fixtures.render_frame(base, p, size)
        state, _ = filt.step(
            state, Frame.create(f[None], timestamp=float(t), fmt=PixelFormat.GRAY)
        )
        trusts.append(float(state.trust))
        corrections.append(float(jnp.abs(state.correction.offsets).max()))
    # EMA (seeded 1.0, rate 0.1) crosses 0.8 after ~5 frames of 0.5-stability;
    # from there trust only decays, ending pinned at 0.
    assert trusts[-1] == 0.0
    assert max(trusts) <= 0.25  # never built meaningful trust
    # With trust 0 the smoothed path sees identity motions: correction decays
    # to (near-)identity even though track() keeps reporting a 3 px pan.
    assert corrections[-1] < 0.05
    # Control: same scene quality EMA but healthy stability never gates.
    state2 = filt.init(spec)
    monkeypatch.setattr(
        stab_mod.frame_tracker,
        "track",
        lambda s, l, c: (
            mediocre_track(s, l, c)[0],
            mediocre_track(s, l, c)[1].replace(
                stability=jnp.asarray(0.95, jnp.float32)
            ),
        ),
    )
    for t, p in enumerate(poses[:20]):
        f = fixtures.render_frame(base, p, size)
        state2, _ = filt.step(
            state2, Frame.create(f[None], timestamp=float(t), fmt=PixelFormat.GRAY)
        )
    assert float(state2.trust) > 0.8


@pytest.mark.slow
def test_trust_drops_on_scene_cut(rng):
    base1 = fixtures.make_texture(320, 320, rng)
    base2 = fixtures.make_texture(320, 320, rng)  # unrelated scene
    size = (120, 160)
    poses, _ = fixtures.shaky_path(16, rng, margin=80.0)
    filt = StabilizationFilter(settings=_settings())
    spec = FrameSpec(height=size[0], width=size[1], channels=1, format=PixelFormat.GRAY)
    state = filt.init(spec)
    trusts = []
    for t, p in enumerate(poses):
        f = fixtures.render_frame(base1 if t < 8 else base2, p, size)
        state, _ = filt.step(
            state, Frame.create(f[None], timestamp=float(t), fmt=PixelFormat.GRAY)
        )
        trusts.append(float(state.trust))
    # Trust builds up, then collapses at the cut (frame 8).
    assert trusts[7] > 0.2
    assert trusts[8] < trusts[7]


@pytest.mark.slow
def test_default_warp_is_easu_parity(rng):
    """r3 VERDICT #2: the filter's default corrective warp must be the
    EASU-sampled path (reference WarpMesh::apply → easu_remap, WarpMesh.cpp:
    183-223 / FSR.cl:362-403).  Re-derives one step's expected output through
    ops.easu.easu_remap from the filter's own state and compares exactly."""
    import dataclasses

    from livevisionkit_tpu.filters import stabilization as stab_mod
    from livevisionkit_tpu.ops import easu as easu_ops

    assert StabilizationFilterSettings().warp_filter == "easu"

    base = fixtures.make_texture(300, 300, rng)
    size = (96, 128)
    poses, _ = fixtures.shaky_path(10, rng, margin=80.0)
    frames = [
        Frame.create(
            fixtures.render_frame(base, p, size)[None],
            timestamp=t / 30.0,
            fmt=PixelFormat.GRAY,
        )
        for t, p in enumerate(poses)
    ]
    filt = StabilizationFilter(settings=_settings(3))
    spec = FrameSpec(size[0], size[1], 1, PixelFormat.GRAY)
    state = filt.init(spec)
    step = jax.jit(filt.step)
    for f in frames[:-1]:
        state, out = step(state, f)

    # Replicate the final step's delay-queue pop by hand, then compare the
    # filter's output against the EASU oracle warped by its own correction.
    # The u8 queue path warps the RAW u8 planes and re-quantizes the output
    # (reference semantics: 8-bit UMat in, 8-bit out), so the oracle does
    # the same round trip.
    last = frames[-1]
    frames_q = state.frames.push(stab_mod._quantize_u8(last))
    delayed_q = frames_q.oldest()
    new_state, out = step(state, last)
    corr = new_state.correction
    smap = corr.to_homography(size).sample_map(size)
    warped = easu_ops.easu_remap(
        delayed_q.pixels.astype(jnp.float32), smap, fmt=PixelFormat.GRAY,
        fill=0.0,
    )
    expected = jnp.clip(jnp.round(warped), 0, 255).astype(jnp.float32) / 255.0
    np.testing.assert_allclose(
        np.asarray(out.pixels), np.asarray(expected), atol=1e-4
    )
    # And the bilinear option must differ (i.e. the knob actually routes).
    filt_b = StabilizationFilter(
        settings=dataclasses.replace(_settings(3), warp_filter="bilinear")
    )
    out_b = jax.jit(filt_b.step)(state, last)[1]
    assert np.abs(np.asarray(out_b.pixels) - np.asarray(out.pixels)).max() > 1e-4


def test_queue_dtype_u8_matches_f32_within_lsb(rng):
    """The u8 delay queue (reference 8-bit UMat storage parity + 4x HBM
    saving) must match the f32 queue within one 8-bit quantization step on
    every output."""
    import dataclasses

    base = fixtures.make_texture(300, 300, rng)
    size = (96, 128)
    poses, _ = fixtures.shaky_path(12, rng, margin=80.0)
    frames = [
        Frame.create(
            fixtures.render_frame(base, p, size)[None],
            timestamp=t / 30.0,
            fmt=PixelFormat.GRAY,
        )
        for t, p in enumerate(poses)
    ]
    outs = {}
    for qd in ("uint8", "float32"):
        # Bilinear warp: this test isolates the delay-queue storage dtype.
        # (EASU's edge-direction estimates are sensitive to the +-0.5 LSB
        # quantization noise, amplifying the u8/f32 difference past the
        # interpolation bound checked here.)
        filt = StabilizationFilter(
            settings=dataclasses.replace(
                _settings(3), queue_dtype=qd, warp_filter="bilinear"
            )
        )
        spec = FrameSpec(size[0], size[1], 1, PixelFormat.GRAY)
        state = filt.init(spec)
        step = jax.jit(filt.step)
        got = []
        for f in frames:
            state, out = step(state, f)
            if bool(out.valid):
                got.append(np.asarray(out.pixels))
        outs[qd] = np.stack(got)
    assert outs["uint8"].shape == outs["float32"].shape
    # Bilinear interpolation of +-0.5/255 quantization noise stays within
    # ~1 LSB of the unquantized result.
    assert np.abs(outs["uint8"] - outs["float32"]).max() <= 1.5 / 255.0
