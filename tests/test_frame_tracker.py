import pytest
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import (
    FeatureDetectorSettings,
    FrameTrackerSettings,
)
from livevisionkit_tpu.vision import frame_tracker

SETTINGS = FrameTrackerSettings(
    detection_size=(96, 120),
    detector=FeatureDetectorSettings(grid_shape=(8, 10), fast_threshold_init=0.06),
    min_motion_samples=15,
)


@pytest.mark.slow
def test_tracker_recovers_known_translation(rng):
    base = fixtures.make_texture(256, 256, rng)
    size = (96, 120)  # frame == detection size: motions compare directly
    p0 = fixtures.camera_pose(48.0, 48.0)
    p1 = fixtures.camera_pose(51.0, 46.0)  # camera moved (+3, -2)
    f0 = fixtures.render_frame(base, p0, size)
    f1 = fixtures.render_frame(base, p1, size)

    state = frame_tracker.init(SETTINGS)
    state, r0 = frame_tracker.track(state, f0, SETTINGS)
    assert not bool(r0.ok)  # first frame has no prev
    state, r1 = frame_tracker.track(state, f1, SETTINGS)
    assert bool(r1.ok)
    assert float(r1.stability) > 0.5

    # Motion field should be ~uniform translation. Our field convention:
    # o(u) = M^-1(u) - u with M mapping prev->cur points; for camera shift d,
    # points move by -d, so o = +d (normalized by size-1).
    off = np.asarray(r1.motion.offsets)
    np.testing.assert_allclose(off[0] * 95, -2.0, atol=0.35)  # dy * (h-1)
    np.testing.assert_allclose(off[1] * 119, 3.0, atol=0.35)  # dx * (w-1)


@pytest.mark.slow
def test_tracker_flags_flat_scene(rng):
    state = frame_tracker.init(SETTINGS)
    flat = jnp.full((96, 120), 0.5)
    state, _ = frame_tracker.track(state, flat, SETTINGS)
    state, r = frame_tracker.track(state, flat, SETTINGS)
    assert not bool(r.ok)
    assert float(r.stability) == 0.0
    np.testing.assert_allclose(np.asarray(r.motion.offsets), 0.0)


@pytest.mark.slow
def test_tracker_jit_scan(rng):
    base = fixtures.make_texture(256, 256, rng)
    size = (96, 120)
    poses, _ = fixtures.shaky_path(6, rng, margin=48.0)
    frames = jnp.stack([fixtures.render_frame(base, p, size) for p in poses])

    def step(state, gray):
        state, r = frame_tracker.track(state, gray, SETTINGS)
        return state, (r.ok, r.stability)

    _, (oks, stab) = jax.jit(
        lambda s, f: jax.lax.scan(step, s, f)
    )(frame_tracker.init(SETTINGS), frames)
    assert np.asarray(oks)[1:].all()
    assert (np.asarray(stab)[1:] > 0.4).all()
