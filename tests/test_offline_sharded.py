"""Temporal sharding: chunked offline processing matches the serial scan."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import fixtures
from livevisionkit_tpu import (
    FeatureDetectorSettings,
    FrameTrackerSettings,
    PathSmootherSettings,
    PixelFormat,
    StabilizationFilter,
    StabilizationFilterSettings,
)
from livevisionkit_tpu.runtime import offline

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated


def _clip(rng, n, size=(96, 128)):
    base = fixtures.make_texture(320, 320, rng)
    poses, _ = fixtures.shaky_path(n, rng, margin=80.0, drift_px=0.2, shake_px=2.0)
    return jnp.stack(
        [fixtures.render_frame(base, p, size)[None] for p in poses]
    )


def _filter():
    return StabilizationFilter(
        settings=StabilizationFilterSettings(
            tracker=FrameTrackerSettings(
                detection_size=(96, 120),
                detector=FeatureDetectorSettings(
                    grid_shape=(8, 10), fast_threshold_init=0.06
                ),
                min_motion_samples=15,
            ),
            smoother=PathSmootherSettings(predictive_samples=4),
        )
    )


def test_sharded_offline_matches_serial(rng):
    n = 64
    clip = _clip(rng, n)
    filt = _filter()

    _, serial = jax.jit(
        lambda px: offline.process_clip(filt, px, PixelFormat.GRAY)
    )(clip)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("time",))
    sharded = offline.process_clip_sharded(
        filt, clip, PixelFormat.GRAY, mesh, overlap=12
    )

    sv = np.asarray(serial.valid)
    cv = np.asarray(sharded.valid)
    # Each chunk re-warms; chunk-interior outputs are valid in both.
    both = sv & cv
    assert both.sum() > n * 0.7
    a = np.asarray(serial.pixels)[both]
    b = np.asarray(sharded.pixels)[both]
    # Timestamps must agree exactly (same delayed-frame correspondence).
    np.testing.assert_allclose(
        np.asarray(serial.timestamp)[both], np.asarray(sharded.timestamp)[both],
        atol=1e-6,
    )
    # Pixels agree up to servo warm-up differences.
    diff = np.abs(a - b).reshape(a.shape[0], -1).mean(axis=1)
    assert diff.mean() < 0.01, diff.mean()


def test_sharded_offline_scales_validity(rng):
    n = 40
    clip = _clip(rng, n)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("time",))
    out = offline.process_clip_sharded(
        _filter(), clip, PixelFormat.GRAY, mesh, overlap=10
    )
    assert out.pixels.shape[0] == n
    assert np.asarray(out.valid).sum() >= n - 8  # only global warm-up lost
