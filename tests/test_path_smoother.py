import jax.numpy as jnp
import numpy as np

from livevisionkit_tpu.config import PathSmootherSettings
from livevisionkit_tpu.models.warp_field import WarpField
from livevisionkit_tpu.vision import path_smoother


def _run(motions, settings):
    state = path_smoother.init(settings, (2, 2))
    out = []
    for m in motions:
        state, corr, ready = path_smoother.next_correction(
            state, WarpField(offsets=jnp.full((2, 2, 2), m)), settings
        )
        out.append((np.asarray(corr.offsets), bool(ready)))
    return out, state


def test_ready_after_delay():
    s = PathSmootherSettings(predictive_samples=3)
    out, _ = _run([0.0] * 10, s)
    assert [r for _, r in out] == [False] * 3 + [True] * 7


def test_zero_motion_zero_correction():
    s = PathSmootherSettings(predictive_samples=3)
    out, _ = _run([0.0] * 10, s)
    for corr, _ in out:
        np.testing.assert_allclose(corr, 0.0, atol=1e-7)


def test_jitter_smoothed(rng):
    # Alternating +/- motion: the path oscillates around a constant; the
    # smoothed correction should steer the anchor toward the window mean.
    s = PathSmootherSettings(predictive_samples=5, corrective_limit=0.2)
    motions = [0.02 if t % 2 == 0 else -0.02 for t in range(30)]
    out, state = _run(motions, s)
    # Positions alternate between 0.02 and 0.0; window mean ~0.01, so the
    # correction magnitude stays ~0.01 and alternates sign with the path.
    corrs = np.array([c[0, 0, 0] for c, r in out if r])
    assert np.abs(corrs).max() <= 0.2 + 1e-6
    assert np.abs(np.abs(corrs[5:]) - 0.01).max() < 5e-3


def test_correction_clamped():
    s = PathSmootherSettings(predictive_samples=2, corrective_limit=0.05)
    # Runaway drift: raw correction would exceed the limit.
    out, _ = _run([0.1] * 12, s)
    for corr, ready in out:
        assert np.abs(corr).max() <= 0.05 + 1e-6


def test_sigma_servo_reduces_smoothing_under_drift():
    # Heavy oscillation vs a tight corrective limit: raw corrections blow
    # past the limit, the drift EMA crosses the hysteresis band, and the
    # servo backs the smoothing strength off. Calm input keeps it at max.
    s = PathSmootherSettings(predictive_samples=4, corrective_limit=0.01)
    wild = [0.15 if t % 2 == 0 else -0.15 for t in range(60)]
    _, state_drift = _run(wild, s)
    _, state_calm = _run([0.0] * 60, s)
    assert float(state_drift.smoothing) < float(state_calm.smoothing)
    assert float(state_calm.smoothing) > 0.99
