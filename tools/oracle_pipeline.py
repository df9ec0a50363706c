"""End-to-end pipeline oracle: the reference's NUMERICS via OpenCV, compared.

r3 VERDICT #8 / BASELINE trajectory criterion.  The reference ships no test
suite and no published numbers, but its per-frame pipeline is ordinary
OpenCV machinery (SURVEY §3.2): FAST/goodFeatures detection →
calcOpticalFlowPyrLK (11×11, 3 levels, 5 iters; FrameTracker.cpp:33-35) →
USAC/MAGSAC homography (FrameTracker.cpp:337-347) → position integration +
Gaussian-windowed path smoothing with a centered 2N+1 window
(PathSmoother.cpp:55-108) → corrective warp.  This tool RUNS that pipeline
with OpenCV on a synthetic fixture clip with known ground-truth camera
poses, runs OUR stabilizer on the same clip, and reports ATE/jitter of both
trajectories against the analytic ideal (Gaussian-smoothed ground truth).

Acceptance (BASELINE.md): our stabilized trajectory within the oracle's
ATE/jitter bound (factor 1.25 here; both should land far below the input).

Usage: python tools/oracle_pipeline.py [--frames 60] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def gaussian_weights(n: int, sigma: float):
    import numpy as np

    k = np.exp(-0.5 * (np.arange(-n, n + 1) / sigma) ** 2)
    return k / k.sum()


def oracle_stabilize(frames_u8, predictive: int, sigma: float,
                     corrective_limit: float, detection_size=None):
    """The reference pipeline in OpenCV; returns per-output-step corrective
    homographies C_t (backward maps, applied to delayed frame t-predictive)
    aligned with OUR filter's output timing."""
    import cv2
    import numpy as np

    h, w = frames_u8[0].shape
    corners = np.array(
        [[0, 0], [w - 1.0, 0], [0, h - 1.0], [w - 1.0, h - 1.0]], np.float32
    )

    # ---- inter-frame motions (FrameTracker parity) -----------------------
    # The reference tracks at a DOWNSCALED detection resolution
    # (FrameTracker.cpp:117); motions scale back up by S M S^-1.
    if detection_size is not None:
        dh, dw = detection_size
        small = [cv2.resize(f, (dw, dh), interpolation=cv2.INTER_AREA)
                 for f in frames_u8]
        S = np.diag([w / dw, h / dh, 1.0])
        Si = np.linalg.inv(S)
    else:
        small = frames_u8
        S = Si = np.eye(3)
    motions = [np.eye(3, dtype=np.float64)]  # M_0 = I
    for t in range(1, len(frames_u8)):
        prev, cur = small[t - 1], small[t]
        pts = cv2.goodFeaturesToTrack(
            prev, maxCorners=400, qualityLevel=0.01, minDistance=7
        )
        nxt, st, _ = cv2.calcOpticalFlowPyrLK(
            prev, cur, pts, None, winSize=(11, 11), maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 5, 0.01),
        )
        good = st.reshape(-1) == 1
        p0 = pts.reshape(-1, 2)[good]
        p1 = nxt.reshape(-1, 2)[good]
        M, _ = cv2.findHomography(p0, p1, cv2.USAC_MAGSAC, 3.0)
        if M is None:
            M = np.eye(3)
        motions.append(S @ M @ Si)

    # ---- position integration (PathSmoother::next parity) ----------------
    # Path as the frame corners' accumulated positions (the reference's
    # 2x2 WarpMesh representation of homography motion): linear objects the
    # Gaussian window can average, exactly like our smoother's field
    # averaging.
    paths = []
    P = np.eye(3)
    for M in motions:
        P = M @ P
        pc = cv2.perspectiveTransform(corners[None], P.astype(np.float64))[0]
        paths.append(pc)
    paths = np.asarray(paths)  # (T, 4, 2) corner trajectories

    # ---- centered Gaussian window + corrective clamp ---------------------
    wts = gaussian_weights(predictive, sigma)
    lim = corrective_limit * max(h, w)
    corrections = []
    for t in range(len(paths)):
        if t < 2 * predictive:
            corrections.append(np.eye(3))
            continue
        center = t - predictive  # the delayed frame this correction warps
        window = paths[t - 2 * predictive : t + 1]
        smoothed = (wts[:, None, None] * window).sum(axis=0)
        delta = np.clip(smoothed - paths[center], -lim, lim)
        # We need the warp of the DELAYED FRAME moving its content by the
        # smoothing delta.  For the trajectory metric only the corner->
        # corner map matters; for these small rotations the scene-coord
        # delta projects into frame coords 1:1, so the backward map sends
        # (corners + delta) -> corners and points move FORWARD by its
        # inverse (a point at x lands at C^-1(x)).
        C = cv2.getPerspectiveTransform(
            (corners + delta).astype(np.float32), corners
        )
        corrections.append(np.linalg.inv(C))
    return corrections  # forward point maps: y_t = corrections[t](x_{t-N})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--model", default="homography",
                    choices=("homography", "field"),
                    help="our stabilizer's motion model; 'field' runs the "
                         "16x16 mesh mode (VSFilter.cpp:269-280) against the "
                         "same homography oracle — on this rigid fixture the "
                         "mesh solve must recover the global motion, so the "
                         "trajectory bound applies unchanged")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2  # noqa: F401
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
    from livevisionkit_tpu.utils import metrics

    rng = np.random.default_rng(11)
    size = (160, 216)
    h, w = size
    n = args.frames
    predictive = 5
    base = fixtures.make_texture(420, 420, rng)
    # Low drift keeps both smoothers at full strength: the reference's
    # adaptive-sigma servo (and ours) backs smoothing off when cumulative
    # drift approaches the corrective limit, which a fixed-sigma oracle
    # doesn't model — this comparison isolates the steady-state numerics.
    poses, _ = fixtures.shaky_path(n, rng, margin=110.0, drift_px=0.1,
                                   shake_px=2.5)
    frames_f = [np.asarray(fixtures.render_frame(base, p, size))
                for p in poses]
    frames_u8 = [np.clip(f * 255 + 0.5, 0, 255).astype(np.uint8)
                 for f in frames_f]

    scene_pt = np.array([210.0, 205.0])

    def input_track():
        xs = []
        for p in poses:
            xs.append(np.asarray(p.inverse().transform(
                jnp.asarray(scene_pt[None])))[0])
        return np.asarray(xs)

    x_in = input_track()

    # ---- oracle ----------------------------------------------------------
    sigma = predictive / 2.0
    oracle_corr = oracle_stabilize(frames_u8, predictive, sigma, 0.10,
                                   detection_size=(120, 168))
    # Steady-state window: skip the QA trust ramp (trust_step 0.05/frame
    # reaches 1.0 after 20 valid frames) so servo warm-up doesn't pollute
    # the steady-state numerics comparison; same window for both.
    t0_steady = max(2 * predictive, 25)
    y_oracle, x_sel = [], []
    for t in range(t0_steady, n):
        center = t - predictive
        xt = x_in[center]
        pt = cv2.perspectiveTransform(
            np.asarray(xt, np.float64).reshape(1, 1, 2), oracle_corr[t]
        )[0, 0]
        y_oracle.append(pt)
        x_sel.append(xt)
    y_oracle = np.asarray(y_oracle)
    x_sel = np.asarray(x_sel)

    # ---- ours ------------------------------------------------------------
    tracker_kw = {}
    if args.model == "field":
        from livevisionkit_tpu.config import MeshMotionSettings

        # The reference's experimental Vector Field preset scaled to the
        # fixture: 16x16 mesh, relaxed inlier threshold (VSFilter.cpp:
        # 269-280).  The oracle stays the 2x2/homography pipeline — the
        # fixture's motion IS a homography, so a correct mesh solve must
        # land on the same trajectory.
        tracker_kw = dict(
            motion_resolution=(16, 16),
            mesh=MeshMotionSettings(inlier_threshold_px=10.0),
        )
    st = StabilizationFilterSettings(
        tracker=FrameTrackerSettings(
            detection_size=(120, 168),
            detector=FeatureDetectorSettings(grid_shape=(10, 14),
                                             fast_threshold_init=0.06),
            min_motion_samples=15,
            **tracker_kw,
        ),
        smoother=PathSmootherSettings(
            predictive_samples=predictive,
            # Pin the adaptive-sigma servo to the oracle's fixed sigma so
            # the comparison isolates the pipeline numerics (detect → LK →
            # RANSAC → window smoothing); the servo dynamics are covered by
            # test_path_smoother.
            min_sigma=sigma, max_sigma=sigma,
        ),
    )
    filt = StabilizationFilter(settings=st)
    spec = FrameSpec(h, w, 1, PixelFormat.GRAY)
    state = filt.init(spec)
    step = jax.jit(filt.step)
    ours_corr, valids = [], []
    for t in range(n):
        fr = Frame.create(jnp.asarray(frames_f[t])[None], timestamp=t / 30.0,
                          fmt=PixelFormat.GRAY)
        state, out = step(state, fr)
        ours_corr.append(np.asarray(state.correction.offsets))
        valids.append(bool(out.valid))

    y_ours, x_ours = [], []
    for t in range(n):
        # Same steady-state window as the oracle (skip warm-up, where the
        # oracle emits identity and ours emits anchored partial windows).
        if not valids[t] or t < t0_steady:
            continue
        center = t - predictive
        xt = x_in[center]
        c = ours_corr[t]
        gh, gw = c.shape[1:]
        # Bilinear field evaluation at the point (nearest-corner sampling
        # adds spurious jitter for rotational corrections).
        fy = np.clip(xt[1] / (h - 1) * (gh - 1), 0, gh - 1)
        fx = np.clip(xt[0] / (w - 1) * (gw - 1), 0, gw - 1)
        y0, x0 = int(fy), int(fx)
        y1, x1 = min(y0 + 1, gh - 1), min(x0 + 1, gw - 1)
        wy, wx = fy - y0, fx - x0
        cval = (
            c[:, y0, x0] * (1 - wy) * (1 - wx)
            + c[:, y0, x1] * (1 - wy) * wx
            + c[:, y1, x0] * wy * (1 - wx)
            + c[:, y1, x1] * wy * wx
        )
        dy = cval[0] * (h - 1)
        dx = cval[1] * (w - 1)
        y_ours.append(xt - np.array([dx, dy]))
        x_ours.append(xt)
    y_ours = np.asarray(y_ours)
    x_ours = np.asarray(x_ours)

    # ---- metrics ---------------------------------------------------------
    def stats(xs, ys):
        ideal = metrics.smooth_path(xs, sigma=sigma)
        return {
            "jitter_in": round(metrics.jitter(xs), 3),
            "jitter_out": round(metrics.jitter(ys), 3),
            "ate_in": round(metrics.ate(xs, ideal), 3),
            "ate_out": round(metrics.ate(ys, ideal), 3),
        }

    s_oracle = stats(x_sel, y_oracle)
    s_ours = stats(x_ours, y_ours)
    row = {
        "metric": ("oracle_pipeline_trajectory" if args.model == "homography"
                   else "oracle_pipeline_trajectory_mesh"),
        "model": args.model,
        "frames": n,
        "size": f"{h}x{w}",
        "predictive_samples": predictive,
        "oracle": s_oracle,
        "ours": s_ours,
        "jitter_ratio_ours_vs_oracle": round(
            s_ours["jitter_out"] / max(s_oracle["jitter_out"], 1e-9), 3
        ),
        "ate_ratio_ours_vs_oracle": round(
            s_ours["ate_out"] / max(s_oracle["ate_out"], 1e-9), 3
        ),
        "bound": 1.25,
    }
    print(json.dumps(row, indent=1), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(json.dumps(row) + "\n")

    ok = (
        row["jitter_ratio_ours_vs_oracle"] <= row["bound"]
        and row["ate_ratio_ours_vs_oracle"] <= row["bound"]
    )
    print("ORACLE OK" if ok else "ORACLE FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
