"""Sub-stage TPU latency profile of FrameTracker.track (scan-delta method)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from profile_stages import scan_time


def main():
    import livevisionkit_tpu as lvk
    from __graft_entry__ import _flagship_filter
    from livevisionkit_tpu.ops import resample
    from livevisionkit_tpu.vision import features as features_mod
    from livevisionkit_tpu.vision import frame_tracker, mesh_motion, optical_flow, ransac
    from livevisionkit_tpu.vision.optical_flow import Pyramid
    from livevisionkit_tpu.models.warp_field import WarpField

    filt = _flagship_filter()
    s = filt.settings.tracker
    print(f"motion_resolution={s.motion_resolution}, "
          f"grid={s.detector.grid_shape}, max_features={s.detector.max_features}, "
          f"hypotheses={s.motion.hypotheses}, levels={s.flow.pyramid_levels}")

    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0.1, 0.9, size=(1080, 1920)).astype(np.float32))
    det = resample.resize(gray, s.detection_size, antialias=True)
    st0 = frame_tracker.init(s)

    # Seed a realistic state: run track twice outside timing.
    st, _ = frame_tracker.track(st0, gray, s)
    st, _ = frame_tracker.track(st, gray, s)
    st = jax.block_until_ready(st)
    pyr = Pyramid.build(det, s.flow.pyramid_levels)

    def t_track(c, t):
        st2, res = frame_tracker.track(st, gray + 1e-6 * t, s)
        return c, res.stability + jnp.sum(st2.features.points) * 1e-9

    print(f"track (whole):        {scan_time(t_track, jnp.float32(0)):7.3f} ms")

    def t_pyr(c, t):
        p = Pyramid.build(det + 1e-6 * t, s.flow.pyramid_levels)
        return c, sum(jnp.sum(l[::32, ::32]) for l in p.levels)

    print(f"pyramid.build:        {scan_time(t_pyr, jnp.float32(0)):7.3f} ms")

    def t_flow(c, t):
        pts, ok = optical_flow.track(
            st.pyramid, pyr, st.features.points + 1e-6 * t,
            st.features.valid, s.flow,
        )
        return c, jnp.sum(pts) + jnp.sum(ok)

    print(f"optical_flow.track:   {scan_time(t_flow, jnp.float32(0)):7.3f} ms")

    key = jax.random.key(1)
    dst = st.features.points + 0.5

    def t_ransac(c, t):
        est = ransac.estimate(
            st.features.points, dst + 1e-6 * t, st.features.valid, key,
            s.motion, use_homography=jnp.asarray(True),
            min_samples=s.min_motion_samples,
        )
        return c, est.stability + jnp.sum(est.homography.m)

    print(f"ransac.estimate:      {scan_time(t_ransac, jnp.float32(0)):7.3f} ms")

    def t_detect(c, t):
        feats, thr = features_mod.detect(det + 1e-6 * t, st.thresholds, s.detector)
        return c, jnp.sum(feats.points) + jnp.sum(thr)

    print(f"features.detect:      {scan_time(t_detect, jnp.float32(0)):7.3f} ms")

    if tuple(s.motion_resolution) != (2, 2):
        warm = WarpField.identity(s.motion_resolution)

        def t_mesh(c, t):
            fld, _, _ = mesh_motion.estimate(
                st.features.points, dst + 1e-6 * t,
                st.features.valid.astype(jnp.float32), warm,
                s.detection_size, s.mesh,
            )
            return c, jnp.sum(fld.offsets)

        print(f"mesh_motion.estimate: {scan_time(t_mesh, jnp.float32(0)):7.3f} ms")


if __name__ == "__main__":
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    main()
