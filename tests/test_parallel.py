"""Multi-device tests on the virtual 8-CPU mesh (stream DP x frame tiling)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu import (
    FeatureDetectorSettings,
    FrameSpec,
    FrameTrackerSettings,
    PathSmootherSettings,
    PixelFormat,
    StabilizationFilter,
    StabilizationFilterSettings,
)
from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.parallel import streams as par

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated


def _filter():
    return StabilizationFilter(
        settings=StabilizationFilterSettings(
            tracker=FrameTrackerSettings(
                detection_size=(48, 64),
                detector=FeatureDetectorSettings(
                    grid_shape=(4, 4), fast_threshold_init=0.05
                ),
                min_motion_samples=6,
            ),
            smoother=PathSmootherSettings(predictive_samples=2),
        )
    )


def _clips(rng, n_streams, n_frames, size=(96, 128)):
    out = []
    for s in range(n_streams):
        base = fixtures.make_texture(256, 256, rng)
        poses, _ = fixtures.shaky_path(n_frames, rng, margin=60.0, shake_px=2.0)
        out.append(
            np.stack([np.asarray(fixtures.render_frame(base, p, size)) for p in poses])
        )
    return np.stack(out)  # (S, T, H, W)


def test_multi_stream_mesh_runs(rng):
    n_streams, n_tiles = 4, 2
    mesh = par.make_mesh(n_streams, n_tiles)
    ms = par.MultiStreamFilter(_filter(), n_streams, mesh)
    spec = FrameSpec(96, 128, 1, PixelFormat.GRAY)
    states = ms.init(spec)

    clips = _clips(rng, n_streams, 8)
    step = ms.jit_step()
    outs = []
    for t in range(8):
        frames = jax.vmap(
            lambda p, tt=t: Frame.create(
                p[None], timestamp=tt / 30.0, fmt=PixelFormat.GRAY
            )
        )(jnp.asarray(clips[:, t]))
        frames = ms._shard(frames, tile_w=True)
        states, out = step(states, frames)
        outs.append(out)
    assert outs[-1].pixels.shape == (n_streams, 1, 96, 128)
    # After the 2-frame delay all streams emit valid frames.
    assert np.asarray(outs[-1].valid).all()
    # Streams evolve independent QA state; with these tiny 16-feature test
    # configs tracking is intermittent, so just require SOME stream built
    # trust and all diagnostics are sane.
    assert (np.asarray(states.trust) > 0.0).any()
    assert (np.asarray(states.stability) >= 0.0).all()


def test_multi_stream_matches_single_stream(rng):
    """DP over streams must be numerically identical to running each stream
    alone (no cross-stream coupling)."""
    n_streams = 2
    mesh = par.make_mesh(n_streams, 1)
    filt = _filter()
    ms = par.MultiStreamFilter(filt, n_streams, mesh, tile_frames=False)
    spec = FrameSpec(96, 128, 1, PixelFormat.GRAY)

    clips = _clips(rng, n_streams, 6)
    # Parallel run.
    states = ms.init(spec)
    step = jax.jit(ms.step)
    for t in range(6):
        frames = jax.vmap(
            lambda p, tt=t: Frame.create(
                p[None], timestamp=tt / 30.0, fmt=PixelFormat.GRAY
            )
        )(jnp.asarray(clips[:, t]))
        states, out_par = step(states, frames)

    # Serial runs.
    outs_serial = []
    for s in range(n_streams):
        st = filt.init(spec)
        for t in range(6):
            st, out = filt.step(
                st,
                Frame.create(
                    jnp.asarray(clips[s, t])[None],
                    timestamp=t / 30.0,
                    fmt=PixelFormat.GRAY,
                ),
            )
        outs_serial.append(np.asarray(out.pixels))

    np.testing.assert_allclose(
        np.asarray(out_par.pixels), np.stack(outs_serial), atol=2e-5
    )


def test_tiled_frames_have_sharded_layout(rng):
    mesh = par.make_mesh(2, 4)
    ms = par.MultiStreamFilter(_filter(), 2, mesh)
    spec = FrameSpec(96, 128, 1, PixelFormat.GRAY)
    states = ms.init(spec)
    # The frame delay queue leaves should be sharded over the tile axis (W).
    queue_leaf = states.frames.data.pixels  # (S, cap, C, H, W)
    spec_found = queue_leaf.sharding.spec
    assert "stream" in str(spec_found)
    assert "tile" in str(spec_found), spec_found
