"""Pallas LK level kernel vs the XLA _track_level oracle (interpret mode)."""

import pytest
import numpy as np
import jax.numpy as jnp

from livevisionkit_tpu.config import OpticalFlowSettings
from livevisionkit_tpu.ops.tpu_kernels import lk as lk_kernel
from livevisionkit_tpu.vision import optical_flow as OF

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated


def _setup(rng, H=68, W=120, N=37, shift=(1, -1)):
    base = rng.uniform(0.2, 0.8, size=(H + 8, W + 8)).astype(np.float32)
    prev = jnp.asarray(base[4 : 4 + H, 4 : 4 + W])
    nxt = jnp.asarray(base[4 + shift[0] : 4 + shift[0] + H,
                           4 + shift[1] : 4 + shift[1] + W])
    pts = jnp.asarray(
        np.stack([rng.uniform(8, W - 8, N), rng.uniform(8, H - 8, N)], -1)
        .astype(np.float32)
    )
    return prev, nxt, pts


def test_matches_xla_level(rng):
    s = OpticalFlowSettings()
    prev, nxt, pts = _setup(rng)
    guess = jnp.zeros_like(pts)
    f_ref, g_ref, _ = OF._track_level(prev, nxt, pts, guess, s)
    f_pal, g_pal = lk_kernel.lk_level(
        prev, nxt, pts, guess, s.window_size, s.iterations,
        s.min_eigen_threshold, block=64, interpret=True,
    )
    # The kernel feeds its MXU selects bf16 (like XLA's own default matmul
    # precision on TPU); vs the fp32 CPU oracle that is ~1e-2 px of flow —
    # far inside the 3 px inlier threshold.
    assert np.abs(np.asarray(f_ref - f_pal)).max() < 5e-2
    assert (np.asarray(g_ref) == np.asarray(g_pal)).mean() >= 0.95


def test_matches_xla_border_windows(rng):
    s = OpticalFlowSettings()
    prev, nxt, _ = _setup(rng)
    H, W = prev.shape
    pts = jnp.asarray(
        np.array(
            [[1.2, 3.4], [W - 2.0, 2.0], [3.0, H - 1.5], [0.4, 0.7],
             [W - 1.2, H - 1.1]],
            np.float32,
        )
    )
    guess = jnp.zeros_like(pts)
    f_ref, g_ref, _ = OF._track_level(prev, nxt, pts, guess, s)
    f_pal, g_pal = lk_kernel.lk_level(
        prev, nxt, pts, guess, s.window_size, s.iterations,
        s.min_eigen_threshold, block=64, interpret=True,
    )
    assert np.abs(np.asarray(f_ref - f_pal)).max() < 5e-2
    assert bool(jnp.all(g_ref == g_pal))


def test_track_dispatch_override(rng, monkeypatch):
    """LVK_LK=pallas routes optical_flow.track through the kernel
    (interpreted off-TPU) and matches the XLA path."""
    s = OpticalFlowSettings()
    prev, nxt, pts = _setup(rng, N=21)
    p1 = OF.Pyramid.build(prev, s.pyramid_levels)
    p2 = OF.Pyramid.build(nxt, s.pyramid_levels)
    valid = jnp.ones(pts.shape[0], bool)
    ref, okr = OF.track(p1, p2, pts, valid, s)
    monkeypatch.setenv("LVK_LK", "pallas")
    got, okg = OF.track(p1, p2, pts, valid, s)
    keep = np.asarray(okr & okg)
    # bf16 rounding compounds over 3 levels x 5 iterations: ~0.1 px.
    assert np.abs(np.asarray(ref - got))[keep].max() < 0.3
    assert (np.asarray(okr) == np.asarray(okg)).mean() > 0.9
