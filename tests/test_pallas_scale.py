"""Pallas EASU-upscale + RCAS kernels vs the XLA oracles (interpret mode).

Reference: FSR.cl:324-358 (easu_scale), :460-537 (rcas); the XLA forms in
ops/easu.py / ops/rcas.py are themselves oracle-tested, so matching them
transitively matches the reference numerics.
"""

import numpy as np

import fixtures
from livevisionkit_tpu.ops import easu, rcas
from livevisionkit_tpu.ops.tpu_kernels import easu_scale as pes
from livevisionkit_tpu.ops.tpu_kernels import rcas as prcas
from livevisionkit_tpu.types import PixelFormat

import jax.numpy as jnp


def test_easu_up2_matches_rational(rng):
    img = jnp.asarray(
        np.stack([np.asarray(fixtures.make_texture(64, 96, rng))] * 3)
    )
    ref = easu.easu_scale(img, (128, 192), fmt=PixelFormat.YUV)
    got = pes.pallas_easu_up(img, p=2, fmt=PixelFormat.YUV, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_easu_up2_rgb_luma_path(rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
    ref = easu.easu_scale(img, (128, 128), fmt=PixelFormat.RGB)
    got = pes.pallas_easu_up(img, p=2, fmt=PixelFormat.RGB, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_easu_dispatch_override(rng, monkeypatch):
    """force="pallas" routes easu_scale through the kernel off-TPU
    (interpreted); "xla" keeps the rational path.  The LVK_EASU env var is
    the default for the argument."""
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 96)).astype(np.float32))
    ref = easu.easu_scale(img, (128, 192), fmt=PixelFormat.YUV, force="xla")
    got = easu.easu_scale(img, (128, 192), fmt=PixelFormat.YUV, force="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    monkeypatch.setenv("LVK_EASU", "pallas")
    env = easu.easu_scale(img, (128, 192), fmt=PixelFormat.YUV)
    np.testing.assert_allclose(np.asarray(env), np.asarray(got), atol=0)


def test_easu_up_randomized_sizes_match_oracle(rng):
    """Property sweep (r2 VERDICT #9): odd/even/non-multiple-of-tile source
    extents all match the XLA rational oracle — exercises the border-band
    pasting and the grid-edge partial tiles of the Pallas kernel, not just
    one aligned shape.  Even extents only (the kernel's parity split
    requires them and the dispatch enforces it)."""
    sizes = [(32, 34), (34, 64), (48, 130), (62, 98), (130, 32), (96, 96)]
    for h, w in sizes:
        img = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
        ref = easu.easu_scale(img, (2 * h, 2 * w), fmt=PixelFormat.YUV,
                              force="xla")
        got = pes.pallas_easu_up(img, p=2, fmt=PixelFormat.YUV, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5,
            err_msg=f"size {(h, w)}",
        )


def test_rcas_matches_xla(rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 100, 150)).astype(np.float32))
    ref = rcas.rcas(img, 0.8)
    got = prcas.pallas_rcas(img, sharpness=0.8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_rcas_dispatch_override(rng, monkeypatch):
    img = jnp.asarray(rng.uniform(0, 1, (1, 300, 300)).astype(np.float32))
    ref = rcas.rcas(img, 0.5, force="xla")
    got = rcas.rcas(img, 0.5, force="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    monkeypatch.setenv("LVK_RCAS", "pallas")
    env = rcas.rcas(img, 0.5)
    np.testing.assert_allclose(np.asarray(env), np.asarray(got), atol=0)
