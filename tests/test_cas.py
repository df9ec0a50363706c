"""AMD CAS sharpening: numeric parity with a direct scalar port of the ffx
math (reference ffx_cas_mod.h CasFilter with CAS_SLOW + CAS_BETTER_DIAGONALS,
as cas.effect:63-66 compiles it; CasSetup sharpness mapping ffx_cas.h:389)."""

import jax.numpy as jnp
import numpy as np

import fixtures
from livevisionkit_tpu.config import CASFilterSettings
from livevisionkit_tpu.data.frame import Frame, PixelFormat
from livevisionkit_tpu.filters.sharpening import CASFilter
from livevisionkit_tpu.ops import cas, rcas


def _cas_oracle_px(n3x3: np.ndarray, peak: float) -> np.ndarray:
    """One output pixel from its (3, 3, C) neighbourhood — scalar transcription
    of CasFilter (ffx_cas_mod.h:57-168), exact rcp/sqrt variants."""
    a, b, c = n3x3[0]
    d, e, f = n3x3[1]
    g, h, i = n3x3[2]
    mn = np.minimum.reduce([d, e, f, b, h])
    mn2 = np.minimum.reduce([mn, a, c, g, i])
    mn = mn + mn2
    mx = np.maximum.reduce([d, e, f, b, h])
    mx2 = np.maximum.reduce([mx, a, c, g, i])
    mx = mx + mx2
    amp = np.clip(np.minimum(mn, 2.0 - mx) / np.maximum(mx, 1e-6), 0.0, 1.0)
    amp = np.sqrt(amp)
    w = amp * peak
    return np.clip(((b + d + f + h) * w + e) / (4.0 * w + 1.0), 0.0, 1.0)


def _cas_oracle(img_chw: np.ndarray, sharpness: float) -> np.ndarray:
    peak = -1.0 / (8.0 + (5.0 - 8.0) * np.clip(sharpness, 0.0, 1.0))
    c_, h_, w_ = img_chw.shape
    p = np.pad(img_chw, ((0, 0), (1, 1), (1, 1)), mode="edge")
    out = np.empty_like(img_chw)
    for y in range(h_):
        for x in range(w_):
            n = p[:, y : y + 3, x : x + 3].transpose(1, 2, 0)  # (3,3,C)
            out[:, y, x] = _cas_oracle_px(n, peak)
    return out


def test_cas_matches_ffx_oracle(rng):
    img = rng.uniform(0.0, 1.0, size=(3, 12, 14)).astype(np.float32)
    for sharp in (0.0, 0.5, 1.0):
        got = np.asarray(cas.cas(jnp.asarray(img), sharp))
        want = _cas_oracle(img, sharp)
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_cas_peak_mapping():
    # CasSetup: sharp = -1/lerp(8, 5, sat(s))  (ffx_cas.h:389).
    assert abs(cas.cas_peak(0.0) + 1.0 / 8.0) < 1e-9
    assert abs(cas.cas_peak(1.0) + 1.0 / 5.0) < 1e-9
    assert abs(cas.cas_peak(0.5) + 1.0 / 6.5) < 1e-9
    assert cas.cas_peak(2.0) == cas.cas_peak(1.0)  # saturated


def test_cas_flat_unchanged():
    img = jnp.full((3, 16, 16), 0.4)
    out = cas.cas(img, 0.8)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-6)


def test_cas_sharpens_edge(rng):
    from livevisionkit_tpu.ops import resample

    ramp = jnp.asarray(np.linspace(0.2, 0.8, 32, dtype=np.float32))
    img = jnp.broadcast_to(ramp[None, None, :], (1, 32, 32))
    soft = resample.gaussian_blur5(img)
    sharp = cas.cas(soft, 1.0)
    g_soft = np.abs(np.diff(np.asarray(soft[0]), axis=1))[8:-8, 8:-8].mean()
    g_sharp = np.abs(np.diff(np.asarray(sharp[0]), axis=1))[8:-8, 8:-8].mean()
    assert g_sharp > g_soft


def test_cas_differs_from_rcas(rng):
    """CAS and RCAS are different kernels (the round-1 CLI aliased them)."""
    tex = np.asarray(fixtures.make_texture(24, 24, rng))[None]
    a = np.asarray(cas.cas(jnp.asarray(tex), 0.8))
    b = np.asarray(rcas.rcas(jnp.asarray(tex), 0.8))
    assert np.abs(a - b).max() > 1e-3


def test_cas_filter_and_cli_wiring(rng):
    tex = np.asarray(fixtures.make_texture(16, 16, rng)).astype(np.float32)
    frame = Frame.create(jnp.stack([tex] * 3), fmt=PixelFormat.YUV)
    filt = CASFilter(CASFilterSettings(sharpness=0.6))
    _, out = filt.step((), frame)
    np.testing.assert_allclose(
        np.asarray(out.pixels), _cas_oracle(np.stack([tex] * 3), 0.6), atol=2e-6
    )
    # CLI `cas` builds the real CASFilter, not an RCAS-bearing ScalingFilter.
    from livevisionkit_tpu.runtime.cli import _build_filter

    built = _build_filter("cas", {"sharpness": "0.6"})
    assert isinstance(built, CASFilter)
    assert built.settings.sharpness == 0.6
