"""Distributed mesh solve == single-device solve, on the virtual 8-dev mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from livevisionkit_tpu.config import MeshMotionSettings
from livevisionkit_tpu.models.warp_field import WarpField
from livevisionkit_tpu.parallel import distributed_solve
from livevisionkit_tpu.vision import mesh_motion

pytestmark = pytest.mark.slow  # whole module: sharded/jit-compile dominated

SIZE = (96, 120)
MESH_SHAPE = (9, 11)


def _problem(rng, n=320):
    import sys

    sys.path.insert(0, "tests")
    from test_mesh_motion import _field_displacement, _make_gt_field

    gt = _make_gt_field()
    xs = rng.uniform(2, SIZE[1] - 3, n)
    ys = rng.uniform(2, SIZE[0] - 3, n)
    pts = np.stack([xs, ys], -1).astype(np.float32)
    d = _field_displacement(pts, gt)
    src = pts + d[:, ::-1]
    w = np.ones(n, np.float32)
    bad = rng.choice(n, 40, replace=False)
    src[bad] += rng.uniform(6, 15, size=(40, 2))
    return jnp.asarray(src), jnp.asarray(pts), jnp.asarray(w), gt


def test_sharded_solve_matches_local(rng):
    src, dst, w, gt = _problem(rng)
    settings = MeshMotionSettings(
        temporal_weight=0.01, rigidity_weight=0.3, irls_rounds=2
    )
    warm = WarpField.identity(MESH_SHAPE)

    local_f, local_inl, local_res = mesh_motion.estimate(
        src, dst, w, warm, SIZE, settings
    )

    devices = np.asarray(jax.devices()).reshape(8)
    mesh = Mesh(devices, ("tile",))
    dist_f, dist_inl, dist_res = distributed_solve.estimate_sharded(
        src, dst, w, warm, SIZE, settings, mesh
    )

    np.testing.assert_allclose(
        np.asarray(dist_f.offsets), np.asarray(local_f.offsets), atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(dist_inl), np.asarray(local_inl))
    np.testing.assert_allclose(float(dist_res), float(local_res), atol=1e-4)


def test_sharded_solve_accuracy(rng):
    src, dst, w, gt = _problem(rng)
    settings = MeshMotionSettings(
        temporal_weight=0.01, rigidity_weight=0.3, irls_rounds=3
    )
    devices = np.asarray(jax.devices()).reshape(8)
    mesh = Mesh(devices, ("tile",))
    est, inl, res = distributed_solve.estimate_sharded(
        src, dst, w, WarpField.identity(MESH_SHAPE), SIZE, settings, mesh
    )
    err_px = np.abs(
        np.asarray(est.offsets - gt.offsets)
        * np.array([SIZE[0] - 1, SIZE[1] - 1]).reshape(2, 1, 1)
    )
    assert err_px[:, 1:-1, 1:-1].max() < 1.0
