"""Spatial (tile) sharding with explicit halo exchange.

Frame tensors shard their W axis across the "tile" mesh axis; warping needs
source pixels up to the displacement bound beyond each shard's edges, so
neighbouring shards exchange halo stripes with `lax.ppermute` (ICI
neighbour traffic only — no all-gather), then each device remaps its own
output stripe locally.  This is the SURVEY.md §7 M5 design: the reference
has no spatial parallelism at all (single GPU); on a pod slice this is how
4K+ frames split across chips.

The halo width must cover the warp's maximum displacement (the stabilizer's
corrective limit by construction).  Larger displacements clamp to the halo
edge, mirroring the replicate-border behaviour at frame edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from livevisionkit_tpu.ops import remap as remap_ops


def remap_sharded(
    img: jax.Array,  # (C, H, W), W divisible by the axis size
    sample_map: jax.Array,  # (2, H, W) absolute coords
    mesh: Mesh,
    fill: float | None = 0.0,
    axis: str = "tile",
    halo: int = 192,
) -> jax.Array:
    """Backward-warp with W sharded over `axis` and ppermute halo exchange."""
    c, h, w = img.shape
    n = mesh.shape[axis]
    assert w % n == 0, f"W={w} must divide the {axis} axis ({n})"
    local_w = w // n
    halo = min(halo, local_w)

    def local_fn(img_l, map_l):
        img_l = img_l  # (C, H, local_w)
        idx = lax.axis_index(axis)

        # Exchange edge stripes with both neighbours (ICI ring traffic).
        right_edge = img_l[:, :, local_w - halo :]
        left_edge = img_l[:, :, :halo]
        from_left = lax.ppermute(  # my left neighbour's right edge
            right_edge, axis, [(i, (i + 1) % n) for i in range(n)]
        )
        from_right = lax.ppermute(  # my right neighbour's left edge
            left_edge, axis, [(i, (i - 1) % n) for i in range(n)]
        )
        padded = jnp.concatenate([from_left, img_l, from_right], axis=2)

        # Local sampling coordinates into the halo-padded stripe.  Clamp to
        # the reachable range: beyond-halo samples degrade to halo-edge
        # replicate (they are out-of-spec displacements).
        x0 = idx * local_w - halo
        ys = jnp.clip(map_l[0], 0.0, float(h - 1))
        xs = jnp.clip(map_l[1], 0.0, float(w - 1)) - x0
        xs = jnp.clip(xs, 0.0, float(local_w + 2 * halo - 1))
        out = remap_ops.bilinear_sample(padded, ys, xs, fill=None)
        return out

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    out = fn(img, sample_map)
    if fill is not None:
        ys, xs = sample_map[0], sample_map[1]
        inside = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
        out = jnp.where(inside, out, jnp.asarray(fill, out.dtype))
    return out
