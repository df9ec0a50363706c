"""WarpField: the core mesh-warp motion model.

Reference parity: ``lvk::WarpMesh`` (reference Math/WarpMesh.hpp:31-161,
Math/WarpMesh.cpp) — an HxW grid of normalized backward offsets
(warped -> identity, WarpMesh.hpp:156-158) with full algebra
(+, -, scalar, blend, combine, clamp, crop_in, set_to(homography),
WarpMesh.cpp:318-560) and an ``apply`` that upsamples the mesh to frame
resolution and remaps (WarpMesh.cpp:183-223; 2x2 meshes short-circuit to an
exact homography warp :196-218).

TPU-native design:
  * Offsets are a single (2, Hm, Wm) float32 tensor, plane 0 = dy, plane 1 =
    dx, in **normalized units** (1.0 = frame height/width - 1) so fields are
    resolution-independent, exactly like the reference's normalized meshes.
  * Field control points are CORNER-ALIGNED over the frame: grid point (i, j)
    sits at frame pixel (i*(H-1)/(Hm-1), j*(W-1)/(Wm-1)).
  * All algebra is elementwise tensor math — it vmaps/scans trivially, which
    is what lets the PathSmoother window convolution become one tensor
    contraction instead of a loop of Mat ops.
  * The reference's thread_local identity-mesh caches (WarpMesh.cpp:453-471)
    are unnecessary: XLA constant-folds the identity grids.

Semantics of a field f: warping image I by f produces
O(u) = I(u_px + f(u) * (size-1)) — backward offsets, like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from livevisionkit_tpu.models.homography import Homography
from livevisionkit_tpu.ops import remap as remap_ops
from livevisionkit_tpu.ops import resample


def _norm_scale(size: tuple[int, int], dtype=jnp.float32) -> jax.Array:
    """(2, 1, 1) pixel-per-normalized-unit scale for a frame size."""
    h, w = size
    return jnp.array([h - 1, w - 1], dtype).reshape(2, 1, 1)


def _grid_points_px(field_shape: tuple[int, int], size: tuple[int, int]) -> jax.Array:
    """(2, Hm, Wm) pixel positions of corner-aligned field control points."""
    hm, wm = field_shape
    h, w = size
    yy = jax.lax.broadcasted_iota(jnp.float32, (hm, wm), 0) * ((h - 1) / (hm - 1))
    xx = jax.lax.broadcasted_iota(jnp.float32, (hm, wm), 1) * ((w - 1) / (wm - 1))
    return jnp.stack([yy, xx])


class WarpField(struct.PyTreeNode):
    offsets: jax.Array  # (2, Hm, Wm) normalized backward offsets (dy, dx)

    # ---- metadata ----------------------------------------------------------

    @property
    def field_shape(self) -> tuple[int, int]:
        return self.offsets.shape[-2:]

    # ---- constructors ------------------------------------------------------

    @classmethod
    def identity(cls, field_shape: tuple[int, int]) -> "WarpField":
        """Zero-offset field (reference WarpMesh identity, WarpMesh.cpp:60-75)."""
        return cls(offsets=jnp.zeros((2,) + tuple(field_shape), jnp.float32))

    @classmethod
    def from_homography(
        cls,
        h: Homography,
        field_shape: tuple[int, int],
        size: tuple[int, int],
    ) -> "WarpField":
        """Field whose warp reproduces `h.warp` at the control points
        (reference WarpMesh::set_to(Homography), WarpMesh.cpp:530-560).

        Backward convention: offsets point from output pixels to their source,
        i.e. o(u) = H^-1(u) - u, normalized.
        """
        pts_px = _grid_points_px(tuple(field_shape), size)  # (2, Hm, Wm) (y, x)
        xy = jnp.stack([pts_px[1], pts_px[0]], axis=-1)  # (Hm, Wm, 2) (x, y)
        src_xy = h.inverse().transform(xy.reshape(-1, 2)).reshape(xy.shape)
        off_px = jnp.stack(
            [src_xy[..., 1] - pts_px[0], src_xy[..., 0] - pts_px[1]]
        )  # (2, Hm, Wm) (dy, dx)
        return cls(offsets=off_px / _norm_scale(size))

    def to_homography(self, size: tuple[int, int]) -> Homography:
        """Exact homography through the 4 corner offsets — the reference's
        2x2-mesh fast path (WarpMesh.cpp:196-218).  Only meaningful for 2x2
        fields (larger fields are sampled at their corners)."""
        pts_px = _grid_points_px(self.field_shape, size)
        off_px = self.offsets * _norm_scale(size)
        src = pts_px + off_px  # where each corner samples from
        corners = [(0, 0), (0, -1), (-1, 0), (-1, -1)]
        dst_q = jnp.stack(
            [jnp.stack([pts_px[1, i, j], pts_px[0, i, j]]) for i, j in corners]
        )
        src_q = jnp.stack(
            [jnp.stack([src[1, i, j], src[0, i, j]]) for i, j in corners]
        )
        # The field samples input at src for output position dst, i.e.
        # out(dst) = in(src) = in(H^-1(dst)) — so H maps src -> dst, which is
        # exactly from_quad(src, dst).
        return Homography.from_quad(src_q, dst_q)

    # ---- algebra (reference WarpMesh.cpp:318-560) --------------------------

    def __add__(self, other: "WarpField") -> "WarpField":
        return WarpField(offsets=self.offsets + other.offsets)

    def __sub__(self, other: "WarpField") -> "WarpField":
        return WarpField(offsets=self.offsets - other.offsets)

    def __mul__(self, s) -> "WarpField":
        return WarpField(offsets=self.offsets * s)

    __rmul__ = __mul__

    def __neg__(self) -> "WarpField":
        return WarpField(offsets=-self.offsets)

    def lerp(self, other: "WarpField", t) -> "WarpField":
        """Blend toward `other` (reference WarpMesh::blend)."""
        return WarpField(offsets=self.offsets + (other.offsets - self.offsets) * t)

    def clamp(self, limits_y, limits_x) -> "WarpField":
        """Clamp normalized offsets into +/- limits (reference
        WarpMesh::clamp used for corrective limits, PathSmoother.cpp:121-125)."""
        dy = jnp.clip(self.offsets[0], -limits_y, limits_y)
        dx = jnp.clip(self.offsets[1], -limits_x, limits_x)
        return WarpField(offsets=jnp.stack([dy, dx]))

    def magnitude(self) -> jax.Array:
        """Per-point L2 offset magnitude (normalized units)."""
        return jnp.sqrt(jnp.sum(self.offsets**2, axis=0))

    def resize(self, field_shape: tuple[int, int]) -> "WarpField":
        """Resample control grid (corner-aligned)."""
        if tuple(field_shape) == self.field_shape:
            return self
        return WarpField(
            offsets=resample.resize_corner_aligned(self.offsets, tuple(field_shape))
        )

    def compose(self, outer: "WarpField") -> "WarpField":
        """Composition: first warp by `outer`, then by self — the combined
        backward field is c(u) = outer.o(u) + self.o(u + outer.o(u))
        (reference WarpMesh::combine).  self is resampled at the displaced
        control points (cheap: field resolution, not frame resolution)."""
        hm, wm = self.field_shape
        o = outer.resize((hm, wm)).offsets
        # Normalized coordinates of control points in [0, 1].
        yy = jax.lax.broadcasted_iota(jnp.float32, (hm, wm), 0) / (hm - 1)
        xx = jax.lax.broadcasted_iota(jnp.float32, (hm, wm), 1) / (wm - 1)
        # Sample positions in *field grid index* units.
        sy = (yy + o[0]) * (hm - 1)
        sx = (xx + o[1]) * (wm - 1)
        inner_at = remap_ops.bilinear_sample(self.offsets, sy, sx, fill=None)
        return WarpField(offsets=o + inner_at)

    # ---- application -------------------------------------------------------

    def sample_map(self, size: tuple[int, int]) -> jax.Array:
        """(2, H, W) absolute-pixel backward sample map at frame resolution."""
        off = resample.resize_corner_aligned(self.offsets, tuple(size))
        return remap_ops.identity_map(tuple(size)) + off * _norm_scale(size)

    def apply(
        self,
        img: jax.Array,
        fill: jax.Array | float | None = 0.0,
        exact_2x2: bool = True,
    ) -> jax.Array:
        """Warp (C, H, W) / (H, W) image by this field (reference
        WarpMesh::apply, WarpMesh.cpp:183-223).  2x2 fields take the exact
        homography path like the reference (:196-218)."""
        size = img.shape[-2:]
        if exact_2x2 and self.field_shape == (2, 2):
            return self.to_homography(size).warp(img, fill=fill)
        return remap_ops.remap(img, self.sample_map(size), fill=fill)
