"""Device-side rasterization of the 10 body-part masks.

TPU twin of ``core.transforms_host.pose_masks`` (itself a rebuild of
src_deformable/utils/pose_transform.py:143-184). The host pipeline ships a
compact polygon description — (10, 4, 2) vertices + (10,) kind codes from
``core.transforms_host.pose_mask_polys`` — and this module rasterizes the
(10, H, W) masks in-graph with pure VPU compare/XOR math. This removes both
the reference's per-sample host rasterization (grid_points_in_poly on CPU in
``Dataset.__getitem__``) and its 10·H·W-per-sample host→device transfer.

Kind codes: 0 = all-ones (body), 1 = box (head; verts[0]=(y0,x0),
verts[1]=(y1,x1) half-open), 2 = even-odd quad (limbs), 3 = empty.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quad_mask(verts: jax.Array, h: int, w: int) -> jax.Array:
    """Even-odd crossing-number rasterization of one (4, 2) (y, x) quad."""
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]   # (H, 1)
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]   # (1, W)
    crossings = jnp.zeros((h, w), dtype=jnp.int32)
    for i in range(4):
        y1, x1 = verts[i, 0], verts[i, 1]
        y2, x2 = verts[(i + 1) % 4, 0], verts[(i + 1) % 4, 1]
        horiz = y1 == y2
        cond = (rr >= jnp.minimum(y1, y2)) & (rr < jnp.maximum(y1, y2))
        denom = jnp.where(horiz, 1.0, y2 - y1)
        x_int = x1 + (rr - y1) * (x2 - x1) / denom
        hit = cond & (cc < x_int) & ~horiz
        crossings = crossings + hit.astype(jnp.int32)
    return (crossings % 2 == 1).astype(jnp.float32)


def _box_mask(verts: jax.Array, h: int, w: int) -> jax.Array:
    rr = jnp.arange(h, dtype=jnp.float32)[:, None]
    cc = jnp.arange(w, dtype=jnp.float32)[None, :]
    y0, x0 = verts[0, 0], verts[0, 1]
    y1, x1 = verts[1, 0], verts[1, 1]
    m = (rr >= y0) & (rr < y1) & (cc >= x0) & (cc < x1)
    return m.astype(jnp.float32)


def rasterize_part_masks(polys: jax.Array, kinds: jax.Array,
                         img_size: tuple[int, int]) -> jax.Array:
    """(T, 4, 2) polys + (T,) kinds → (T, H, W) float32 masks.

    Matches ``core.transforms_host.pose_masks`` for the same polygon
    description up to float32-vs-float64 edge-intersection rounding (isolated
    pixels exactly on a polygon boundary may flip). vmap-able over a leading
    batch dim.
    """
    h, w = img_size

    def one_part(verts, kind):
        quad = _quad_mask(verts, h, w)
        box = _box_mask(verts, h, w)
        ones = jnp.ones((h, w), jnp.float32)
        zeros = jnp.zeros((h, w), jnp.float32)
        return jax.lax.switch(kind, [lambda: ones, lambda: box,
                                     lambda: quad, lambda: zeros])

    return jax.vmap(one_part)(polys.astype(jnp.float32), kinds)
