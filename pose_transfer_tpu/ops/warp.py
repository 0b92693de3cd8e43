"""Differentiable multi-transform affine feature warping (the deformable op).

TPU-first rebuild of the reference's warp stack
(src_deformable/utils/pose_transform.py:16-92):

- ``AffineLayer`` tiled the feature map ×T in HBM, round-tripped through
  ``F.affine_grid``'s normalized-coordinate convention, and ``grid_sample``d
  (pose_transform.py:23-39). Here the warp samples directly in *pixel* space:
  for an inverse (output→input) affine ``m`` acting on (x, y) pixel-center
  coordinates, output(y, x) = bilinear(input, m @ (x+.5, y+.5, 1) - .5) with
  zero padding. This is exactly the end-to-end semantics of the reference's
  normalize_transforms (pose_transform.py:48-58) + align_corners=False
  affine_grid/grid_sample chain for square feature maps (the only shapes the
  reference trains: 256², 224², 128²), derived analytically and verified
  against torch in tests/test_warp.py.
- ``AffineTransformLayer`` resized part masks with cv2 on the CPU inside the
  forward pass (pose_transform.py:82-85 — a device→host→device sync per
  stage). Here the resize is ``jax.image.resize`` in-graph.
- The ×T feature blowup never hits HBM: transforms are folded with a
  fori_loop running max/sum accumulator (and a fused Pallas kernel in
  ``ops.warp_pallas`` for the hot path).

Transforms are (T, 8) row-major first-8 of a 3×3 matrix acting on (x, y, 1):
``[m00, m01, tx, m10, m11, ty, 0, 0]`` — the layout produced by
``core.transforms_host.affine_transforms``. Translations are estimated at the
full image resolution ``init_image_size`` and rescaled per feature resolution
(the reference's ``affine_mul``, pose_transform.py:72-76; we scale tx by the
width ratio and ty by the height ratio, which is identical for the square
shapes of record and dimensionally correct otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, cv2 INTER_LINEAR
    semantics: half-pixel centers, clamped borders, no antialiasing.

    Built with numpy at trace time, so the resize itself is one MXU matmul
    per axis instead of a gather.
    """
    u = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    u0 = np.floor(u).astype(np.int64)
    frac = u - u0
    lo = np.clip(u0, 0, n_in - 1)
    hi = np.clip(u0 + 1, 0, n_in - 1)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), lo] += 1.0 - frac
    mat[np.arange(n_out), hi] += frac
    return mat


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Resize the trailing-2 spatial dims (..., H, W) → (..., h, w).

    Matches cv2.resize(..., INTER_LINEAR) — the reference's mask resize
    (pose_transform.py:82-85) — as two static-matrix contractions.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ry = jnp.asarray(_resize_matrix(h_out, h_in), x.dtype)
    rx = jnp.asarray(_resize_matrix(w_out, w_in), x.dtype)
    x = jnp.einsum("ah,...hw->...aw", ry, x)
    return jnp.einsum("bw,...aw->...ab", rx, x)


def _sample_coords(transform: jax.Array, h: int, w: int,
                   scale_y: float, scale_x: float):
    """Pixel-space sample coordinates (v, u) for one (8,) inverse affine."""
    m00, m01, tx, m10, m11, ty = (transform[0], transform[1], transform[2],
                                  transform[3], transform[4], transform[5])
    tx = tx * scale_x
    ty = ty * scale_y
    x = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5   # (1, W) centers
    y = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5   # (H, 1)
    u = m00 * x + m01 * y + tx - 0.5                      # (H, W) input x
    v = m10 * x + m11 * y + ty - 0.5                      # (H, W) input y
    return v, u


def bilinear_sample(image: jax.Array, v: jax.Array, u: jax.Array) -> jax.Array:
    """Bilinear sample with zero padding (torch grid_sample semantics).

    Args:
      image: (H, W, C).
      v, u: (Ho, Wo) float sample positions (row, col) in pixel units.

    Returns:
      (Ho, Wo, C) samples; out-of-bounds taps contribute zero.
    """
    h, w, c = image.shape
    v0 = jnp.floor(v)
    u0 = jnp.floor(u)
    fv = v - v0
    fu = u - u0
    v0 = v0.astype(jnp.int32)
    u0 = u0.astype(jnp.int32)

    flat = image.reshape(h * w, c)

    def tap(vi, ui, weight):
        valid = (vi >= 0) & (vi < h) & (ui >= 0) & (ui < w)
        idx = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*v.shape, c)
        return vals * (weight * valid)[..., None]

    out = (tap(v0, u0, (1 - fv) * (1 - fu))
           + tap(v0, u0 + 1, (1 - fv) * fu)
           + tap(v0 + 1, u0, fv * (1 - fu))
           + tap(v0 + 1, u0 + 1, fv * fu))
    # taps accumulate in f32 (weights are f32); cast back so low-precision
    # feature dtypes (bfloat16) round-trip the op
    return out.astype(image.dtype)


def warp_feature_single(features: jax.Array, transform: jax.Array,
                        init_image_size: tuple[int, int]) -> jax.Array:
    """Warp one (H, W, C) feature map by one (8,) inverse affine."""
    h, w, _ = features.shape
    v, u = _sample_coords(transform, h, w,
                          scale_y=h / init_image_size[0],
                          scale_x=w / init_image_size[1])
    v = jax.lax.stop_gradient(v)
    u = jax.lax.stop_gradient(u)
    return bilinear_sample(features, v, u)


@functools.partial(jax.jit,
                   static_argnames=("init_image_size", "warp_skip",
                                    "warp_agg"))
def affine_transform_layer(features: jax.Array, warps: jax.Array,
                           masks: jax.Array | None,
                           init_image_size: tuple[int, int],
                           warp_skip: str = "mask",
                           warp_agg: str = "max") -> jax.Array:
    """Warp + (mask) + aggregate over the T part transforms.

    Args:
      features: (N, h, w, C) NHWC appearance skip.
      warps: (N, T, 8) inverse pixel affines estimated at ``init_image_size``.
      masks: (N, T, H0, W0) part masks at image resolution (required for
        ``warp_skip='mask'``; ignored otherwise, matching
        pose_transform.py:79-88).
      init_image_size: (H0, W0) resolution the transforms were estimated at.
      warp_skip: 'mask' | 'full' | 'none' — 'none' still warps with all T
        transforms unmasked, the deformable tree's actual behavior for that
        flag (networks.py:283 + pose_transform.py:79).
      warp_agg: 'max' (reference hardcoded, pose_transform.py:89) or 'avg'
        (the never-honored --warp_agg option, implemented here).

    Returns:
      (N, h, w, C) aggregated warped features.
    """
    n, h, w, c = features.shape
    t = warps.shape[1]

    if warp_skip == "mask":
        if masks is None:
            raise ValueError("warp_skip='mask' requires part masks")
        # in-graph replacement for the reference's cv2-on-CPU resize
        masks_r = resize_bilinear(masks.astype(features.dtype), (h, w))
    else:
        masks_r = None

    neg_inf = jnp.asarray(-jnp.inf, features.dtype)

    def body(i, acc):
        if masks_r is not None:
            def one_sample(feat, tr, mask_i):
                warped = warp_feature_single(feat, tr, init_image_size)
                return warped * mask_i[..., None]
            warped = jax.vmap(one_sample)(features, warps[:, i],
                                          masks_r[:, i])
        else:
            def one_sample(feat, tr):
                return warp_feature_single(feat, tr, init_image_size)
            warped = jax.vmap(one_sample)(features, warps[:, i])
        if warp_agg == "max":
            return jnp.maximum(acc, warped)
        return acc + warped

    init = jnp.full((n, h, w, c), neg_inf, features.dtype) \
        if warp_agg == "max" else jnp.zeros((n, h, w, c), features.dtype)
    out = jax.lax.fori_loop(0, t, body, init)
    if warp_agg == "avg":
        out = out / t
    return out
