"""Device-side pose geometry: keypoints ↔ Gaussian heatmaps, pose interpolation.

TPU-first redesign of the reference's host-side numpy loops:

- ``cords_to_map`` (reference: src_deformable/utils/pose_utils.py:79-86 — a
  per-joint python loop over full meshgrids on the CPU, recomputed for every
  sample every epoch) becomes a single fused broadcasted Gaussian eval over
  (H, W, K), jit-able and vmap-able over the batch. The train step rasterizes
  heatmaps on device, so the host only ships (K, 2) keypoint arrays.
- ``map_to_cord`` (pose_utils.py:56-76) becomes an argmax decode.
- ``compute_interpol_pose`` (pose_utils.py:89-118) is the stacked-generator
  pose interpolation with the reference's missing-joint synthesis rule.

Layout: heatmaps are NHWC (..., H, W, K) — channels-last keeps the joint axis
on the TPU lane dimension and matches the conv layout used by the models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .skeletons import MISSING_VALUE


def cords_to_map(cords: jax.Array, img_size: tuple[int, int],
                 sigma: float = 6.0) -> jax.Array:
    """Rasterize keypoints into Gaussian heatmaps.

    Args:
      cords: (..., K, 2) float or int array of (y, x) keypoints;
        a coordinate equal to ``MISSING_VALUE`` (-1) marks a missing joint,
        whose channel is all zeros (pose_utils.py:82-83).
      img_size: (H, W).
      sigma: Gaussian std in pixels (reference default 6).

    Returns:
      (..., H, W, K) float32 heatmaps: exp(-((y-cy)^2+(x-cx)^2)/(2 sigma^2)).
    """
    h, w = img_size
    cords = jnp.asarray(cords, jnp.float32)
    cy = cords[..., 0][..., None, None, :]          # (..., 1, 1, K)
    cx = cords[..., 1][..., None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None, None]   # (H, 1, 1)
    xx = jnp.arange(w, dtype=jnp.float32)[None, :, None]   # (1, W, 1)
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    maps = jnp.exp(-d2 / (2.0 * sigma ** 2))
    missing = jnp.logical_or(cords[..., 0] == MISSING_VALUE,
                             cords[..., 1] == MISSING_VALUE)
    return jnp.where(missing[..., None, None, :], 0.0, maps)


@functools.partial(jax.jit, static_argnames=("pose_dim", "threshold"))
def map_to_cord(pose_map: jax.Array, pose_dim: int,
                threshold: float = 0.1) -> jax.Array:
    """Decode heatmaps back to (K, 2) integer (y, x) keypoints.

    Matches pose_utils.py:56-76: per channel, take the first (row-major)
    location of the channel max if that max exceeds ``threshold``, else
    MISSING_VALUE. Supports leading batch dims.
    """
    pose_map = pose_map[..., :pose_dim]
    h, w = pose_map.shape[-3], pose_map.shape[-2]
    flat = jnp.moveaxis(pose_map, -1, -3).reshape(
        pose_map.shape[:-3] + (pose_dim, h * w))
    idx = jnp.argmax(flat, axis=-1)                 # first max, row-major
    peak = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    y = idx // w
    x = idx % w
    valid = peak > threshold
    y = jnp.where(valid, y, MISSING_VALUE)
    x = jnp.where(valid, x, MISSING_VALUE)
    return jnp.stack([y, x], axis=-1).astype(jnp.int32)


def compute_interpol_pose(inp_pose: jax.Array, tg_pose: jax.Array,
                          index: int, num_stacks: int,
                          pose_dim: int) -> jax.Array:
    """Linear keypoint interpolation for the stacked generator.

    Matches pose_utils.py:89-118. For pose_dim 16 it is a plain lerp.
    For pose_dim 18 missing joints are synthesized/vanished at the halfway
    stack: a joint missing in the input but present in the target is MISSING
    for index <= num_stacks//2 and snaps to the target after; symmetrically
    for joints missing in the target.
    """
    inp_pose = jnp.asarray(inp_pose, jnp.float32)
    tg_pose = jnp.asarray(tg_pose, jnp.float32)
    frac = index / num_stacks
    lerp = inp_pose + (tg_pose - inp_pose) * frac
    if pose_dim == 16:
        return lerp

    inp_missing = jnp.any(inp_pose == MISSING_VALUE, axis=-1, keepdims=True)
    tg_missing = jnp.any(tg_pose == MISSING_VALUE, axis=-1, keepdims=True)
    first_half = index <= num_stacks // 2
    missing_vec = jnp.full_like(lerp, MISSING_VALUE)

    # missing in input, present in target: MISSING then target
    case_inp = jnp.where(first_half, missing_vec, tg_pose)
    # present in input, missing in target: input then MISSING
    case_tg = jnp.where(first_half, inp_pose, missing_vec)

    out = jnp.where(inp_missing & ~tg_missing, case_inp, lerp)
    out = jnp.where(tg_missing & ~inp_missing, case_tg, out)
    out = jnp.where(inp_missing & tg_missing, missing_vec, out)
    return out


def interpol_pose_sequence(inp_pose: jax.Array, tg_pose: jax.Array,
                           num_stacks: int, pose_dim: int) -> jax.Array:
    """All ``num_stacks`` interpolated poses, final one == target pose.

    Returns (num_stacks, ..., K, 2). Mirrors the dataset's per-stage loop
    (PoseTransfer_Dataset.py:147-158) but stays stackable for device use.
    """
    return jnp.stack([
        compute_interpol_pose(inp_pose, tg_pose, i, num_stacks, pose_dim)
        for i in range(1, num_stacks + 1)
    ])


def preprocess_image(image: jax.Array) -> jax.Array:
    """uint8 [0,255] → float32 [-1, 1] (pose_utils.py:216-217)."""
    return (jnp.asarray(image, jnp.float32) / 255.0 - 0.5) * 2.0


def deprocess_image(image: jax.Array) -> jax.Array:
    """float [-1, 1] → uint8 [0, 255] (pose_utils.py:219-220)."""
    return (255.0 * (image + 1.0) / 2.0).astype(jnp.uint8)


def get_imgpose(inp: jax.Array, use_input_pose: bool, pose_dim: int):
    """Split the packed NHWC input into (image, input pose, target pose).

    Channel contract (pose_utils.py:227-233): [0:3] RGB, [3:3+K] input pose
    (when ``use_input_pose``), remainder target pose.
    """
    inp_img = inp[..., :3]
    inp_pose = inp[..., 3:3 + pose_dim] if use_input_pose else None
    tg_start = 3 + pose_dim if use_input_pose else 6
    tg_pose = inp[..., tg_start:]
    return inp_img, inp_pose, tg_pose


def pack_input(image: jax.Array, inp_pose_map: jax.Array | None,
               tg_pose_map: jax.Array) -> jax.Array:
    """Concatenate [image ‖ (input pose) ‖ target pose] on channels (NHWC)."""
    parts = [image]
    if inp_pose_map is not None:
        parts.append(inp_pose_map)
    parts.append(tg_pose_map)
    return jnp.concatenate(parts, axis=-1)
