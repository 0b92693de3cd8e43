"""Device-side batch preparation: compact host batch → model-ready tensors.

This is the in-graph half of the data pipeline. The host ships uint8 images,
(K, 2) keypoints and compact warp/mask descriptions
(``dataset.PoseTransferDataset.item_compact``); everything the reference
rasterized per-sample on the CPU (Gaussian heatmaps — pose_utils.py:79-86;
part masks — pose_transform.py:143-184) happens here under jit, fused by XLA
into the same program as the train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import pose as pose_ops
from ..ops.masks import rasterize_part_masks


def _heatmaps(kp: jax.Array, image_size: tuple[int, int]) -> jax.Array:
    """(N, K, 2) keypoints → (N, H, W, K) Gaussian heatmaps."""
    return pose_ops.cords_to_map(kp, image_size)


def make_batch_preparer(*, image_size: tuple[int, int], pose_dim: int,
                        use_input_pose: bool = True,
                        warp_skip: str = "mask",
                        gen_type: str = "baseline",
                        num_stacks: int = 4,
                        dtype=jnp.float32,
                        jit: bool = True):
    """Build a jitted ``prepare(batch) -> dict`` for a fixed config.

    Output dict (baseline):
      input:  (N, H, W, 3+2K) packed [image ‖ input pose ‖ target pose]
      target: (N, H, W, 3) in [-1, 1]
      warps:  (N, T, 8)
      masks:  (N, T, H, W) for warp_skip='mask', else None

    Output dict (stacked): input, target, interpol_pose (N, H, W, S·K),
      interpol_warps (N, S+1, T, 8), interpol_masks (N, S+1, T, H, W).
    """
    h, w = image_size

    def prepare(batch: dict) -> dict:
        img_from = pose_ops.preprocess_image(batch["image_from"]).astype(dtype)
        if "image_to" in batch:
            img_to = pose_ops.preprocess_image(
                batch["image_to"]).astype(dtype)
        else:
            # serving: no ground-truth target exists; the slot only feeds
            # the (unused) reconstruction target. Built in-graph so the
            # request never ships target-image bytes host→device.
            img_to = jnp.full_like(img_from, -1.0)
        inp_map = _heatmaps(batch["kp_from"], image_size).astype(dtype)
        tg_map = _heatmaps(batch["kp_to"], image_size).astype(dtype)

        packed = pose_ops.pack_input(
            img_from, inp_map if use_input_pose else None, tg_map)
        out = {"input": packed, "target": img_to}

        if gen_type == "unet":
            pass  # packed input only — no warps/masks to transfer/rasterize
        elif gen_type != "stacked":
            out["warps"] = batch["warps"].astype(dtype)
            if warp_skip == "mask":
                out["masks"] = jax.vmap(
                    lambda p, k: rasterize_part_masks(p, k, image_size)
                )(batch["mask_polys"], batch["mask_kinds"]).astype(dtype)
            else:
                out["masks"] = None
        else:
            n = batch["interpol_kp"].shape[0]
            s = num_stacks
            # (N, S, K, 2) → (N, H, W, S*K) channel-concatenated stage maps
            maps = _heatmaps(batch["interpol_kp"].reshape(n * s, pose_dim, 2),
                             image_size)
            maps = maps.reshape(n, s, h, w, pose_dim)
            maps = jnp.moveaxis(maps, 1, 3).reshape(n, h, w, s * pose_dim)
            out["interpol_pose"] = maps.astype(dtype)
            out["interpol_warps"] = batch["interpol_warps"].astype(dtype)
            if warp_skip == "mask":
                polys = batch["interpol_polys"]    # (N, S+1, T, 4, 2)
                kinds = batch["interpol_kinds"]    # (N, S+1, T)
                n_, s1, t = kinds.shape
                m = jax.vmap(
                    lambda p, k: rasterize_part_masks(p, k, image_size)
                )(polys.reshape(n_ * s1, t, 4, 2), kinds.reshape(n_ * s1, t))
                out["interpol_masks"] = m.reshape(n_, s1, t, h, w).astype(dtype)
            else:
                out["interpol_masks"] = None
        return out

    return jax.jit(prepare) if jit else prepare


@functools.partial(jax.jit, static_argnames=("image_size",))
def masks_from_polys(polys: jax.Array, kinds: jax.Array,
                     image_size: tuple[int, int]) -> jax.Array:
    """(N, T, 4, 2) + (N, T) → (N, T, H, W) batched mask rasterization."""
    return jax.vmap(lambda p, k: rasterize_part_masks(p, k, image_size))(
        polys, kinds)
