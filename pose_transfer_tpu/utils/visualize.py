"""Sample-grid visualization — rebuild of the display half of
src_deformable/utils/pose_utils.py (120-158, 235-309).

All functions take the framework's NHWC arrays (numpy or JAX). The skeleton
renderer reimplements skimage's ``line_aa`` (Xiaolin Wu anti-aliased line)
and filled ``circle`` in plain numpy — skimage is not a dependency here.
"""

from __future__ import annotations

import numpy as np

from ..core.skeletons import COLORS, LIMB_SEQ, LIMB_SEQ_PAF, MISSING_VALUE
from ..core import pose as pose_ops


def line_aa(y0: int, x0: int, y1: int, x1: int):
    """Anti-aliased line (Wu's algorithm): returns (yy, xx, val) index/weight
    triples, same contract as ``skimage.draw.line_aa``."""
    y0, x0, y1, x1 = float(y0), float(x0), float(y1), float(x1)
    steep = abs(y1 - y0) > abs(x1 - x0)
    if steep:
        x0, y0, x1, y1 = y0, x0, y1, x1
    if x0 > x1:
        x0, x1, y0, y1 = x1, x0, y1, y0
    dx = x1 - x0
    grad = (y1 - y0) / dx if dx != 0 else 1.0

    xs = np.arange(int(round(x0)), int(round(x1)) + 1)
    ys = y0 + grad * (xs - x0)
    floor = np.floor(ys)
    frac = ys - floor
    yy = np.concatenate([floor, floor + 1]).astype(np.int64)
    xx = np.concatenate([xs, xs]).astype(np.int64)
    val = np.concatenate([1.0 - frac, frac])
    keep = val > 1e-6
    yy, xx, val = yy[keep], xx[keep], val[keep]
    if steep:
        yy, xx = xx, yy
    return yy, xx, val


def disk(y: int, x: int, radius: int, shape: tuple[int, int]):
    """Filled circle pixel indices clipped to ``shape``."""
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    inside = yy ** 2 + xx ** 2 <= radius ** 2
    yy = yy[inside] + int(y)
    xx = xx[inside] + int(x)
    keep = (yy >= 0) & (yy < shape[0]) & (xx >= 0) & (xx < shape[1])
    return yy[keep], xx[keep]


def draw_pose_from_cords(pose_joints: np.ndarray, pose_dim: int,
                         img_size: tuple[int, int], radius: int = 2,
                         draw_joints: bool = True):
    """Render a skeleton: white AA limbs + per-joint colored disks.

    Matches pose_utils.py:120-154. Returns (colors uint8 HWC, bool mask).
    """
    pose_joints = np.asarray(pose_joints)
    colors = np.zeros((*img_size, 3), np.uint8)
    mask = np.zeros(img_size, bool)
    limb_seq = LIMB_SEQ if pose_dim == 16 else LIMB_SEQ_PAF

    def missing(j):
        return (pose_joints[j][0] == MISSING_VALUE or
                pose_joints[j][1] == MISSING_VALUE)

    if draw_joints:
        for f, t in limb_seq:
            if missing(f) or missing(t):
                continue
            yy, xx, val = line_aa(pose_joints[f][0], pose_joints[f][1],
                                  pose_joints[t][0], pose_joints[t][1])
            keep = (yy >= 0) & (yy < img_size[0]) & \
                   (xx >= 0) & (xx < img_size[1])
            yy, xx, val = yy[keep], xx[keep], val[keep]
            colors[yy, xx] = np.expand_dims(val, 1) * 255
            mask[yy, xx] = True

    for i, joint in enumerate(pose_joints):
        if missing(i):
            continue
        yy, xx = disk(joint[0], joint[1], radius, img_size)
        colors[yy, xx] = COLORS[i % len(COLORS)]
        mask[yy, xx] = True
    return colors, mask


def draw_pose_from_map(pose_map: np.ndarray, pose_dim: int,
                       threshold: float = 0.1, **kwargs):
    """(H, W, K) heatmaps → rendered skeleton (pose_utils.py:156-158)."""
    import jax.numpy as jnp

    cords = np.asarray(pose_ops.map_to_cord(jnp.asarray(pose_map), pose_dim,
                                            threshold=threshold))
    return draw_pose_from_cords(cords, pose_dim, pose_map.shape[:2],
                                **kwargs)


def make_grid(batch: np.ndarray, row: int, col: int,
              order: int = 0) -> np.ndarray:
    """Tile an (N, H, W, C) batch into a (row·H, col·W, C) canvas
    (pose_utils.py:292-309; order 0 fills columns first)."""
    batch = np.asarray(batch)
    n, h, w, c = batch.shape
    out = np.empty((row * h, col * w, c), batch.dtype)
    idx = 0
    outer, inner = (col, row) if order == 0 else (row, col)
    for i in range(outer):
        for j in range(inner):
            r, cidx = (j, i) if order == 0 else (i, j)
            out[r * h:(r + 1) * h, cidx * w:(cidx + 1) * w] = batch[idx]
            idx += 1
    return out


def _to_uint8(img) -> np.ndarray:
    """[-1, 1] float NHWC → uint8."""
    img = np.asarray(img, np.float32)
    return (255.0 * (img + 1.0) / 2.0).clip(0, 255).astype(np.uint8)


def display(input_batch, target_batch, output_batch, use_input_pose: bool,
            pose_dim: int) -> np.ndarray:
    """The train-loop sample grid (pose_utils.py:235-255): columns are
    [input image | target-pose skeleton | target | generated], one row per
    sample. NHWC inputs."""
    input_batch = np.asarray(input_batch)
    row = input_batch.shape[0]
    k = pose_dim
    inp_img = input_batch[..., :3]
    tg_pose = input_batch[..., (3 + k if use_input_pose else 3):]

    pose_images = np.array([draw_pose_from_map(p, pose_dim)[0]
                            for p in tg_pose])
    cols = [make_grid(_to_uint8(inp_img), row, 1),
            make_grid(pose_images, row, 1),
            make_grid(_to_uint8(target_batch), row, 1),
            make_grid(_to_uint8(output_batch), row, 1)]
    return np.concatenate(cols, axis=1)


def display_stacked(input_batch, interpol_batch, target_batch, outputs,
                    num_stacks: int, use_input_pose: bool,
                    pose_dim: int) -> np.ndarray:
    """Stacked-generator grid (pose_utils.py:258-288): input, the
    ``num_stacks`` interpolated-pose skeletons, target, and every stage
    output."""
    input_batch = np.asarray(input_batch)
    interpol_batch = np.asarray(interpol_batch)
    row = input_batch.shape[0]
    inp_img = input_batch[..., :3]

    pose_blocks = []
    for i in range(num_stacks):
        stage = interpol_batch[..., i * pose_dim:(i + 1) * pose_dim]
        pose_blocks.append(np.array([draw_pose_from_map(p, pose_dim)[0]
                                     for p in stage]))
    interpol_img = make_grid(np.concatenate(pose_blocks, axis=0), row,
                             num_stacks)
    res_img = make_grid(
        np.concatenate([_to_uint8(o) for o in outputs], axis=0),
        row, num_stacks)
    cols = [make_grid(_to_uint8(inp_img), row, 1), interpol_img,
            make_grid(_to_uint8(target_batch), row, 1), res_img]
    return np.concatenate(cols, axis=1)


def save_image(path: str, image: np.ndarray) -> None:
    """Write a uint8 HWC image as PNG/JPEG."""
    from PIL import Image

    Image.fromarray(np.asarray(image)).save(path)
