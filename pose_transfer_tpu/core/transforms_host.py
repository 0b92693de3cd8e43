"""Host-side (numpy) per-pair warp estimation: affine fits, polygons, masks.

Re-implements the estimation half of src_deformable/utils/pose_transform.py
(lines 94-327) without skimage:

- ``estimate_affine`` replaces ``skimage.transform.estimate_transform('affine')``
  with a closed-form least-squares fit (same math, numpy lstsq).
- ``grid_points_in_poly`` replaces ``skimage.measure.grid_points_in_poly`` with
  an even-odd crossing-number rasterizer.

These run in the data pipeline on the host. The heavy rasterization
(``pose_masks``) additionally has a device-side twin in
``pose_transfer_tpu.ops.masks`` that consumes the polygon vertices produced by
``pose_mask_polys`` — the fast path ships only (10, 4, 2) vertices to the TPU
instead of (10, H, W) mask rasters.

Behavioral quirks reproduced on purpose (they are the reference's semantics):
- transforms are *inverse* affines, output→input (pose_transform.py:211-212);
- missing limbs fall back to the mirrored side, else a sentinel
  translation-by-1000 matrix (pose_transform.py:221,264-273);
- for pose_dim == 16 the limb names 'Rkne'/'Lkne' and all head names are not
  in the 16-joint LABELS schema, so knee/ankle limb parts and the head part
  always degenerate to the sentinel/empty mask — only body + 4 arm segments
  are active on h36m;
- the body mask is all-ones (pose_transform.py:149).
"""

from __future__ import annotations

import json

import numpy as np

from .skeletons import LABELS, LABELS_PAF, MISSING_VALUE

NO_POINT_TR = np.array([[1.0, 0.0, 1000.0],
                        [0.0, 1.0, 1000.0],
                        [0.0, 0.0, 1.0]])

HEAD_CANDIDATE_NAMES = ("Leye", "Reye", "Lear", "Rear", "nose")

# (from, to, inc_to for transforms, inc_to for masks) per limb part, in the
# reference's ordering (pose_transform.py:172-182, 277-287). Note transforms
# use inc_to 0.3 for lower segments while masks use 0.5 — reference asymmetry.
LIMB_PARTS = (
    ("Rhip", "Rkne", 0.1, 0.1),
    ("Lhip", "Lkne", 0.1, 0.1),
    ("Rkne", "Rank", 0.3, 0.5),
    ("Lkne", "Lank", 0.3, 0.5),
    ("Rsho", "Relb", 0.1, 0.1),
    ("Lsho", "Lelb", 0.1, 0.1),
    ("Relb", "Rwri", 0.3, 0.5),
    ("Lelb", "Lwri", 0.3, 0.5),
)

NUM_PARTS = 2 + len(LIMB_PARTS)  # body + head + 8 limb segments


def load_pose_cords_from_strings(y_str: str, x_str: str) -> np.ndarray:
    """Annotation CSV JSON lists → (K, 2) int array of (y, x)."""
    y = np.asarray(json.loads(y_str))
    x = np.asarray(json.loads(x_str))
    return np.stack([y, x], axis=1)


def give_name_to_keypoints(array: np.ndarray, pose_dim: int) -> dict:
    """(K, 2) (y, x) array → {joint name: (x, y)} skipping missing joints."""
    labels = LABELS if pose_dim == 16 else LABELS_PAF
    res = {}
    for i, name in enumerate(labels):
        if array[i][0] != MISSING_VALUE and array[i][1] != MISSING_VALUE:
            res[name] = np.asarray(array[i][::-1], dtype=np.float64)
    return res


def check_keypoints_present(kp: dict, names) -> bool:
    return all(name in kp for name in names)


def static_empty_parts(pose_dim: int) -> tuple[int, ...]:
    """Part indices whose mask/transform are degenerate for EVERY input of
    this schema — the joint names the part needs don't exist in the schema
    at all (e.g. pose_dim 16: 'Rkne'/'Lkne' never match the 16-joint
    'Rknee'/'Lknee' labels, and no head names exist → parts 1-5 are always
    the empty-mask sentinel; see the module docstring). Lets the device
    fold skip their contractions statically (ops/warp.py)."""
    labels = set(LABELS if pose_dim == 16 else LABELS_PAF)
    out = []
    if not any(nm in labels for nm in HEAD_CANDIDATE_NAMES):
        out.append(1)
    for i, (fr, to, _, _) in enumerate(LIMB_PARTS):
        if fr not in labels or to not in labels:
            out.append(i + 2)
    return tuple(out)


def compute_st_distance(kp: dict) -> float:
    """Torso scale: RMS of hip-shoulder distances (pose_transform.py:119-122)."""
    d1 = np.sum((kp["Rhip"] - kp["Rsho"]) ** 2)
    d2 = np.sum((kp["Lhip"] - kp["Lsho"]) ** 2)
    return float(np.sqrt((d1 + d2) / 2.0))


def estimate_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares 2D affine mapping src→dst; returns 3x3 params matrix.

    Same problem skimage's AffineTransform.estimate solves: minimize
    ||X @ M.T - dst|| with X = [x, y, 1].
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    n = src.shape[0]
    x = np.concatenate([src, np.ones((n, 1))], axis=1)
    sol, *_ = np.linalg.lstsq(x, dst, rcond=None)
    params = np.eye(3)
    params[:2, :] = sol.T
    return params


def estimate_polygon(fr: np.ndarray, to: np.ndarray, st: float, inc_to: float,
                     inc_from: float, p_to: float, p_from: float) -> np.ndarray:
    """Quadrilateral around a limb segment (pose_transform.py:187-209).

    Note the sequential update: ``to`` is extended using the already-extended
    ``fr`` — the reference does this (deliberately or not) and the polygon
    shape depends on it.
    """
    fr = fr + (fr - to) * inc_from
    to = to + (to - fr) * inc_to
    norm_vec = fr - to
    norm_vec = np.array([-norm_vec[1], norm_vec[0]])
    norm = np.linalg.norm(norm_vec)
    if norm == 0:
        return np.array([fr + 1, fr - 1, to - 1, to + 1])
    norm_vec = norm_vec / norm
    return np.array([
        fr + st * p_from * norm_vec,
        fr - st * p_from * norm_vec,
        to - st * p_to * norm_vec,
        to + st * p_to * norm_vec,
    ])


def _to_transform(tr: np.ndarray) -> np.ndarray:
    """Keep ``tr`` if invertible else the sentinel (pose_transform.py:224-230)."""
    try:
        np.linalg.inv(tr)
        return tr
    except np.linalg.LinAlgError:
        return NO_POINT_TR


def affine_transforms(array1: np.ndarray, array2: np.ndarray,
                      pose_dim: int) -> np.ndarray:
    """Estimate the 10 inverse (output→input) part affines → (10, 8).

    Parts in order: body, head, then LIMB_PARTS. Mirrors
    pose_transform.py:213-289 including the mirrored-limb fallback.
    """
    kp1 = give_name_to_keypoints(array1, pose_dim)
    kp2 = give_name_to_keypoints(array2, pose_dim)
    st1 = compute_st_distance(kp1)
    st2 = compute_st_distance(kp2)

    transforms = []

    body_names = ["Rhip", "Lhip", "Lsho", "Rsho"]
    body_poly_1 = np.array([kp1[n] for n in body_names])
    body_poly_2 = np.array([kp2[n] for n in body_names])
    transforms.append(_to_transform(estimate_affine(src=body_poly_2,
                                                    dst=body_poly_1)))

    head_names = {n for n in HEAD_CANDIDATE_NAMES if n in kp1 and n in kp2}
    if head_names:
        head_names |= {"Lsho", "Rsho"}
        names = list(head_names)
        head_poly_1 = np.array([kp1[n] for n in names])
        head_poly_2 = np.array([kp2[n] for n in names])
        transforms.append(_to_transform(estimate_affine(src=head_poly_2,
                                                        dst=head_poly_1)))
    else:
        transforms.append(_to_transform(NO_POINT_TR))

    def estimate_join(fr: str, to: str, inc_to: float) -> np.ndarray:
        if not check_keypoints_present(kp2, [fr, to]):
            return NO_POINT_TR
        poly_2 = estimate_polygon(kp2[fr], kp2[to], st2, inc_to, 0.1, 0.2, 0.2)
        if check_keypoints_present(kp1, [fr, to]):
            poly_1 = estimate_polygon(kp1[fr], kp1[to], st1, inc_to, 0.1, 0.2, 0.2)
        else:
            # mirrored-side fallback (pose_transform.py:264-273)
            if fr[0] == "R":
                fr, to = fr.replace("R", "L"), to.replace("R", "L")
            else:
                fr, to = fr.replace("L", "R"), to.replace("L", "R")
            if check_keypoints_present(kp1, [fr, to]):
                poly_1 = estimate_polygon(kp1[fr], kp1[to], st1, inc_to,
                                          0.1, 0.2, 0.2)
            else:
                return NO_POINT_TR
        return estimate_affine(src=poly_2, dst=poly_1)

    for fr, to, inc_to, _ in LIMB_PARTS:
        transforms.append(_to_transform(estimate_join(fr, to, inc_to)))

    return np.array(transforms).reshape((-1, 9))[..., :-1]


def estimate_uniform_transform(array1: np.ndarray, array2: np.ndarray,
                               pose_dim: int) -> np.ndarray:
    """Single whole-body inverse affine for warp_skip='full' → (1, 9).

    Mirrors pose_transform.py:293-327 (which returns the full 9 params in the
    invertible case and 8 in the degenerate one; we always return 9 and let
    the consumer slice, matching the common case shape (1, 9)).
    """
    kp1 = give_name_to_keypoints(array1, pose_dim)
    kp2 = give_name_to_keypoints(array2, pose_dim)

    names = {"Rhip", "Lhip", "Lsho", "Rsho"}
    for cn in ("Rkne", "Lkne"):
        if cn in kp1 and cn in kp2:
            names.add(cn)
    names = list(names)
    poly_1 = np.array([kp1[n] for n in names])
    poly_2 = np.array([kp2[n] for n in names])
    tr = estimate_affine(src=poly_2, dst=poly_1)
    try:
        np.linalg.inv(tr)
        return tr.reshape((-1, 9))
    except np.linalg.LinAlgError:
        return NO_POINT_TR.reshape((-1, 9))


def grid_points_in_poly(shape: tuple[int, int], verts: np.ndarray) -> np.ndarray:
    """Even-odd point-in-polygon test on the integer pixel grid.

    ``verts`` are (N, 2) (row, col) polygon vertices. Replacement for
    skimage.measure.grid_points_in_poly as used at pose_transform.py:170.
    """
    h, w = shape
    rr = np.arange(h, dtype=np.float64)[:, None]
    cc = np.arange(w, dtype=np.float64)[None, :]
    vy = verts[:, 0]
    vx = verts[:, 1]
    inside = np.zeros((h, w), dtype=bool)
    n = len(verts)
    for i in range(n):
        y1, x1 = vy[i], vx[i]
        y2, x2 = vy[(i + 1) % n], vx[(i + 1) % n]
        if y1 == y2:
            continue
        # edge crosses the horizontal line through the pixel row
        cond = (rr >= min(y1, y2)) & (rr < max(y1, y2))
        x_int = x1 + (rr - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (cc < x_int)
    return inside


def mask_from_kp_array(kp_array: np.ndarray, border_inc: float,
                       img_size: tuple[int, int]) -> np.ndarray:
    """Axis-aligned box mask around keypoints (pose_transform.py:125-136).

    ``kp_array`` is (N, 2) in (x, y); the box is truncated-int expanded and
    clamped to [0, (W, H)].
    """
    mn = np.min(kp_array, axis=0) - int(border_inc)
    mx = np.max(kp_array, axis=0) + int(border_inc)
    mn = np.maximum(mn, 0)
    mx = np.minimum(mx, np.asarray(img_size)[::-1])
    mask = np.zeros(img_size)
    mask[int(mn[1]):int(mx[1]), int(mn[0]):int(mx[0])] = 1
    return mask


def pose_masks(array2: np.ndarray, img_size: tuple[int, int],
               pose_dim: int) -> np.ndarray:
    """10 binary part masks in target pose space → (10, H, W) float.

    Mirrors pose_transform.py:143-184: body = all ones, head = box around the
    head-keypoint center of mass ±0.4·st, 8 limb quads rasterized even-odd.
    """
    kp2 = give_name_to_keypoints(array2, pose_dim)
    st2 = compute_st_distance(kp2)
    empty = np.zeros(img_size)
    masks = [np.ones(img_size)]

    head_names = [n for n in HEAD_CANDIDATE_NAMES if n in kp2]
    if head_names:
        com = np.mean([kp2[n] for n in head_names], axis=0,
                      keepdims=True).astype(int)
        masks.append(mask_from_kp_array(com, 0.40 * st2, img_size))
    else:
        masks.append(empty)

    for fr, to, _, inc_to in LIMB_PARTS:
        if not check_keypoints_present(kp2, [fr, to]):
            masks.append(empty)
            continue
        poly = estimate_polygon(kp2[fr], kp2[to], st2, inc_to, 0.1, 0.2, 0.2)
        masks.append(grid_points_in_poly(img_size, poly[:, ::-1]).astype(float))

    return np.array(masks)


def pose_mask_polys(array2: np.ndarray, img_size: tuple[int, int],
                    pose_dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Compact mask description for device-side rasterization.

    Returns:
      polys: (10, 4, 2) float32 polygon vertices in (y, x) pixel space.
      kinds: (10,) int32 — 0: all-ones (body), 1: box (head, verts are the
        box corners), 2: even-odd quad (limbs), 3: empty.

    The device twin ``ops.masks.rasterize_part_masks`` reproduces
    ``pose_masks`` bit-for-bit from this description; shipping 80 floats per
    sample instead of 10·H·W removes the reference's biggest host-side cost
    (pose_transform.py:143-184 ran per sample per epoch on CPU).
    """
    kp2 = give_name_to_keypoints(array2, pose_dim)
    st2 = compute_st_distance(kp2)
    polys = np.zeros((NUM_PARTS, 4, 2), dtype=np.float32)
    kinds = np.zeros((NUM_PARTS,), dtype=np.int32)

    kinds[0] = 0  # body: all ones

    head_names = [n for n in HEAD_CANDIDATE_NAMES if n in kp2]
    if head_names:
        com = np.mean([kp2[n] for n in head_names], axis=0,
                      keepdims=True).astype(int)
        mn = np.maximum(np.min(com, axis=0) - int(0.40 * st2), 0)
        mx = np.minimum(np.max(com, axis=0) + int(0.40 * st2),
                        np.asarray(img_size)[::-1])
        # store box corners (y, x): rows [mn_y, mx_y), cols [mn_x, mx_x)
        polys[1, 0] = (mn[1], mn[0])
        polys[1, 1] = (mx[1], mx[0])
        kinds[1] = 1
    else:
        kinds[1] = 3

    for j, (fr, to, _, inc_to) in enumerate(LIMB_PARTS):
        i = 2 + j
        if not check_keypoints_present(kp2, [fr, to]):
            kinds[i] = 3
            continue
        poly = estimate_polygon(kp2[fr], kp2[to], st2, inc_to, 0.1, 0.2, 0.2)
        polys[i] = poly[:, ::-1]  # (x, y) → (y, x)
        kinds[i] = 2

    return polys, kinds
