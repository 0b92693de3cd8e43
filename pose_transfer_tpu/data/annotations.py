"""Annotation CSV handling and host-side keypoint bookkeeping.

The annotation files are ``:``-separated CSVs with columns
``name:keypoints_y:keypoints_x`` where the keypoint columns hold JSON lists
(reference: src_deformable/datasets/PoseTransfer_Dataset.py:40-46 and
utils/pose_utils.py:161-164).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..core.skeletons import MISSING_VALUE


def load_annotations(path: str) -> pd.DataFrame:
    """Read one annotation CSV, indexed by image name."""
    df = pd.read_csv(path, sep=":")
    return df.set_index("name")


def merge_annotations(train_path: str, test_path: str) -> pd.DataFrame:
    """Concatenate train+test annotations into one name-indexed table.

    The reference swaps the two variables before concatenating
    (PoseTransfer_Dataset.py:40-46) — harmless since lookups are by name;
    we concatenate in file order.
    """
    frames = [pd.read_csv(p, sep=":") for p in (train_path, test_path)]
    return pd.concat(frames, axis=0, ignore_index=True).set_index("name")


def load_keypoints(row) -> np.ndarray:
    """Annotation row → (K, 2) int array of (y, x) keypoints."""
    y = np.asarray(json.loads(row["keypoints_y"]))
    x = np.asarray(json.loads(row["keypoints_x"]))
    return np.stack([y, x], axis=1)


def dump_keypoints(kp: np.ndarray) -> tuple[str, str]:
    """(K, 2) (y, x) keypoints → (keypoints_y, keypoints_x) JSON strings."""
    kp = np.asarray(kp)
    return (json.dumps([int(v) for v in kp[:, 0]]),
            json.dumps([int(v) for v in kp[:, 1]]))


def project_keypoints(cords: np.ndarray,
                      img_size: tuple[int, int],
                      sigma: float = 6.0,
                      threshold: float = 0.1) -> np.ndarray:
    """Closed form of ``map_to_cord(cords_to_map(kp))`` — no rasterization.

    The reference's stacked data path round-trips every interpolated pose
    through a full H×W×K Gaussian rasterization followed by an argmax decode
    (PoseTransfer_Dataset.py:112-133 via pose_utils.py:56-86). The composition
    has a closed form: each coordinate snaps to the nearest integer grid point
    (ties resolve to the smaller index — the first row-major argmax), clamped
    into the image, and the joint goes MISSING when the peak Gaussian value
    ``exp(-d²/(2σ²))`` does not exceed ``threshold``. Verified bit-exact
    against the rasterized round trip in tests/test_data.py.
    """
    cords = np.asarray(cords, dtype=np.float64)
    h, w = img_size
    missing = (cords[:, 0] == MISSING_VALUE) | (cords[:, 1] == MISSING_VALUE)
    py = np.clip(np.ceil(cords[:, 0] - 0.5), 0, h - 1)
    px = np.clip(np.ceil(cords[:, 1] - 0.5), 0, w - 1)
    d2 = (py - cords[:, 0]) ** 2 + (px - cords[:, 1]) ** 2
    peak = np.exp(-d2 / (2.0 * sigma ** 2))
    valid = ~missing & (peak > threshold)
    out = np.full_like(cords, MISSING_VALUE)
    out[valid, 0] = py[valid]
    out[valid, 1] = px[valid]
    return out.astype(np.int64)


def interpolate_keypoints_host(kp_from: np.ndarray, kp_to: np.ndarray,
                               index: int, num_stacks: int,
                               pose_dim: int) -> np.ndarray:
    """Host twin of ``core.pose.compute_interpol_pose`` (numpy).

    Linear lerp for pose_dim 16; for pose_dim 18 joints missing on one side
    are synthesized/vanished at the halfway stack (pose_utils.py:89-118).
    """
    kp_from = np.asarray(kp_from, dtype=np.float64)
    kp_to = np.asarray(kp_to, dtype=np.float64)
    frac = index / num_stacks
    lerp = kp_from + (kp_to - kp_from) * frac
    if pose_dim == 16:
        return lerp

    inp_missing = np.any(kp_from == MISSING_VALUE, axis=-1)
    tg_missing = np.any(kp_to == MISSING_VALUE, axis=-1)
    first_half = index <= num_stacks // 2
    out = lerp.copy()
    only_inp = inp_missing & ~tg_missing
    only_tg = tg_missing & ~inp_missing
    both = inp_missing & tg_missing
    out[only_inp] = MISSING_VALUE if first_half else kp_to[only_inp]
    out[only_tg] = kp_from[only_tg] if first_half else MISSING_VALUE
    out[both] = MISSING_VALUE
    return out
