"""L0 pose geometry: heatmaps, decode, interpolation — vs numpy goldens.

The golden implementations are literal numpy transcriptions of the reference
semantics (src_deformable/utils/pose_utils.py:56-118) so parity failures
localize to the JAX code.
"""

import numpy as np
import pytest

from pose_transfer_tpu.core import pose
from pose_transfer_tpu.core.skeletons import MISSING_VALUE


def ref_cords_to_map(cords, img_size, sigma=6):
    """Reference semantics of pose_utils.cords_to_map:79-86."""
    result = np.zeros(img_size + cords.shape[0:1], dtype="float32")
    for i, point in enumerate(cords):
        if point[0] == MISSING_VALUE or point[1] == MISSING_VALUE:
            continue
        xx, yy = np.meshgrid(np.arange(img_size[1]), np.arange(img_size[0]))
        result[..., i] = np.exp(
            -((yy - point[0]) ** 2 + (xx - point[1]) ** 2)
            / (2 * sigma ** 2))
    return result


def ref_map_to_cord(pose_map, pose_dim, threshold=0.1):
    """Reference semantics of pose_utils.map_to_cord:56-76."""
    all_peaks = [[] for _ in range(pose_dim)]
    pose_map = pose_map[..., :pose_dim]
    y, x, z = np.where(np.logical_and(
        pose_map == pose_map.max(axis=(0, 1)), pose_map > threshold))
    for x_i, y_i, z_i in zip(x, y, z):
        all_peaks[z_i].append([x_i, y_i])
    xs, ys = [], []
    for i in range(pose_dim):
        if all_peaks[i]:
            xs.append(all_peaks[i][0][0])
            ys.append(all_peaks[i][0][1])
        else:
            xs.append(MISSING_VALUE)
            ys.append(MISSING_VALUE)
    return np.stack([ys, xs], axis=1)


@pytest.mark.parametrize("img_size", [(64, 48), (32, 32)])
def test_cords_to_map_matches_reference(img_size):
    rng = np.random.RandomState(0)
    k = 18
    cords = rng.randint(0, min(img_size), size=(k, 2)).astype(np.float32)
    cords[3] = MISSING_VALUE
    cords[7, 0] = MISSING_VALUE
    ours = np.asarray(pose.cords_to_map(cords, img_size))
    golden = ref_cords_to_map(cords, img_size)
    np.testing.assert_allclose(ours, golden, atol=1e-5)
    assert ours[..., 3].max() == 0.0


def test_cords_to_map_batched():
    rng = np.random.RandomState(1)
    cords = rng.randint(0, 32, size=(4, 16, 2)).astype(np.float32)
    ours = np.asarray(pose.cords_to_map(cords, (32, 32)))
    assert ours.shape == (4, 32, 32, 16)
    for b in range(4):
        np.testing.assert_allclose(
            ours[b], ref_cords_to_map(cords[b], (32, 32)), atol=1e-5)


def test_map_to_cord_roundtrip_and_reference():
    rng = np.random.RandomState(2)
    k = 16
    cords = rng.randint(0, 32, size=(k, 2))
    cords[5] = MISSING_VALUE
    maps = np.asarray(pose.cords_to_map(cords, (32, 32)))
    ours = np.asarray(pose.map_to_cord(maps, k))
    golden = ref_map_to_cord(maps, k)
    np.testing.assert_array_equal(ours, golden)
    # round trip recovers the keypoints (incl. the missing sentinel)
    np.testing.assert_array_equal(ours, cords)


def test_map_to_cord_threshold():
    maps = np.zeros((16, 16, 3), np.float32)
    maps[4, 5, 0] = 0.5       # above threshold
    maps[8, 2, 1] = 0.05      # below threshold → missing
    out = np.asarray(pose.map_to_cord(maps, 3))
    np.testing.assert_array_equal(out[0], [4, 5])
    np.testing.assert_array_equal(out[1], [MISSING_VALUE, MISSING_VALUE])
    np.testing.assert_array_equal(out[2], [MISSING_VALUE, MISSING_VALUE])


def ref_compute_interpol_pose(inp_pos, tg_pos, index, num_stacks, pose_dim):
    """Reference semantics of pose_utils.compute_interpol_pose:89-118."""
    if pose_dim == 16:
        return inp_pos + (tg_pos - inp_pos) * index / num_stacks
    out = np.zeros([pose_dim, 2], dtype="float32")
    for i in range(pose_dim):
        inp_missing = (inp_pos[i, 0] == MISSING_VALUE
                       or inp_pos[i, 1] == MISSING_VALUE)
        tg_missing = (tg_pos[i, 0] == MISSING_VALUE
                      or tg_pos[i, 1] == MISSING_VALUE)
        if inp_missing and not tg_missing:
            out[i] = MISSING_VALUE if index <= num_stacks // 2 else tg_pos[i]
        elif tg_missing and not inp_missing:
            out[i] = inp_pos[i] if index <= num_stacks // 2 else MISSING_VALUE
        elif tg_missing and inp_missing:
            out[i] = MISSING_VALUE
        else:
            out[i] = inp_pos[i] + (tg_pos[i] - inp_pos[i]) * index / num_stacks
    return out


@pytest.mark.parametrize("pose_dim", [16, 18])
@pytest.mark.parametrize("index", [1, 2, 3, 4])
def test_compute_interpol_pose(pose_dim, index):
    rng = np.random.RandomState(3)
    inp = rng.randint(0, 64, size=(pose_dim, 2)).astype(np.float32)
    tg = rng.randint(0, 64, size=(pose_dim, 2)).astype(np.float32)
    if pose_dim == 18:
        inp[2] = MISSING_VALUE
        tg[5] = MISSING_VALUE
        inp[9] = MISSING_VALUE
        tg[9] = MISSING_VALUE
    ours = np.asarray(pose.compute_interpol_pose(inp, tg, index, 4, pose_dim))
    golden = ref_compute_interpol_pose(inp, tg, index, 4, pose_dim)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_interpol_sequence_ends_at_target():
    rng = np.random.RandomState(4)
    inp = rng.randint(0, 64, size=(16, 2)).astype(np.float32)
    tg = rng.randint(0, 64, size=(16, 2)).astype(np.float32)
    seq = np.asarray(pose.interpol_pose_sequence(inp, tg, 4, 16))
    assert seq.shape == (4, 16, 2)
    np.testing.assert_allclose(seq[-1], tg, atol=1e-5)


def test_pre_deprocess_roundtrip():
    img = np.arange(0, 256, dtype=np.uint8).reshape(16, 16)
    pre = np.asarray(pose.preprocess_image(img))
    assert pre.min() >= -1.0 and pre.max() <= 1.0
    # deprocess truncates like the reference's .byte(); float32 rounding can
    # land 1e-7 below an integer, so allow off-by-one
    post = np.asarray(pose.deprocess_image(pre)).astype(np.int32)
    assert np.abs(post - img.astype(np.int32)).max() <= 1


def test_pack_get_imgpose_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.rand(2, 8, 8, 3).astype(np.float32)
    p1 = rng.rand(2, 8, 8, 16).astype(np.float32)
    p2 = rng.rand(2, 8, 8, 16).astype(np.float32)
    packed = np.asarray(pose.pack_input(img, p1, p2))
    assert packed.shape == (2, 8, 8, 35)
    a, b, c = pose.get_imgpose(packed, True, 16)
    np.testing.assert_array_equal(np.asarray(a), img)
    np.testing.assert_array_equal(np.asarray(b), p1)
    np.testing.assert_array_equal(np.asarray(c), p2)
