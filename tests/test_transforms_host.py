"""Host-side warp estimation: affine fits, polygons, masks.

Parity targets:
- ``estimate_affine`` vs an independent normal-equations solve (and, where
  torch is a stand-in, exactness on synthetically generated affine point
  sets).
- ``pose_masks`` (host) vs ``ops.masks.rasterize_part_masks`` (device) — the
  compact-poly fast path must reproduce the host rasterizer bit-for-bit.
- structural invariants of ``affine_transforms`` incl. the pose_dim-16 quirk
  (knee/head parts degenerate to the translation-by-1000 sentinel).
"""

import numpy as np

from pose_transfer_tpu.core import transforms_host as th
from pose_transfer_tpu.core.skeletons import MISSING_VALUE
from pose_transfer_tpu.ops import masks as masks_op


def _random_pose(rng, pose_dim, img_size=(64, 64)):
    """Random pose with all joints present, (y, x) ints."""
    h, w = img_size
    return np.stack([rng.randint(4, h - 4, size=pose_dim),
                     rng.randint(4, w - 4, size=pose_dim)], axis=1)


def test_estimate_affine_exact_on_affine_points():
    rng = np.random.RandomState(0)
    m = np.array([[1.2, 0.1, 3.0], [-0.2, 0.9, -1.5]])
    src = rng.rand(6, 2) * 50
    dst = src @ m[:, :2].T + m[:, 2]
    params = th.estimate_affine(src, dst)
    np.testing.assert_allclose(params[:2], m, atol=1e-8)
    np.testing.assert_allclose(params[2], [0, 0, 1], atol=1e-12)


def test_estimate_affine_least_squares_property():
    rng = np.random.RandomState(1)
    src = rng.rand(8, 2) * 30
    dst = rng.rand(8, 2) * 30
    params = th.estimate_affine(src, dst)
    # residual must be orthogonal to the design columns (normal equations)
    x = np.concatenate([src, np.ones((8, 1))], axis=1)
    resid = x @ params[:2].T - dst
    np.testing.assert_allclose(x.T @ resid, 0, atol=1e-8)


def test_affine_transforms_shape_and_identity():
    rng = np.random.RandomState(2)
    kp = _random_pose(rng, 18)
    tr = th.affine_transforms(kp, kp, 18)
    assert tr.shape == (10, 8)
    # identical poses → identity transforms for present parts
    ident = np.array([1, 0, 0, 0, 1, 0, 0, 0], dtype=float)
    np.testing.assert_allclose(tr[0], ident, atol=1e-6)   # body
    np.testing.assert_allclose(tr[2], ident, atol=1e-6)   # a limb


def test_affine_transforms_pose16_knee_head_quirk():
    """pose_dim 16 LABELS lack 'Rkne'/'Lkne' and all head names → sentinel."""
    rng = np.random.RandomState(3)
    kp = _random_pose(rng, 16)
    tr = th.affine_transforms(kp, kp, 16)
    sentinel = th.NO_POINT_TR.reshape(9)[:8]
    np.testing.assert_allclose(tr[1], sentinel)   # head
    for i in (2, 3, 4, 5):                        # hip→knee, knee→ankle
        np.testing.assert_allclose(tr[i], sentinel)
    # arm parts are active
    ident = np.array([1, 0, 0, 0, 1, 0, 0, 0], dtype=float)
    np.testing.assert_allclose(tr[6], ident, atol=1e-6)


def test_affine_transforms_mirror_fallback():
    rng = np.random.RandomState(4)
    kp1 = _random_pose(rng, 18)
    kp2 = _random_pose(rng, 18)
    # drop the right elbow/wrist in kp1 only → mirrored (left) side is used
    kp1_miss = kp1.copy()
    kp1_miss[3] = MISSING_VALUE   # Relb
    kp1_miss[4] = MISSING_VALUE   # Rwri
    tr = th.affine_transforms(kp1_miss, kp2, 18)
    # part 8 = Relb→Rwri; fallback uses kp1's Lelb→Lwri so it is NOT sentinel
    sentinel = th.NO_POINT_TR.reshape(9)[:8]
    assert not np.allclose(tr[8], sentinel)


def test_estimate_uniform_transform():
    rng = np.random.RandomState(5)
    kp = _random_pose(rng, 18)
    tr = th.estimate_uniform_transform(kp, kp, 18)
    assert tr.shape == (1, 9)
    np.testing.assert_allclose(tr[0], [1, 0, 0, 0, 1, 0, 0, 0, 1], atol=1e-6)


def test_pose_masks_structure():
    rng = np.random.RandomState(6)
    kp = _random_pose(rng, 18, (32, 32))
    m = th.pose_masks(kp, (32, 32), 18)
    assert m.shape == (10, 32, 32)
    assert np.all(m[0] == 1.0)                    # body mask all ones
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m[2:].sum() > 0                        # some limb pixels covered


def test_pose_masks_pose16_quirk():
    rng = np.random.RandomState(7)
    kp = _random_pose(rng, 16, (32, 32))
    m = th.pose_masks(kp, (32, 32), 16)
    assert m[1].sum() == 0                        # head empty
    for i in (2, 3, 4, 5):
        assert m[i].sum() == 0                    # knee parts empty
    assert m[6:].sum() > 0                        # arms active


def test_device_mask_rasterizer_matches_host():
    rng = np.random.RandomState(8)
    for pose_dim in (16, 18):
        for _ in range(3):
            kp = _random_pose(rng, pose_dim, (48, 40))
            host = th.pose_masks(kp, (48, 40), pose_dim)
            polys, kinds = th.pose_mask_polys(kp, (48, 40), pose_dim)
            dev = np.asarray(
                masks_op.rasterize_part_masks(polys, kinds, (48, 40)))
            for i in range(10):
                diff = int(np.abs(dev[i] - host[i]).sum())
                if kinds[i] == 2:
                    # quad edges may flip boundary pixels when the float64
                    # host vertices round to the float32 shipped to device
                    assert diff <= 3, f"part {i}: {diff} px differ"
                else:
                    assert diff == 0, f"part {i} (kind {kinds[i]}) differs"


def test_grid_points_in_poly_square():
    # unit-aligned square: half-open behavior of the even-odd rule
    verts = np.array([[2.0, 2.0], [2.0, 6.0], [6.0, 6.0], [6.0, 2.0]])
    m = th.grid_points_in_poly((10, 10), verts)
    assert m[3, 3] and m[2, 2]
    assert not m[8, 8]
    assert m.sum() == 16  # rows 2..5 × cols 2..5


def test_load_pose_cords_from_strings():
    out = th.load_pose_cords_from_strings("[1, 2, -1]", "[4, 5, -1]")
    np.testing.assert_array_equal(out, [[1, 4], [2, 5], [-1, -1]])
