"""Data pipeline tests: keypoint projection, CSVs, dataset, loader, device prep."""

import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from pose_transfer_tpu.core import pose as pose_dev
from pose_transfer_tpu.data import (
    BatchStream,
    DevicePrefetcher,
    PoseTransferDataset,
    annotations as ann,
    device as device_prep,
    pairs as pairs_mod,
    synthetic,
)

IMG = (64, 48)


def _roundtrip_reference(kp, img_size, pose_dim):
    """The reference's rasterize-then-decode round trip, on device ops."""
    hm = pose_dev.cords_to_map(jnp.asarray(kp, jnp.float32), img_size)
    return np.asarray(pose_dev.map_to_cord(hm, pose_dim))


@pytest.mark.parametrize("pose_dim", [16, 18])
def test_project_keypoints_matches_rasterized_roundtrip(pose_dim):
    rng = np.random.default_rng(0)
    for trial in range(20):
        kp = rng.uniform(-10, 80, (pose_dim, 2))
        kp[rng.random(pose_dim) < 0.2] = -1.0
        got = ann.project_keypoints(kp, IMG)
        want = _roundtrip_reference(kp, IMG, pose_dim)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_project_keypoints_integer_identity():
    kp = np.array([[5, 7], [63, 47], [0, 0], [-1, -1]])
    got = ann.project_keypoints(kp, IMG)
    np.testing.assert_array_equal(got, kp)


def test_interpolate_keypoints_host_matches_device():
    rng = np.random.default_rng(1)
    for pose_dim in (16, 18):
        kp1 = rng.integers(0, 60, (pose_dim, 2)).astype(np.float64)
        kp2 = rng.integers(0, 60, (pose_dim, 2)).astype(np.float64)
        kp1[2] = -1
        kp2[5] = -1
        for i in range(1, 5):
            host = ann.interpolate_keypoints_host(kp1, kp2, i, 4, pose_dim)
            dev = np.asarray(pose_dev.compute_interpol_pose(
                jnp.asarray(kp1), jnp.asarray(kp2), i, 4, pose_dim))
            np.testing.assert_allclose(host, dev, atol=1e-5)


def test_make_pairs_families():
    names = [f"p{p:02d}_{i:04d}.jpg" for p in range(2) for i in range(6)]
    df = pd.DataFrame({"name": names})
    vid = pairs_mod.make_pairs(df)
    assert len(vid) == 2 * 4  # 6 frames → (i, i+2) for i in 0..3
    assert vid.iloc[0]["from"] == "p00_0000.jpg"
    assert vid.iloc[0]["to"] == "p00_0002.jpg"
    nonvid = pairs_mod.make_pair_nonvid(df)
    # person id = first token → 2 people × 6P2 = 30 each
    assert len(nonvid) == 2 * 30
    it = pairs_mod.make_pairs_iterative(df, frame_diff=2)
    assert list(it.columns) == ["seq0", "seq1", "seq2"]


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    synthetic.write_synthetic_dataset(str(d), dataset="fasion", pose_dim=18,
                                      num_people=3, images_per_person=3,
                                      img_size=IMG)
    return str(d)


def _opt(synth_dir, **over):
    base = dict(
        gen_type="baseline", num_stacks=2, pose_dim=18, image_size=IMG,
        use_input_pose=True, warp_skip="mask", dataset="fasion",
        images_dir_train=f"{synth_dir}/fasion-dataset/train",
        images_dir_test=f"{synth_dir}/fasion-dataset/test",
        pairs_file_train=f"{synth_dir}/fasion-pairs-train.csv",
        pairs_file_test=f"{synth_dir}/fasion-pairs-test.csv",
        pairs_file_train_interpol=f"{synth_dir}/fasion-pairs-train-interpol.csv",
        pairs_file_test_interpol=f"{synth_dir}/fasion-pairs-test-interpol.csv",
        annotations_file_train=f"{synth_dir}/fasion-annotation-train.csv",
        annotations_file_test=f"{synth_dir}/fasion-annotation-test.csv",
    )
    base.update(over)
    return base


def test_dataset_compact_and_reference_layouts_agree(synth_dir):
    ds = PoseTransferDataset(_opt(synth_dir), "train")
    assert len(ds) > 0
    compact = ds[0]
    assert compact["image_from"].dtype == np.uint8
    assert compact["warps"].shape == (10, 8)
    assert compact["mask_polys"].shape == (10, 4, 2)

    packed, target, warps, masks = ds.item_reference(0)
    k = 18
    assert packed.shape == (3 + 2 * k, *IMG)
    assert masks.shape == (10, *IMG)
    np.testing.assert_allclose(warps, compact["warps"], atol=1e-5)

    # device prep reproduces the reference packing (NCHW→NHWC transposed)
    prepare = device_prep.make_batch_preparer(
        image_size=IMG, pose_dim=18, warp_skip="mask", gen_type="baseline")
    from pose_transfer_tpu.data.dataset import collate
    batch = prepare(collate([compact]))
    np.testing.assert_allclose(
        np.asarray(batch["input"][0]), np.transpose(packed, (1, 2, 0)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batch["target"][0]), np.transpose(target, (1, 2, 0)),
        atol=1e-5)
    # float32 (device) vs float64 (host) edge-intersection rounding may flip
    # isolated pixels exactly on a polygon boundary
    mismatch = np.mean(np.asarray(batch["masks"][0]) != masks)
    assert mismatch < 1e-3


def test_dataset_stacked_layout(synth_dir):
    ds = PoseTransferDataset(_opt(synth_dir, gen_type="stacked"), "train")
    compact = ds[0]
    s = ds.num_stacks
    assert compact["interpol_kp"].shape == (s, 18, 2)
    assert compact["interpol_warps"].shape == (s + 1, 10, 8)

    packed, target, interpol_map, warps, masks = ds.item_reference(0)
    assert interpol_map.shape == (s * 18, *IMG)
    assert warps.shape == (s + 1, 10, 8)
    assert masks.shape == (s + 1, 10, *IMG)

    prepare = device_prep.make_batch_preparer(
        image_size=IMG, pose_dim=18, warp_skip="mask", gen_type="stacked",
        num_stacks=s)
    from pose_transfer_tpu.data.dataset import collate
    batch = prepare(collate([compact]))
    np.testing.assert_allclose(
        np.asarray(batch["interpol_pose"][0]),
        np.transpose(interpol_map.reshape(s, 18, *IMG), (2, 3, 0, 1))
        .reshape(*IMG, s * 18), atol=1e-5)
    mismatch = np.mean(np.asarray(batch["interpol_masks"][0]) != masks)
    assert mismatch < 1e-3


def test_missing_image_is_black(synth_dir):
    ds = PoseTransferDataset(_opt(synth_dir), "train")
    img = ds.load_image("no_such_file.jpg")
    assert img.shape == (*IMG, 3)
    assert img.sum() == 0


def test_batch_stream_and_prefetcher(synth_dir):
    ds = PoseTransferDataset(_opt(synth_dir), "train")
    stream = BatchStream(ds, batch_size=2, seed=0, num_threads=2)
    b1 = next(stream)
    assert b1["image_from"].shape == (2, *IMG, 3)
    # exhaust an epoch to exercise the reshuffle path
    for _ in range(len(ds) // 2 + 2):
        next(stream)
    assert stream.epochs_completed >= 1

    pf = DevicePrefetcher(BatchStream(ds, batch_size=2, seed=1,
                                      num_threads=2))
    batch = next(pf)
    assert batch["image_from"].shape == (2, *IMG, 3)
    pf.close()


def test_batch_stream_seek_is_deterministic(synth_dir):
    """seek_batches(k) == drawing k batches: a resumed stream continues
    exactly where a continuous run would be (across reshuffle
    boundaries)."""
    ds = PoseTransferDataset(_opt(synth_dir), "train")
    k = (len(ds) // 3) * 2 + 5  # crosses at least one epoch boundary
    a = BatchStream(ds, batch_size=3, seed=7, num_threads=1)
    for _ in range(k):
        a.next_indices()
    b = BatchStream(ds, batch_size=3, seed=7, num_threads=1)
    b.seek_batches(k)
    assert a.epochs_completed == b.epochs_completed
    for _ in range(4):
        np.testing.assert_array_equal(a.next_indices(), b.next_indices())
    # a different seed diverges (the equality above is not vacuous)
    c = BatchStream(ds, batch_size=3, seed=8, num_threads=1)
    c.seek_batches(k)
    assert any(not np.array_equal(a.next_indices(), c.next_indices())
               for _ in range(4))


def test_unet_skips_warp_pipeline(synth_dir):
    """gen_type='unet' consumes the packed input only: the dataset must not
    pay host-side affine/polygon fits and the preparer must not emit (or
    rasterize) warps/masks — all dead work for the plain U-Net."""
    from pose_transfer_tpu.data.dataset import collate
    from pose_transfer_tpu.data.device import make_batch_preparer

    ds = PoseTransferDataset(_opt(synth_dir, gen_type="unet"), "train")
    s = ds[0]
    assert "warps" not in s and "mask_polys" not in s

    prepare = make_batch_preparer(image_size=IMG, pose_dim=18,
                                  warp_skip="mask", gen_type="unet",
                                  jit=False)
    out = prepare(collate([s, ds[1]]))
    assert "warps" not in out and "masks" not in out
    assert out["input"].shape == (2, *IMG, 3 + 2 * 18)


def test_synthetic_compact_batch_shapes():
    rng = np.random.default_rng(0)
    b = synthetic.synthetic_compact_batch(rng, 2, IMG, 18)
    assert b["warps"].shape == (2, 10, 8)
    b = synthetic.synthetic_compact_batch(rng, 2, IMG, 16, warp_skip="full")
    assert b["warps"].shape == (2, 1, 8)
    b = synthetic.synthetic_compact_batch(rng, 1, IMG, 18,
                                          gen_type="stacked", num_stacks=3)
    assert b["interpol_warps"].shape == (1, 4, 10, 8)


def test_skeleton_style_dataset(tmp_path):
    from PIL import Image

    from pose_transfer_tpu.data.synthetic import skeleton_image

    d = str(tmp_path / "skel") + "/"
    synthetic.write_synthetic_dataset(d, dataset="fasion128128",
                                      pose_dim=18, num_people=2,
                                      images_per_person=2,
                                      img_size=(64, 64), style="skeleton")
    img = np.asarray(Image.open(
        d + "fasion128128-dataset/train/trainp000_0000.jpg"))
    assert img.shape == (64, 64, 3)
    assert img.max() > 100  # skeleton strokes present
    # deterministic function of the keypoints
    kp = np.array([[10, 10], [20, 20], [30, 15], [40, 25], [50, 30]] * 4)[:18]
    a = skeleton_image(kp, (64, 64), 18)
    b = skeleton_image(kp, (64, 64), 18)
    np.testing.assert_array_equal(a, b)


def test_make_pairs_restricted_filters_action_classes():
    names = [f"s_01_act_{a:02d}_subact_01_ca_01_{i:06d}.jpg"
             for a in (2, 15) for i in range(5)]
    df = pd.DataFrame({"name": names})
    pairs = pairs_mod.make_pairs_restricted(df)
    # only act_15 (>= 14) survives: 5 frames → 3 (i, i+2) pairs
    assert len(pairs) == 3
    assert all("act_15" in n for n in pairs["from"])


def test_prefetcher_propagates_worker_errors():
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    stream = BatchStream(Boom(), batch_size=2, num_threads=1)
    pf = DevicePrefetcher(stream, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)
    pf.close()


def test_write_pair_files_check_mode(synth_dir, tmp_path):
    """checkMode writes the seeded ≤4000-pair sample to the -check CSVs
    and nothing else (src_baseline/utils/create_pairs.py:114-127)."""
    import types

    opt = types.SimpleNamespace(
        pose_dim=18, images_for_train=None, images_for_test=None,
        checkMode=1, write_iterative=0, frame_diff=10,
        annotations_file_train=f"{synth_dir}/fasion-annotation-train.csv",
        annotations_file_test=f"{synth_dir}/fasion-annotation-test.csv",
        pairs_file_train=str(tmp_path / "p-train.csv"),
        pairs_file_test=str(tmp_path / "p-test.csv"),
        pairs_file_train_interpol=str(tmp_path / "p-train-i.csv"),
        pairs_file_test_interpol=str(tmp_path / "p-test-i.csv"),
        pairs_file_train_check=str(tmp_path / "p-train-check.csv"),
        pairs_file_test_check=str(tmp_path / "p-test-check.csv"),
    )
    n_train, n_test = pairs_mod.write_pair_files(opt)
    got = pd.read_csv(opt.pairs_file_train_check)
    assert len(got) == n_train <= 4000
    assert not (tmp_path / "p-train.csv").exists()
    # seeded: a second run produces the identical sample
    pairs_mod.write_pair_files(opt)
    pd.testing.assert_frame_equal(got, pd.read_csv(opt.pairs_file_train_check))
