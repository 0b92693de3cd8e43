"""pose_dim-16 (h36m-style) end-to-end: video-style pairs, degenerate limb
parts (knee/head names absent from the 16-joint schema — transforms fall to
the sentinel and masks to empty, transforms_host.py docstring), full train +
infer."""

import numpy as np

from pose_transfer_tpu.data.synthetic import write_synthetic_dataset


def _flags(root, data, **over):
    base = {
        "--expID": "h", "--data_Dir": data, "--dataset": "fasion128128",
        "--pose_dim": "16", "--batch_size": "2", "--iters_per_epoch": "2",
        "--number_of_epochs": "1", "--display_ratio": "1",
        "--checkpoint_ratio": "1", "--checkMode": "1",
        "--exp_root": str(root / "exp"), "--prefetch": "0",
        "--num_devices": "1",
    }
    base.update({k: str(v) for k, v in over.items()})
    return [x for kv in base.items() for x in kv]


def test_pose16_train_and_infer(tmp_path):
    from pose_transfer_tpu.cli import main as train_main
    from pose_transfer_tpu.cli import test as infer_main

    data = str(tmp_path / "data") + "/"
    write_synthetic_dataset(data, dataset="fasion128128", pose_dim=16,
                            num_people=2, images_per_person=4,
                            img_size=(128, 128))
    train_main.main(_flags(tmp_path, data))
    exp = tmp_path / "exp" / "h"
    assert list((exp / "results" / "train").glob("*.png"))
    assert list((exp / "models").glob("gen_*.msgpack"))
    infer_main.main(_flags(tmp_path, data) + ["--resume", "1"])
    assert list((exp / "results" / "generated").glob("*.png"))


def test_pose16_degenerate_parts():
    """Knee/ankle and head parts degenerate for pose_dim 16 by schema."""
    from pose_transfer_tpu.core import transforms_host as th
    from pose_transfer_tpu.data.synthetic import random_skeleton

    rng = np.random.default_rng(0)
    kp1 = random_skeleton(rng, (64, 64), 16)
    kp2 = random_skeleton(rng, (64, 64), 16)
    warps = th.affine_transforms(kp1, kp2, 16)
    # head (index 1) and knee→ankle segments (indices 4, 5) hit the sentinel
    np.testing.assert_allclose(warps[1, 2], 1000.0)
    masks = th.pose_masks(kp2, (64, 64), 16)
    assert masks[0].all()          # body all-ones
    assert masks[1].sum() == 0     # head empty (no head names in LABELS)
