"""Stacked-generator end-to-end: train driver, warm-start path, inference."""

import numpy as np

from pose_transfer_tpu.data.synthetic import write_synthetic_dataset


def _flags(root, data, **over):
    base = {
        "--expID": "s", "--data_Dir": data, "--dataset": "fasion128128",
        "--pose_dim": "18", "--batch_size": "2", "--iters_per_epoch": "2",
        "--number_of_epochs": "1", "--display_ratio": "1",
        "--checkpoint_ratio": "1", "--checkMode": "1",
        "--gen_type": "stacked", "--num_stacks": "2",
        "--exp_root": str(root / "exp"), "--prefetch": "0",
        "--num_devices": "1",
    }
    base.update({k: str(v) for k, v in over.items()})
    return [x for kv in base.items() for x in kv]


def test_stacked_train_and_infer(tmp_path, capsys):
    from pose_transfer_tpu.cli import main as train_main
    from pose_transfer_tpu.cli import test as infer_main

    data = str(tmp_path / "data") + "/"
    write_synthetic_dataset(data, dataset="fasion128128", pose_dim=18,
                            num_people=2, images_per_person=3,
                            img_size=(128, 128))
    train_main.main(_flags(tmp_path, data))
    out = capsys.readouterr().out
    # no full_<dataset> run on disk → warm-start is skipped, not a crash
    # (the reference crashed here, pose_gan.py:30-42)
    assert "training stacked generator from scratch" in out
    exp = tmp_path / "exp" / "s"
    assert list((exp / "results" / "train").glob("*.png"))
    assert list((exp / "models").glob("gen_*.msgpack"))

    infer_main.main(_flags(tmp_path, data) + ["--resume", "1"])
    assert list((exp / "results" / "generated").glob("*.png"))
