"""End-to-end CLI tests: opts parity, train driver, inference driver, viz."""

import os
import sys

import numpy as np
import pytest

from pose_transfer_tpu.cli.opts import Opts
from pose_transfer_tpu.data.synthetic import write_synthetic_dataset
from pose_transfer_tpu.utils import (
    display,
    draw_pose_from_cords,
    make_grid,
)

IMG = (64, 48)


def test_opts_defaults_match_reference(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = Opts().parse(["--exp_root", str(tmp_path / "exp")])
    # reference defaults (src_deformable/opts.py)
    assert opt.batch_size == 4
    assert opt.training_ratio == 1
    assert opt.learning_rate == 2e-4
    assert opt.l1_penalty_weight == 100
    assert opt.gan_penalty_weight == 1
    assert opt.number_of_epochs == 500
    assert opt.content_loss_layer == "none"
    assert opt.pose_dim == 16
    assert opt.iters_per_epoch == 1000
    assert opt.checkpoint_ratio == 5
    assert opt.nn_loss_area_size == 1
    assert opt.dataset == "h36m"
    assert opt.warp_skip == "mask"
    assert opt.gen_type == "baseline"
    assert opt.image_size == (224, 224)
    # derived dirs + opt.txt dump (opts.py:124-141)
    assert os.path.isdir(opt.checkpoints_dir)
    assert os.path.isdir(os.path.join(opt.output_dir, "train"))
    assert os.path.isfile(os.path.join(opt.saveDir, "opt.txt"))


def test_opts_image_size_mapping(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    for ds, size in [("fasion", (256, 256)), ("fasion128128", (128, 128)),
                     ("market", (128, 64))]:
        opt = Opts().parse(["--dataset", ds, "--exp_root",
                            str(tmp_path / "exp")])
        assert opt.image_size == size


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = str(root / "data") + "/"
    write_synthetic_dataset(data, dataset="fasion128128", pose_dim=18,
                            num_people=3, images_per_person=3,
                            img_size=(128, 128))
    return root, data


def _flags(root, data, **over):
    base = {
        "--expID": "t", "--data_Dir": data, "--dataset": "fasion128128",
        "--pose_dim": "18", "--batch_size": "2", "--iters_per_epoch": "2",
        "--number_of_epochs": "1", "--display_ratio": "1",
        "--checkpoint_ratio": "1", "--checkMode": "1",
        "--exp_root": str(root / "exp"), "--prefetch": "0",
        "--num_devices": "1",
    }
    base.update({k: str(v) for k, v in over.items()})
    return [x for kv in base.items() for x in kv]


def test_train_and_infer_end_to_end(synth_env):
    from pose_transfer_tpu.cli import main as train_main
    from pose_transfer_tpu.cli import test as infer_main

    root, data = synth_env
    train_main.main(_flags(root, data))
    exp = root / "exp" / "t"
    pngs = list((exp / "results" / "train").glob("*.png"))
    assert pngs, "no train sample grids written"
    assert list((exp / "results" / "test").glob("*.png"))
    ckpts = list((exp / "models").glob("gen_*.msgpack"))
    assert ckpts, "no checkpoints written"

    infer_main.main(_flags(root, data) + ["--resume", "1"])
    gen_dir = exp / "results" / "generated"
    assert list(gen_dir.glob("*.png")), "no inference grids written"


def test_train_resume(synth_env):
    from pose_transfer_tpu.cli import main as train_main

    root, data = synth_env
    train_main.main(_flags(root, data, **{"--expID": "r"}))
    # resume + one more epoch
    train_main.main(_flags(root, data, **{"--expID": "r",
                                          "--number_of_epochs": 2}) +
                    ["--resume", "1"])
    exp = root / "exp" / "r"
    assert (exp / "models" / "gen_002.msgpack").exists()


def test_create_pairs_cli(synth_env, tmp_path):
    from pose_transfer_tpu.cli import create_pairs

    root, data = synth_env
    # remove pair files and regenerate them
    out = str(tmp_path / "cp") + "/"
    os.makedirs(out, exist_ok=True)
    import shutil
    for f in os.listdir(data):
        if "annotation" in f:
            shutil.copy(os.path.join(data, f), out)
    os.makedirs(os.path.join(out, "fasion128128-dataset"), exist_ok=True)
    create_pairs.main(["--data_Dir", out, "--dataset", "fasion128128",
                       "--pose_dim", "18",
                       "--exp_root", str(tmp_path / "exp")])
    assert os.path.exists(os.path.join(out, "fasion128128-pairs-train.csv"))
    assert os.path.exists(
        os.path.join(out, "fasion128128-pairs-train-interpol.csv"))


# ----------------------------------------------------------------- viz


def test_draw_pose_and_grid():
    kp = np.array([[10, 10], [20, 20], [30, 15], [40, 25], [-1, -1]] * 4)[:18]
    colors, mask = draw_pose_from_cords(kp, 18, IMG)
    assert colors.shape == (*IMG, 3)
    assert colors.max() > 0 and mask.any()

    batch = np.zeros((4, 8, 6, 3), np.uint8)
    grid = make_grid(batch, 4, 1)
    assert grid.shape == (32, 6, 3)


def test_display_grid_shape():
    n, k = 2, 18
    h, w = IMG
    inp = np.random.default_rng(0).uniform(-1, 1, (n, h, w, 3 + 2 * k))
    tgt = np.random.default_rng(1).uniform(-1, 1, (n, h, w, 3))
    out = np.random.default_rng(2).uniform(-1, 1, (n, h, w, 3))
    img = display(inp, tgt, out, True, k)
    assert img.shape == (n * h, 4 * w, 3)
    assert img.dtype == np.uint8


def test_train_warp_none_config(synth_env):
    """BASELINE.json config 1: baseline generator, no mask warping."""
    from pose_transfer_tpu.cli import main as train_main

    root, data = synth_env
    train_main.main(_flags(root, data, **{"--expID": "wn",
                                          "--warp_skip": "none"}))
    exp = root / "exp" / "wn"
    assert list((exp / "models").glob("gen_*.msgpack"))


def test_train_full_config_vgg_nn_loss(synth_env):
    """BASELINE.json config 4: mask warp + nn_loss area 5 + VGG content
    loss (random VGG filters — no pretrained weights in this env)."""
    from pose_transfer_tpu.cli import main as train_main

    root, data = synth_env
    train_main.main(_flags(root, data, **{
        "--expID": "fc", "--content_loss_layer": "block1_conv2",
        "--nn_loss_area_size": "5", "--l1_penalty_weight": "1.0"}))
    exp = root / "exp" / "fc"
    assert list((exp / "models").glob("gen_*.msgpack"))
    assert list((exp / "results" / "train").glob("*.png"))
