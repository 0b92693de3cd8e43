"""Auxiliary pieces: evaluate CLI, misc helpers, warp gradcheck, VGG."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose_transfer_tpu.utils import mean_inputation, produce_ma_mask


def test_mean_inputation():
    x = np.array([[[1.0, 2.0]], [[-1.0, 4.0]], [[3.0, -1.0]]])
    out = mean_inputation(x)
    assert out[1, 0, 0] == pytest.approx(2.0)   # mean of 1, 3
    assert out[2, 0, 1] == pytest.approx(3.0)   # mean of 2, 4
    assert out[0, 0, 0] == 1.0


def test_produce_ma_mask():
    from pose_transfer_tpu.data.synthetic import random_skeleton

    rng = np.random.default_rng(0)
    kp = random_skeleton(rng, (64, 64), 18)
    mask = produce_ma_mask(kp, (64, 64))
    assert mask.dtype == bool and mask.any() and not mask.all()


def test_warp_gradcheck():
    """Numerical gradient check on both warp backends — the reference's
    gradcheck concern (unitTests.py:83-85)."""
    from jax.test_util import check_grads

    from pose_transfer_tpu.ops.warp import (
        warp_feature_matmul, warp_feature_single)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(6, 6, 2)), jnp.float32)
    t = jnp.asarray([0.9, 0.1, 1.0, 0.0, 1.1, -0.5, 0, 0], jnp.float32)
    check_grads(lambda x: warp_feature_single(x, t, (6, 6)), (img,),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    check_grads(lambda x: warp_feature_matmul(x[None], t, (6, 6))[0],
                (img,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_vgg_feature_extraction_and_layer_map():
    from pose_transfer_tpu.models import vgg

    assert vgg.get_layer_ind("block1_conv2") == 1
    assert vgg.get_layer_ind("block4_conv1") == 19
    params = vgg.random_vgg19_features(0)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)),
                    jnp.float32)
    f = vgg.extract_named(params, x, "block1_conv2")
    assert f.shape == (1, 32, 32, 64)
    f2 = vgg.extract_named(params, x, "block3_conv1", "reference")
    assert f2.shape == (1, 8, 8, 256)
    assert np.isfinite(np.asarray(f2)).all()


def test_vgg_reference_preprocess_matches_torch_reshape_quirk():
    import torch

    from pose_transfer_tpu.models.vgg import preprocess_for_vgg

    rng = np.random.default_rng(1)
    x_nchw = rng.uniform(-1, 1, (2, 3, 8, 8)).astype(np.float32)
    xt = torch.tensor(x_nchw)
    n, c, h, w = xt.shape
    v = xt.reshape(n, h, w, c)
    mean = torch.tensor([0.485, 0.456, 0.406])
    std = torch.tensor([0.229, 0.224, 0.225])
    want = ((v - mean) / std).reshape(n, c, h, w).numpy()

    got = preprocess_for_vgg(
        jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), "reference")
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-6)


def test_evaluate_cli(tmp_path, monkeypatch):
    from pose_transfer_tpu.cli import evaluate as eval_cli
    from pose_transfer_tpu.cli import main as train_main
    from pose_transfer_tpu.data.synthetic import write_synthetic_dataset

    data = str(tmp_path / "data") + "/"
    write_synthetic_dataset(data, dataset="fasion128128", pose_dim=18,
                            num_people=2, images_per_person=3,
                            img_size=(128, 128))
    flags = ["--expID", "e", "--data_Dir", data, "--dataset", "fasion128128",
             "--pose_dim", "18", "--batch_size", "2", "--iters_per_epoch",
             "2", "--number_of_epochs", "1", "--display_ratio", "5",
             "--checkpoint_ratio", "1", "--checkMode", "1", "--exp_root",
             str(tmp_path / "exp"), "--prefetch", "0", "--num_devices", "1"]
    train_main.main(flags)
    p = eval_cli.Opts()
    p.init()
    p.parser.add_argument("--max_batches", default=0, type=int)
    opt = eval_cli.Opts.derive(p.parser.parse_args(flags))
    result = eval_cli.evaluate(opt, max_batches=2)
    assert -1.0 <= result["value"] <= 1.0
    assert result["epoch"] == 1
    assert result["num_batches"] >= 1
    # feature-distance metric (VERDICT r4 #5): default block1_conv2 over
    # the same random-init VGG stack training scores against; identical
    # images ⇒ 0, so a trained-vs-target distance must be finite positive
    assert result["feat_layer"] == "block1_conv2"
    assert result["feat_l2"] > 0 and np.isfinite(result["feat_l2"])
    assert result["feat_l1"] > 0 and np.isfinite(result["feat_l1"])
    # feat_nn (the flagship's shifted-min objective over the same
    # features) can only be <= the pointwise channel-summed distance
    assert 0 < result["feat_nn"] and np.isfinite(result["feat_nn"])
    none_result = eval_cli.evaluate(opt, max_batches=1, feat_layer="none")
    assert "feat_l2" not in none_result


def test_bench_vs_baseline_metric_matched():
    """bench.py's vs_baseline only divides by a SAME-metric prior (an
    infer or h36m A/B run must not be ratioed against the fashion-train
    baseline) and searches the prev record's secondary sub-records."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    prev = {"metric": "train_x", "value": 100.0,
            "h36m": {"metric": "train_h", "value": 50.0},
            "infer": {"metric": "infer_x", "value": 25.0}}
    assert bench._vs("train_x", 110.0, prev) == 1.1
    assert bench._vs("train_h", 55.0, prev) == 1.1
    assert bench._vs("infer_x", 50.0, prev) == 2.0
    assert bench._vs("some_other_metric", 123.0, prev) == 1.0
    assert bench._vs("train_x", 110.0, {}) == 1.0


def test_bench_warp_flop_model():
    """The useful-FLOP pricing of the warp fold (bench.py::_warp_flop_model):
    dense two-pass dot FLOPs vs the irreducible 4-MAC bilinear work. Pins
    the fashion-256 stage-0 arithmetic by hand and the structural facts the
    MFU honesty claim rests on (useful ≪ dense; train = ratio+1 fwd +
    1 bwd instances; infer = 1 fwd)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from pose_transfer_tpu.train.engine import GANConfig

    cfg = GANConfig(image_size=(256, 256), pose_dim=18, batch_size=1,
                    warp_skip="mask", gen_type="baseline", training_ratio=1)
    dense, useful = bench._warp_flop_model(cfg, "train")
    # stage 0 by hand: body two-pass 2·256·256·64·(256+256); 9 windowed
    # parts at (s_y, s_x) = (128, 144): pass1 2·128·64·256·256 each,
    # pass2 2·128·144·64·256 each
    s0 = 2 * 256 * 256 * 64 * 512 + 9 * (2 * 128 * 64 * 256 * 256
                                         + 2 * 128 * 144 * 64 * 256)
    assert dense > 3 * s0  # 3 instances of stage 0 alone
    assert useful < dense / 50  # the dots are >98% structural zeros
    d_inf, u_inf = bench._warp_flop_model(cfg, "infer")
    assert dense == 3 * d_inf and useful == 3 * u_inf
    # non-deformable configs are out of the model's scope — reason string,
    # surfaced as mfu_useful_skipped in the artifact (ADVICE r4)
    unet = GANConfig(image_size=(256, 256), pose_dim=18, batch_size=1,
                     warp_skip="none", gen_type="unet")
    assert bench._warp_flop_model(unet, "train") == "non-deformable-config"
    # the model prices the path the config actually selects (ADVICE r4):
    # BENCH_WINDOWED=0 → full fold, all parts at full extent
    full = dataclasses.replace(cfg, warp_windowed=False)
    d_full, u_full = bench._warp_flop_model(full, "train")
    assert d_full > dense and u_full > useful  # no windowing discount
    s0_full = 10 * 2 * 256 * 256 * 64 * 512
    assert d_full > 3 * s0_full
    # BENCH_PLACE=xla at a windowed batch → data-dependent window extents,
    # not modeled (at batch 1, xla placement auto-resolves to the full
    # fold, which IS modeled — so no skip there)
    assert isinstance(
        bench._warp_flop_model(
            dataclasses.replace(cfg, warp_place="xla"), "train"), tuple)
    xla = dataclasses.replace(cfg, warp_place="xla", batch_size=32)
    assert bench._warp_flop_model(xla, "train") \
        == "xla-placement-windows-not-modeled"
    # the skip reason lands in the artifact fields
    fields = bench._mfu_fields(1e12, 0.1, xla, "train")
    assert fields["mfu_useful_skipped"] \
        == "xla-placement-windows-not-modeled"
    assert "mfu_useful" not in fields
