"""Non-square (market, 128×64) end-to-end: the only reference dataset whose
H ≠ W (opts.py:90-97 maps everything else to squares). Exercises the warp
chain, mask rasterization/resize, and the conv ladders at rectangular
shapes down to 4×2.

Note on the reference's ``affine_mul`` (pose_transform.py:72-76): it scales
the two translation params by per-axis image/feature ratios; because every
stage halves H and W together, the H- and W-ratios are equal at every skip
resolution for ALL reference datasets (square or not), so the axis-order
question it raises for rectangles is unreachable — our per-axis scaling is
identical to the reference everywhere it runs.
"""

import numpy as np

from pose_transfer_tpu.data.synthetic import write_synthetic_dataset


def _flags(root, data, **over):
    base = {
        "--expID": "m", "--data_Dir": data, "--dataset": "market",
        "--pose_dim": "18", "--batch_size": "2", "--iters_per_epoch": "2",
        "--number_of_epochs": "1", "--display_ratio": "1",
        "--checkpoint_ratio": "1", "--checkMode": "1",
        "--exp_root": str(root / "exp"), "--prefetch": "0",
        "--num_devices": "1",
    }
    base.update({k: str(v) for k, v in over.items()})
    return [x for kv in base.items() for x in kv]


def test_market_train_and_infer(tmp_path):
    from pose_transfer_tpu.cli import main as train_main
    from pose_transfer_tpu.cli import test as infer_main

    data = str(tmp_path / "data") + "/"
    write_synthetic_dataset(data, dataset="market", pose_dim=18,
                            num_people=2, images_per_person=4,
                            img_size=(128, 64))
    train_main.main(_flags(tmp_path, data))
    exp = tmp_path / "exp" / "m"
    assert list((exp / "results" / "train").glob("*.png"))
    assert list((exp / "models").glob("gen_*.msgpack"))
    infer_main.main(_flags(tmp_path, data) + ["--resume", "1"])
    assert list((exp / "results" / "generated").glob("*.png"))


def test_warp_matmul_vs_exact_nonsquare():
    """The two-pass MXU warp must agree with the gather-exact backend on
    rectangular feature maps (h ≠ w exercises the per-axis translation
    scaling and the rectangular weight matrices)."""
    import jax.numpy as jnp

    from pose_transfer_tpu.ops.warp import affine_transform_layer

    rng = np.random.RandomState(0)
    h, w = 32, 16
    feats = jnp.asarray(rng.rand(2, h, w, 4), jnp.float32)
    # mild rotation+scale+translate, no vertical shear (m10=0) so the
    # two-pass result is exact, plus a pure translation
    warps = jnp.asarray(np.stack([
        np.tile([0.9, 0.1, 3.0, 0.0, 1.1, -2.0, 0, 0], (2, 1)),
        np.tile([1.0, 0.0, -5.0, 0.0, 1.0, 4.0, 0, 0], (2, 1)),
    ], axis=1), jnp.float32)  # (N=2, T=2, 8)
    masks = jnp.ones((2, 2, 128, 64), jnp.float32)
    out_mm = affine_transform_layer(feats, warps, masks, (128, 64),
                                    "mask", "max", backend="matmul")
    out_ex = affine_transform_layer(feats, warps, masks, (128, 64),
                                    "mask", "max", backend="exact")
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_ex),
                               atol=2e-5)
