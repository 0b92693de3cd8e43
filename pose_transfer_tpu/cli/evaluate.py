"""Quantitative evaluation: SSIM + L1 + feature distance over the test split.

The reference never implemented a metric (SSIM/IS are explicit ToDos in its
``Design Choices.txt``); this driver provides the north-star SSIM parity
check (BASELINE.json). Runs the generator over the test set from the latest
checkpoint and prints one JSON line with mean SSIM, L1, PSNR, and — because
the flagship recipe optimizes a *perceptual* objective that pixel-aligned
metrics can't reward (BASELINE.md's plateau analysis) — a feature-space
distance: mean L2/L1 between VGG19 features of output and target, extracted
with the same stack the content loss trains against
(``models/vgg.py::extract_named``; random-init seed 0 when no ``--vgg_weights``,
matching ``train.engine.create_state``). ``--feat_layer none`` disables it.

Run: ``python -m pose_transfer_tpu.cli.evaluate --expID ... --resume 1
[--max_batches N] [--feat_layer block1_conv2]``
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PoseTransferDataset
from ..data.dataset import collate
from ..ops.ssim import ssim
from ..train import checkpoint, create_state, make_eval_step
from .opts import Opts, config_from_opt, mesh_from_opt


def evaluate(opt, max_batches: int | None = None,
             feat_layer: str | None = None) -> dict:
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    config = config_from_opt(opt)  # honors --compute_dtype (VERDICT r1 #4)
    dataset = PoseTransferDataset(vars(opt), "test")
    if feat_layer is None:
        feat_layer = getattr(opt, "feat_layer", "block1_conv2")
    vgg_params = None
    if feat_layer != "none":
        from ..models import vgg as vgg_mod
        if getattr(opt, "vgg_weights", None):
            vgg_params = vgg_mod.load_torch_vgg19_features(opt.vgg_weights)
        else:
            # same random-init stack a no-weights training run scores
            # against (train.engine.create_state)
            vgg_params = vgg_mod.random_vgg19_features(0)
        feat_index = vgg_mod.get_layer_ind(feat_layer)
    # --num_devices: shard the eval batch over a data mesh (the SSIM sweep
    # over 8 670 test pairs should use the whole slice, not one chip)
    mesh = mesh_from_opt(opt, config)
    if mesh is not None:
        from ..parallel import config_for_mesh
        config = config_for_mesh(config, mesh)
    state, gen, _ = create_state(config, seed=opt.seed)
    state, epoch = checkpoint.resume(state, opt.checkpoints_dir,
                                      require_disc=False)
    if mesh is not None:
        from ..parallel import make_parallel_eval_step, replicate_state
        state = replicate_state(state, mesh)
        eval_step = make_parallel_eval_step(config, gen, mesh)
    else:
        eval_step = make_eval_step(config, gen)

    def _metrics(a, b):
        # images are [-1, 1]: PSNR over the [0, 1] remap (peak 1.0), the
        # convention fid/eval suites use for generated imagery
        mse = jnp.mean(jnp.square((a - b) * 0.5))
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        return ssim(a, b), jnp.mean(jnp.abs(a - b)), psnr

    def _feat_metrics(a, b):
        from ..models.vgg import extract_features
        from ..ops.nn_loss import nn_loss
        fa = extract_features(vgg_params, a, feat_index,
                              config.preprocess_mode)
        fb = extract_features(vgg_params, b, feat_index,
                              config.preprocess_mode)
        fa32, fb32 = fa.astype(jnp.float32), fb.astype(jnp.float32)
        d = fa32 - fb32
        # feat_nn = the flagship recipe's literal training objective
        # (shifted-min nn_loss over the content features, area 5 —
        # src_deformable/commands:9, pose_gan.py:100-105): pointwise
        # feat_l2/l1 penalize the small spatial misalignments nn_loss is
        # built to forgive, so only feat_nn can show whether the full
        # config wins on the thing it optimizes
        return (jnp.mean(jnp.square(d)), jnp.mean(jnp.abs(d)),
                nn_loss(fa32, fb32, 5, 5))

    metric = jax.jit(_metrics)
    feat_metric = jax.jit(_feat_metrics) if vgg_params is not None else None
    n_batches = len(dataset) // config.batch_size
    if max_batches:
        n_batches = min(n_batches, max_batches)
    ssims, l1s, psnrs, f2s, f1s, fnns = [], [], [], [], [], []
    for b in range(n_batches):
        batch = collate([dataset[b * config.batch_size + i]
                         for i in range(config.batch_size)])
        out, prepared = eval_step(state.gen_params, batch)
        if config.gen_type == "stacked":
            out = out[-1]  # metric on the final stage image
        out32 = out.astype(jnp.float32)
        tgt32 = prepared["target"].astype(jnp.float32)
        s, l1, p = metric(out32, tgt32)
        ssims.append(float(s))
        l1s.append(float(l1))
        psnrs.append(float(p))
        if feat_metric is not None:
            f2, f1, fnn = feat_metric(out32, tgt32)
            f2s.append(float(f2))
            f1s.append(float(f1))
            fnns.append(float(fnn))
    result = {
        "metric": "test_ssim",
        "value": round(float(np.mean(ssims)), 5),
        "l1": round(float(np.mean(l1s)), 5),
        "psnr": round(float(np.mean(psnrs)), 3),
        "epoch": epoch,
        "num_batches": n_batches,
    }
    if f2s:
        result["feat_l2"] = round(float(np.mean(f2s)), 6)
        result["feat_l1"] = round(float(np.mean(f1s)), 6)
        result["feat_nn"] = round(float(np.mean(fnns)), 6)
        result["feat_layer"] = feat_layer
    return result


def main(argv=None):
    p = Opts()
    p.init()
    p.parser.add_argument("--max_batches", default=0, type=int)
    p.parser.add_argument("--feat_layer", default="block1_conv2",
                          help="VGG19 layer for the feature-distance "
                               "metric ('none' disables)")
    opt = Opts.derive(p.parser.parse_args(argv))
    result = evaluate(opt, opt.max_batches or None)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
