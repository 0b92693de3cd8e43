"""Import trained reference (PyTorch) checkpoints into this framework.

The analog of the reference's own weight-port tool ``keras_to_pytorch``
(src_deformable/models/networks.py:77-128), pointing the other way: a user
of the reference can load their trained ``gen_XXX.pkl`` / ``disc_XXX.pkl``
state_dicts here and keep serving/fine-tuning on TPU.

Key mapping (reference module layout, networks.py:142-357):

  generator (Deformable_Generator):
    encoder_app.net.0.{weight,bias}          → encoder_app/Conv_0
    encoder_app.net.i.net.1.weight  (i>=1)   → encoder_app/Block_{i-1}/Conv_0
    encoder_app.net.i.net.2.{weight,bias}    → .../VolumeInstanceNorm_0
    (same for encoder_pose)
    decoder.net.i.net.1.weight (ConvT)       → decoder/Block_i/ConvTranspose_0
    decoder.net.i.net.3.{weight,bias}        → decoder/Block_i/VolumeInstanceNorm_0
    decoder.net.<n>.{weight,bias} (final)    → decoder/Conv_0
  stacked generator: same keys under the ``generator.`` prefix.
  discriminator:
    net.0.{weight,bias}                      → Conv_0
    net.i.net.1.weight (i=1..)               → Block_{i-1}/Conv_0
    net.i.net.2.{weight,bias}                → Block_{i-1}/VolumeInstanceNorm_0

Weight conversions (validated numerically against torch functional ops in
tests/test_import_torch.py):
  Conv2d  OIHW → HWIO:            transpose(2, 3, 1, 0)
  ConvTranspose2d (in,out,kh,kw) → transpose(2, 3, 0, 1) + flip both
    spatial axes (torch's transposed conv is the gradient of conv; flax's
    ConvTranspose is a fractionally-strided conv, hence the flip)
  InstanceNorm3d(1) affine (1,)  → scalar scale/bias
"""

from __future__ import annotations

import numpy as np


def _load_state_dict(path_or_dict):
    if isinstance(path_or_dict, dict):
        sd = path_or_dict
    else:
        import torch
        sd = torch.load(path_or_dict, map_location="cpu",
                        weights_only=True)
    return {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
            for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_transpose(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _scalar(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).reshape(())


def _import_encoder(sd: dict, prefix: str, n_stages: int) -> dict:
    out = {"Conv_0": {"kernel": _conv(sd[f"{prefix}.net.0.weight"]),
                      "bias": sd[f"{prefix}.net.0.bias"]}}
    for i in range(1, n_stages):
        block = {"Conv_0": {"kernel": _conv(sd[f"{prefix}.net.{i}.net.1.weight"])}}
        in_key = f"{prefix}.net.{i}.net.2.weight"
        if in_key in sd:  # last stage has bn=False
            block["VolumeInstanceNorm_0"] = {
                "scale": _scalar(sd[in_key]),
                "bias": _scalar(sd[f"{prefix}.net.{i}.net.2.bias"]),
            }
        out[f"Block_{i - 1}"] = block
    return out


def _import_decoder(sd: dict, prefix: str, n_stages: int) -> dict:
    out = {}
    for i in range(n_stages - 1):
        block = {"ConvTranspose_0": {
            "kernel": _conv_transpose(sd[f"{prefix}.net.{i}.net.1.weight"])}}
        in_key = f"{prefix}.net.{i}.net.3.weight"
        if in_key in sd:
            block["VolumeInstanceNorm_0"] = {
                "scale": _scalar(sd[in_key]),
                "bias": _scalar(sd[f"{prefix}.net.{i}.net.3.bias"]),
            }
        out[f"Block_{i}"] = block
    # final: net[n_stages-1] is ReLU, net[n_stages] is Conv2d
    out["Conv_0"] = {"kernel": _conv(sd[f"{prefix}.net.{n_stages}.weight"]),
                     "bias": sd[f"{prefix}.net.{n_stages}.bias"]}
    return out


def import_generator(path_or_dict, n_enc: int, n_dec: int,
                     stacked: bool = False) -> dict:
    """Reference generator state_dict → flax params for
    DeformableGenerator (or StackedGenerator when ``stacked``).

    Args:
      n_enc/n_dec: stage counts — ``len(encoder_filters_for(image_size))``.
    """
    sd = _load_state_dict(path_or_dict)
    pre = "generator." if any(k.startswith("generator.") for k in sd) else ""
    params = {
        "encoder_app": _import_encoder(sd, pre + "encoder_app", n_enc),
        "encoder_pose": _import_encoder(sd, pre + "encoder_pose", n_enc),
        "decoder": _import_decoder(sd, pre + "decoder", n_dec),
    }
    if stacked:
        params = {"generator": params}
    return {"params": params}


def import_discriminator(path_or_dict, check_mode: bool = False) -> dict:
    """Reference Discriminator state_dict → flax params."""
    sd = _load_state_dict(path_or_dict)
    n_blocks = 2 if check_mode else 4
    params = {"Conv_0": {"kernel": _conv(sd["net.0.weight"]),
                         "bias": sd["net.0.bias"]}}
    for i in range(1, n_blocks + 1):
        block = {"Conv_0": {"kernel": _conv(sd[f"net.{i}.net.1.weight"])}}
        in_key = f"net.{i}.net.2.weight"
        if in_key in sd:
            block["VolumeInstanceNorm_0"] = {
                "scale": _scalar(sd[in_key]),
                "bias": _scalar(sd[f"net.{i}.net.2.bias"]),
            }
        params[f"Block_{i - 1}"] = block
    return {"params": params}
