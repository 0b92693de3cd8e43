"""Torch-checkpoint importer parity: a functional torch oracle reproducing
the reference's module semantics (networks.py:142-357) is run forward, its
state_dict imported via models.import_torch, and the flax forward must match.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pose_transfer_tpu.models import DeformableGenerator, Discriminator
from pose_transfer_tpu.models.import_torch import (
    import_discriminator,
    import_generator,
)

torch.manual_seed(0)

ENC = (4, 8, 8)
DEC = (8, 8, 3)
K = 16
IMG = (16, 16)


def _volume_instance_norm_torch(x, w, b, eps=1e-3):
    """InstanceNorm3d(1, affine) on the (N,1,C,H,W) view (networks.py:159)."""
    mean = x.mean(dim=(1, 2, 3), keepdim=True)
    var = x.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
    return (x - mean) / torch.sqrt(var + eps) * w + b


def _block_down(x, sd, prefix, bn=True):
    x = F.leaky_relu(x, 0.2)
    x = F.conv2d(x, sd[f"{prefix}.net.1.weight"], stride=2, padding=1)
    if bn:
        x = _volume_instance_norm_torch(x, sd[f"{prefix}.net.2.weight"],
                                        sd[f"{prefix}.net.2.bias"])
    return x


def _block_up(x, sd, prefix, bn=True):
    x = F.relu(x)
    x = F.conv_transpose2d(x, sd[f"{prefix}.net.1.weight"], stride=2)
    x = x[:, :, 1:-1, 1:-1]  # Cropping2D(1)
    if bn:
        x = _volume_instance_norm_torch(x, sd[f"{prefix}.net.3.weight"],
                                        sd[f"{prefix}.net.3.bias"])
    return x


def _encoder_torch(x, sd, prefix):
    skips = []
    x = F.conv2d(x, sd[f"{prefix}.net.0.weight"],
                 sd[f"{prefix}.net.0.bias"], padding=1)
    skips.append(x)
    for i in range(1, len(ENC)):
        x = _block_down(x, sd, f"{prefix}.net.{i}", bn=(i != len(ENC) - 1))
        skips.append(x)
    return skips


def _decoder_torch(skips, sd):
    n = len(DEC)
    out = _block_up(skips[-1], sd, "decoder.net.0")
    for i in range(1, n - 1):
        out = torch.cat([out, skips[-(i + 1)]], dim=1)
        out = _block_up(out, sd, f"decoder.net.{i}")
    out = torch.cat([out, skips[-1 - (n - 1)]], dim=1)
    out = F.relu(out)
    out = F.conv2d(out, sd[f"decoder.net.{n}.weight"],
                   sd[f"decoder.net.{n}.bias"], padding=1)
    return torch.tanh(out)


def _rand_gen_state_dict():
    """Random tensors under the reference generator's key names."""
    sd = {}
    in_app, in_pose = 3 + K, K
    for prefix, in_ch in (("encoder_app", in_app),
                          ("encoder_pose", in_pose)):
        sd[f"{prefix}.net.0.weight"] = torch.randn(ENC[0], in_ch, 3, 3) * .1
        sd[f"{prefix}.net.0.bias"] = torch.randn(ENC[0]) * .1
        for i in range(1, len(ENC)):
            sd[f"{prefix}.net.{i}.net.1.weight"] = \
                torch.randn(ENC[i], ENC[i - 1], 4, 4) * .1
            if i != len(ENC) - 1:
                sd[f"{prefix}.net.{i}.net.2.weight"] = torch.rand(1) + .5
                sd[f"{prefix}.net.{i}.net.2.bias"] = torch.randn(1) * .1
    # decoder: in-channels mirror the reference's skip-concat plan
    # (2 encoders ⇒ num_skips=2)
    dec_in = [2 * ENC[-1]]
    for i in range(1, len(DEC)):
        dec_in.append(2 * ENC[-(i + 1)] + DEC[i - 1])
    for i in range(len(DEC) - 1):
        sd[f"decoder.net.{i}.net.1.weight"] = \
            torch.randn(dec_in[i], DEC[i], 4, 4) * .1
        sd[f"decoder.net.{i}.net.3.weight"] = torch.rand(1) + .5
        sd[f"decoder.net.{i}.net.3.bias"] = torch.randn(1) * .1
    n = len(DEC)
    sd[f"decoder.net.{n}.weight"] = torch.randn(DEC[-1], dec_in[-1], 3, 3) * .1
    sd[f"decoder.net.{n}.bias"] = torch.randn(DEC[-1]) * .1
    return sd


def test_generator_import_forward_parity():
    sd = _rand_gen_state_dict()
    x = torch.randn(2, 3 + 2 * K, *IMG) * 0.5

    # torch oracle (identity warps ⇒ plain skip concat, networks.py:279-288)
    app = x[:, :3 + K]
    pose = x[:, 3 + K:]
    skips_app = _encoder_torch(app, sd, "encoder_app")
    skips_pose = _encoder_torch(pose, sd, "encoder_pose")
    skips = [torch.cat([a, p], dim=1)
             for a, p in zip(skips_app, skips_pose)]
    want = _decoder_torch(skips, sd).detach().numpy()

    params = import_generator(
        {k: v for k, v in sd.items()}, n_enc=len(ENC), n_dec=len(DEC))
    gen = DeformableGenerator(pose_dim=K, image_size=IMG, nfilters_enc=ENC,
                              nfilters_dec=DEC, warp_skip="none")
    identity = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32),
                        (2, 1, 1))
    got = gen.apply(jax.tree.map(jnp.asarray, params),
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    identity, None, train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_discriminator_import_forward_parity():
    in_ch = 3 + 2 * K + 3
    blocks = [(64, 128), (128, 256), (256, 512), (512, 1)]
    sd = {"net.0.weight": torch.randn(64, in_ch, 4, 4) * .05,
          "net.0.bias": torch.randn(64) * .05}
    for i, (ci, co) in enumerate(blocks, start=1):
        sd[f"net.{i}.net.1.weight"] = torch.randn(co, ci, 4, 4) * .05
        if i != len(blocks):
            sd[f"net.{i}.net.2.weight"] = torch.rand(1) + .5
            sd[f"net.{i}.net.2.bias"] = torch.randn(1) * .1

    x = torch.randn(2, in_ch, 64, 64) * 0.5
    out = F.conv2d(x, sd["net.0.weight"], sd["net.0.bias"], stride=2)
    for i in range(1, len(blocks) + 1):
        out = _block_down(out, sd, f"net.{i}", bn=(i != len(blocks)))
    want = torch.sigmoid(out).reshape(2, -1).detach().numpy()

    params = import_discriminator({k: v for k, v in sd.items()})
    disc = Discriminator()
    got = np.asarray(disc.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_stacked_prefix_detected():
    sd = _rand_gen_state_dict()
    sd = {f"generator.{k}": v for k, v in sd.items()}
    params = import_generator(sd, n_enc=len(ENC), n_dec=len(DEC),
                              stacked=True)
    assert "generator" in params["params"]
