"""VGG19 feature extractor for the content loss (``--content_loss_layer``).

Rebuild of the reference's VGG usage (src_deformable/utils/pose_utils.py:
312-337 + models/pose_gan.py:53-56, 100-105). Reference behaviors, preserved
or consciously fixed:

- **Layer naming**: Keras-style ``blockB_convC`` is mapped to a torchvision
  ``features`` index via offsets ['0','5','10','19','28'] and
  ``offset + conv - 1`` (pose_utils.py:312-317). That mapping actually lands
  on the ReLU *before* conv C rather than conv C itself — a reference quirk
  we reproduce exactly, since the committed training logs were produced with
  it.
- **Missing return**: the reference's ``Feature_Extractor`` never returns the
  computed features (pose_utils.py:320-337 ends with the loop) — as written,
  the content-loss path crashes on ``None``. Here extraction works; this is
  a deliberate fix, not a port bug.
- **preprocess_for_vgg**: the reference normalizes via ``x.view(N,H,W,C)`` —
  a *reshape*, not a permute — so ImageNet mean/std are applied per
  flat-index-mod-3 instead of per channel (pose_utils.py:324-331), on
  [-1, 1] inputs no less. ``preprocess_mode='reference'`` reproduces that
  bit pattern; the default ``'correct'`` applies proper per-channel ImageNet
  normalization after rescaling [-1, 1] → [0, 1].

Weights: torchvision pretrained weights are not fetchable in a zero-egress
environment; ``load_torch_vgg19_features`` imports a local torch state_dict
(``vgg19-dcbb9e9d.pth`` or a plain ``features.*`` dict), else
``random_vgg19_features`` gives Glorot-random filters (still a useful
perceptual-style loss signal, and keeps the config runnable everywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG19 'features' configuration (cfg 'E'):
# integers are conv output channels, 'M' is 2x2 max-pool.
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def features_layout() -> list[tuple[str, int]]:
    """The torch ``features`` module list: [('conv', out_ch) | ('relu', 0) |
    ('pool', 0)], index-aligned with torchvision VGG19."""
    layout = []
    for v in VGG19_CFG:
        if v == "M":
            layout.append(("pool", 0))
        else:
            layout.append(("conv", v))
            layout.append(("relu", 0))
    return layout


def get_layer_ind(layer_name: str) -> int:
    """Keras ``blockB_convC`` → torch features index (pose_utils.py:312-317),
    including the off-by-one-onto-the-ReLU quirk."""
    block, conv = layer_name.split("_")
    offsets = [0, 5, 10, 19, 28]
    return offsets[int(block[-1]) - 1] + int(conv[-1]) - 1


def random_vgg19_features(rng: jax.Array | int = 0) -> dict:
    """Glorot-uniform random VGG19 conv stack (fallback when no weights)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    init = jax.nn.initializers.glorot_uniform()
    params = {}
    in_ch = 3
    conv_i = 0
    for kind, out_ch in features_layout():
        if kind == "conv":
            rng, k = jax.random.split(rng)
            params[f"conv{conv_i}_kernel"] = init(
                k, (3, 3, in_ch, out_ch), jnp.float32)
            params[f"conv{conv_i}_bias"] = jnp.zeros((out_ch,), jnp.float32)
            in_ch = out_ch
            conv_i += 1
    return params


def load_torch_vgg19_features(path: str) -> dict:
    """Import conv weights from a torch VGG19 checkpoint (OIHW → HWIO)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params = {}
    conv_i = 0
    feat_idx = 0
    for kind, _ in features_layout():
        if kind == "conv":
            w = state[f"features.{feat_idx}.weight"].numpy()
            b = state[f"features.{feat_idx}.bias"].numpy()
            params[f"conv{conv_i}_kernel"] = jnp.asarray(
                np.transpose(w, (2, 3, 1, 0)))
            params[f"conv{conv_i}_bias"] = jnp.asarray(b)
            conv_i += 1
        feat_idx += 1
    return params


def preprocess_for_vgg(x: jax.Array, mode: str = "correct") -> jax.Array:
    """ImageNet normalization of [-1, 1] NHWC images.

    mode='correct': [0,1]-rescale then per-channel mean/std.
    mode='reference': the reference's reshape quirk (pose_utils.py:324-331) —
    mean/std indexed by NCHW flat-position mod 3, input left in [-1, 1].
    """
    if mode == "correct":
        x01 = (x + 1.0) * 0.5
        return (x01 - _IMAGENET_MEAN) / _IMAGENET_STD
    if mode != "reference":
        raise ValueError(f"unknown preprocess mode {mode!r}")
    n, h, w, c = x.shape
    # reproduce torch x.view(N,H,W,C) on an NCHW-contiguous tensor: flat
    # index within each sample determines which mean/std element applies.
    nchw = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    idx = jnp.arange(nchw.shape[1]) % 3
    nchw = (nchw - mean[idx]) / std[idx]
    return jnp.transpose(nchw.reshape(n, c, h, w), (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("layer_index",
                                             "preprocess_mode"))
def extract_features(params: dict, x: jax.Array, layer_index: int,
                     preprocess_mode: str = "correct") -> jax.Array:
    """Run VGG19 ``features[0..layer_index]`` on NHWC [-1, 1] images.

    The working version of the reference's ``Feature_Extractor``
    (pose_utils.py:320-337): preprocess, then apply modules up to and
    including ``layer_index``.
    """
    x = preprocess_for_vgg(x, preprocess_mode)
    conv_i = 0
    for it, (kind, _) in enumerate(features_layout()):
        if it > layer_index:
            break
        if kind == "conv":
            k = params[f"conv{conv_i}_kernel"].astype(x.dtype)
            b = params[f"conv{conv_i}_bias"].astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            conv_i += 1
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return x


def extract_named(params: dict, x: jax.Array, layer_name: str,
                  preprocess_mode: str = "correct") -> jax.Array:
    """``extract_features`` addressed by the Keras layer name."""
    return extract_features(params, x, get_layer_ind(layer_name),
                            preprocess_mode)
