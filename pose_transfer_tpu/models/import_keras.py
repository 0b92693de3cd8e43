"""Import original pose-gan Keras checkpoints into this framework.

The reference bootstraps its torch models from the original Keras pose-gan
weights with ``keras_to_pytorch`` (src_deformable/models/networks.py:77-128,
exercised in unitTests.py:205-249): it walks the torch module tree in
registration order (encoder_app → encoder_pose → decoder; convs then norms
inside each Block), consuming a FLAT list of Keras layers in order —
skipping zero-weight layers (activations/dropout/cropping) — and maps

  Keras Conv2D/Conv2DTranspose kernel (kh, kw, ·, ·) → torch via
  ``np.transpose(w, [3, 2, 0, 1])``; bias (if present) straight through;
  InstanceNormalization (scale, bias) straight through.

This module is the flax analog, completing the migration-tool surface
(torch→flax lives in ``import_torch``). Rather than re-deriving the
Keras→flax layout algebra, the walk synthesizes a reference-layout torch
state_dict (the [3,2,0,1] transpose above, keys as the reference's module
paths) and feeds it through the NUMERICALLY VALIDATED torch→flax
converters in ``import_torch`` — so Keras→flax is the composition of the
reference's own documented mapping with the tested torch mapping.

No Keras/TF runtime is needed: ``layers`` is any sequence of per-layer
weight lists (exactly what ``layer.get_weights()`` returns — an empty list
for weightless layers), and ``load_keras_h5`` reads that sequence straight
out of a Keras-format ``.h5`` weights file (``layer_names`` /
``weight_names`` attribute layout) with h5py.
"""

from __future__ import annotations

import numpy as np

from .import_torch import import_discriminator, import_generator


def load_keras_h5(path: str) -> list[list[np.ndarray]]:
    """Keras ``save_weights`` .h5 → per-layer weight lists, in layer order.

    Handles both the bare layout (file root holds the layer groups) and
    the ``model_weights`` subgroup of a full ``model.save`` file.
    """
    import h5py

    out: list[list[np.ndarray]] = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in g.attrs["layer_names"]]
        for ln in layer_names:
            lg = g[ln]
            weight_names = [n.decode() if isinstance(n, bytes) else n
                            for n in lg.attrs.get("weight_names", [])]
            out.append([np.asarray(lg[wn]) for wn in weight_names])
    return out


class _Walk:
    """Sequential consumer of weighted Keras layers (zero-weight layers
    are skipped, like the reference's ``len(weights)==0`` branch)."""

    def __init__(self, layers):
        self._it = iter([list(ws) for ws in layers if len(ws)])
        self.pos = -1

    def conv(self, key: str, sd: dict, bias: bool) -> None:
        ws = self._next(key)
        if ws[0].ndim != 4:
            raise ValueError(
                f"{key}: expected a 4-D conv kernel, got shape "
                f"{ws[0].shape} (Keras layer order mismatch)")
        sd[key + ".weight"] = np.transpose(
            np.asarray(ws[0], np.float32), (3, 2, 0, 1))
        if bias:
            if len(ws) != 2:
                raise ValueError(f"{key}: expected kernel+bias, got "
                                 f"{len(ws)} weights")
            sd[key + ".bias"] = np.asarray(ws[1], np.float32)
        elif len(ws) != 1:
            raise ValueError(
                f"{key}: the reference conv here is bias-free "
                f"(networks.py:154-156) but the Keras layer has "
                f"{len(ws)} weights")

    def norm(self, key: str, sd: dict) -> None:
        ws = self._next(key)
        if len(ws) != 2 or ws[0].ndim != 1:
            raise ValueError(
                f"{key}: expected InstanceNormalization (scale, bias), "
                f"got {[w.shape for w in ws]}")
        sd[key + ".weight"] = np.asarray(ws[0], np.float32)
        sd[key + ".bias"] = np.asarray(ws[1], np.float32)

    def _next(self, key: str) -> list[np.ndarray]:
        try:
            ws = next(self._it)
        except StopIteration:
            raise ValueError(f"ran out of Keras layers at {key}") from None
        self.pos += 1
        return ws


def _encoder_sd(walk: _Walk, prefix: str, n_stages: int, sd: dict) -> None:
    """Reference encoder walk order (networks.py:182-190): stage-0 conv
    (with bias), then Blocks — conv (bias-free) + InstanceNorm except the
    bn=False last stage."""
    walk.conv(f"{prefix}.net.0", sd, bias=True)
    for i in range(1, n_stages):
        walk.conv(f"{prefix}.net.{i}.net.1", sd, bias=False)
        if i != n_stages - 1:
            walk.norm(f"{prefix}.net.{i}.net.2", sd)


def _decoder_sd(walk: _Walk, prefix: str, n_stages: int, sd: dict) -> None:
    """Reference decoder walk order (networks.py:218-233): Blocks —
    ConvTranspose (bias-free) + InstanceNorm — then the final k3 conv."""
    for i in range(n_stages - 1):
        walk.conv(f"{prefix}.net.{i}.net.1", sd, bias=False)
        walk.norm(f"{prefix}.net.{i}.net.3", sd)
    walk.conv(f"{prefix}.net.{n_stages}", sd, bias=True)


def import_generator_keras(layers, n_enc: int, n_dec: int,
                           stacked: bool = False) -> dict:
    """Keras pose-gan generator weights → flax params.

    Args:
      layers: per-layer weight lists in model order (``load_keras_h5``
        output, or ``[l.get_weights() for l in model.layers]``).
      n_enc/n_dec: stage counts — ``len(encoder_filters_for(image_size))``.
    """
    walk = _Walk(layers)
    sd: dict = {}
    _encoder_sd(walk, "encoder_app", n_enc, sd)
    _encoder_sd(walk, "encoder_pose", n_enc, sd)
    _decoder_sd(walk, "decoder", n_dec, sd)
    return import_generator(sd, n_enc, n_dec, stacked=stacked)


def import_discriminator_keras(layers, check_mode: bool = False) -> dict:
    """Keras pose-gan discriminator weights → flax params."""
    walk = _Walk(layers)
    sd: dict = {}
    n_blocks = 2 if check_mode else 4
    walk.conv("net.0", sd, bias=True)
    for i in range(1, n_blocks + 1):
        walk.conv(f"net.{i}.net.1", sd, bias=False)
        if i != n_blocks:
            walk.norm(f"net.{i}.net.2", sd)
    return import_discriminator(sd, check_mode=check_mode)
