"""Keras-checkpoint importer: the walk (reference keras_to_pytorch,
networks.py:77-128) is golden-tested against a synthetic Keras-format
layer list — no Keras runtime needed. The layer list is built by applying
the INVERSE of the reference's [3,2,0,1] kernel transpose to a random
reference-layout torch state_dict, so equality with ``import_generator``'s
(numerically validated) output proves the walk consumes layers in the
reference's order and applies the reference's mapping.
"""

import numpy as np
import torch

import jax

from pose_transfer_tpu.models.import_keras import (
    import_discriminator_keras,
    import_generator_keras,
    load_keras_h5,
)
from pose_transfer_tpu.models.import_torch import (
    import_discriminator,
    import_generator,
)

from test_import_torch import ENC, DEC, K, _rand_gen_state_dict

torch.manual_seed(1)


def _keras_kernel(torch_w):
    """Inverse of keras_to_pytorch's np.transpose(w, [3, 2, 0, 1])."""
    return np.transpose(np.asarray(torch_w), (2, 3, 1, 0))


def _gen_keras_layers(sd):
    """Keras layer list in the reference's walk order, with zero-weight
    layers (activations/dropout) sprinkled in like a real Keras model."""
    layers = [[]]  # input layer
    for prefix in ("encoder_app", "encoder_pose"):
        layers.append([_keras_kernel(sd[f"{prefix}.net.0.weight"]),
                       np.asarray(sd[f"{prefix}.net.0.bias"])])
        for i in range(1, len(ENC)):
            layers.append([])  # LeakyReLU
            layers.append([_keras_kernel(sd[f"{prefix}.net.{i}.net.1.weight"])])
            if i != len(ENC) - 1:
                layers.append([np.asarray(sd[f"{prefix}.net.{i}.net.2.weight"]),
                               np.asarray(sd[f"{prefix}.net.{i}.net.2.bias"])])
    for i in range(len(DEC) - 1):
        layers.append([])  # ReLU
        layers.append([_keras_kernel(sd[f"decoder.net.{i}.net.1.weight"])])
        layers.append([])  # Cropping2D
        layers.append([np.asarray(sd[f"decoder.net.{i}.net.3.weight"]),
                       np.asarray(sd[f"decoder.net.{i}.net.3.bias"])])
        layers.append([])  # Dropout
    n = len(DEC)
    layers.append([_keras_kernel(sd[f"decoder.net.{n}.weight"]),
                   np.asarray(sd[f"decoder.net.{n}.bias"])])
    return layers


def _tree_equal(a, b):
    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_generator_keras_matches_torch_import():
    sd = _rand_gen_state_dict()
    layers = _gen_keras_layers(sd)
    got = import_generator_keras(layers, n_enc=len(ENC), n_dec=len(DEC))
    want = import_generator(dict(sd), n_enc=len(ENC), n_dec=len(DEC))
    _tree_equal(got, want)


def test_generator_keras_stacked_nesting():
    sd = _rand_gen_state_dict()
    got = import_generator_keras(_gen_keras_layers(sd), n_enc=len(ENC),
                                 n_dec=len(DEC), stacked=True)
    assert "generator" in got["params"]


def test_discriminator_keras_matches_torch_import():
    in_ch = 3 + 2 * K + 3
    blocks = [(64, 128), (128, 256), (256, 512), (512, 1)]
    sd = {"net.0.weight": torch.randn(64, in_ch, 4, 4) * .05,
          "net.0.bias": torch.randn(64) * .05}
    layers = [[], [_keras_kernel(sd["net.0.weight"]),
                   np.asarray(sd["net.0.bias"])]]
    for i, (ci, co) in enumerate(blocks, start=1):
        sd[f"net.{i}.net.1.weight"] = torch.randn(co, ci, 4, 4) * .05
        layers.append([])  # LeakyReLU
        layers.append([_keras_kernel(sd[f"net.{i}.net.1.weight"])])
        if i != len(blocks):
            sd[f"net.{i}.net.2.weight"] = torch.rand(1) + .5
            sd[f"net.{i}.net.2.bias"] = torch.randn(1) * .1
            layers.append([np.asarray(sd[f"net.{i}.net.2.weight"]),
                           np.asarray(sd[f"net.{i}.net.2.bias"])])
    got = import_discriminator_keras(layers)
    want = import_discriminator(dict(sd))
    _tree_equal(got, want)


def test_load_keras_h5_roundtrip(tmp_path):
    """A synthetic save_weights-layout .h5 reads back as the layer list."""
    import h5py

    sd = _rand_gen_state_dict()
    layers = _gen_keras_layers(sd)
    path = tmp_path / "gen.h5"
    with h5py.File(path, "w") as f:
        names = []
        for i, ws in enumerate(layers):
            ln = f"layer_{i}"
            names.append(ln.encode())
            lg = f.create_group(ln)
            wnames = []
            for j, w in enumerate(ws):
                wn = f"{ln}/w_{j}:0"
                lg.create_dataset(wn, data=np.asarray(w, np.float32))
                wnames.append(wn.encode())
            lg.attrs["weight_names"] = wnames
        f.attrs["layer_names"] = names

    loaded = load_keras_h5(str(path))
    assert len(loaded) == len(layers)
    got = import_generator_keras(loaded, n_enc=len(ENC), n_dec=len(DEC))
    want = import_generator(dict(sd), n_enc=len(ENC), n_dec=len(DEC))
    # h5 round-trips through float32; the source sd is float32 already
    _tree_equal(got, want)


def test_walk_errors_on_order_mismatch():
    """A norm where a conv is expected (wrong layer order) raises."""
    sd = _rand_gen_state_dict()
    layers = _gen_keras_layers(sd)
    # drop the first weighted layer → everything shifts
    first_weighted = next(i for i, ws in enumerate(layers) if ws)
    del layers[first_weighted]
    try:
        import_generator_keras(layers, n_enc=len(ENC), n_dec=len(DEC))
    except ValueError:
        return
    raise AssertionError("order mismatch did not raise")
