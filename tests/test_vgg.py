"""VGG19 feature-extractor parity: torch-checkpoint import, forward parity
against a torch replica of the reference's Feature_Extractor
(pose_utils.py:320-337), and the preprocess reshape quirk
(pose_utils.py:324-331)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pose_transfer_tpu.models.vgg import (  # noqa: E402
    extract_features, extract_named, features_layout, get_layer_ind,
    load_torch_vgg19_features, preprocess_for_vgg)


def _torch_vgg19_features_state(rng):
    """Random state dict with torchvision VGG19 'features.*' keys/shapes."""
    state = {}
    in_ch = 3
    for idx, (kind, out_ch) in enumerate(features_layout()):
        if kind == "conv":
            state[f"features.{idx}.weight"] = torch.tensor(
                rng.randn(out_ch, in_ch, 3, 3).astype(np.float32) * 0.1)
            state[f"features.{idx}.bias"] = torch.tensor(
                rng.randn(out_ch).astype(np.float32) * 0.1)
            in_ch = out_ch
    return state


def _torch_forward(state, x_nchw, layer_index):
    """features[0..layer_index] inclusive, as the reference's extractor
    applies them (pose_utils.py:333-336)."""
    x = x_nchw
    for idx, (kind, _) in enumerate(features_layout()):
        if idx > layer_index:
            break
        if kind == "conv":
            x = torch.nn.functional.conv2d(
                x, state[f"features.{idx}.weight"],
                state[f"features.{idx}.bias"], padding=1)
        elif kind == "relu":
            x = torch.nn.functional.relu(x)
        else:
            x = torch.nn.functional.max_pool2d(x, 2, 2)
    return x


def test_get_layer_ind_reference_values():
    # offsets ['0','5','10','19','28'] + conv - 1 (pose_utils.py:312-317)
    assert get_layer_ind("block1_conv2") == 1
    assert get_layer_ind("block2_conv1") == 5
    assert get_layer_ind("block5_conv4") == 31


@pytest.mark.parametrize("layer", ["block1_conv2", "block2_conv2"])
def test_torch_import_forward_parity(tmp_path, layer):
    rng = np.random.RandomState(0)
    state = _torch_vgg19_features_state(rng)
    path = str(tmp_path / "vgg19_random.pth")
    torch.save(state, path)
    params = load_torch_vgg19_features(path)

    x = rng.rand(2, 16, 16, 3).astype(np.float32) * 2.0 - 1.0  # [-1, 1]
    ours = extract_named(params, jnp.asarray(x), layer,
                         preprocess_mode="correct")

    x01 = (x + 1.0) * 0.5
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = torch.tensor(np.transpose((x01 - mean) / std, (0, 3, 1, 2)))
    theirs = _torch_forward(state, xt, get_layer_ind(layer))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
        atol=2e-4)


def test_reference_preprocess_matches_torch_view_quirk():
    """mode='reference' must reproduce x.view(N,H,W,C)-based normalization
    on an NCHW-contiguous tensor (pose_utils.py:324-331)."""
    rng = np.random.RandomState(1)
    x = rng.rand(2, 4, 6, 3).astype(np.float32) * 2.0 - 1.0  # NHWC
    ours = preprocess_for_vgg(jnp.asarray(x), mode="reference")

    xt = torch.tensor(
        np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))  # NCHW contig
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    v = xt.view(xt.shape[0], xt.shape[2], xt.shape[3], xt.shape[1]).clone()
    for i in range(3):
        v[..., i] = (v[..., i] - mean[i]) / std[i]
    # undo the view to recover the NCHW tensor the reference then feeds
    theirs = v.view_as(xt).numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs, atol=1e-6)
