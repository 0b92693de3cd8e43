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


# ---- real-checkpoint-format import (VERDICT r1 next #8) -------------------


def _torchvision_vgg19_module():
    """The torchvision ``vgg19()`` module structure, built with plain torch
    (cfg 'E' of torchvision.models.vgg.make_layers) so the state-dict key
    layout comes from torch's own Sequential numbering — independent of
    this package's ``features_layout``."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = v
    model = torch.nn.Module()
    model.features = torch.nn.Sequential(*layers)
    model.classifier = torch.nn.Sequential(
        torch.nn.Linear(512 * 7 * 7, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 10))
    return model


@pytest.mark.parametrize("layer", ["block1_conv2", "block3_conv3"])
def test_import_real_torchvision_checkpoint_layout(tmp_path, layer):
    """Load a checkpoint with the exact torchvision vgg19() state-dict key
    layout (features.* numbered by torch's Sequential, classifier.* present
    and ignored) and match torch's own forward through the reference's
    blockB_convC index quirk end-to-end. Catches any OIHW→HWIO or
    layer-offset mistake against the real checkpoint format."""
    torch.manual_seed(0)
    model = _torchvision_vgg19_module()
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.2)  # keep activations in a comparable range
    path = str(tmp_path / "vgg19-dcbb9e9d.pth")
    torch.save(model.state_dict(), path)

    # sanity: the checkpoint really has the torchvision layout
    keys = set(model.state_dict().keys())
    assert "features.0.weight" in keys and "features.34.weight" in keys
    assert "classifier.0.weight" in keys
    params = load_torch_vgg19_features(path)
    assert params["conv0_kernel"].shape == (3, 3, 3, 64)
    assert params["conv15_kernel"].shape == (3, 3, 512, 512)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2.0 - 1.0  # [-1, 1]
    ours = np.asarray(extract_named(params, jnp.asarray(x), layer,
                                    preprocess_mode="correct"))

    # torch golden: the reference's extractor runs features[:ind+1]
    # (pose_utils.py:333-336) on ImageNet-normalized input
    ind = get_layer_ind(layer)
    x01 = (x + 1.0) * 0.5
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xt = torch.tensor(np.ascontiguousarray(
        np.transpose((x01 - mean) / std, (0, 3, 1, 2))))
    sub = torch.nn.Sequential(*list(model.features.children())[:ind + 1])
    with torch.no_grad():
        golden = sub(xt).numpy()
    np.testing.assert_allclose(ours, np.transpose(golden, (0, 2, 3, 1)),
                               atol=2e-5)
