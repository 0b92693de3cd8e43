"""Volume instance norm, nn_loss, SSIM — parity vs torch goldens."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from pose_transfer_tpu.ops.nn_loss import nn_loss
from pose_transfer_tpu.ops.norm import volume_instance_norm
from pose_transfer_tpu.ops.ssim import ssim


def test_volume_instance_norm_matches_torch():
    """vs InstanceNorm3d(1, eps=1e-3, affine) on the (N,1,C,H,W) view —
    the reference Block's norm quirk (networks.py:159,166-169)."""
    rng = np.random.RandomState(0)
    x = rng.randn(3, 4, 8, 8).astype(np.float32)  # NCHW

    m = nn.InstanceNorm3d(1, eps=1e-3, affine=True,
                          track_running_stats=False)
    with torch.no_grad():
        m.weight.fill_(1.7)
        m.bias.fill_(-0.3)
    with torch.no_grad():
        golden = m(torch.from_numpy(x).unsqueeze(1)).squeeze(1).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, [0, 2, 3, 1]))
    ours = volume_instance_norm(x_nhwc, jnp.float32(1.7), jnp.float32(-0.3))
    ours_nchw = np.transpose(np.asarray(ours), [0, 3, 1, 2])
    np.testing.assert_allclose(ours_nchw, golden, atol=1e-5)


def torch_nn_loss(predicted, ground_truth, nh, nw):
    """Behavioral golden for pose_gan.nn_loss:173-199 (NCHW torch)."""
    v_pad = nh // 2
    h_pad = nw // 2
    val_pad = nn.ConstantPad2d((v_pad, v_pad, h_pad, h_pad),
                               -10000)(ground_truth)
    reference_tensors = []
    for i_begin in range(0, nh):
        i_end = i_begin - nh + 1
        i_end = None if i_end == 0 else i_end
        for j_begin in range(0, nw):
            j_end = j_begin - nw + 1
            j_end = None if j_end == 0 else j_end
            sub_tensor = val_pad[:, :, i_begin:i_end, j_begin:j_end]
            reference_tensors.append(sub_tensor.unsqueeze(-1))
    reference = torch.cat(reference_tensors, dim=-1)
    predicted = predicted.unsqueeze(-1)
    norms = torch.sum(torch.abs(reference - predicted), dim=1)
    loss, _ = torch.min(norms, dim=-1)
    return torch.mean(loss)


def test_nn_loss_matches_torch():
    rng = np.random.RandomState(1)
    for nh in (1, 3, 5):
        pred = rng.randn(2, 6, 12, 12).astype(np.float32)
        gt = rng.randn(2, 6, 12, 12).astype(np.float32)
        golden = torch_nn_loss(torch.from_numpy(pred),
                               torch.from_numpy(gt), nh, nh).item()
        ours = float(nn_loss(
            jnp.asarray(np.transpose(pred, [0, 2, 3, 1])),
            jnp.asarray(np.transpose(gt, [0, 2, 3, 1])), nh, nh))
        np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_nn_loss_custom_vjp_matches_autodiff():
    """nn_loss carries an argmin-routing custom VJP (stores one uint8
    shift index instead of autodiff's ~25 per-shift residual maps). Its
    gradients — for BOTH inputs — must match plain autodiff through the
    minimum chain (f32, random data: argmin ties are measure-zero)."""
    import jax

    from pose_transfer_tpu.ops import nn_loss as mod

    def plain(predicted, ground_truth, nh, nw):
        gt_pad = mod._pad_gt(ground_truth, nh, nw)
        h, w = predicted.shape[1:3]
        min_norms = None
        for i, j in mod._shifts(nh, nw):
            ref = gt_pad[:, i:i + h, j:j + w, :]
            norms = jnp.sum(jnp.abs(ref - predicted), axis=-1)
            min_norms = norms if min_norms is None \
                else jnp.minimum(min_norms, norms)
        return jnp.mean(min_norms)

    rng = np.random.RandomState(7)
    for nh in (1, 3, 5):
        pred = jnp.asarray(rng.randn(2, 12, 12, 6).astype(np.float32))
        gt = jnp.asarray(rng.randn(2, 12, 12, 6).astype(np.float32))
        val, (dp, dg) = jax.value_and_grad(mod.nn_loss, argnums=(0, 1))(
            pred, gt, nh, nh)
        val_r, (dp_r, dg_r) = jax.value_and_grad(plain, argnums=(0, 1))(
            pred, gt, nh, nh)
        np.testing.assert_allclose(float(val), float(val_r), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_r),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_r),
                                   atol=1e-7)


def test_nn_loss_vjp_escape_hatch(monkeypatch):
    """PT_NN_LOSS_VJP=0 (the A/B lever for measuring the custom VJP's
    step/memory impact) routes around the custom VJP but must compute the
    same value and gradients."""
    import jax

    from pose_transfer_tpu.ops import nn_loss as mod

    rng = np.random.RandomState(11)
    pred = jnp.asarray(rng.randn(2, 10, 10, 4).astype(np.float32))
    gt = jnp.asarray(rng.randn(2, 10, 10, 4).astype(np.float32))
    val, (dp, dg) = jax.value_and_grad(mod.nn_loss, argnums=(0, 1))(
        pred, gt, 3, 3)
    monkeypatch.setenv("PT_NN_LOSS_VJP", "0")
    val_p, (dp_p, dg_p) = jax.value_and_grad(mod.nn_loss, argnums=(0, 1))(
        pred, gt, 3, 3)
    np.testing.assert_allclose(float(val), float(val_p), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_p), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_p), atol=1e-7)


def test_nn_loss_area1_is_l1():
    rng = np.random.RandomState(2)
    pred = rng.randn(2, 8, 8, 3).astype(np.float32)
    gt = rng.randn(2, 8, 8, 3).astype(np.float32)
    ours = float(nn_loss(jnp.asarray(pred), jnp.asarray(gt), 1, 1))
    expect = np.abs(pred - gt).sum(-1).mean()
    np.testing.assert_allclose(ours, expect, rtol=1e-6)


def test_ssim_bounds_and_identity():
    rng = np.random.RandomState(3)
    a = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    assert float(ssim(a, a)) == 1.0
    b = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    s = float(ssim(a, b))
    assert -1.0 <= s < 0.5  # random images are dissimilar


def test_ssim_degrades_with_noise():
    rng = np.random.RandomState(4)
    a = rng.rand(1, 32, 32, 3).astype(np.float32)
    s_small = float(ssim(a, a + 0.01 * rng.randn(*a.shape).astype(np.float32)))
    s_big = float(ssim(a, a + 0.2 * rng.randn(*a.shape).astype(np.float32)))
    assert s_big < s_small < 1.0


def test_warp_agg_avg_honored():
    """--warp_agg avg is honored here (the reference ignored it,
    pose_transform.py:89)."""
    import jax.numpy as jnp

    from pose_transfer_tpu.ops.warp import affine_transform_layer

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    identity = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32),
                        (1, 3, 1))
    shift = identity.at[0, 1, 2].set(4.0)  # one transform translated
    avg = affine_transform_layer(feats, shift, None, (16, 16), "none",
                                 warp_agg="avg")
    mx = affine_transform_layer(feats, shift, None, (16, 16), "none",
                                warp_agg="max")
    assert np.abs(np.asarray(avg) - np.asarray(mx)).max() > 1e-3
    # avg of 3 identical identity warps == the input
    same = affine_transform_layer(feats, identity, None, (16, 16), "none",
                                  warp_agg="avg")
    np.testing.assert_allclose(np.asarray(same), np.asarray(feats),
                               atol=1e-5)
