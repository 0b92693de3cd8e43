"""Warp-op parity vs torch — the reference's exact compute chain.

The golden below is a fresh transcription of the *behavior* of the
reference's AffineLayer/AffineTransformLayer
(src_deformable/utils/pose_transform.py:16-92): pixel affines →
normalize_transforms → F.affine_grid → F.grid_sample (zero padding,
bilinear) → mask multiply (cv2 resize) → max over transforms. Our op
samples directly in pixel space; these tests pin the equivalence for the
square shapes the reference trains (SURVEY.md §7 hard part 1).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import functools

from pose_transfer_tpu.ops import warp as _warp_mod


class warp:  # torch-parity pins exercise the exact gather backend
    resize_bilinear = _warp_mod.resize_bilinear
    affine_transform_layer = staticmethod(functools.partial(
        _warp_mod.affine_transform_layer, backend="exact"))


def torch_reference_warp(features_nchw: np.ndarray, warps: np.ndarray,
                         masks: np.ndarray | None,
                         init_image_size: tuple[int, int],
                         warp_skip: str) -> np.ndarray:
    """Behavioral golden for AffineTransformLayer.forward (CPU torch)."""
    inp = torch.from_numpy(features_nchw).float()
    w = torch.from_numpy(warps).float()
    n, c, h, ww = inp.shape
    t = w.shape[1]

    # AffineTransformLayer: rescale translations to feature resolution
    affine_mul = torch.tensor([1, 1, init_image_size[0] / h,
                               1, 1, init_image_size[1] / ww,
                               1, 1]).float()
    w = w / affine_mul

    # AffineLayer: tile, normalize to affine_grid convention, sample
    x = inp.unsqueeze(1).repeat(1, t, 1, 1, 1).view(n * t, c, h, ww)
    tr = w[:, :, :6].reshape(-1, 2, 3).clone()
    tr[:, 0, 1] = tr[:, 0, 1] * ww / h
    tr[:, 0, 2] = tr[:, 0, 2] * 2 / h + tr[:, 0, 0] + tr[:, 0, 1] - 1
    tr[:, 1, 0] = tr[:, 1, 0] * h / ww
    tr[:, 1, 2] = tr[:, 1, 2] * 2 / ww + tr[:, 1, 0] + tr[:, 1, 1] - 1
    grid = F.affine_grid(tr, x.shape, align_corners=False)
    warped = F.grid_sample(x, grid, align_corners=False,
                           padding_mode="zeros")
    warped = warped.view(n, t, c, h, ww)

    if warp_skip == "mask":
        import cv2
        m = np.array([cv2.resize(np.transpose(mk, [1, 2, 0]), (ww, h))
                      for mk in masks])
        if m.ndim == 3:   # cv2 drops singleton channel dims
            m = m[..., None]
        mt = torch.from_numpy(m).permute(0, 3, 1, 2).unsqueeze(2).float()
        warped = warped * mt
    return warped.max(dim=1)[0].numpy()


def _random_warps(rng, n, t):
    """Well-conditioned random affines near identity, with translations."""
    w = np.zeros((n, t, 8), np.float32)
    w[..., 0] = 1 + rng.uniform(-0.2, 0.2, (n, t))
    w[..., 1] = rng.uniform(-0.2, 0.2, (n, t))
    w[..., 2] = rng.uniform(-6, 6, (n, t))
    w[..., 3] = rng.uniform(-0.2, 0.2, (n, t))
    w[..., 4] = 1 + rng.uniform(-0.2, 0.2, (n, t))
    w[..., 5] = rng.uniform(-6, 6, (n, t))
    return w


@pytest.mark.parametrize("size", [16, 32])
def test_warp_matches_torch_full_res(size):
    """Full-resolution unmasked warp == the reference torch chain."""
    rng = np.random.RandomState(0)
    n, t, c = 2, 4, 3
    feats = rng.rand(n, c, size, size).astype(np.float32)
    warps = _random_warps(rng, n, t)

    golden = torch_reference_warp(feats, warps, None, (size, size), "none")

    ours = warp.affine_transform_layer(
        jnp.asarray(np.transpose(feats, [0, 2, 3, 1])),
        jnp.asarray(warps), None, (size, size), "none")
    ours_nchw = np.transpose(np.asarray(ours), [0, 3, 1, 2])
    np.testing.assert_allclose(ours_nchw, golden, atol=2e-5)


def test_warp_matches_torch_feature_res():
    """Half-resolution features: translation rescaling parity."""
    rng = np.random.RandomState(1)
    n, t, c, size = 2, 3, 4, 16
    feats = rng.rand(n, c, size, size).astype(np.float32)
    warps = _random_warps(rng, n, t)

    golden = torch_reference_warp(feats, warps, None, (2 * size, 2 * size),
                                  "none")
    ours = warp.affine_transform_layer(
        jnp.asarray(np.transpose(feats, [0, 2, 3, 1])),
        jnp.asarray(warps), None, (2 * size, 2 * size), "none")
    ours_nchw = np.transpose(np.asarray(ours), [0, 3, 1, 2])
    np.testing.assert_allclose(ours_nchw, golden, atol=2e-5)


def test_warp_masked_matches_torch():
    """Mask path: cv2-resize golden vs in-graph jax.image.resize."""
    rng = np.random.RandomState(2)
    n, t, c, size, init = 2, 5, 3, 16, 32
    feats = rng.rand(n, c, size, size).astype(np.float32)
    warps = _random_warps(rng, n, t)
    masks = (rng.rand(n, t, init, init) > 0.5).astype(np.float32)

    golden = torch_reference_warp(feats, warps, masks, (init, init), "mask")
    ours = warp.affine_transform_layer(
        jnp.asarray(np.transpose(feats, [0, 2, 3, 1])),
        jnp.asarray(warps), jnp.asarray(masks), (init, init), "mask")
    ours_nchw = np.transpose(np.asarray(ours), [0, 3, 1, 2])
    # cv2 and jax.image bilinear share the half-pixel convention; tiny
    # float divergences only
    np.testing.assert_allclose(ours_nchw, golden, atol=1e-4)


def test_warp_masked_full_res_exact():
    """At full resolution (no resize) the mask path is exact."""
    rng = np.random.RandomState(3)
    n, t, c, size = 1, 10, 2, 24
    feats = rng.rand(n, c, size, size).astype(np.float32)
    warps = _random_warps(rng, n, t)
    masks = (rng.rand(n, t, size, size) > 0.3).astype(np.float32)

    golden = torch_reference_warp(feats, warps, masks, (size, size), "mask")
    ours = warp.affine_transform_layer(
        jnp.asarray(np.transpose(feats, [0, 2, 3, 1])),
        jnp.asarray(warps), jnp.asarray(masks), (size, size), "mask")
    ours_nchw = np.transpose(np.asarray(ours), [0, 3, 1, 2])
    np.testing.assert_allclose(ours_nchw, golden, atol=2e-5)


def test_warp_gradient_matches_torch():
    """d(sum(warped))/d(features) parity — the backprop the reference
    debugged by hand (unitTests.py:83-85 gradcheck)."""
    rng = np.random.RandomState(4)
    n, t, c, size = 1, 3, 2, 12
    feats = rng.rand(n, c, size, size).astype(np.float32)
    warps = _random_warps(rng, n, t)

    ft = torch.from_numpy(feats).requires_grad_(True)
    # golden grad via the torch chain
    inp = ft.unsqueeze(1).repeat(1, t, 1, 1, 1).view(n * t, c, size, size)
    tr = torch.from_numpy(warps[:, :, :6]).reshape(-1, 2, 3).clone()
    tr[:, 0, 1] = tr[:, 0, 1]
    tr[:, 0, 2] = tr[:, 0, 2] * 2 / size + tr[:, 0, 0] + tr[:, 0, 1] - 1
    tr[:, 1, 0] = tr[:, 1, 0]
    tr[:, 1, 2] = tr[:, 1, 2] * 2 / size + tr[:, 1, 0] + tr[:, 1, 1] - 1
    grid = F.affine_grid(tr, inp.shape, align_corners=False)
    out = F.grid_sample(inp, grid, align_corners=False).view(
        n, t, c, size, size).max(dim=1)[0]
    out.sum().backward()
    golden_grad = ft.grad.numpy()

    def loss_fn(f_nhwc):
        o = warp.affine_transform_layer(f_nhwc, jnp.asarray(warps), None,
                                        (size, size), "none")
        return jnp.sum(o)

    g = jax.grad(loss_fn)(jnp.asarray(np.transpose(feats, [0, 2, 3, 1])))
    g_nchw = np.transpose(np.asarray(g), [0, 3, 1, 2])
    np.testing.assert_allclose(g_nchw, golden_grad, atol=1e-4)


def test_warp_jits_and_is_finite_with_sentinels():
    """Sentinel (translation-by-1000) transforms must not produce NaNs."""
    from pose_transfer_tpu.core.transforms_host import NO_POINT_TR
    feats = jnp.ones((2, 8, 8, 3))
    sent = jnp.asarray(NO_POINT_TR.reshape(9)[:8], jnp.float32)
    warps = jnp.broadcast_to(sent, (2, 10, 8))
    masks = jnp.ones((2, 10, 8, 8))
    out = warp.affine_transform_layer(feats, warps, masks, (8, 8), "mask")
    assert bool(jnp.isfinite(out).all())
    assert bool((out == 0).all())
