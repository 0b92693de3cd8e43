"""Pallas fused warp kernel vs the XLA matmul backend (interpret mode on
CPU; the real Mosaic compile is exercised on TPU by tools/profile_step.py
and bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose_transfer_tpu.ops import warp_pallas
from pose_transfer_tpu.ops.warp import (
    affine_transform_layer,
    resize_bilinear,
    warp_feature_matmul,
)

H, W, C, T = 16, 16, 8, 3


def _inputs(seed=0, n=2):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(n, H, W, C)), jnp.float32)
    warps = np.tile(np.asarray([1, 0, 0, 0, 1, 0, 0, 0], np.float32),
                    (n, T, 1))
    warps[:, 1] = [0.9, 0.1, 2.0, -0.1, 1.1, -1.0, 0, 0]
    warps[:, 2] = [1.0, 0.0, 1000.0, 0.0, 1.0, 1000.0, 0, 0]  # sentinel
    masks = (rng.random((n, T, H, W)) > 0.3).astype(np.float32)
    return feats, jnp.asarray(warps), jnp.asarray(masks)


def _fold_matmul(feats, warps, masks):
    """Reference fold built from the already-tested matmul path."""
    outs = []
    for i in range(warps.shape[1]):
        per = jax.vmap(lambda f, tr: warp_feature_matmul(
            f[None], tr, (H, W))[0])(feats, warps[:, i])
        outs.append(per * masks[:, i][..., None])
    return jnp.max(jnp.stack(outs), axis=0)


def test_forward_matches_matmul_fold():
    feats, warps, masks = _inputs()
    want = np.asarray(_fold_matmul(feats, warps, masks))
    got = np.asarray(warp_pallas.warp_fold_pallas(
        feats, warps, masks, True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_layer_pallas_backend_interpret(monkeypatch):
    """The layer integration: scaling + mask resize + kernel call."""
    import pose_transfer_tpu.ops.warp_pallas as wp

    orig = wp.warp_fold_pallas
    monkeypatch.setattr(
        wp, "warp_fold_pallas",
        lambda f, w, m, interpret=False: orig(f, w, m, True))
    feats, warps, masks = _inputs(1)
    big_masks = jnp.asarray(
        np.random.default_rng(2).random((2, T, 2 * H, 2 * W)) > 0.3,
        jnp.float32)
    got = affine_transform_layer(feats, warps, big_masks, (2 * H, 2 * W),
                                 "mask", backend="pallas")
    want = affine_transform_layer(feats, warps, big_masks, (2 * H, 2 * W),
                                  "mask", backend="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_backward_matches_matmul_autodiff():
    feats, warps, masks = _inputs(3)

    def loss_pallas(f):
        out = warp_pallas.warp_fold_pallas(f, warps, masks, True)
        return jnp.sum(out * jnp.cos(out))

    def loss_matmul(f):
        out = _fold_matmul(f, warps, masks)
        return jnp.sum(out * jnp.cos(out))

    g_p = np.asarray(jax.grad(loss_pallas)(feats))
    g_m = np.asarray(jax.grad(loss_matmul)(feats))
    # tie-handling at equal maxima may route gradient to a different t with
    # identical values; compare loosely elementwise and tightly in norm
    np.testing.assert_allclose(g_p, g_m, atol=1e-3, rtol=1e-3)


def test_unmasked_path_and_unsupported_fallback():
    feats, warps, _ = _inputs(4)
    ones = jnp.ones((2, T, H, W), jnp.float32)
    got = np.asarray(warp_pallas.warp_fold_pallas(feats, warps, ones, True))
    want = np.asarray(_fold_matmul(feats, warps, ones))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert not warp_pallas.supported(30, 32)
    # odd shape silently falls back to matmul inside the layer
    f_odd = feats[:, :15, :, :]
    m_odd = jnp.ones((2, T, 15, W), jnp.float32)
    out = affine_transform_layer(f_odd, warps, m_odd, (15, W), "mask",
                                 backend="pallas")
    assert out.shape == f_odd.shape
