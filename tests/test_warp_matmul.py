"""The MXU two-pass warp vs the exact gather path.

Exact-equality cases: m10 == 0 (no vertical shear). General affines: the
two-pass approximation shifts vertical taps by at most |m10| px; assert a
tight error bound on smooth inputs and unchanged zero-padding behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose_transfer_tpu.core import transforms_host as th
from pose_transfer_tpu.ops.warp import (
    affine_transform_layer,
    warp_feature_matmul,
    warp_feature_single,
)

H = W = 32


def _smooth_image(rng, c=8):
    from scipy.ndimage import gaussian_filter

    img = rng.normal(size=(H, W, c))
    img = gaussian_filter(img, sigma=(2.0, 2.0, 0.0))
    return jnp.asarray(img, jnp.float32)


@pytest.mark.parametrize("tr", [
    [1, 0, 0, 0, 1, 0, 0, 0],              # identity
    [1, 0, 3.5, 0, 1, -2.25, 0, 0],        # translate
    [0.5, 0, 4, 0, 2.0, -3, 0, 0],         # anisotropic scale
    [1.2, 0.3, -2, 0, 0.8, 5, 0, 0],       # horizontal shear (m10 = 0)
    [1, 0, 1000, 0, 1, 1000, 0, 0],        # sentinel (all out of bounds)
])
def test_matmul_matches_exact_when_m10_zero(tr):
    rng = np.random.default_rng(0)
    img = _smooth_image(rng)
    t = jnp.asarray(tr, jnp.float32)
    exact = warp_feature_single(img, t, (H, W))
    fast = warp_feature_matmul(img[None], t, (H, W))[0]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=1e-4, rtol=1e-4)


def test_matmul_close_for_rotation():
    rng = np.random.default_rng(1)
    img = _smooth_image(rng)
    a = 0.15  # ~8.6 degrees
    t = jnp.asarray([np.cos(a), -np.sin(a), 2.0, np.sin(a), np.cos(a), -1.0,
                     0, 0], jnp.float32)
    exact = np.asarray(warp_feature_single(img, t, (H, W)))
    fast = np.asarray(warp_feature_matmul(img[None], t, (H, W))[0])
    # two-pass taps shift by <= |m10| px vertically; smooth input keeps the
    # difference small, interior only (borders share zero padding)
    # error bound: |m10| px vertical tap shift × local gradient (smooth
    # input: gradient ~0.1/px after sigma-2 gaussian)
    err = np.abs(fast - exact)
    assert err.mean() < 0.01, err.mean()
    assert np.quantile(err, 0.99) < 0.1


def test_matmul_real_part_transforms():
    """Transforms estimated from plausible skeletons stay close to exact."""
    from pose_transfer_tpu.data.synthetic import random_skeleton

    rng = np.random.default_rng(2)
    kp1 = random_skeleton(rng, (H, W), 18)
    kp2 = random_skeleton(rng, (H, W), 18)
    warps = jnp.asarray(th.affine_transforms(kp1, kp2, 18), jnp.float32)
    img = _smooth_image(rng)
    for t in warps:
        exact = np.asarray(warp_feature_single(img, t, (H, W)))
        fast = np.asarray(warp_feature_matmul(img[None], t, (H, W))[0])
        # limb transforms can be ~90° rotations (|m10| ≈ 1): the two-pass
        # vertical tap skew is then up to 1 px, so the error bound is the
        # image's mean 1-px finite difference, not a fixed small constant
        grad = np.abs(np.diff(np.asarray(img), axis=0)).mean()
        m10 = abs(float(t[3]))
        assert np.abs(fast - exact).mean() <= max(0.025, 5.0 * m10 * grad)


def test_layer_backends_agree_and_grad_flows():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, H, W, 8)), jnp.float32)
    warps = jnp.asarray(
        [[[1, 0, 2, 0, 1, 1, 0, 0]] * 10, [[0.9, 0, -1, 0, 1.1, 0, 0, 0]] * 10],
        jnp.float32)
    masks = jnp.ones((2, 10, H, W), jnp.float32)
    a = affine_transform_layer(feats, warps, masks, (H, W), "mask",
                               backend="exact")
    b = affine_transform_layer(feats, warps, masks, (H, W), "mask",
                               backend="matmul")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)

    def loss(f):
        out = affine_transform_layer(f, warps, masks, (H, W), "mask",
                                     backend="matmul")
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(feats)
    assert float(jnp.abs(g).max()) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_bfloat16_roundtrip():
    rng = np.random.default_rng(4)
    img = _smooth_image(rng).astype(jnp.bfloat16)
    t = jnp.asarray([1, 0, 2, 0, 1, 1, 0, 0], jnp.float32)
    out = warp_feature_matmul(img[None], t, (H, W))[0]
    assert out.dtype == jnp.bfloat16
    f32 = warp_feature_matmul(img[None].astype(jnp.float32), t, (H, W))[0]
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(f32),
                               atol=0.05)
