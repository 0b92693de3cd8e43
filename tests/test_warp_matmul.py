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


# ---- custom-VJP fold (warp_fold_matmul) ----------------------------------

from pose_transfer_tpu.ops.warp import (  # noqa: E402
    _fold_scan,
    warp_feature_matmul_t,
    warp_fold_matmul,
)


def _fold_inputs(seed, t=4):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(2, H, W, 8)), jnp.float32)
    trs = np.tile(np.eye(3, dtype=np.float32).ravel()[:8], (2, t, 1))
    trs[:, :, 2] = rng.uniform(-4, 4, (2, t))      # tx
    trs[:, :, 5] = rng.uniform(-4, 4, (2, t))      # ty
    trs[:, :, 0] = rng.uniform(0.7, 1.3, (2, t))   # m00
    trs[:, :, 4] = rng.uniform(0.7, 1.3, (2, t))   # m11
    trs[:, :, 1] = rng.uniform(-0.2, 0.2, (2, t))  # m01
    trs[:, :, 3] = rng.uniform(-0.2, 0.2, (2, t))  # m10
    # strictly positive masks: no masked-zero ties between transforms
    masks = jnp.asarray(rng.uniform(0.5, 1.5, (2, t, H, W)), jnp.float32)
    return feats, jnp.asarray(trs), masks


def test_matmul_transpose_is_adjoint():
    """<Wf, g> == <f, Wᵀg>: warp_feature_matmul_t is the exact linear
    transpose of warp_feature_matmul for arbitrary affines."""
    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.normal(size=(1, H, W, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, H, W, 8)), jnp.float32)
    tr = jnp.asarray([0.9, 0.25, 2.0, -0.35, 1.2, -3.0, 0, 0], jnp.float32)
    wf = warp_feature_matmul(f, tr, (H, W))
    wtg = warp_feature_matmul_t(g, tr, (H, W))
    lhs = float(jnp.sum(wf * g))
    rhs = float(jnp.sum(f * wtg))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


@pytest.mark.parametrize("agg", ["max", "avg"])
def test_fold_custom_vjp_matches_autodiff(agg):
    """The hand-written VJP equals autodiff of the forward fold."""
    feats, warps, masks = _fold_inputs(12)

    def loss_custom(f):
        out = warp_fold_matmul(f, warps, masks, (H, W), agg)
        return jnp.sum(out * jnp.sin(out))

    def loss_autodiff(f):
        out, _ = _fold_scan(f, warps, masks, (H, W), agg)
        return jnp.sum(out * jnp.sin(out))

    np.testing.assert_allclose(np.asarray(loss_custom(feats)),
                               np.asarray(loss_autodiff(feats)), rtol=1e-6)
    g_c = np.asarray(jax.grad(loss_custom)(feats))
    g_a = np.asarray(jax.grad(loss_autodiff)(feats))
    np.testing.assert_allclose(g_c, g_a, atol=2e-4, rtol=1e-4)


def test_fold_vjp_no_grad_to_warps_masks():
    """Transforms/masks are host-estimated data: their gradients are
    defined as zero (reference parity — pose_transform.py's transforms
    never receive gradients)."""
    feats, warps, masks = _fold_inputs(13)
    gw, gm = jax.grad(
        lambda w, m: jnp.sum(
            warp_fold_matmul(feats, w, m, (H, W), "max") ** 2),
        argnums=(0, 1))(warps, masks)
    assert float(jnp.abs(gw).max()) == 0.0
    assert float(jnp.abs(gm).max()) == 0.0


def test_fold_idx_first_t_wins_ties():
    """Duplicate transforms tie everywhere; the argmax index must stay at
    the first occurrence (strict > update), and fit int8."""
    feats, warps, masks = _fold_inputs(14, t=3)
    warps = warps.at[:, 1].set(warps[:, 0])   # t=1 duplicates t=0
    masks = masks.at[:, 1].set(masks[:, 0])
    _, idx = _fold_scan(feats, warps, masks, (H, W), "max")
    assert idx.dtype == jnp.int8
    assert not bool(jnp.any(idx == 1))        # never the duplicate


# ---- mask-windowed fold --------------------------------------------------

from pose_transfer_tpu.ops.warp import _support_windows  # noqa: E402


def _windowed_inputs(seed, n=3, t=10, h=64, w=64, c=5, oversize=False):
    """Masks exercising the fold branches: body all-ones (always full-res),
    small fractional boxes (windowed), two empty (sentinel), and optionally
    one oversize box — which trips the whole-fold full fallback."""
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    trs = []
    for _ in range(n * t):
        a = rng.uniform(-0.6, 0.6)
        trs.append([np.cos(a), -np.sin(a), rng.uniform(-10, 10),
                    np.sin(a), np.cos(a), rng.uniform(-10, 10), 0, 0])
    warps = jnp.asarray(np.asarray(trs).reshape(n, t, 8), jnp.float32)
    masks = np.zeros((n, t, h, w), np.float32)
    masks[:, 0] = 1.0
    for i in range(n):
        for j in range(1, 8):
            y, x = rng.integers(0, h - 20), rng.integers(0, w - 20)
            masks[i, j, y:y + int(rng.integers(5, 20)),
                  x:x + int(rng.integers(5, 20))] = rng.uniform(0.3, 1.0)
    if oversize:
        masks[:, 7] = 0.0
        masks[:, 7, 5:h - 9, 2:w - 4] = 1.0   # > h/2 extent
    return feats, warps, jnp.asarray(masks)


def test_support_windows():
    feats, warps, masks = _windowed_inputs(0, oversize=True)
    y0, x0, fits, empty = _support_windows(masks, 32, 32)
    fits, empty = np.asarray(fits), np.asarray(empty)
    assert not fits[:, 0].any()          # body: all-ones never fits
    assert fits[:, 1:7].all()            # small boxes fit
    assert not fits[:, 7].any()          # oversize box
    assert fits[:, 8:].all() and empty[:, 8:].all()   # empty parts
    assert not empty[:, :8].any()
    # window covers the support
    m = np.asarray(masks)
    for i in range(m.shape[0]):
        for j in range(1, 7):
            ys, xs = np.nonzero(m[i, j])
            assert int(y0[i, j]) <= ys.min() and ys.max() < int(y0[i, j]) + 32
            assert int(x0[i, j]) <= xs.min() and xs.max() < int(x0[i, j]) + 32


@pytest.mark.parametrize("agg", ["max", "avg"])
@pytest.mark.parametrize("oversize", [False, True])
def test_windowed_fold_matches_full(agg, oversize):
    """Windowed == full-extent fold (mathematically exact; a few f32 ulps
    of FMA/codegen wiggle between contraction shapes), fwd and grad — both
    the all-parts-fit windowed path and the oversize full fallback."""
    feats, warps, masks = _windowed_inputs(1, oversize=oversize)
    ref = warp_fold_matmul(feats, warps, masks, (H_W := (64, 64)), agg, False)
    win = warp_fold_matmul(feats, warps, masks, H_W, agg, True)
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)

    def loss(f, windowed):
        out = warp_fold_matmul(f, warps, masks, H_W, agg, windowed)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(lambda f: loss(f, False))(feats)
    g_win = jax.grad(lambda f: loss(f, True))(feats)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_ref),
                               atol=5e-6, rtol=1e-4)


@pytest.mark.parametrize("seed", [2, 3, 4, 5])
def test_windowed_fold_fuzz_geometries(seed):
    """Seeded fuzz: random support rectangles (including border-touching
    ones — windows clip at h-s_y / aligned x-max) must keep the
    kernel-placed windowed fold equal to the full fold, fwd and grad."""
    feats, warps, masks = _windowed_inputs(seed)
    m = np.array(masks)
    rng = np.random.default_rng(100 + seed)
    # push two supports against the borders to stress start clipping
    for i in range(m.shape[0]):
        m[i, 8] = 0.0
        m[i, 8, 0:int(rng.integers(4, 12)), -int(rng.integers(4, 12)):] = 1.0
        m[i, 9] = 0.0
        m[i, 9, -int(rng.integers(4, 12)):, 0:int(rng.integers(4, 12))] = 1.0
    masks = jnp.asarray(m)

    hw = (64, 64)
    ref, vjp_r = jax.vjp(
        lambda f: warp_fold_matmul(f, warps, masks, hw), feats)
    win, vjp_w = jax.vjp(
        lambda f: warp_fold_matmul(f, warps, masks, hw, "max", True, (),
                                   "kernel"), feats)
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref), atol=5e-5)
    g = jnp.asarray(np.random.default_rng(seed).normal(size=ref.shape),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(vjp_w(g)[0]),
                               np.asarray(vjp_r(g)[0]), atol=5e-5)


def test_windowed_fold_bf16_bit_exact():
    feats, warps, masks = _windowed_inputs(2)
    fb, mb = feats.astype(jnp.bfloat16), masks.astype(jnp.bfloat16)
    ref = warp_fold_matmul(fb, warps, mb, (64, 64), "max", False)
    win = warp_fold_matmul(fb, warps, mb, (64, 64), "max", True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(win, np.float32))


def test_windowed_fold_sentinel_parts_contribute_zero():
    """Sentinel transforms (empty masks) must inject exact zeros into the
    max — reference semantics: warped·mask ≡ 0 everywhere for that part."""
    rng = np.random.default_rng(3)
    n, t, h, w, c = 2, 3, 64, 64, 4
    feats = jnp.asarray(-np.abs(rng.normal(size=(n, h, w, c))) - 0.5,
                        jnp.float32)  # strictly negative features
    eye = np.tile(np.eye(3, dtype=np.float32).ravel()[:8], (n, t, 1))
    eye[:, 1] = [1, 0, 1000, 0, 1, 1000, 0, 0]   # sentinel translate
    warps = jnp.asarray(eye)
    masks = np.ones((n, t, h, w), np.float32)
    masks[:, 1] = 0.0                             # empty mask for sentinel
    out = warp_fold_matmul(feats, warps, jnp.asarray(masks), (h, w),
                           "max", True)
    # the sentinel's zero contribution dominates the negative features
    np.testing.assert_array_equal(np.asarray(out),
                                  np.zeros((n, h, w, c), np.float32))


def test_windowed_disabled_for_odd_or_small_shapes():
    """Odd dims / sub-32 windows fall back to the full fold (still correct)."""
    rng = np.random.default_rng(4)
    for h, w in [(30, 64), (63, 64)]:
        feats = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
        warps = jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32).ravel()[:8], (1, 2, 1)))
        masks = jnp.asarray(rng.uniform(0, 1, (1, 2, h, w)), jnp.float32)
        a = warp_fold_matmul(feats, warps, masks, (h, w), "max", True)
        b = warp_fold_matmul(feats, warps, masks, (h, w), "max", False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_empty_parts_schema():
    from pose_transfer_tpu.core.transforms_host import static_empty_parts
    # pose_dim 16 ('Rkne'/'Lkne' not in the 16-joint labels, no head names):
    # head + hip→kne ×2 + kne→ank ×2 degenerate (transforms_host docstring)
    assert static_empty_parts(16) == (1, 2, 3, 4, 5)
    assert static_empty_parts(18) == ()


@pytest.mark.parametrize("agg", ["max", "avg"])
def test_windowed_static_empty_matches_full(agg):
    """Skipping statically-empty parts == computing them (their masks are
    empty, so their contribution is exactly zero)."""
    feats, warps, masks = _windowed_inputs(5)
    masks = masks.at[:, 1:6].set(0.0)   # pose_dim-16-like: parts 1-5 empty
    ref = warp_fold_matmul(feats, warps, masks, (64, 64), agg, False)
    win = warp_fold_matmul(feats, warps, masks, (64, 64), agg, True,
                           (1, 2, 3, 4, 5))
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    g_ref = jax.grad(lambda f: jnp.sum(jnp.sin(
        warp_fold_matmul(f, warps, masks, (64, 64), agg, False))))(feats)
    g_win = jax.grad(lambda f: jnp.sum(jnp.sin(
        warp_fold_matmul(f, warps, masks, (64, 64), agg, True,
                         (1, 2, 3, 4, 5)))))(feats)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_ref),
                               atol=5e-6, rtol=1e-4)


@pytest.mark.parametrize("agg", ["max", "avg"])
def test_full_fold_static_empty_matches(agg):
    """Static part compaction on the DEFAULT (non-windowed) fold: skipping
    the structurally-empty parts equals computing them."""
    feats, warps, masks = _windowed_inputs(6)
    masks = masks.at[:, 1:6].set(0.0)
    ref = warp_fold_matmul(feats, warps, masks, (64, 64), agg, False)
    cmp = warp_fold_matmul(feats, warps, masks, (64, 64), agg, False,
                           (1, 2, 3, 4, 5))
    np.testing.assert_allclose(np.asarray(cmp), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    g_ref = jax.grad(lambda f: jnp.sum(jnp.sin(
        warp_fold_matmul(f, warps, masks, (64, 64), agg, False))))(feats)
    g_cmp = jax.grad(lambda f: jnp.sum(jnp.sin(
        warp_fold_matmul(f, warps, masks, (64, 64), agg, False,
                         (1, 2, 3, 4, 5)))))(feats)
    np.testing.assert_allclose(np.asarray(g_cmp), np.asarray(g_ref),
                               atol=5e-6, rtol=1e-4)
