"""Model zoo: parameter-count parity with the reference logs + forward
shapes + dropout/train-eval behavior.

The reference's committed run log (src_deformable/logs/gen_full_fasion)
prints "Total number of parameters: 82080611" for the Fashion-256 deformable
generator and 2803782 for its discriminator — exact architectural
fingerprints our flax modules must reproduce.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_transfer_tpu.models import (
    Decoder,
    DeformableGenerator,
    Discriminator,
    Encoder,
    StackedGenerator,
    UNetGenerator,
    decoder_filters_for,
    encoder_filters_for,
)


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


FASHION = (256, 256)
K18 = 18


def _fashion_gen():
    return DeformableGenerator(
        pose_dim=K18, image_size=FASHION,
        nfilters_enc=encoder_filters_for(FASHION),
        nfilters_dec=decoder_filters_for(FASHION),
        warp_skip="mask")


def test_generator_param_count_matches_reference_log():
    gen = _fashion_gen()
    # tiny spatial size: param shapes don't depend on H,W
    inp = jnp.zeros((1, 32, 32, 3 + 2 * K18))
    warps = jnp.zeros((1, 10, 8))
    masks = jnp.ones((1, 10, 32, 32))
    gen2 = DeformableGenerator(
        pose_dim=K18, image_size=(32, 32),
        nfilters_enc=encoder_filters_for(FASHION),
        nfilters_dec=decoder_filters_for(FASHION), warp_skip="mask")
    params = gen2.init(jax.random.PRNGKey(0), inp, warps, masks, train=False)
    assert n_params(params) == 82_080_611


def test_discriminator_param_count_matches_reference_log():
    disc = Discriminator()
    x = jnp.zeros((1, 32, 32, 3 + 2 * K18 + 3))  # input_nc + 3
    params = disc.init(jax.random.PRNGKey(0), x, train=False)
    assert n_params(params) == 2_803_782


def test_h36m_config_param_counts_consistent():
    """128-class ladder (max(image_size) < 256) builds and is smaller."""
    size = (64, 64)
    gen = DeformableGenerator(
        pose_dim=16, image_size=size,
        nfilters_enc=encoder_filters_for((224, 224)),
        nfilters_dec=decoder_filters_for((224, 224)), warp_skip="mask")
    inp = jnp.zeros((1, 64, 64, 3 + 2 * 16))
    params = gen.init(jax.random.PRNGKey(0), inp, jnp.zeros((1, 10, 8)),
                      jnp.ones((1, 10, 64, 64)), train=False)
    # the <256 ladder (one fewer enc/dec stage) is strictly smaller
    assert 0 < n_params(params) < 82_080_611


def test_generator_forward_shapes_and_range():
    size = (64, 64)
    gen = DeformableGenerator(
        pose_dim=K18, image_size=size,
        nfilters_enc=(8, 16, 16), nfilters_dec=(16, 16, 3),
        warp_skip="mask", num_warp_stages=2)
    inp = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3 + 2 * K18),
                      jnp.float32)
    warps = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32),
                     (2, 10, 1))
    masks = jnp.ones((2, 10, 64, 64))
    params = gen.init(jax.random.PRNGKey(0), inp, warps, masks, train=False)
    out = gen.apply(params, inp, warps, masks, train=False)
    assert out.shape == (2, 64, 64, 3)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh range


def test_unet_generator_baseline_tree():
    gen = UNetGenerator(nfilters_enc=(8, 16, 16), nfilters_dec=(16, 16, 3))
    inp = jnp.zeros((2, 32, 32, 3 + 2 * 16))
    params = gen.init(jax.random.PRNGKey(0), inp, train=False)
    out = gen.apply(params, inp, train=False)
    assert out.shape == (2, 32, 32, 3)


def test_stacked_generator_shapes():
    k, s = 16, 3
    gen = StackedGenerator(
        pose_dim=k, image_size=(32, 32), nfilters_enc=(8, 16, 16),
        nfilters_dec=(16, 16, 3), num_stacks=s, warp_skip="mask")
    inp = jnp.zeros((2, 32, 32, 3 + 2 * k))
    tgt_pose = jnp.zeros((2, 32, 32, s * k))
    warps = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32),
                     (2, s, 10, 1))
    masks = jnp.ones((2, s, 10, 32, 32))
    params = gen.init(jax.random.PRNGKey(0), inp, tgt_pose, warps, masks,
                      train=False)
    outs = gen.apply(params, inp, tgt_pose, warps, masks, train=False)
    assert len(outs) == s
    assert all(o.shape == (2, 32, 32, 3) for o in outs)
    # the generator is SHARED across stages (networks.py:302): one param set
    assert list(params["params"].keys()) == ["generator"]


def test_discriminator_patch_output():
    disc = Discriminator()
    x = jnp.zeros((2, 128, 128, 42))
    params = disc.init(jax.random.PRNGKey(0), x, train=False)
    out = disc.apply(params, x, train=False)
    assert out.ndim == 2 and out.shape[0] == 2
    # 128 → 63 → 31 → 15 → 7 → 3: 3x3 = 9 patch probabilities
    assert out.shape[1] == 9
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_dropout_active_only_in_train():
    gen = UNetGenerator(nfilters_enc=(8, 16, 16), nfilters_dec=(16, 16, 3))
    inp = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 35),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), inp, train=False)
    e1 = gen.apply(params, inp, train=False)
    e2 = gen.apply(params, inp, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = gen.apply(params, inp, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = gen.apply(params, inp, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0


def test_encoder_returns_all_skips_with_halving():
    enc = Encoder((8, 16, 32))
    x = jnp.zeros((1, 32, 32, 5))
    params = enc.init(jax.random.PRNGKey(0), x, train=False)
    skips = enc.apply(params, x, train=False)
    assert [s.shape for s in skips] == [(1, 32, 32, 8), (1, 16, 16, 16),
                                        (1, 8, 8, 32)]


def test_generator_gradients_flow_through_warp():
    """Backprop must reach the appearance encoder through the warped skips —
    the failure the reference debugged (unitTests.py:131-141)."""
    gen = DeformableGenerator(
        pose_dim=16, image_size=(16, 16), nfilters_enc=(4, 8),
        nfilters_dec=(8, 3), warp_skip="mask", num_warp_stages=1)
    inp = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 35),
                      jnp.float32)
    warps = jnp.tile(jnp.asarray([1, 0, 1, 0, 1, 1, 0, 0], jnp.float32),
                     (1, 10, 1))
    masks = jnp.ones((1, 10, 16, 16))
    params = gen.init(jax.random.PRNGKey(0), inp, warps, masks, train=False)

    def loss(p):
        return jnp.sum(gen.apply(p, inp, warps, masks, train=False) ** 2)

    grads = jax.grad(loss)(params)
    app_kernel_grads = jax.tree.leaves(
        grads["params"]["encoder_app"])
    assert any(float(jnp.abs(g).max()) > 0 for g in app_kernel_grads)


def test_up_block_padding_equals_valid_plus_crop():
    """The up Block's padding-(2,2) ConvTranspose must be bit-equal to the
    reference semantics: k4s2 VALID transpose then Cropping2D(1)
    (networks.py:134-139, 154-157)."""
    import flax.linen as nn

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 5), jnp.float32)
    k = jnp.asarray(np.random.RandomState(1).randn(4, 4, 5, 7), jnp.float32)
    params = {"params": {"kernel": k}}
    ref = nn.ConvTranspose(7, (4, 4), strides=(2, 2), padding="VALID",
                           use_bias=False).apply(params, x)[:, 1:-1, 1:-1, :]
    ours = nn.ConvTranspose(7, (4, 4), strides=(2, 2),
                            padding=((2, 2), (2, 2)),
                            use_bias=False).apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_phase_upconv_matches_conv_transpose():
    """PhaseConvTranspose (4 dense k2s1 phase convs + interleave — the TPU
    default, networks.py::_upconv_impl) must match the dilated
    ConvTranspose path: same function to fp tolerance, same gradients,
    same parameter tree (shared ConvTranspose_0/kernel param), so the two
    paths are checkpoint- and init-interchangeable."""
    import jax
    import flax.linen as nn

    from pose_transfer_tpu.models.networks import PhaseConvTranspose

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 6, 5), jnp.float32)
    k = jnp.asarray(rs.randn(4, 4, 5, 7), jnp.float32)
    params = {"params": {"kernel": k}}
    dilated = nn.ConvTranspose(7, (4, 4), strides=(2, 2),
                               padding=((2, 2), (2, 2)),
                               use_bias=False)
    phase = PhaseConvTranspose(7)
    out_d = dilated.apply(params, x)
    out_p = phase.apply(params, x)
    assert out_p.shape == out_d.shape == (2, 16, 12, 7)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)

    # gradients through both impls agree (wrt input and kernel)
    cot = jnp.asarray(rs.randn(*out_d.shape), jnp.float32)
    gd = jax.grad(lambda p, x: jnp.vdot(dilated.apply(p, x), cot),
                  argnums=(0, 1))(params, x)
    gp = jax.grad(lambda p, x: jnp.vdot(phase.apply(p, x), cot),
                  argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp[0]["params"]["kernel"]),
                               np.asarray(gd[0]["params"]["kernel"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-4)

    # init parity: same param path, shape, and init stream
    key = jax.random.PRNGKey(0)
    vp = phase.init(key, x)
    vd = nn.ConvTranspose(
        7, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
        use_bias=False,
        kernel_init=nn.initializers.glorot_uniform()).init(key, x)
    assert jax.tree_util.tree_structure(vp) == \
        jax.tree_util.tree_structure(vd)
    np.testing.assert_array_equal(np.asarray(vp["params"]["kernel"]),
                                  np.asarray(vd["params"]["kernel"]))


def test_upconv_env_escape_hatch(monkeypatch):
    """PT_UPCONV forces the decoder up-conv implementation; 'auto' is
    dilated everywhere (phase is a measured dead end — 304.3 vs 330.6
    img/s at fashion b32, see networks.py::_upconv_impl)."""
    from pose_transfer_tpu.models import networks as nets

    monkeypatch.setenv("PT_UPCONV", "phase")
    assert nets._upconv_impl() == "phase"
    monkeypatch.setenv("PT_UPCONV", "dilated")
    assert nets._upconv_impl() == "dilated"
    monkeypatch.setenv("PT_UPCONV", "auto")
    assert nets._upconv_impl() == "dilated"
