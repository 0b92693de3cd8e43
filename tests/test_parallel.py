"""Data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pose_transfer_tpu.data import synthetic
from pose_transfer_tpu.parallel import (
    config_for_mesh,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_state,
    unreplicate_state,
)
from pose_transfer_tpu.train import GANConfig, create_state, make_train_step

IMG = (32, 32)


def small_config(**over):
    base = dict(image_size=IMG, pose_dim=18, batch_size=8, check_mode=True,
                warp_skip="mask", gen_type="baseline", training_ratio=1)
    base.update(over)
    return GANConfig(**base)


def _batches(config, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: synthetic.synthetic_compact_batch(  # noqa: E731
        rng, config.batch_size, config.image_size, config.pose_dim,
        warp_skip=config.warp_skip, gen_type=config.gen_type,
        num_stacks=config.num_stacks)
    fake = {k: v[None] for k, v in mk().items()}
    real = {k: v[None] for k, v in mk().items()}
    gen_batch = mk()
    return fake, real, gen_batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_parallel_step_matches_single_device():
    config = small_config()
    state, gen, disc = create_state(config, seed=0)
    fake, real, gen_batch = _batches(config)

    single = jax.jit(make_train_step(config, gen, disc))
    s1, m1, out1 = single(state, fake, real, gen_batch)

    mesh = make_mesh(8)
    pstate = replicate_state(state, mesh)
    # same gen/disc modules on purpose (the numerics comparison needs
    # identical models); only device_count must match the mesh width
    parallel = make_parallel_train_step(config_for_mesh(config, mesh),
                                        gen, disc, mesh)
    s8, m8, out8 = parallel(pstate, fake, real, gen_batch)

    np.testing.assert_allclose(np.asarray(m1["gen"]), np.asarray(m8["gen"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1["disc"]),
                               np.asarray(m8["disc"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8),
                               rtol=2e-3, atol=1e-3)
    # params agree after one step
    host8 = unreplicate_state(s8)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.gen_params)),
                    jax.tree_util.tree_leaves(host8.gen_params)):
        # atol: one Adam update quantum. Adam's step is lr·m̂/(√v̂+ε) —
        # sign-like for any nonzero grad — so a near-zero gradient whose
        # SIGN flips under the psum's f32 reassociation moves its param by
        # up to 2·lr = 4e-4 on the first step. Everything else matches to
        # rtol; this bounds the reassociation-sensitive stragglers.
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=4.1e-4)


def test_parallel_eval_step():
    config = small_config()
    state, gen, _ = create_state(config, seed=0)
    mesh = make_mesh(4)
    pstate = replicate_state(state, mesh)
    eval_step = make_parallel_eval_step(config_for_mesh(config, mesh),
                                        gen, mesh)
    _, _, gen_batch = _batches(config)
    out, prepared = eval_step(pstate.gen_params, gen_batch)
    assert out.shape == (config.batch_size, *IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_batch_not_divisible_raises():
    with pytest.raises(ValueError):
        make_mesh(16)


@pytest.mark.parametrize("place", ["xla", "kernel"])
def test_windowed_fold_sharded_matches_single(place):
    """Under a data-parallel mesh the windowed fold runs per-device via
    shard_map (ops.warp.fold_mesh) — batch-elementwise, so sharded must
    equal unsharded, forward and gradient (both placement impls; 'kernel'
    runs the Pallas placement in interpret mode on CPU)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pose_transfer_tpu.ops import warp as warp_ops

    rng = np.random.RandomState(0)
    n, hw, c, t = 8, 64, 8, 4
    f = jnp.asarray(rng.randn(n, hw, hw, c), jnp.float32)
    warps = np.tile(np.array([1, 0, 0, 0, 1, 0, 0, 0], np.float32),
                    (n, t, 1))
    warps[:, 1] = [0.9, 0.1, 3.0, -0.15, 1.05, -2.0, 0, 0]
    warps[:, 2] = [1.2, -0.3, -5.0, 0.2, 0.8, 4.0, 0, 0]
    masks = np.zeros((n, t, hw, hw), np.float32)
    masks[:, 0] = 1.0
    masks[:, 1, 5:30, 8:30] = 1.0
    masks[:, 2, 33:60, 33:60] = 1.0
    warps, masks = jnp.asarray(warps), jnp.asarray(masks)
    g = jnp.asarray(rng.randn(n, hw, hw, c), jnp.float32)

    def layer(x, w_, m):
        return warp_ops.affine_transform_layer(
            x, w_, m, (hw, hw), "mask", "max", "matmul",
            windowed=True, place_impl=place)

    def fwd_bwd(x, w_, m):
        out, vjp = jax.vjp(lambda xx: layer(xx, w_, m), x)
        return out, vjp(g)[0]

    out1, df1 = jax.jit(fwd_bwd)(f, warps, masks)

    mesh = make_mesh(4)
    shard = NamedSharding(mesh, P("data"))
    before = warp_ops._SHARD_FOLD_TRACES

    def traced(x, w_, m):
        with warp_ops.fold_mesh(mesh, "data"):
            return fwd_bwd(x, w_, m)

    out8, df8 = jax.jit(traced, in_shardings=(shard, shard, shard))(
        jax.device_put(f, shard), jax.device_put(warps, shard),
        jax.device_put(masks, shard))
    assert warp_ops._SHARD_FOLD_TRACES > before  # the shard path traced
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(df8), np.asarray(df1), atol=2e-5)


def test_parallel_windowed_train_step_matches_single_device():
    """Full data-parallel train step with the windowed fold forced on
    (64² so the shape qualifies): 4-device == 1-device numerics, like the
    unwindowed equality test."""
    config = small_config(image_size=(64, 64), batch_size=8,
                          warp_windowed=True, warp_place="xla")
    state, gen, disc = create_state(config, seed=0)
    fake, real, gen_batch = _batches(config)

    single = jax.jit(make_train_step(config, gen, disc))
    s1, m1, out1 = single(state, fake, real, gen_batch)

    mesh = make_mesh(4)
    pstate = replicate_state(state, mesh)
    parallel = make_parallel_train_step(config_for_mesh(config, mesh),
                                        gen, disc, mesh)
    s4, m4, out4 = parallel(pstate, fake, real, gen_batch)

    np.testing.assert_allclose(np.asarray(m1["gen"]), np.asarray(m4["gen"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out4),
                               rtol=2e-3, atol=1e-3)


def test_parallel_stacked_windowed_matches_single_device():
    """Stacked generator (per-stage fold instances, (S, N, ...) outputs)
    over the mesh with the windowed fold forced: 4-device == 1-device.
    Covers the stacked out-sharding (batch axis 1) and the shard_mapped
    fold inside every stage."""
    config = small_config(image_size=(64, 64), batch_size=4,
                          gen_type="stacked", num_stacks=2,
                          warp_windowed=True, warp_place="xla")
    state, gen, disc = create_state(config, seed=0)
    fake, real, gen_batch = _batches(config)

    single = jax.jit(make_train_step(config, gen, disc))
    s1, m1, out1 = single(state, fake, real, gen_batch)

    mesh = make_mesh(4)
    pstate = replicate_state(state, mesh)
    parallel = make_parallel_train_step(config_for_mesh(config, mesh),
                                        gen, disc, mesh)
    s4, m4, out4 = parallel(pstate, fake, real, gen_batch)

    assert out1.shape[0] == config.num_stacks  # (S, N, H, W, 3)
    np.testing.assert_allclose(np.asarray(m1["gen"]), np.asarray(m4["gen"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out4),
                               rtol=2e-3, atol=1e-3)


def test_parallel_requires_matching_device_count():
    """make_parallel_* validate config.device_count == mesh width: the auto
    warp_windowed rule keys off the data-parallel width, so models built
    from a config that never saw the mesh are a silent-misconfig hazard
    (__graft_entry__ itself once hit this)."""
    config = small_config()  # device_count defaults to 1
    state, gen, disc = create_state(config, seed=0)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="device_count"):
        make_parallel_train_step(config, gen, disc, mesh)
    with pytest.raises(ValueError, match="device_count"):
        make_parallel_eval_step(config, gen, mesh)
    assert config_for_mesh(config, mesh).device_count == 8
    assert config_for_mesh(config, None).device_count == 1
