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
        warp_skip=config.warp_skip)
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
