"""GAN engine tests: loss parity vs torch, train-step mechanics, checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from pose_transfer_tpu.data import synthetic
from pose_transfer_tpu.train import (
    GANConfig,
    checkpoint,
    create_state,
    losses,
    make_eval_step,
    make_train_step,
)

IMG = (32, 32)


def small_config(**over):
    base = dict(image_size=IMG, pose_dim=18, batch_size=2, check_mode=True,
                warp_skip="mask", gen_type="baseline", training_ratio=1,
                nn_loss_area_size=1)
    base.update(over)
    return GANConfig(**base)


# ---------------------------------------------------------------- loss parity


def _torch_gen_ad_loss(out_dis, gan_w, batch):
    """The reference's per-sample loop (pose_gan.py:90-98), in torch."""
    out_dis = torch.as_tensor(out_dis)
    ad = None
    for it in range(out_dis.shape[0]):
        term = -torch.mean(torch.log(out_dis[it, :] + 1e-7))
        ad = term if ad is None else ad + term
    return float(ad * gan_w / batch)


def _torch_disc_loss(res_dis, gan_w, batch):
    """pose_gan.py:140-164 loop."""
    res_dis = torch.as_tensor(res_dis)
    t_loss, f_loss = None, None
    for it in range(res_dis.shape[0]):
        out = res_dis[it, :]
        if it < batch:
            term = -torch.mean(torch.log(out + 1e-7))
            t_loss = term if t_loss is None else t_loss + term
        else:
            term = -torch.mean(torch.log(1 - out + 1e-7))
            f_loss = term if f_loss is None else f_loss + term
    return (float(t_loss * gan_w / batch), float(f_loss * gan_w / batch))


def test_gen_adversarial_loss_matches_torch_loop():
    rng = np.random.default_rng(0)
    probs = rng.uniform(0.01, 0.99, (4, 30)).astype(np.float32)
    got = float(losses.gen_adversarial_loss(jnp.asarray(probs), 1.5, 4))
    want = _torch_gen_ad_loss(probs, 1.5, 4)
    assert got == pytest.approx(want, rel=1e-5)


def test_disc_adversarial_loss_matches_torch_loop():
    rng = np.random.default_rng(1)
    probs = rng.uniform(0.01, 0.99, (8, 30)).astype(np.float32)
    t, f = losses.disc_adversarial_loss(jnp.asarray(probs[:4]),
                                        jnp.asarray(probs[4:]), 2.0, 4)
    want_t, want_f = _torch_disc_loss(probs, 2.0, 4)
    assert float(t) == pytest.approx(want_t, rel=1e-5)
    assert float(f) == pytest.approx(want_f, rel=1e-5)


def test_l1_matches_torch():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    b = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    got = float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(torch.nn.L1Loss()(torch.as_tensor(a), torch.as_tensor(b)))
    assert got == pytest.approx(want, rel=1e-6)


# ------------------------------------------------------------- train step


def _draws(rng, config, n_batches):
    batches = [synthetic.synthetic_compact_batch(
        rng, config.batch_size, config.image_size, config.pose_dim,
        warp_skip=config.warp_skip, gen_type=config.gen_type,
        num_stacks=config.num_stacks) for _ in range(n_batches)]
    return batches


def _stack(batches):
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


@pytest.mark.parametrize("warp_skip", ["mask", "full"])
def test_train_step_updates_and_finite(warp_skip):
    config = small_config(warp_skip=warp_skip, training_ratio=2)
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(0)
    r = config.training_ratio
    fake = _stack(_draws(rng, config, r))
    real = _stack(_draws(rng, config, r))
    gen_batch = _draws(rng, config, 1)[0]

    new_state, metrics, out_gen = step(state, fake, real, gen_batch)
    assert out_gen.shape == (config.batch_size, *IMG, 3)
    for v in jax.tree_util.tree_leaves(metrics):
        assert np.isfinite(np.asarray(v)).all()
    assert int(new_state.step) == 1
    # both nets actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.gen_params, new_state.gen_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    moved_d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.disc_params, new_state.disc_params)
    assert max(jax.tree_util.tree_leaves(moved_d)) > 0


def test_train_step_stacked():
    config = small_config(gen_type="stacked", num_stacks=2)
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(0)
    fake = _stack(_draws(rng, config, 1))
    real = _stack(_draws(rng, config, 1))
    gen_batch = _draws(rng, config, 1)[0]
    new_state, metrics, out_gen = step(state, fake, real, gen_batch)
    # per-stage images surface (S, N, H, W, 3) — the reference's stacked
    # forward returns every stage (networks.py:306-327)
    assert out_gen.shape == (config.num_stacks, config.batch_size, *IMG, 3)
    # stages are distinct images, not the final output repeated
    assert float(jnp.abs(out_gen[0] - out_gen[-1]).max()) > 1e-4
    assert np.isfinite(np.asarray(metrics["gen"])).all()


def test_eval_step_stacked_stage_outputs():
    config = small_config(gen_type="stacked", num_stacks=3)
    state, gen, _ = create_state(config, seed=0)
    eval_step = make_eval_step(config, gen)
    rng = np.random.default_rng(0)
    out, _ = eval_step(state.gen_params, _draws(rng, config, 1)[0])
    assert out.shape == (config.num_stacks, config.batch_size, *IMG, 3)
    assert float(jnp.abs(out[0] - out[-1]).max()) > 1e-4


def test_train_step_unet():
    """The baseline TREE's plain U-Net (src_baseline/models/networks.py:
    238-253) reachable via gen_type='unet'."""
    config = small_config(gen_type="unet", warp_skip="none")
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(0)
    new_state, metrics, out = step(
        state, _stack(_draws(rng, config, 1)), _stack(_draws(rng, config, 1)),
        _draws(rng, config, 1)[0])
    assert out.shape == (config.batch_size, *IMG, 3)
    assert np.isfinite(np.asarray(metrics["gen"])).all()
    # single encoder: no encoder_app/encoder_pose split
    names = set(new_state.gen_params["params"].keys())
    assert "encoder" in names and "encoder_app" not in names


def test_gaussian_weight_init():
    """N(0, 0.02) conv kernels (networks.py:33-42) via weight_init config."""
    cfg_x = small_config()
    cfg_g = small_config(weight_init="gaussian")
    state_x, _, _ = create_state(cfg_x, seed=0)
    state_g, _, _ = create_state(cfg_g, seed=0)

    kernels = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(state_g.gen_params)[0]
               if any(getattr(p, "key", None) == "kernel" for p in path)
               and leaf.ndim == 4]
    assert kernels
    flat = np.concatenate([np.asarray(k).ravel() for k in kernels])
    assert abs(flat.std() - 0.02) < 0.002
    assert abs(flat.mean()) < 0.002
    # differs from the xavier init, biases untouched
    x_kernels = [leaf for path, leaf in
                 jax.tree_util.tree_flatten_with_path(state_x.gen_params)[0]
                 if any(getattr(p, "key", None) == "kernel" for p in path)
                 and leaf.ndim == 4]
    assert float(jnp.abs(kernels[0] - x_kernels[0]).max()) > 0
    with pytest.raises(ValueError):
        create_state(small_config(weight_init="bogus"), seed=0)


def test_content_loss_path():
    config = small_config(content_loss_layer="block1_conv2")
    state, gen, disc = create_state(config, seed=0)
    assert state.vgg_params is not None
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(0)
    new_state, metrics, _ = step(
        state, _stack(_draws(rng, config, 1)), _stack(_draws(rng, config, 1)),
        _draws(rng, config, 1)[0])
    assert np.isfinite(np.asarray(metrics["gen"])).all()


def test_overfit_single_batch_reduces_l1():
    """checkMode analog: the generator L1 must fall on a repeated batch."""
    config = small_config(l1_penalty_weight=100.0, gan_penalty_weight=0.01)
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(3)
    fake = _stack(_draws(rng, config, 1))
    real = _stack(_draws(rng, config, 1))
    gen_batch = _draws(rng, config, 1)[0]
    lls = []
    for _ in range(60):
        state, metrics, _ = step(state, fake, real, gen_batch)
        lls.append(float(metrics["gen"][1]))
    assert np.mean(lls[-5:]) < np.mean(lls[:5]) * 0.7, lls


def test_eval_step():
    config = small_config()
    state, gen, disc = create_state(config, seed=0)
    eval_step = make_eval_step(config, gen)
    rng = np.random.default_rng(0)
    out, batch = eval_step(state.gen_params,
                           _draws(rng, config, 1)[0])
    assert out.shape == (config.batch_size, *IMG, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    config = small_config()
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(0)
    state, _, _ = step(state, _stack(_draws(rng, config, 1)),
                       _stack(_draws(rng, config, 1)),
                       _draws(rng, config, 1)[0])
    checkpoint.save(state, str(tmp_path), epoch=7)
    assert checkpoint.get_model_list(str(tmp_path), "gen").endswith(
        "gen_007.msgpack")

    fresh, _, _ = create_state(config, seed=1)
    restored, epoch = checkpoint.resume(fresh, str(tmp_path))
    assert epoch == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.gen_params),
                    jax.tree_util.tree_leaves(restored.gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.disc_opt_state),
                    jax.tree_util.tree_leaves(restored.disc_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # empty dir → epoch 1, state untouched
    _, epoch = checkpoint.resume(fresh, str(tmp_path / "nothing"))
    assert epoch == 1


def test_resume_missing_disc_raises(tmp_path):
    """A gen checkpoint without its disc sibling is a half-written dir —
    resume must refuse, not silently restart from scratch (VERDICT r1 #6)."""
    config = small_config()
    state, _, _ = create_state(config, seed=0)
    checkpoint.save(state, str(tmp_path), epoch=3)
    (tmp_path / "disc_003.msgpack").unlink()
    with pytest.raises(FileNotFoundError, match="matching disc checkpoint"):
        checkpoint.resume(state, str(tmp_path))


def test_resume_gen_only_for_inference(tmp_path):
    """require_disc=False (inference flows) loads the generator even when
    the same-epoch disc sibling is missing — eval/serving never touches
    the disc, and the gen file is complete (atomic write)."""
    config = small_config()
    state, _, _ = create_state(config, seed=0)
    checkpoint.save(state, str(tmp_path), epoch=3)
    (tmp_path / "disc_003.msgpack").unlink()

    fresh, _, _ = create_state(config, seed=1)
    restored, epoch = checkpoint.resume(fresh, str(tmp_path),
                                        require_disc=False)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.gen_params),
                    jax.tree_util.tree_leaves(restored.gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training resume still refuses the half-written dir
    with pytest.raises(FileNotFoundError, match="matching disc checkpoint"):
        checkpoint.resume(fresh, str(tmp_path))


def test_wait_for_saves_timeout_raises(monkeypatch):
    """wait_for_saves(timeout) treats the timeout as a deadline and raises
    when saves are still running — incomplete must not look complete."""
    import threading

    import pose_transfer_tpu.train.checkpoint as cp

    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True)
    t.error = None
    t.start()
    monkeypatch.setattr(cp, "_pending_saves", [t])
    try:
        with pytest.raises(TimeoutError, match="still running"):
            cp.wait_for_saves(timeout=0.2)
    finally:
        release.set()
        t.join()
        cp._pending_saves.clear()


def test_fixed_seed_step_golden():
    """Numeric-drift tripwire: one fixed-seed step reproduces pinned
    metrics (CPU, f32). Loose tolerance absorbs XLA version wiggle; a real
    semantic change in losses/init/data-prep moves these by far more."""
    config = small_config()
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(42)
    mk = lambda: synthetic.synthetic_compact_batch(  # noqa: E731
        rng, 2, IMG, 18, warp_skip="mask")
    fake = {k: v[None] for k, v in mk().items()}
    real = {k: v[None] for k, v in mk().items()}
    _, m, _ = step(state, fake, real, mk())
    np.testing.assert_allclose(
        np.asarray(m["gen"]), [74.523773, 73.384346, 1.139425], rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(m["disc"]), [1.227888, 0.607519, 0.620369], rtol=1e-3)


def test_checkpoint_async_save_matches_blocking(tmp_path):
    """block=False must write byte-identical checkpoints, and the device
    snapshot must survive the next step DONATING the live state buffers."""
    config = small_config()
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc), donate_argnums=(0,))
    rng = np.random.default_rng(0)

    def draw():
        fake, real, gen_b = _draws(rng, config, 3)
        return _stack([fake]), _stack([real]), gen_b

    state, _, _ = step(state, *draw())

    checkpoint.save(state, str(tmp_path / "sync"), epoch=3)
    checkpoint.save(state, str(tmp_path / "async"), epoch=3, block=False)
    # donate the state away while the async fetch may still be in flight
    state, _, _ = step(state, *draw())
    jax.block_until_ready(state)
    checkpoint.wait_for_saves()

    for name in ("gen_003.msgpack", "disc_003.msgpack"):
        a = (tmp_path / "sync" / name).read_bytes()
        b = (tmp_path / "async" / name).read_bytes()
        assert a == b, f"{name} differs between sync and async save"


def test_checkpoint_async_failure_surfaces(tmp_path, monkeypatch):
    """A failed background save must raise from wait_for_saves, not
    silently drop the checkpoint."""
    config = small_config()
    state, gen, disc = create_state(config, seed=0)

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(checkpoint, "_write_state", boom)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        checkpoint.save(state, str(tmp_path), epoch=1, block=False)
        checkpoint.wait_for_saves()
    assert not list(tmp_path.glob("*.msgpack"))


def test_warp_windowed_auto_resolution(monkeypatch):
    """warp_windowed=None resolves by placement availability and batch
    size (CLAUDE.md sweep: with the Pallas placement kernels — TPU +
    warp_place != 'xla' — windowing wins at every batch; with XLA
    placement only at batch >= 16)."""
    import pose_transfer_tpu.train.engine as engine_mod
    from pose_transfer_tpu.train.engine import build_models

    # this suite runs on CPU: kernel placement unavailable -> batch rule
    gen_small, _ = build_models(small_config(batch_size=8))
    gen_big, _ = build_models(small_config(batch_size=16))
    assert gen_small.warp_windowed is False
    assert gen_big.warp_windowed is True
    gen_forced, _ = build_models(small_config(batch_size=8,
                                              warp_windowed=True))
    assert gen_forced.warp_windowed is True

    # on TPU the kernel placement makes windowing win at every batch
    monkeypatch.setattr(engine_mod.jax, "default_backend", lambda: "tpu")
    gen_tpu, _ = build_models(small_config(batch_size=8))
    assert gen_tpu.warp_windowed is True
    gen_tpu_xla, _ = build_models(small_config(batch_size=8,
                                               warp_place="xla"))
    assert gen_tpu_xla.warp_windowed is False
    # the placement kernels only exist for the max fold: with
    # warp_agg='avg' what actually runs is the XLA placement, so the
    # batch >= 16 rule applies even on TPU
    gen_tpu_avg, _ = build_models(small_config(batch_size=8,
                                               warp_agg="avg"))
    assert gen_tpu_avg.warp_windowed is False
    gen_tpu_avg16, _ = build_models(small_config(batch_size=16,
                                                 warp_agg="avg"))
    assert gen_tpu_avg16.warp_windowed is True
    # under a mesh the rule keys off the PER-DEVICE batch (the fold runs
    # per-device via shard_map — ops.warp.fold_mesh)
    gen_mesh_small, _ = build_models(small_config(
        batch_size=32, device_count=4, warp_place="xla"))
    assert gen_mesh_small.warp_windowed is False   # per-dev 8 < 16, no krn
    gen_mesh_big, _ = build_models(small_config(
        batch_size=64, device_count=4, warp_place="xla"))
    assert gen_mesh_big.warp_windowed is True      # per-dev 16
    # CLI string forms
    cfg = GANConfig.from_opt({"image_size": (32, 32), "use_input_pose": 1,
                              "warp_windowed": "auto"})
    assert cfg.warp_windowed is None
    cfg = GANConfig.from_opt({"image_size": (32, 32), "use_input_pose": 1,
                              "warp_windowed": "1"})
    assert cfg.warp_windowed is True


def test_resume_mismatched_epochs_raises(tmp_path):
    """gen_N next to disc_{N-1} (killed mid-save — gen writes first) must
    refuse, not silently pair mismatched epochs."""
    config = small_config()
    state, _, _ = create_state(config, seed=0)
    checkpoint.save(state, str(tmp_path), epoch=4)
    checkpoint.save(state, str(tmp_path), epoch=5)
    (tmp_path / "disc_005.msgpack").unlink()
    with pytest.raises(FileNotFoundError, match="disc_004"):
        checkpoint.resume(state, str(tmp_path))
