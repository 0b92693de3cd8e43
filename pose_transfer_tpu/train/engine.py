"""The GAN training engine: one jitted two-phase step.

Rebuild of src_deformable/models/pose_gan.py (DeformablePose_GAN) +
the inner loop of main.py:70-115, redesigned for XLA:

- The reference ran ``training_ratio`` eager discriminator updates (each
  drawing TWO fresh batches — a fake-path batch and an independent real
  batch, main.py:81-85) followed by one generator update, with a host→device
  copy and separate CUDA launches per op. Here the whole cadence is ONE
  compiled ``train_step``: disc updates run under ``lax.scan`` over the
  stacked disc draws, then the gen update — all fused with the in-graph
  batch preparation (heatmap + mask rasterization, ``data.device``).
- The reference built a full generator autograd graph in ``dis_update``
  without ever stepping the generator (pose_gan.py:120-129 — no detach;
  wasted memory/compute). Here the generator forward inside the disc phase
  is under ``stop_gradient``, and XLA never materializes its backward.
- Both Adam optimizers are optax (lr 2e-4, β=(0.5, 0.999) —
  pose_gan.py:50-51); loss math and scaling are bit-matched in
  ``train.losses``.

Loss metric layout matches the reference's printout contract:
gen [total, ll, ad] (pose_gan.py:115), disc [total, true, fake]
(pose_gan.py:171).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.device import make_batch_preparer
from ..models import vgg as vgg_mod
from ..models.networks import (
    Block,  # noqa: F401  (re-export convenience)
    DeformableGenerator,
    Discriminator,
    StackedGenerator,
    UNetGenerator,
    decoder_filters_for,
    encoder_filters_for,
    gaussian_weights_init,
)
from ..ops.nn_loss import nn_loss
from . import losses


@dataclasses.dataclass(frozen=True)
class GANConfig:
    """Static training configuration (hashable — jit-safe closure)."""
    image_size: tuple[int, int] = (256, 256)
    pose_dim: int = 18
    batch_size: int = 4
    use_input_pose: bool = True
    warp_skip: str = "mask"
    warp_agg: str = "max"
    gen_type: str = "baseline"
    num_stacks: int = 4
    training_ratio: int = 1
    learning_rate: float = 2e-4
    l1_penalty_weight: float = 100.0
    gan_penalty_weight: float = 1.0
    tv_penalty_weight: float = 0.0
    content_loss_layer: str = "none"
    nn_loss_area_size: int = 1
    warp_backend: str = "matmul"   # 'matmul' (MXU path) | 'exact' (gather)
    # mask-windowed fold (ops/warp.py): None = auto. With the Pallas
    # placement kernels available (TPU + warp_agg max + warp_place !=
    # 'xla') windowing wins at EVERY batch (280-297 vs 236-265 img/s at
    # 256²; 381 vs 346 infer at b8 — sweep in CLAUDE.md), so auto = on.
    # With XLA placement the per-sample dynamic-slice chains only amortize
    # at a PER-DEVICE batch ≥ 16 (257-265 vs 236-242; off below: 253 vs
    # 248). Under a mesh the fold runs per-device on its local batch
    # (jax.shard_map over the data axis — ops.warp.fold_mesh, installed by
    # parallel.make_parallel_*), so the same rules apply per device.
    warp_windowed: bool | None = None
    # windowed-fold placement implementation (ops/warp_fused.py): 'auto' =
    # Pallas placement kernels on TPU, XLA slice/update chains elsewhere
    warp_place: str = "auto"
    device_count: int = 1          # data-parallel width (set by drivers)
    preprocess_mode: str = "correct"   # VGG preprocess ('reference' quirk opt-in)
    weight_init: str = "xavier"    # 'xavier' (pose_gan.py:51-52) | 'gaussian'
    check_mode: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def input_nc(self) -> int:
        """Packed input channels (pose_gan.py:20-23)."""
        k = self.pose_dim
        return 3 + 2 * k if self.use_input_pose else 3 + k

    @property
    def num_warp_transforms(self) -> int:
        return 10 if self.warp_skip == "mask" else 1

    @classmethod
    def from_opt(cls, opt) -> "GANConfig":
        """Build from a parsed reference-style options object/dict."""
        if not isinstance(opt, dict):
            opt = vars(opt)
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in opt.items() if k in fields}
        kwargs["image_size"] = tuple(opt["image_size"])
        kwargs["use_input_pose"] = bool(opt["use_input_pose"])
        if "checkMode" in opt:
            kwargs["check_mode"] = bool(opt["checkMode"])
        ww = kwargs.get("warp_windowed")
        if isinstance(ww, str):  # CLI: 'auto' | '0' | '1'
            kwargs["warp_windowed"] = None if ww == "auto" else ww == "1"
        return cls(**kwargs)


class GANState(struct.PyTreeNode):
    """All mutable training state, one pytree (checkpointable as a unit)."""
    step: jax.Array
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any
    rng: jax.Array
    vgg_params: Any = None


def build_models(config: GANConfig):
    """(generator, discriminator) flax modules for a config."""
    enc = encoder_filters_for(config.image_size)
    dec = decoder_filters_for(config.image_size)
    if config.check_mode:
        # the baseline tree's tiny overfit-smoke model
        # (src_baseline/models/pose_gan.py:19-21)
        enc, dec = enc[:2], (dec[-2], 3)
    common = dict(pose_dim=config.pose_dim, image_size=config.image_size,
                  nfilters_enc=enc, nfilters_dec=dec,
                  warp_skip=config.warp_skip, warp_agg=config.warp_agg,
                  use_input_pose=config.use_input_pose,
                  warp_backend=config.warp_backend,
                  dtype=config.compute_dtype)
    if config.gen_type != "unet":
        windowed = config.warp_windowed
        if windowed is None:
            # the placement kernels only exist for the max fold
            # (ops.warp._use_place_kernel rejects warp_agg != 'max'); for
            # 'avg' the XLA slice/dus placement is what actually runs, and
            # it only amortizes at a PER-DEVICE batch ≥ 16 (sweep in
            # CLAUDE.md). Under a mesh the fold runs per-device via
            # shard_map (ops.warp.fold_mesh, installed by
            # parallel.make_parallel_*), so the rule keys off the
            # per-device batch.
            kernel_place = (config.warp_place != "xla"
                            and config.warp_agg == "max"
                            and jax.default_backend() == "tpu")
            per_dev = config.batch_size // max(config.device_count, 1)
            windowed = kernel_place or per_dev >= 16
        common["warp_windowed"] = windowed
        common["warp_place"] = config.warp_place
    if config.gen_type == "stacked":
        gen = StackedGenerator(num_stacks=config.num_stacks, **common)
    elif config.gen_type == "baseline":
        gen = DeformableGenerator(**common)
    elif config.gen_type == "unet":
        # the baseline tree's plain single-encoder U-Net
        # (src_baseline/models/networks.py:238-253): packed input, plain
        # skip concat, no warping
        gen = UNetGenerator(nfilters_enc=enc, nfilters_dec=dec,
                            dtype=config.compute_dtype)
    else:
        raise ValueError(f"invalid gen_type {config.gen_type!r}")
    disc = Discriminator(check_mode=config.check_mode,
                         dtype=config.compute_dtype)
    return gen, disc


def _example_batch(config: GANConfig):
    """Minimal prepared batch for parameter init."""
    h, w = config.image_size
    n, t = 1, config.num_warp_transforms
    inp = jnp.zeros((n, h, w, config.input_nc), config.compute_dtype)
    warps = jnp.zeros((n, t, 8), config.compute_dtype)
    warps = warps.at[:, :, 0].set(1.0).at[:, :, 4].set(1.0)
    masks = jnp.ones((n, t, h, w), config.compute_dtype) \
        if config.warp_skip == "mask" else None
    if config.gen_type == "stacked":
        s = config.num_stacks
        pose = jnp.zeros((n, h, w, s * config.pose_dim), config.compute_dtype)
        warps = jnp.broadcast_to(warps[:, None], (n, s + 1, t, 8))
        if masks is not None:
            masks = jnp.broadcast_to(masks[:, None], (n, s + 1, t, h, w))
        return inp, (pose, warps, masks)
    if config.gen_type == "unet":
        return inp, ()
    return inp, (warps, masks)


def gen_apply(gen, params, batch: dict, config: GANConfig, *, rngs=None,
              train: bool = True):
    """Generator forward on a prepared batch → (out_gen, stage_outputs)."""
    if config.gen_type == "stacked":
        outputs = gen.apply(params, batch["input"], batch["interpol_pose"],
                            batch["interpol_warps"], batch["interpol_masks"],
                            train=train, rngs=rngs)
        return outputs[-1], outputs
    if config.gen_type == "unet":
        out = gen.apply(params, batch["input"], train=train, rngs=rngs)
        return out, []
    out = gen.apply(params, batch["input"], batch["warps"], batch["masks"],
                    train=train, rngs=rngs)
    return out, []


def disc_input(inp_packed: jax.Array, candidate: jax.Array,
               config: GANConfig) -> jax.Array:
    """[src img ‖ (src pose) ‖ candidate ‖ target pose] (pose_gan.py:84-87).

    The packed input is already [img ‖ (src pose) ‖ target pose]; splice the
    candidate image before the target pose.
    """
    k = config.pose_dim
    split = 3 + k if config.use_input_pose else 3
    return jnp.concatenate(
        [inp_packed[..., :split], candidate.astype(inp_packed.dtype),
         inp_packed[..., split:]], axis=-1)


def create_state(config: GANConfig, seed: int = 0,
                 vgg_params=None) -> tuple[GANState, Any, Any]:
    """Initialize params (Glorot — networks.py:26-31) and both optimizers.

    Returns (state, gen_model, disc_model). When a content loss is
    configured and ``vgg_params`` is None, random VGG filters are used
    (models/vgg.py docstring).
    """
    gen, disc = build_models(config)
    root = jax.random.PRNGKey(seed)
    k_gen, k_disc, k_state = jax.random.split(root, 3)
    inp, gen_args = _example_batch(config)
    gen_params = gen.init({"params": k_gen}, inp, *gen_args, train=False)
    disc_params = disc.init(
        {"params": k_disc},
        jnp.zeros((1, *config.image_size, config.input_nc + 3),
                  config.compute_dtype), train=False)
    if config.weight_init == "gaussian":
        k_ggen, k_gdisc = jax.random.split(jax.random.fold_in(root, 7))
        gen_params = gaussian_weights_init(gen_params, k_ggen)
        disc_params = gaussian_weights_init(disc_params, k_gdisc)
    elif config.weight_init != "xavier":
        raise ValueError(f"invalid weight_init {config.weight_init!r}")
    if config.content_loss_layer != "none" and vgg_params is None:
        vgg_params = vgg_mod.random_vgg19_features(0)
    tx = make_optimizer(config)
    state = GANState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt_state=tx.init(gen_params),
        disc_opt_state=tx.init(disc_params),
        rng=k_state,
        vgg_params=vgg_params,
    )
    return state, gen, disc


def make_optimizer(config: GANConfig) -> optax.GradientTransformation:
    """Adam lr=2e-4, betas=(0.5, 0.999), eps=1e-8 (pose_gan.py:50-51)."""
    return optax.adam(config.learning_rate, b1=0.5, b2=0.999, eps=1e-8)


def reconstruction_loss(out_gen, target, vgg_params, config: GANConfig):
    """L1, or nn_loss over VGG features when a content layer is set
    (pose_gan.py:100-105)."""
    if config.content_loss_layer == "none":
        return losses.l1_loss(out_gen, target)
    layer = vgg_mod.get_layer_ind(config.content_loss_layer)
    f_gen = vgg_mod.extract_features(vgg_params, out_gen, layer,
                                     config.preprocess_mode)
    f_tgt = vgg_mod.extract_features(vgg_params, target, layer,
                                     config.preprocess_mode)
    a = config.nn_loss_area_size
    return nn_loss(f_gen, f_tgt, a, a)


def make_train_step(config: GANConfig, gen, disc, tx=None):
    """Build the fused two-phase train step.

    Signature: ``step(state, disc_fake, disc_real, gen_batch) →
    (state, metrics)`` where ``disc_fake``/``disc_real`` are compact batches
    with a leading ``training_ratio`` axis (two independent draws per disc
    update — main.py:81-85) and ``gen_batch`` is one compact batch.
    Metrics: {'gen': [total, ll, ad], 'disc': [total, true, fake]}.
    """
    tx = tx or make_optimizer(config)
    prepare = make_batch_preparer(
        image_size=config.image_size, pose_dim=config.pose_dim,
        use_input_pose=config.use_input_pose, warp_skip=config.warp_skip,
        gen_type=config.gen_type, num_stacks=config.num_stacks,
        dtype=config.compute_dtype, jit=False)

    def disc_phase(carry, draws):
        disc_params, disc_opt_state, gen_params, rng = carry
        fake_raw, real_raw = draws
        rng, k_gen = jax.random.split(rng)
        fake = prepare(fake_raw)
        real = prepare(real_raw)

        out_gen, _ = gen_apply(gen, gen_params, fake, config,
                               rngs={"dropout": k_gen}, train=True)
        out_gen = jax.lax.stop_gradient(out_gen)

        def loss_fn(dp):
            fake_inp = disc_input(fake["input"], out_gen, config)
            real_inp = disc_input(real["input"], real["target"], config)
            both = jnp.concatenate([real_inp, fake_inp], axis=0)
            res = disc.apply(dp, both, train=True)
            n = config.batch_size
            true_loss, fake_loss = losses.disc_adversarial_loss(
                res[:n], res[n:], config.gan_penalty_weight, n)
            total = true_loss + fake_loss
            return total, (true_loss, fake_loss)

        (total, (t_loss, f_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(disc_params)
        updates, disc_opt_state = tx.update(grads, disc_opt_state,
                                            disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        metrics = jnp.stack([total, t_loss, f_loss]).astype(jnp.float32)
        return (disc_params, disc_opt_state, gen_params, rng), metrics

    def gen_phase(state: GANState, gen_raw):
        batch = prepare(gen_raw)
        rng, k_gen = jax.random.split(state.rng)

        def loss_fn(gp):
            out_gen, stages = gen_apply(gen, gp, batch, config,
                                        rngs={"dropout": k_gen}, train=True)
            d_inp = disc_input(batch["input"], out_gen, config)
            d_out = disc.apply(state.disc_params, d_inp, train=True)
            ad = losses.gen_adversarial_loss(
                d_out, config.gan_penalty_weight, config.batch_size)
            ll = reconstruction_loss(out_gen, batch["target"],
                                     state.vgg_params, config)
            ll = ll * config.l1_penalty_weight
            total = ad + ll
            if config.tv_penalty_weight:
                total = total + config.tv_penalty_weight * \
                    losses.total_variation_loss(out_gen)
            # stacked: surface every stage image (S, N, H, W, 3), the
            # reference's per-stage diagnostic view (networks.py:306-327 +
            # display_stacked, pose_utils.py:258-288); stacking keeps the
            # step's output pytree static
            out = jnp.stack(stages) if stages else out_gen
            return total, (ll, ad, out)

        (total, (ll, ad, out_gen)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.gen_params)
        updates, gen_opt_state = tx.update(grads, state.gen_opt_state,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)
        metrics = jnp.stack([total, ll, ad]).astype(jnp.float32)
        state = state.replace(gen_params=gen_params,
                              gen_opt_state=gen_opt_state, rng=rng,
                              step=state.step + 1)
        return state, metrics, out_gen

    def train_step(state: GANState, disc_fake: dict, disc_real: dict,
                   gen_batch: dict):
        """Returns (state, metrics, out): ``out`` is (N, H, W, 3) for the
        baseline generator, (S, N, H, W, 3) per-stage images for stacked."""
        carry = (state.disc_params, state.disc_opt_state, state.gen_params,
                 state.rng)
        if config.training_ratio == 1:
            # a length-1 scan only adds a while barrier between the disc
            # and gen phases; unrolling it lets XLA schedule/fuse across
            # the whole step (same ops, same numerics — scan of length 1
            # IS one call)
            carry, m = disc_phase(
                carry, jax.tree.map(lambda x: x[0],
                                    (disc_fake, disc_real)))
            disc_metrics = m[None]
        else:
            carry, disc_metrics = jax.lax.scan(disc_phase, carry,
                                               (disc_fake, disc_real))
        disc_params, disc_opt_state, _, rng = carry
        state = state.replace(disc_params=disc_params,
                              disc_opt_state=disc_opt_state, rng=rng)
        state, gen_metrics, out_gen = gen_phase(state, gen_batch)
        metrics = {"gen": gen_metrics,
                   "disc": jnp.mean(disc_metrics, axis=0)}
        return state, metrics, out_gen

    return train_step


def make_eval_step(config: GANConfig, gen):
    """Jitted inference forward on a compact batch → generated images.

    Returns (out, prepared_batch); ``out`` is (N, H, W, 3) for baseline,
    (S, N, H, W, 3) per-stage images for stacked (reference
    networks.py:306-327 returns every stage)."""
    prepare = make_batch_preparer(
        image_size=config.image_size, pose_dim=config.pose_dim,
        use_input_pose=config.use_input_pose, warp_skip=config.warp_skip,
        gen_type=config.gen_type, num_stacks=config.num_stacks,
        dtype=config.compute_dtype, jit=False)

    @jax.jit
    def eval_step(gen_params, batch_raw: dict):
        batch = prepare(batch_raw)
        out, stages = gen_apply(gen, gen_params, batch, config, train=False)
        return (jnp.stack(stages) if stages else out), batch

    return eval_step
