"""Model zoo: U-Net GAN generators and patch discriminator (flax linen).

TPU-native rebuild of src_deformable/models/networks.py (and the baseline
tree's plain ``Generator``, src_baseline/models/networks.py:238-253). NHWC
layout throughout; params fp32 with configurable compute dtype (bfloat16 on
TPU keeps the k4s2 conv ladders on the MXU at full throughput).

Architecture facts preserved exactly (verified by parameter-count parity
with the reference logs: generator 82 080 611 / discriminator 2 803 782 for
the Fashion-256 config):

- Block (networks.py:142-172): (Leaky)ReLU → k4s2p1 conv (no bias) down, or
  k4s2 VALID transposed conv + crop-1 up → volume instance norm (whole-CHW
  stats, scalar affine — the InstanceNorm3d(1) quirk) → channel dropout.
- Encoder (networks.py:175-202): stage 0 is a full-res k3s1p1 conv (bias),
  then Blocks; the deepest Block has no norm. All stage outputs are skips.
- Decoder (networks.py:204-250): skip-concat ladders, dropout on the first
  3 stages, final ReLU→k3 conv→Tanh.
- DeformableGenerator (networks.py:252-288): dual encoders (appearance on
  [image ‖ source pose], pose on target pose); the appearance skip is warped
  through the affine layer for the first 4 stages only; ``num_skips`` is 2
  for every real flag value ('none'/'full'/'mask') because the reference
  compares against the string 'None' (networks.py:257) — reproduced.
- Discriminator (networks.py:329-357): k4s2 pad-0 conv → Blocks
  64→128→256→512→1 (last no norm) → sigmoid → per-patch probability vector.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import pose as pose_ops
from ..core import transforms_host as th
from ..ops.norm import volume_instance_norm
from ..ops.warp import affine_transform_layer


def encoder_filters_for(image_size: tuple[int, int]) -> tuple[int, ...]:
    """Filter ladder selection (pose_gan.py:17-18)."""
    if max(image_size) < 256:
        return (64, 128, 256, 512, 512, 512)
    return (64, 128, 256, 512, 512, 512, 512)


def decoder_filters_for(image_size: tuple[int, int]) -> tuple[int, ...]:
    if max(image_size) < 256:
        return (512, 512, 512, 256, 128, 3)
    return (512, 512, 512, 512, 256, 128, 3)


_conv_init = nn.initializers.glorot_uniform()


def gaussian_weights_init(params, rng: jax.Array):
    """Re-initialize every conv kernel with N(0, 0.02).

    Rebuild of the reference's ``gaussian_weights_init``
    (src_deformable/models/networks.py:33-42): torch walks modules and
    draws conv/linear weights from N(0, 0.02); biases and the volume
    instance norms keep their defaults (the torch fn only touches
    'BatchNorm2d' norms, and the reference's norms are InstanceNorm3d).
    Here: every rank-4 'kernel' leaf (conv/conv-transpose) is redrawn,
    each from its own fold of ``rng``; everything else passes through.
    Selected via GANConfig.weight_init='gaussian' (the reference exposed
    no flag — pose_gan.py applies xavier — but ships the fn as a
    capability).
    """
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    new = {}
    for i, (path, leaf) in enumerate(leaves):
        is_kernel = any(getattr(p, "key", None) == "kernel" for p in path)
        if is_kernel and getattr(leaf, "ndim", 0) == 4:
            new[jax.tree_util.keystr(path)] = (
                0.02 * jax.random.normal(jax.random.fold_in(rng, i),
                                         leaf.shape, leaf.dtype))

    def replace(path, leaf):
        return new.get(jax.tree_util.keystr(path), leaf)

    return jax.tree_util.tree_map_with_path(replace, params)


class VolumeInstanceNorm(nn.Module):
    """Scalar-affine whole-volume instance norm (see ops/norm.py)."""
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        weight = self.param("scale", nn.initializers.ones, ())
        bias = self.param("bias", nn.initializers.zeros, ())
        return volume_instance_norm(x, weight, bias, self.eps)


def _upconv_impl() -> str:
    """Decoder up-conv implementation: 'dilated' (flax ConvTranspose →
    ``conv_general_dilated`` with lhs_dilation 2, the default everywhere)
    or 'phase' (4 dense k2s1 phase convolutions + channel-to-space
    interleave). Env escape hatch ``PT_UPCONV``; 'auto' = dilated.

    'phase' is a MEASURED DEAD END, kept as the design record (same
    discipline as ops/warp_pallas.py): the hypothesis was that XLA-TPU
    executes the input-dilated conv over k4 windows where 3 of 4 taps per
    dim land on inserted zeros (4× wasted MACs). Measured fashion-256 b32
    bf16 (round 5): **dilated 330.6 img/s/chip, phase 304.3** — the
    dilated path was ALREADY at ~dense-FLOP speed (decoder Block_4's
    dense floor is ~5.6 ms and its traced fwd instance runs ~6.0 ms:
    XLA-TPU specializes lhs_dilation; it does not grind zeros), while the
    phase rewrite re-reads the full input once per phase conv (4× input
    HBM traffic) and pays a full-output interleave copy per stage.
    Hardware numerics parity (f32 1.7e-7, bf16 2.8e-3 rel) verified
    2026-08-20. Both paths share the parameter tree
    (ConvTranspose_0/kernel, (4,4,Cin,Cout)) so checkpoints and init
    streams are interchangeable; the golden-pinned tests run the dilated
    path.
    """
    impl = os.environ.get("PT_UPCONV", "auto")
    if impl == "auto":
        return "dilated"
    return impl


class PhaseConvTranspose(nn.Module):
    """k4s2 transposed conv with padding (2,2) (the reference's VALID +
    Cropping2D(1), networks.py:134-139,154-157) as dense phase convs.

    Derivation: with lhs_dilation 2 and pad (4-1-2)=1 per side, output
    position p = 2q+a (phase a per dim) only receives kernel taps
    k ≡ a (mod 2): y[2q] = w[0]·x[q-1] + w[2]·x[q] and
    y[2q+1] = w[1]·x[q] + w[3]·x[q+1]. So each of the 4 (a, b) output
    phases is a k2s1 conv with kernel w[a::2, b::2] and padding
    ((1-a, a), (1-b, b)), interleaved back as
    y[:, 2q+a, 2r+b] = phase_ab[:, q, r]. Same math, zero wasted MACs.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _conv_init,
                            (4, 4, x.shape[-1], self.features), jnp.float32)
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                phases.append(jax.lax.conv_general_dilated(
                    x, kernel[a::2, b::2], (1, 1),
                    ((1 - a, a), (1 - b, b)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
        n, h, w, c = phases[0].shape
        t = jnp.stack(phases, axis=3).reshape(n, h, w, 2, 2, c)
        return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * h, 2 * w, c)


class Block(nn.Module):
    """The reference's down/up conv block (networks.py:142-172)."""
    features: int
    down: bool = True
    bn: bool = True
    dropout: bool = False
    leaky: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.leaky_relu(x, 0.2) if self.leaky else nn.relu(x)
        if self.down:
            x = nn.Conv(self.features, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype)(x)
        elif _upconv_impl() == "phase":
            # same param path/shape as the ConvTranspose branch →
            # identical init stream and checkpoint layout
            x = PhaseConvTranspose(self.features, dtype=self.dtype,
                                   name="ConvTranspose_0")(x)
        else:
            # reference: ConvTranspose k4s2 VALID then Cropping2D(1)
            # (networks.py:134-139, 154-157). Expressed as explicit padding
            # (2,2) on the dilated input — bit-equal output (pinned in
            # tests/test_models.py), but the crop never materializes as a
            # separate slice copy (~9 ms/step of decoder slice fusions at
            # 256² before this fold).
            x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)), use_bias=False,
                                 kernel_init=_conv_init, dtype=self.dtype)(x)
        if self.bn:
            x = VolumeInstanceNorm()(x)
        if self.dropout:
            # Dropout2d: whole feature channels dropped (p=0.5)
            x = nn.Dropout(0.5, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class Encoder(nn.Module):
    """Shared U-Net encoder; returns every stage output as a skip."""
    nfilters: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        outputs = []
        for i, nf in enumerate(self.nfilters):
            if i == 0:
                x = nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=True, kernel_init=_conv_init,
                            dtype=self.dtype)(x)
            else:
                x = Block(nf, bn=(i != len(self.nfilters) - 1),
                          dtype=self.dtype)(x, train=train)
            outputs.append(x)
        return outputs


class Decoder(nn.Module):
    """U-Net decoder over (possibly fused) skips (networks.py:204-250)."""
    nfilters_dec: Sequence[int]
    nfilters_enc: Sequence[int]
    num_skips: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips, *, train: bool = True):
        out = None
        n = len(self.nfilters_dec)
        for i, nf in enumerate(self.nfilters_dec):
            if i == 0:
                out = Block(nf, down=False, leaky=False, dropout=True,
                            dtype=self.dtype)(skips[-1], train=train)
            elif i < n - 1:
                out = jnp.concatenate([out, skips[-(i + 1)]], axis=-1)
                out = Block(nf, down=False, leaky=False, dropout=(i < 3),
                            dtype=self.dtype)(out, train=train)
            else:
                out = jnp.concatenate([out, skips[-(i + 1)]], axis=-1)
                out = nn.relu(out)
                out = nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                              use_bias=True, kernel_init=_conv_init,
                              dtype=self.dtype)(out)
        return jnp.tanh(out)


class DeformableGenerator(nn.Module):
    """Dual-encoder U-Net with deformable (affine-warped) skips."""
    pose_dim: int
    image_size: tuple[int, int]
    nfilters_enc: Sequence[int]
    nfilters_dec: Sequence[int]
    warp_skip: str = "mask"        # 'none' | 'full' | 'mask'
    warp_agg: str = "max"
    use_input_pose: bool = True
    num_warp_stages: int = 4       # warp only the first 4 skips
    warp_backend: str = "matmul"   # 'matmul' (MXU) | 'exact' (gather)
    warp_windowed: bool = False    # opt-in mask-windowed fold (ops/warp.py)
    warp_place: str = "auto"       # windowed placement: 'auto'|'kernel'|'xla'
    dtype: jnp.dtype = jnp.float32

    @property
    def num_skips(self) -> int:
        # reference string-compare quirk: compares against 'None', and the
        # flag values are lowercase, so this is 2 for every real config
        # (networks.py:257)
        return 1 if self.warp_skip == "None" else 2

    @nn.compact
    def __call__(self, inp, warps, masks, *, train: bool = True):
        inp_img, inp_pose, tg_pose = pose_ops.get_imgpose(
            inp, self.use_input_pose, self.pose_dim)
        inp_app = jnp.concatenate([inp_img, inp_pose], axis=-1) \
            if inp_pose is not None else inp_img

        skips_app = Encoder(self.nfilters_enc, dtype=self.dtype,
                            name="encoder_app")(inp_app, train=train)
        skips_pose = Encoder(self.nfilters_enc, dtype=self.dtype,
                             name="encoder_pose")(tg_pose, train=train)

        # parts whose joint names don't exist in this schema are degenerate
        # for EVERY sample (pose_dim 16: head + 4 knee-adjacent limbs) — the
        # windowed fold skips their contractions statically
        static_empty = th.static_empty_parts(self.pose_dim) \
            if self.warp_skip == "mask" else ()

        skips = []
        for i, (sk_app, sk_pose) in enumerate(zip(skips_app, skips_pose)):
            if i < self.num_warp_stages:
                warped = affine_transform_layer(
                    sk_app, warps, masks, self.image_size,
                    self.warp_skip, self.warp_agg,
                    backend=self.warp_backend,
                    windowed=self.warp_windowed,
                    static_empty=static_empty,
                    place_impl=self.warp_place)
                skips.append(jnp.concatenate([warped, sk_pose], axis=-1))
            else:
                skips.append(jnp.concatenate([sk_app, sk_pose], axis=-1))

        return Decoder(self.nfilters_dec, self.nfilters_enc,
                       num_skips=self.num_skips, dtype=self.dtype,
                       name="decoder")(skips, train=train)


class UNetGenerator(nn.Module):
    """Baseline-tree plain U-Net generator (single encoder, no warping;
    src_baseline/models/networks.py:238-253)."""
    nfilters_enc: Sequence[int]
    nfilters_dec: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp, *, train: bool = True):
        skips = Encoder(self.nfilters_enc, dtype=self.dtype,
                        name="encoder")(inp, train=train)
        return Decoder(self.nfilters_dec, self.nfilters_enc, num_skips=1,
                       dtype=self.dtype, name="decoder")(skips, train=train)


class StackedGenerator(nn.Module):
    """One shared DeformableGenerator applied ``num_stacks`` times along the
    interpolated-pose chain (networks.py:290-327). Stage i consumes the
    previous stage's output image; the chain is sequential by construction.
    """
    pose_dim: int
    image_size: tuple[int, int]
    nfilters_enc: Sequence[int]
    nfilters_dec: Sequence[int]
    num_stacks: int = 4
    warp_skip: str = "mask"
    warp_agg: str = "max"
    use_input_pose: bool = True
    warp_backend: str = "matmul"
    warp_windowed: bool = False
    warp_place: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp, target_pose, target_warps, target_masks,
                 *, train: bool = True):
        """target_pose: (N, H, W, num_stacks*K); target_warps: (N, S, T, 8);
        target_masks: (N, S, T, H, W). Returns list of per-stage outputs."""
        gen = DeformableGenerator(
            self.pose_dim, self.image_size, self.nfilters_enc,
            self.nfilters_dec, self.warp_skip, self.warp_agg,
            self.use_input_pose, warp_backend=self.warp_backend,
            warp_windowed=self.warp_windowed, warp_place=self.warp_place,
            dtype=self.dtype, name="generator")

        init_img, init_pose, _ = pose_ops.get_imgpose(
            inp, self.use_input_pose, self.pose_dim)
        k = self.pose_dim
        outputs = []
        out = None
        for i in range(self.num_stacks):
            stage_tg = target_pose[..., i * k:(i + 1) * k]
            if i == 0:
                parts = [init_img]
                if self.use_input_pose:
                    parts.append(init_pose)
                parts.append(stage_tg)
            else:
                parts = [out]
                if self.use_input_pose:
                    parts.append(target_pose[..., (i - 1) * k:i * k])
                parts.append(stage_tg)
            stage_inp = jnp.concatenate(parts, axis=-1)
            out = gen(stage_inp, target_warps[:, i], target_masks[:, i],
                      train=train)
            outputs.append(out)
        return outputs


class Discriminator(nn.Module):
    """Patch discriminator → flattened per-patch probabilities."""
    check_mode: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                    use_bias=True, kernel_init=_conv_init,
                    dtype=self.dtype)(x)
        x = Block(128, dtype=self.dtype)(x, train=train)
        x = Block(256, dtype=self.dtype)(x, train=train)
        if not self.check_mode:
            x = Block(512, dtype=self.dtype)(x, train=train)
            x = Block(1, bn=False, dtype=self.dtype)(x, train=train)
        else:
            x = Block(1, bn=False, dtype=self.dtype)(x, train=train)
        # probabilities in f32: bf16 sigmoid saturates to exactly 0/1 (bf16
        # resolution near 1 is ~8e-3), which degenerates the log losses
        x = jax.nn.sigmoid(x.astype(jnp.float32))
        return x.reshape(x.shape[0], -1)
