"""Nearest-neighbor reconstruction loss (``--nn_loss_area_size``).

Rebuild of DeformablePose_GAN.nn_loss (src_deformable/models/pose_gan.py:
173-199): per output pixel, the L1 distance (summed over channels) to the
*best-matching* ground-truth pixel within an (nh, nw) neighborhood window,
averaged over all pixels.

The reference materializes all nh·nw shifted views of the padded ground truth
as one (N, C, H, W, nh·nw) tensor — ~25× activation blowup for the
full-config window of 5. Here the min runs as an unrolled accumulator over
shifts, so peak memory stays O(N·H·W·C) and XLA fuses the shift/abs/sum/min
chain into VPU code.

The loss carries a custom VJP (the same argmin-routing design as the warp
fold's, ops/warp.py): plain autodiff through the 25-term ``minimum`` chain
must keep every per-shift residual — 25 (N,H,W) f32 norm maps PLUS the
25 (N,H,W,C) diff tensors whose signs the ``abs`` backward needs, ~3.3 GB
at the flagship point (b16, 256², 64ch block1_conv2 features) — while the
backward only ever reads them through the per-pixel argmin. The custom
forward stores ONE uint8 shift index (1 MB at that point) next to the
inputs, and the backward regenerates sign(pred − ref_k) per shift and
masks it by ``idx == k``: 25 elementwise passes, no stored residuals.
Subgradient at ties: the first shift in scan order wins (strict ``<``
update), matching the chained-``minimum`` primal.

Measured on the flagship recipe (fashion-256 train, bf16, area 5,
``PT_NN_LOSS_VJP=0`` A/B via bench.py, round 5 — full table in
CLAUDE.md): the custom VJP is **+8.4% step throughput at b16** (196.3 vs
181.0 img/s/chip) and **+4.7% at b32** (193.5 vs 184.8). The memory story
is smaller than the naive residual sum suggests: XLA's scheduler
interleaves the per-shift backward with the forward chain, so the
compiled temp reservation only drops 229 MB at b16 / 531 MB at b32
(5 948 vs 6 177 / 10 101 vs 10 631 MB) — both fit either way; the win is
mostly time (fewer full-res residual writes), not fit.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _shifts(nh: int, nw: int):
    return [(i, j) for i in range(nh) for j in range(nw)]


def _pad_gt(ground_truth: jax.Array, nh: int, nw: int) -> jax.Array:
    # NOTE the swapped pad-axis convention (v_pad on the width axis,
    # h_pad on the height axis) — reproduced from the reference
    # (pose_gan.py:174-176) on purpose; with nh == nw (every config the
    # reference ships) it is also immaterial.
    v_pad = nh // 2
    h_pad = nw // 2
    return jnp.pad(ground_truth,
                   ((0, 0), (h_pad, h_pad), (v_pad, v_pad), (0, 0)),
                   constant_values=-10000.0)


def _nn_loss_primal(predicted: jax.Array, ground_truth: jax.Array,
                    nh: int, nw: int) -> jax.Array:
    gt_pad = _pad_gt(ground_truth, nh, nw)
    n, h, w, _ = predicted.shape
    min_norms = None
    for i, j in _shifts(nh, nw):
        ref = gt_pad[:, i:i + h, j:j + w, :]
        norms = jnp.sum(jnp.abs(ref - predicted), axis=-1)
        min_norms = norms if min_norms is None \
            else jnp.minimum(min_norms, norms)
    return jnp.mean(min_norms)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _nn_loss_vjp(predicted: jax.Array, ground_truth: jax.Array,
                 nh: int = 3, nw: int = 3) -> jax.Array:
    return _nn_loss_primal(predicted, ground_truth, nh, nw)


def nn_loss(predicted: jax.Array, ground_truth: jax.Array,
            nh: int = 3, nw: int = 3) -> jax.Array:
    """Min-over-neighborhood L1 between NHWC feature maps.

    ``nh == nw == 1`` degenerates to channel-summed L1 mean, matching the
    reference's default path. ``PT_NN_LOSS_VJP=0`` (read at trace time)
    bypasses the custom VJP and differentiates the chained-``minimum``
    primal with plain autodiff — the A/B lever for measuring what the
    custom VJP buys (step time + residual memory).
    """
    if os.environ.get("PT_NN_LOSS_VJP", "1") == "0":
        return _nn_loss_primal(predicted, ground_truth, nh, nw)
    return _nn_loss_vjp(predicted, ground_truth, nh, nw)


def _nn_loss_fwd(predicted, ground_truth, nh, nw):
    gt_pad = _pad_gt(ground_truth, nh, nw)
    n, h, w, _ = predicted.shape
    min_norms = None
    idx = None
    for k, (i, j) in enumerate(_shifts(nh, nw)):
        ref = gt_pad[:, i:i + h, j:j + w, :]
        norms = jnp.sum(jnp.abs(ref - predicted), axis=-1)
        if min_norms is None:
            min_norms = norms
            idx = jnp.zeros(norms.shape, jnp.uint8)
        else:
            take = norms < min_norms          # strict: first shift wins
            min_norms = jnp.where(take, norms, min_norms)
            idx = jnp.where(take, jnp.asarray(k, jnp.uint8), idx)
    return jnp.mean(min_norms), (predicted, ground_truth, idx)


def _nn_loss_bwd(nh, nw, res, g):
    predicted, ground_truth, idx = res
    gt_pad = _pad_gt(ground_truth, nh, nw)
    n, h, w, c = predicted.shape
    # mean → per-element cotangent; route and accumulate in f32 (bf16
    # sign sums are exact but the tiny g/(N·H·W) scale would round)
    scale = g.astype(jnp.float32) / (n * h * w)
    d_pred = jnp.zeros(predicted.shape, jnp.float32)
    d_gt_pad = jnp.zeros(gt_pad.shape, jnp.float32)
    for k, (i, j) in enumerate(_shifts(nh, nw)):
        ref = gt_pad[:, i:i + h, j:j + w, :]
        m = (idx == k)[..., None]
        # d|ref − pred|/dpred = −sign(ref − pred); sign(0) = 0 matches
        # autodiff's abs rule
        s = jnp.where(m, jnp.sign(ref.astype(jnp.float32)
                                  - predicted.astype(jnp.float32)), 0.0)
        d_pred = d_pred - s
        d_gt_pad = d_gt_pad.at[:, i:i + h, j:j + w, :].add(s)
    v_pad = nh // 2
    h_pad = nw // 2
    d_gt = d_gt_pad[:, h_pad:h_pad + h, v_pad:v_pad + w, :]
    return ((scale * d_pred).astype(predicted.dtype),
            (scale * d_gt).astype(ground_truth.dtype))


_nn_loss_vjp.defvjp(_nn_loss_fwd, _nn_loss_bwd)
