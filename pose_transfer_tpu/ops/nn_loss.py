"""Nearest-neighbor reconstruction loss (``--nn_loss_area_size``).

Rebuild of DeformablePose_GAN.nn_loss (src_deformable/models/pose_gan.py:
173-199): per output pixel, the L1 distance (summed over channels) to the
*best-matching* ground-truth pixel within an (nh, nw) neighborhood window,
averaged over all pixels.

The reference materializes all nh·nw shifted views of the padded ground truth
as one (N, C, H, W, nh·nw) tensor — ~25× activation blowup for the
full-config window of 5. Here the min runs as a fori_loop accumulator over
shifts, so peak memory stays O(N·H·W·C) and XLA fuses the shift/abs/sum/min
chain into VPU code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nh", "nw"))
def nn_loss(predicted: jax.Array, ground_truth: jax.Array,
            nh: int = 3, nw: int = 3) -> jax.Array:
    """Min-over-neighborhood L1 between NHWC feature maps.

    ``nh == nw == 1`` degenerates to channel-summed L1 mean, matching the
    reference's default path.
    """
    v_pad = nh // 2
    h_pad = nw // 2
    gt_pad = jnp.pad(ground_truth,
                     ((0, 0), (h_pad, h_pad), (v_pad, v_pad), (0, 0)),
                     constant_values=-10000.0)
    n, h, w, _ = predicted.shape

    min_norms = None
    for i in range(nh):
        for j in range(nw):
            ref = gt_pad[:, i:i + h, j:j + w, :]
            norms = jnp.sum(jnp.abs(ref - predicted), axis=-1)
            min_norms = norms if min_norms is None \
                else jnp.minimum(min_norms, norms)
    return jnp.mean(min_norms)
