"""Volume instance normalization — the reference's Block norm quirk.

The reference applies ``nn.InstanceNorm3d(1, eps=1e-3, affine=True)`` to the
activation unsqueezed to (N, 1, C, H, W) (src_deformable/models/networks.py:
159, 166-169): statistics are computed over the *whole* (C, H, W) volume per
sample (a layer-norm-like normalization matching keras-contrib
InstanceNormalization with axis=None), and the affine transform is a single
scalar weight/bias pair per layer — NOT per-channel instance norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def volume_instance_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
                         eps: float = 1e-3) -> jax.Array:
    """Normalize an NHWC tensor over (H, W, C) per sample, scalar affine.

    Matches torch ``InstanceNorm3d(1, eps=1e-3, affine=True,
    track_running_stats=False)`` on the (N, 1, C, H, W) view: biased variance,
    eps inside the rsqrt.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # one-pass stats: E[x] and E[x²] are independent reductions over the
    # same input, so XLA fuses them into a single read of x (the centered
    # two-pass form costs an extra full activation read per norm, in both
    # the forward and its VJP). f32 accumulation keeps the cancellation in
    # E[x²]−E[x]² benign at activation scales; clamped at 0 regardless.
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    msq = jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(dtype)
