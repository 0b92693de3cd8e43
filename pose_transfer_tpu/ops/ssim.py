"""SSIM image-quality metric (Wang et al. 2004).

The reference never implemented a quantitative metric — SSIM/IS are explicit
ToDos in its ``Design Choices.txt`` — but SSIM is the north-star parity
metric for this rebuild (BASELINE.json), so it is a first-class op here.

Standard formulation: 11×11 Gaussian window (σ=1.5), K1=0.01, K2=0.03,
computed per channel and averaged. Runs fully in-graph (depthwise convs →
XLA) so it can be part of a jitted eval step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise valid-mode 2D filter on NHWC input."""
    c = x.shape[-1]
    k = kernel[:, :, None, None].astype(x.dtype)
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with feature_group_count=C
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


@functools.partial(jax.jit, static_argnames=("max_val", "window_size",
                                             "sigma"))
def ssim(img1: jax.Array, img2: jax.Array, max_val: float = 2.0,
         window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM between two NHWC image batches.

    ``max_val`` is the dynamic range — 2.0 for the framework's [-1, 1]
    images, 1.0 for [0, 1], 255 for bytes.
    """
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    kernel = _gaussian_kernel(window_size, sigma)

    mu1 = _filter2d(img1, kernel)
    mu2 = _filter2d(img2, kernel)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter2d(img1 * img2, kernel) - mu12

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
