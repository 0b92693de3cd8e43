"""Piecewise TPU timing of the train step: find the non-conv bottlenecks.

Usage: python tools/profile_step.py [--dtype bfloat16|float32] [--hw 256]
Times (after warmup, blocking): batch prep (heatmaps+masks), warp layer per
stage size, gen forward, gen fwd+bwd, disc fwd, full train step. Also checks
loss finiteness at each dtype.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def _force(out):
    """Materialize a scalar on host — block_until_ready can return early
    through the axon tunnel; a scalar fetch that data-depends on the output
    forces completion without paying a big-array transfer."""
    import jax.numpy as jnp
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)).ravel()[0] if leaf.ndim
          else leaf.astype(jnp.float32))


def timeit(fn, *args, n=20, warm=5, **kw):
    # ≥5 warm-up calls: the first dispatches after compile carry ~50 ms of
    # tunnel warm-up; with n=5 and one warm-up every op looked ~5 ms slower
    for _ in range(warm):
        out = fn(*args, **kw)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _force(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    hw = (args.hw, args.hw)

    from pose_transfer_tpu.data.device import make_batch_preparer
    from pose_transfer_tpu.data.synthetic import synthetic_compact_batch
    from pose_transfer_tpu.ops.warp import affine_transform_layer
    from pose_transfer_tpu.train.engine import (
        GANConfig, create_state, disc_input, gen_apply, make_train_step)

    config = GANConfig(image_size=hw, pose_dim=18, batch_size=args.batch,
                       warp_skip="mask", compute_dtype=dtype)
    rng = np.random.default_rng(0)
    raw = synthetic_compact_batch(rng, args.batch, hw, 18, warp_skip="mask")
    raw = jax.device_put(raw)

    prepare = make_batch_preparer(image_size=hw, pose_dim=18,
                                  warp_skip="mask", dtype=dtype)
    print(f"prep:          {timeit(prepare, raw)*1e3:8.2f} ms")
    batch = jax.device_put(prepare(raw))

    n = args.batch
    for c, s in [(64, args.hw), (128, args.hw // 2), (256, args.hw // 4),
                 (512, args.hw // 8)]:
        feat = jnp.zeros((n, s, s, c), dtype)
        t = timeit(affine_transform_layer, feat, batch["warps"],
                   batch["masks"], hw, "mask")
        tp = timeit(affine_transform_layer, feat, batch["warps"],
                    batch["masks"], hw, "mask", backend="pallas")
        print(f"warp {c:4d}ch @{s:3d}: {t*1e3:8.2f} ms | pallas "
              f"{tp*1e3:8.2f} ms", flush=True)

    state, gen, disc = create_state(config, seed=0)

    fwd = jax.jit(lambda p, b: gen_apply(gen, p, b, config, train=False)[0])
    print(f"gen fwd:       {timeit(fwd, state.gen_params, batch)*1e3:8.2f} ms",
          flush=True)

    # bisect: same U-Net without any warping (plain skip concat)
    import dataclasses
    cfg_nw = dataclasses.replace(config, warp_skip="full")
    raw_nw = synthetic_compact_batch(rng, args.batch, hw, 18,
                                     warp_skip="full")
    batch_nw = jax.device_put(make_batch_preparer(
        image_size=hw, pose_dim=18, warp_skip="full", dtype=dtype)(raw_nw))
    state_nw, gen_nw, _ = create_state(cfg_nw, seed=0)
    fwd_nw = jax.jit(
        lambda p, b: gen_apply(gen_nw, p, b, cfg_nw, train=False)[0])
    print(f"gen fwd T=1:   "
          f"{timeit(fwd_nw, state_nw.gen_params, batch_nw)*1e3:8.2f} ms",
          flush=True)

    def loss_nw(p, b):
        out, _ = gen_apply(gen_nw, p, b, cfg_nw, train=False)
        return jnp.mean(jnp.abs(out - b["target"])).astype(jnp.float32)

    grad_nw = jax.jit(jax.grad(loss_nw))
    print(f"gen f+b T=1:   "
          f"{timeit(grad_nw, state_nw.gen_params, batch_nw)*1e3:8.2f} ms",
          flush=True)

    def loss_fn(p, b):
        out, _ = gen_apply(gen, p, b, config, train=False)
        return jnp.mean(jnp.abs(out - b["target"])).astype(jnp.float32)

    grad = jax.jit(jax.grad(loss_fn))
    print(f"gen fwd+bwd:   {timeit(grad, state.gen_params, batch)*1e3:8.2f} ms")

    dfwd = jax.jit(lambda p, b, img: disc.apply(
        p, disc_input(b["input"], img, config), train=False))
    img = batch["target"]
    print(f"disc fwd:      {timeit(dfwd, state.disc_params, batch, img)*1e3:8.2f} ms")

    step = jax.jit(make_train_step(config, gen, disc))
    fake = {k: v[None] for k, v in raw.items()}
    st, m, _ = step(state, fake, fake, raw)
    jax.block_until_ready(st)
    print("metrics gen:", np.asarray(m["gen"]), "disc:",
          np.asarray(m["disc"]))

    def run(s):
        s2, m2, _ = step(s, fake, fake, raw)
        return s2

    print(f"full step:     {timeit(run, st, n=15)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
