"""Isolated warp-fold microbenchmark.

Times ``affine_transform_layer`` (the reference's AffineTransformLayer,
pose_transform.py:60-92) at one generator skip stage, outside the full
train step, so fold-variant A/B runs take seconds instead of re-timing the
whole GAN step. Variants: full vs mask-windowed fold, XLA vs Pallas-kernel
placement, forward-only (the no-grad ``emit_idx=False`` path) vs
forward+backward (the custom VJP).

Usage (real TPU; honors the platform timing rules in CLAUDE.md — ≥5
warm-up calls, scalar host fetch data-dependent on the output):

    python tools/bench_fold.py --batch 32 --stage 0 --mode grad \
        --variant kernel --iters 20

Prints one JSON line per requested variant with ms/call.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_shape(image_size, stage):
    from pose_transfer_tpu.models.networks import encoder_filters_for
    enc = encoder_filters_for(image_size)
    h = image_size[0] if stage == 0 else image_size[0] // (2 ** stage)
    w = image_size[1] if stage == 0 else image_size[1] // (2 ** stage)
    return h, w, enc[stage]


def _fold_inputs(batch, image_size, pose_dim, stage, dtype, seed=0):
    """Realistic fold inputs: warps/masks from the synthetic skeleton
    sampler (same geometry distribution the train step sees), random
    features at the requested encoder stage's shape."""
    import jax
    import jax.numpy as jnp

    from pose_transfer_tpu.data.device import masks_from_polys
    from pose_transfer_tpu.data.synthetic import synthetic_compact_batch

    rng = np.random.default_rng(seed)
    raw = synthetic_compact_batch(rng, batch, image_size, pose_dim,
                                  warp_skip="mask")
    h, w, c = _stage_shape(image_size, stage)
    feats = jnp.asarray(rng.standard_normal((batch, h, w, c)), dtype)
    warps = jnp.asarray(raw["warps"])
    masks = masks_from_polys(jnp.asarray(raw["mask_polys"]),
                             jnp.asarray(raw["mask_kinds"]), image_size)
    return jax.device_put((feats, warps, masks.astype(dtype)))


def _time_fn(fn, args, iters, warmup):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    # data-dependent scalar fetch: block_until_ready alone under-reports
    # through the axon tunnel (CLAUDE.md platform rule #2)
    float(jax.numpy.asarray(out).astype("float32").ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.numpy.asarray(out).astype("float32").ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _bench_ramp(args, image_size, dtype, feats, warps, masks):
    """Isolate the banded-weight (ramp) build cost of the windowed joint
    einsums: times (a) the production path (ramps built in-graph, fused
    into the dots by XLA), (b) the same dots fed PRECOMPUTED weight
    tensors (pure-MXU floor + weight HBM reads), (c) the weight build
    alone. (a) − (b) ≈ what the fused VPU ramp generation stalls the MXU;
    if (b) ≫ (c)+dots the weights are materializing instead of fusing.

    MEASURED (2026-08-19, v5e, b32 stage 0, bf16, probe_batch 4):
    fused 0.642 ms/sample vs precomputed-weights dots 0.906 + build
    0.745 — the PRODUCTION fused path BEATS the 'pure MXU floor' leg
    because the materialized weights' HBM reads (0.22 GB/sample) cost
    more than the in-fusion VPU ramp build. VERDICT r3 next #2's
    'build ramps once and reuse' candidate is therefore a measured
    regression, not a win; the ramp build is already free relative to
    the banded dots' memory traffic."""
    import jax
    import jax.numpy as jnp

    from pose_transfer_tpu.ops import warp as W
    from pose_transfer_tpu.ops.warp_fused import X_ALIGN

    h, w, c = feats.shape[1:]
    s_y, s_x = W._kernel_window_sizes(h, w)
    masks_r = W.resize_bilinear(masks.astype(feats.dtype), (h, w))
    y0, x0, _, _ = jax.jit(lambda m: W._support_windows(m, s_y, s_x,
                                                        X_ALIGN))(masks_r)
    t = warps.shape[1]
    sel = list(range(1, t))
    wp, yy, xx = warps[:, sel], y0[:, sel], x0[:, sel]

    fused = jax.jit(lambda f, wpp, yyy, xxx: W._warp_batch_win_joint(
        f, wpp, yyy, xxx, s_y, s_x, image_size).sum())
    ms_fused = _time_fn(fused, (feats, wp, yy, xx), args.iters, args.warmup)
    print(json.dumps({"experiment": "ramp", "leg": "fused",
                      "batch": int(feats.shape[0]),
                      "ms_fused": round(ms_fused, 3)}), flush=True)

    # the precomputed-weight legs MATERIALIZE wy/wx — (N·P)·(W·S_y·H +
    # S_y·S_x·W) elements, 7.5 GB at 256²/b32 (OOMs a 16 GB chip next to
    # the feature stacks). Probe at the largest batch whose weights stay
    # under ~4 GB and report the probe batch; ms/sample scales linearly
    # (independent per-(n,p) work), so the fused-vs-floor comparison
    # normalizes per sample.
    per_sample_gb = (wp.shape[1] * (w * s_y * h + s_y * s_x * w)
                     * jnp.dtype(dtype).itemsize) / 2**30
    # cap ~1.5 GB: the weight BUILD transits f32 (2× the bf16 result) and
    # the probe rig holds result + features simultaneously — 3.7 GB of
    # weights OOM'd a 16 GB chip next to them (measured)
    nb = feats.shape[0]
    while nb > 1 and nb * per_sample_gb > 1.5:
        nb //= 2
    fp, wpp, yyp, xxp = feats[:nb], wp[:nb], yy[:nb], xx[:nb]

    def weights_all(wpp, yyy, xxx):
        def one(tr, yv, xv):
            return W._two_pass_weights(tr, h, w, image_size, dtype,
                                       y0=yv, x0=xv, s_y=s_y, s_x=s_x)
        return jax.vmap(jax.vmap(one))(wpp, yyy, xxx)

    jw = jax.jit(weights_all)
    wy, wx = jax.block_until_ready(jw(wpp, yyp, xxp))
    ms_weights = _time_fn(lambda *a: jw(*a)[0], (wpp, yyp, xxp),
                          args.iters, args.warmup)

    def dots(wyv, wxv, f):
        tmp = jnp.einsum("npxoy,nyxc->npoxc", wyv, f,
                         preferred_element_type=f.dtype)
        return jnp.einsum("npoax,npoxc->npoac", wxv, tmp,
                          preferred_element_type=f.dtype).sum()

    ms_dots = _time_fn(jax.jit(dots), (wy, wx, fp),
                       args.iters, args.warmup)
    gb = (wy.size + wx.size) * wy.dtype.itemsize / 2**30
    print(json.dumps({
        "experiment": "ramp", "batch": int(feats.shape[0]),
        "probe_batch": int(nb),
        "shape": [int(h), int(w), int(c)], "window": [s_y, s_x],
        "ms_fused": round(ms_fused, 3),
        "ms_dots_precomputed_weights": round(ms_dots, 3),
        "ms_weight_build": round(ms_weights, 3),
        "ms_fused_per_sample": round(ms_fused / feats.shape[0], 4),
        "ms_dots_per_sample": round(ms_dots / nb, 4),
        "ms_weight_build_per_sample": round(ms_weights / nb, 4),
        "weights_gb": round(gb, 3),
        "backend": jax.default_backend(),
    }))


def _bench_joint(args, image_size, dtype, feats, warps, masks):
    """A/B the joint windowed einsum pair's INTERMEDIATE layout. The
    round-3 trace shows a ~4 ms full-stack transpose copy between pass 1
    and pass 2 at b32 stage 0 (vmap(pxoy,yxc->poxc)/transpose): pass 1's
    natural dot output order is (x,p,o,c) (x is the batch dim) but pass 2
    consumes (p,o) as batch dims. Variants ask for different tmp orders so
    XLA's layout assignment can skip the copy; all are the same math.

    MEASURED (2026-08-19, v5e, b32 stage 0 fwd, bf16): poxc (prod)
    20.47 ms, xpoc 20.86, pxoc 20.43, opxc 20.44 — all within noise.
    XLA's layout assignment picks the same physical plan regardless of
    the requested einsum output order; the inter-pass copy is NOT
    removable at the einsum-spec level. (The structural fix is to not
    materialize the pass boundary at all — see ops/warp_fused.py.)"""
    import jax
    import jax.numpy as jnp

    from pose_transfer_tpu.ops import warp as W
    from pose_transfer_tpu.ops.warp_fused import X_ALIGN

    h, w, c = feats.shape[1:]
    s_y, s_x = W._kernel_window_sizes(h, w)
    masks_r = W.resize_bilinear(masks.astype(feats.dtype), (h, w))
    y0, x0, _, _ = jax.jit(lambda m: W._support_windows(m, s_y, s_x,
                                                        X_ALIGN))(masks_r)
    t = warps.shape[1]
    sel = list(range(1, t))
    wp, yy, xx = warps[:, sel], y0[:, sel], x0[:, sel]

    def variant(p1, p2):
        def one(f, trs, yys, xxs):
            def weights(tr, yv, xv):
                return W._two_pass_weights(tr, h, w, image_size, f.dtype,
                                           y0=yv, x0=xv, s_y=s_y, s_x=s_x)
            wy, wx = jax.vmap(weights)(trs, yys, xxs)
            tmp = jnp.einsum(p1, wy, f, preferred_element_type=f.dtype)
            return jnp.einsum(p2, wx, tmp, preferred_element_type=f.dtype)
        return jax.jit(lambda f, wpp, yyy, xxx: jax.vmap(one)(
            f, wpp, yyy, xxx).sum())

    variants = {
        "poxc (prod)": ("pxoy,yxc->poxc", "poax,poxc->poac"),
        "xpoc": ("pxoy,yxc->xpoc", "poax,xpoc->poac"),
        "pxoc": ("pxoy,yxc->pxoc", "poax,pxoc->poac"),
        "opxc": ("pxoy,yxc->opxc", "poax,opxc->poac"),
    }
    for name, (p1, p2) in variants.items():
        fn = variant(p1, p2)
        ms = _time_fn(fn, (feats, wp, yy, xx), args.iters, args.warmup)
        print(json.dumps({"experiment": "joint", "variant": name,
                          "batch": int(feats.shape[0]),
                          "ms": round(ms, 3)}), flush=True)


def _bench_joint_bwd(args, image_size, dtype, feats, warps, masks):
    """Same layout A/B for the backward joint pair
    (``_warp_batch_t_win_joint``): pass 1 'poax,poac->poxc' is natural
    (batch (p,o)), but pass 2 'pxoy,poxc->yxc' batches over x — so the
    rhs needs (x,...) leading AND the asked-for output yxc is a transpose
    of the natural (x,y,c). Variants move the transposes around / emit
    xyc and transpose outside (where the consumer add may fuse it).

    MEASURED (2026-08-19, v5e, b32 stage 0, bf16): poxc/yxc (prod)
    15.43 ms, xpoc/yxc 16.82, poxc/xyc+T 15.34, xpoc/xyc+T 15.35 —
    the production spec is already optimal (xyc+T within noise). Same
    conclusion as the forward A/B: XLA's layout assignment is invariant
    to the einsum-spec order; the inter-pass copies are structural."""
    import jax
    import jax.numpy as jnp

    from pose_transfer_tpu.ops import warp as W
    from pose_transfer_tpu.ops.warp_fused import X_ALIGN

    h, w, c = feats.shape[1:]
    s_y, s_x = W._kernel_window_sizes(h, w)
    masks_r = W.resize_bilinear(masks.astype(feats.dtype), (h, w))
    y0, x0, _, _ = jax.jit(lambda m: W._support_windows(m, s_y, s_x,
                                                        X_ALIGN))(masks_r)
    t = warps.shape[1]
    sel = list(range(1, t))
    wp, yy, xx = warps[:, sel], y0[:, sel], x0[:, sel]
    import numpy as np
    rng = np.random.default_rng(1)
    g = jax.device_put(jnp.asarray(rng.standard_normal(
        (feats.shape[0], len(sel), s_y, s_x, c)), dtype))

    def variant(p1, p2, out_t):
        def one(gms, trs, yys, xxs):
            def weights(tr, yv, xv):
                return W._two_pass_weights(tr, h, w, image_size, gms.dtype,
                                           y0=yv, x0=xv, s_y=s_y, s_x=s_x)
            wy, wx = jax.vmap(weights)(trs, yys, xxs)
            dtmp = jnp.einsum(p1, wx, gms, preferred_element_type=gms.dtype)
            df = jnp.einsum(p2, wy, dtmp,
                            preferred_element_type=jnp.float32)
            return df.transpose(1, 0, 2) if out_t else df
        return jax.jit(lambda gg, wpp, yyy, xxx: jax.vmap(one)(
            gg, wpp, yyy, xxx).sum())

    variants = {
        "poxc/yxc (prod)": ("poax,poac->poxc", "pxoy,poxc->yxc", False),
        "xpoc/yxc": ("poax,poac->xpoc", "pxoy,xpoc->yxc", False),
        "poxc/xyc+T": ("poax,poac->poxc", "pxoy,poxc->xyc", True),
        "xpoc/xyc+T": ("poax,poac->xpoc", "pxoy,xpoc->xyc", True),
    }
    for name, (p1, p2, out_t) in variants.items():
        fn = variant(p1, p2, out_t)
        ms = _time_fn(fn, (g, wp, yy, xx), args.iters, args.warmup)
        print(json.dumps({"experiment": "joint_bwd", "variant": name,
                          "batch": int(feats.shape[0]),
                          "ms": round(ms, 3)}), flush=True)


def _bench_partstream(args, image_size, dtype, feats, warps, masks):
    """Measure VERDICT r3 next #5's suggested structure: stream part
    GROUPS of the joint einsum output through the placement kernel
    (``warp_fused.fold_place_stream`` under ``lax.scan``, fold state
    donated between groups) so the whole (N, P, S_y, S_x, C) wins stack
    never lives in HBM — versus the production monolithic kernel.

    The bandwidth arithmetic predicts the stream loses: the wins tensor
    already makes exactly ONE HBM round trip (einsum writes it once, the
    kernel reads it once — aliasing cannot remove a producer/consumer
    materialization across a custom-call boundary), so part-streaming
    only reduces *residency*, at the price of (groups − 1) extra
    out+idx state round trips (2 × 2 × N·H·W·C·itemsize per extra
    group) plus un-fusing the body init and zero pass from the kernel.
    Residency is already bounded for free by batch chunking
    (``ops.warp._place_batch_chunk``), which adds NO traffic. This rig
    measures both legs' wall clock and compiled high-water marks
    (``memory_analysis``) so the verdict is recorded, not argued.

    Both legs run PRIMAL-ONLY (emit_idx=False): the idx-carrying stream
    needs four full-res state windows in VMEM and Mosaic refuses the
    256²/C=64 shape outright (see ``warp_fused._place_stream_kernel``),
    so the training variant of the stream is not even compilable at the
    shape the wins-stack concern is about — itself a recorded verdict.

    MEASURED (v5e, b32, stage 0, bf16, 2026-08-20; bit-exact outputs):
      prod_monolithic  36.5-37.6 ms   temp_hbm 6.16 GB
      partstream_g3    43.4 ms (+18%) temp_hbm 2.89 GB
      partstream_g9    39.2 ms (+7.5%) temp_hbm 0.82 GB
    The stream cuts compiled high-water residency up to 7.5× but always
    loses wall clock — exactly the extra-state-traffic prediction — and
    the idx-carrying variant training would need does not fit VMEM at
    all. Verdict: measured dead end for throughput; the monolithic
    kernel + batch chunking stay. (Worth revisiting only if a
    memory-constrained deployment needs the residency cut and accepts
    the ~8% fold tax — the machinery is here and parity-tested.)"""
    import jax
    import jax.numpy as jnp

    from pose_transfer_tpu.ops import warp as W
    from pose_transfer_tpu.ops import warp_fused as WF

    n = feats.shape[0]
    h, w, c = feats.shape[1:]
    s_y, s_x = W._kernel_window_sizes(h, w)
    masks_r = jax.jit(lambda m: W.resize_bilinear(
        m.astype(dtype), (h, w)))(masks)
    y0, x0, _, _ = jax.jit(lambda m: W._support_windows(
        m, s_y, s_x, WF.X_ALIGN))(masks_r)
    t = warps.shape[1]
    actives = W._place_actives(t, ())
    sel = list(actives)
    p = len(sel)
    g = args.groups
    assert p % g == 0, f"groups {g} must divide parts {p}"
    pg = p // g

    mwins = jax.jit(lambda mr, yy, xx: jnp.stack(
        [W._slice_win(mr[:, i], yy[:, i], xx[:, i], s_y, s_x)
         for i in sel], axis=1))(masks_r, y0, x0)
    offs = W._place_offs(y0, x0, actives)
    zero_nb = (masks_r[:, 1:] == 0).any(axis=1).astype(dtype)
    interpret = jax.default_backend() != "tpu"

    def _body(f, wp, mr):
        return W._warp_batch(f, wp[:, 0], image_size) * mr[:, 0][..., None]

    def prod(f, wp, mr, yy, xx, mw, off, znb):
        body = _body(f, wp, mr)
        wins = W._warp_batch_win_joint(f, wp[:, sel], yy[:, sel],
                                       xx[:, sel], s_y, s_x, image_size)
        out, _ = WF.fold_place(body, wins, mw, znb, off, interpret, False)
        return out

    def stream(f, wp, mr, yy, xx, mw, off, znb):
        body = _body(f, wp, mr)

        def grp(a):  # (n, p, ...) -> (g, n, pg, ...) scan xs
            return a.reshape(n, g, pg, *a.shape[2:]).swapaxes(0, 1)

        xs = (grp(wp[:, sel]), grp(yy[:, sel]), grp(xx[:, sel]),
              grp(mw), grp(off))

        def step(acc, x):
            wpg, yyg, xxg, mwg, offg = x
            wins = W._warp_batch_win_joint(f, wpg, yyg, xxg, s_y, s_x,
                                           image_size)
            out, _ = WF.fold_place_stream(acc, None, wins, mwg, offg,
                                          interpret)
            return out, None

        acc, _ = jax.lax.scan(step, body, xs)
        # the zero-contribution pass the monolithic kernel fuses
        take0 = (znb > 0)[..., None] & (acc < 0)
        return jnp.where(take0, jnp.zeros((), acc.dtype), acc)

    inputs = (feats, warps, masks_r, y0, x0, mwins, offs, zero_nb)
    legs = {"prod_monolithic": prod, f"partstream_g{g}": stream}
    outs = {}
    for name, fn in legs.items():
        jf = jax.jit(fn)
        try:
            ma = jf.lower(*inputs).compile().memory_analysis()
            temp_gb = round(ma.temp_size_in_bytes / 2**30, 3)
        except Exception:
            temp_gb = None
        outs[name] = np.asarray(jax.block_until_ready(jf(*inputs)))
        ms = _time_fn(lambda *a, _f=jf: _f(*a).sum(), inputs,
                      args.iters, args.warmup)
        print(json.dumps({
            "experiment": "partstream", "leg": name,
            "batch": n, "shape": [int(h), int(w), int(c)],
            "groups": g if "stream" in name else 1,
            "ms": round(ms, 3), "temp_hbm_gb": temp_gb,
            "backend": jax.default_backend()}), flush=True)
    a, b = outs.values()
    # bit-exactness holds for the kernel itself (verified: identical wins
    # input → identical output, tests/test_warp_place.py); any residual
    # diff here is the per-GROUP einsum's different contraction blocking
    # (different f32 accumulation order → different bf16 rounding), the
    # same reason PT_WARP_JOINT_GROUP is tolerance-tested.
    print(json.dumps({
        "experiment": "partstream",
        "bitexact": bool(np.array_equal(a, b)),
        "max_abs_diff": float(np.abs(a.astype(np.float32)
                                     - b.astype(np.float32)).max())}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--pose_dim", type=int, default=18)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stage", type=int, default=0,
                    help="encoder skip stage (0 = full resolution)")
    ap.add_argument("--mode", choices=("fwd", "grad"), default="grad")
    ap.add_argument("--variant", default="kernel",
                    help="comma list of: full, xla, kernel")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--groups", type=int, default=3,
                    help="part groups for --experiment partstream")
    ap.add_argument("--experiment", default=None,
                    choices=(None, "ramp", "joint", "joint_bwd",
                             "partstream"),
                    help="'ramp': isolate the weight-build cost of the "
                         "windowed joint einsums instead of timing folds; "
                         "'joint': A/B the joint einsums' intermediate "
                         "layout (the inter-pass transpose copy)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides a shell-level JAX_PLATFORMS=cpu)")
    args = ap.parse_args()
    if args.cpu:
        # the TPU plugin forces jax_platforms programmatically at
        # interpreter start; the env var alone is not enough (conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pose_transfer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pose_transfer_tpu.core.transforms_host import static_empty_parts
    from pose_transfer_tpu.ops.warp import affine_transform_layer

    image_size = (args.image_size, args.image_size)
    dtype = jnp.dtype(args.dtype)
    feats, warps, masks = _fold_inputs(args.batch, image_size,
                                       args.pose_dim, args.stage, dtype)
    if args.experiment == "ramp":
        _bench_ramp(args, image_size, dtype, feats, warps, masks)
        return
    if args.experiment == "joint":
        _bench_joint(args, image_size, dtype, feats, warps, masks)
        return
    if args.experiment == "joint_bwd":
        _bench_joint_bwd(args, image_size, dtype, feats, warps, masks)
        return
    if args.experiment == "partstream":
        _bench_partstream(args, image_size, dtype, feats, warps, masks)
        return
    static_empty = static_empty_parts(args.pose_dim)

    for variant in args.variant.split(","):
        windowed = variant != "full"
        place = {"full": "auto", "xla": "xla", "kernel": "kernel"}[variant]

        def fold(f, wp, mk):
            return affine_transform_layer(
                f, wp, mk, image_size, "mask", "max", backend="matmul",
                windowed=windowed, static_empty=static_empty,
                place_impl=place)

        if args.mode == "fwd":
            fn = jax.jit(lambda f, wp, mk: fold(f, wp, mk).sum())
        else:
            # fwd+bwd wrt features — what the gen-phase fold costs
            fn = jax.jit(jax.grad(lambda f, wp, mk: fold(f, wp, mk).sum()))
        ms = _time_fn(fn, (feats, warps, masks), args.iters, args.warmup)
        h, w, c = _stage_shape(image_size, args.stage)
        print(json.dumps({
            "variant": variant, "mode": args.mode, "ms_per_call": round(ms, 3),
            "batch": args.batch, "stage": args.stage,
            "shape": [h, w, c], "dtype": str(dtype),
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
