"""Benchmark: fused GAN train-step throughput on the flagship config.

Measures steady-state images/sec/chip for the **full deformable Fashion-256
training step** (warp_skip=mask, the reference's headline config) — one
compiled program containing: in-graph heatmap + mask rasterization,
``training_ratio`` discriminator updates (2 batches each) and one generator
update. Images/sec counts every image consumed per step
(``batch · (2·ratio + 1)``), the same accounting a wall-clock-per-epoch
measurement of the reference would give.

A default (driver) run also times the h36m configuration (224², pose_dim
16 — the reference's second dataset, src_deformable/commands:19-24) and
generator inference (the serving path), embedding them as ``"h36m"`` /
``"infer"`` fields of the same JSON line, so all three headline numbers
are recorded round-over-round. Any ``BENCH_*`` override (an A/B run)
skips the secondary measurements.

The reference records no throughput numbers anywhere (BASELINE.md), so
``vs_baseline`` is reported against the previous round's own measurement
(``BENCH_PREV.json`` — rolled forward each round — matched by metric
name; 1.0 when no same-metric prior exists).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# measured throughput-optimal batch per dataset/mode on v5e with the
# kernel-placed windowed fold (round-5 sweeps in CLAUDE.md; the fashion
# infer curve 405.0 / 428.5 / 427.7 / 428.3 / 434.1 / 416.7 at b8-b64
# peaks at b48; h36m infer 655.3 / 660.8 / 664.5 at b16/32/48 also
# peaks at b48)
_DATASETS = {
    "fashion": dict(image_size=(256, 256), pose_dim=18, train_batch=32,
                    infer_batch=48),
    "h36m": dict(image_size=(224, 224), pose_dim=16, train_batch=48,
                 infer_batch=48),
}


def _preflight_tunnel() -> None:
    """Fail fast (seconds, not the plugin's ~10 min) when the dev
    environment's axon tunnel is down. Only applies when the axon plugin
    is configured against a loopback pool (the tunneled dev setup) — on a
    real TPU VM there is no tunnel and this is a no-op."""
    ip = os.environ.get("PALLAS_AXON_POOL_IPS", "")
    if "axon" not in os.environ.get("JAX_PLATFORMS", "") \
            or not ip.startswith("127."):
        return
    import socket
    s = socket.socket()
    s.settimeout(5)
    try:
        s.connect((ip, 8083))
    except OSError as e:
        raise SystemExit(
            f"bench.py: axon tunnel {ip}:8083 unreachable ({e}) — "
            f"TPU backend cannot initialize; aborting before the "
            f"plugin's long claim timeout") from e
    finally:
        s.close()


def _make_config(dataset: str, mode: str, batch: int | None = None):
    import jax.numpy as jnp

    from pose_transfer_tpu.train.engine import GANConfig

    spec = _DATASETS[dataset]
    if batch is None:
        batch = spec["train_batch" if mode == "train" else "infer_batch"]
    ww = os.environ.get("BENCH_WINDOWED", "auto")
    windowed = None if ww == "auto" else ww != "0"
    # BENCH_CONTENT=block1_conv2 times the FULL flagship recipe (VGG
    # content loss + nn_loss area 5 + l1_w 1.0 — src_deformable/commands:9)
    # instead of the default L1 deformable config; an A/B override like
    # BENCH_BATCH (skips the secondary measurements).
    content = os.environ.get("BENCH_CONTENT", "none")
    extra = {}
    if content != "none":
        extra = dict(content_loss_layer=content, nn_loss_area_size=5,
                     l1_penalty_weight=1.0)
    return GANConfig(image_size=spec["image_size"],
                     pose_dim=spec["pose_dim"], batch_size=batch,
                     warp_skip="mask", gen_type="baseline",
                     training_ratio=1, compute_dtype=jnp.bfloat16,
                     warp_windowed=windowed,
                     warp_place=os.environ.get("BENCH_PLACE", "auto"),
                     **extra)


def _step_flops(step, *args) -> float | None:
    """XLA's own FLOP count for the compiled step (executed FLOPs — the
    fold's dense banded contractions count at face value). None when the
    backend doesn't report it."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: per-device list
            ca = ca[0]
        flops = float(ca["flops"])
        return flops if flops > 0 else None
    except Exception:
        return None


def _step_mem(step, *args) -> dict | None:
    """XLA's compile-time memory analysis (BENCH_MEM=1): the A/B lever for
    memory-motivated rewrites (e.g. the nn_loss custom VJP's autodiff
    residuals). ``temp_mb`` is the transient working set the executable
    reserves beyond arguments/outputs."""
    if os.environ.get("BENCH_MEM", "0") != "1":
        return None
    try:
        ma = step.lower(*args).compile().memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        return {"temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                "output_mb": round(ma.output_size_in_bytes / 2**20, 1)}
    except Exception:
        return None


def _bench_train(config, iters: int) -> tuple[float, float | None, float]:
    import jax

    from pose_transfer_tpu.data.synthetic import synthetic_compact_batch
    from pose_transfer_tpu.train.engine import create_state, make_train_step

    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    mk = lambda: synthetic_compact_batch(  # noqa: E731
        rng, config.batch_size, config.image_size, config.pose_dim,
        warp_skip=config.warp_skip)
    fake = jax.device_put({k: v[None] for k, v in mk().items()})
    real = jax.device_put({k: v[None] for k, v in mk().items()})
    gen_batch = jax.device_put(mk())

    # before the first call: the state is donated, so its buffers are gone
    # once the step runs
    flops = _step_flops(step, state, fake, real, gen_batch)
    _bench_train.last_mem = _step_mem(step, state, fake, real, gen_batch)

    # warmup / compile (block on the full state: on some platforms blocking
    # on one output does not force the whole donated-state chain)
    state, metrics, _ = step(state, fake, real, gen_batch)
    jax.block_until_ready(state)
    gen_m = np.asarray(metrics["gen"])
    assert np.isfinite(gen_m).all(), f"non-finite losses: {gen_m}"

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics, _ = step(state, fake, real, gen_batch)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    images_per_step = config.batch_size * (2 * config.training_ratio + 1)
    return iters * images_per_step / dt, flops, dt / iters


def _bench_infer(config, iters: int) -> tuple[float, float | None, float]:
    """BENCH_MODE=infer: generator-forward serving throughput."""
    import jax

    from pose_transfer_tpu.data.synthetic import synthetic_compact_batch
    from pose_transfer_tpu.train.engine import create_state, make_eval_step

    state, gen, _ = create_state(config, seed=0)
    eval_step = make_eval_step(config, gen)
    rng = np.random.default_rng(0)
    raw = jax.device_put(synthetic_compact_batch(
        rng, config.batch_size, config.image_size, config.pose_dim,
        warp_skip=config.warp_skip))
    flops = _step_flops(jax.jit(eval_step), state.gen_params, raw)
    _bench_infer.last_mem = _step_mem(jax.jit(eval_step), state.gen_params,
                                      raw)
    out, _ = eval_step(state.gen_params, raw)
    jax.block_until_ready(out)
    float(out.astype("float32").sum())  # force through the tunnel

    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = eval_step(state.gen_params, raw)
    float(out.astype("float32").sum())
    dt = time.perf_counter() - t0
    return iters * config.batch_size / dt, flops, dt / iters


def _warp_flop_model(config, mode: str) -> tuple[float, float] | str:
    """(dense_dot_flops, useful_flops) of the warp fold per step.

    XLA's executed-FLOP count prices the fold's two-pass einsums as dense
    dots, but their banded weight matrices carry ≤ 2 nonzero taps per
    output position out of up to W (``ops/warp.py::_line_weights``) — the
    dots are ~99% structural zeros. The *useful* work of a warp is the
    bilinear sample itself: 4 MACs (8 flops) per emitted output element
    (reference op: src_deformable/utils/pose_transform.py:37-39). This
    mirrors the production path's static shape selection (windowing,
    kernel window sizes, static-empty compaction) to price both views,
    so ``mfu_useful`` reports utilization against work an oracle resampler
    would do rather than work the dense formulation happens to run.

    The model follows the CONFIGURED fold path: full fold
    (``warp_windowed=False``, e.g. a BENCH_WINDOWED=0 A/B) is priced at
    all-parts full extent; ``warp_place='auto'`` is priced as the TPU
    resolution (kernel placement, X_ALIGN-widened windows — bench.py is a
    TPU tool). Returns a reason string instead of a tuple for paths the
    model doesn't cover (non-deformable configs; XLA placement, whose
    per-sample window extents are data-dependent) — emitted as
    ``mfu_useful_skipped`` so artifact gaps are diagnosable.
    """
    if config.gen_type == "unet" or config.warp_skip != "mask":
        return "non-deformable-config"
    from pose_transfer_tpu.core.transforms_host import static_empty_parts
    from pose_transfer_tpu.models.networks import encoder_filters_for
    from pose_transfer_tpu.ops import warp as W

    kernel_place = (config.warp_place in ("auto", "kernel")
                    and config.warp_agg == "max")
    windowed = config.warp_windowed
    if windowed is None:
        per_dev = config.batch_size // max(config.device_count, 1)
        windowed = kernel_place or per_dev >= 16
    if windowed and not kernel_place:
        return "xla-placement-windows-not-modeled"

    enc = encoder_filters_for(config.image_size)
    act = config.num_warp_transforms - len(
        static_empty_parts(config.pose_dim))
    h0, w0 = config.image_size
    dense = useful = 0.0
    for i in range(4):  # DeformableGenerator.num_warp_stages
        h, w, c = h0 >> i, w0 >> i, enc[i]
        two_pass_full = 2.0 * h * w * c * (h + w)
        if windowed and W._windowable(h, w):
            sizes = W._kernel_window_sizes(h, w)
            sy, sx = sizes if sizes else (h // 2, w // 2)
            p = act - 1
            dense += two_pass_full \
                + p * 2.0 * sy * c * (w * h + sx * w)
            useful += 8.0 * c * (h * w + p * sy * sx)
        else:
            dense += act * two_pass_full
            useful += 8.0 * c * act * h * w
    # backward = transposed einsum pairs of identical total shape (body +
    # joint part pass, ops/warp.py::_fold_windowed_place_bwd_impl).
    # Warp instances per train step: each disc update runs ONE generator
    # forward (only the fake batch transits the generator —
    # train/engine.py::disc_phase), plus the gen phase's fwd + bwd.
    fwd = (config.training_ratio + 1) if mode == "train" else 1
    bwd = 1 if mode == "train" else 0
    n = config.batch_size
    return (fwd + bwd) * n * dense, (fwd + bwd) * n * useful


def _vs(metric: str, value: float, rec: dict) -> float:
    """Round-over-round ratio — only against a prev record of the SAME
    metric (an A/B infer or h36m run must not divide by the fashion
    train baseline). The prev record's secondary sub-records ("h36m",
    "infer") are searched too."""
    if rec.get("metric") == metric and rec.get("value"):
        return round(value / rec["value"], 3)
    for sub in ("h36m", "infer"):
        s = rec.get(sub)
        if isinstance(s, dict) and s.get("metric") == metric \
                and s.get("value"):
            return round(value / s["value"], 3)
    return 1.0


def _mfu_fields(flops: float | None, sec_per_step: float,
                config=None, mode: str = "train") -> dict:
    """Achieved TFLOP/s and MFU from XLA's executed-FLOP count, plus the
    useful-FLOP view. Peak is the chip's bf16 matmul peak (v5e default;
    override BENCH_PEAK_TFLOPS on other generations).

    ``mfu_vs_peak`` prices executed FLOPs at face value — the banded warp
    contractions included — so it measures utilization of what actually
    runs (an upper bound). ``mfu_useful`` re-prices the fold at its
    irreducible bilinear-sampling work (``_warp_flop_model``): the honest
    "how much of this step is work any implementation must do" number —
    the gap between the two is the fold's structural-zero dot padding."""
    if not flops:
        return {}
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    achieved = flops / sec_per_step / 1e12
    out = {"tflops_per_step": round(flops / 1e12, 3),
           "achieved_tflops": round(achieved, 1),
           "mfu_vs_peak": round(achieved / peak, 3)}
    model = _warp_flop_model(config, mode) if config is not None else None
    if isinstance(model, str):
        out["mfu_useful_skipped"] = model
    elif model is not None:
        dense, useful_warp = model
        useful = flops - dense + useful_warp
        if 0 < useful <= flops:
            out["useful_tflops_per_step"] = round(useful / 1e12, 3)
            out["mfu_useful"] = round(useful / sec_per_step / 1e12 / peak,
                                      3)
        else:
            # the model subtracted more dense FLOPs than XLA executed —
            # coverage bug; surface it rather than silently dropping
            out["mfu_useful_skipped"] = "model-exceeds-executed-flops"
    return out


def main() -> None:
    _preflight_tunnel()

    from pose_transfer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    mode = os.environ.get("BENCH_MODE", "train")  # train | infer
    dataset = os.environ.get("BENCH_DATASET", "fashion")
    batch = os.environ.get("BENCH_BATCH")
    batch = int(batch) if batch else None
    iters = int(os.environ.get("BENCH_ITERS",
                               "20" if mode == "train" else "30"))
    # a pure driver run (no overrides) also records the h36m + infer numbers
    secondary = (mode == "train" and dataset == "fashion"
                 and not any(os.environ.get(k) for k in
                             ("BENCH_BATCH", "BENCH_WINDOWED",
                              "BENCH_PLACE", "BENCH_DATASET",
                              "BENCH_CONTENT")))

    run = _bench_train if mode == "train" else _bench_infer
    config = _make_config(dataset, mode, batch)
    ips, flops, sec_per_step = run(config, iters)

    prev = {}
    if os.path.exists("BENCH_PREV.json"):
        try:
            with open("BENCH_PREV.json") as f:
                prev = json.load(f)
        except Exception:
            prev = {}

    tag = "fashion256" if dataset == "fashion" else "h36m224"
    metric = f"{mode}_images_per_sec_per_chip_full_deformable_{tag}"
    record = {
        "metric": metric,
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": _vs(metric, ips, prev),
        "batch": config.batch_size,
    }
    record.update(_mfu_fields(flops, sec_per_step, config, mode))
    mem = getattr(run, "last_mem", None)
    if mem:
        record["memory"] = mem
    if secondary:
        h_cfg = _make_config("h36m", "train")
        h_ips, h_flops, h_sec = _bench_train(h_cfg, iters)
        h_metric = "train_images_per_sec_per_chip_full_deformable_h36m224"
        record["h36m"] = {
            "metric": h_metric,
            "value": round(h_ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": _vs(h_metric, h_ips, prev),
            "batch": h_cfg.batch_size,
            **_mfu_fields(h_flops, h_sec, h_cfg, "train"),
        }
        i_cfg = _make_config("fashion", "infer")
        i_ips, i_flops, i_sec = _bench_infer(
            i_cfg, int(os.environ.get("BENCH_ITERS", "30")))
        i_metric = "infer_images_per_sec_per_chip_full_deformable_fashion256"
        record["infer"] = {
            "metric": i_metric,
            "value": round(i_ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": _vs(i_metric, i_ips, prev),
            "batch": i_cfg.batch_size,
            **_mfu_fields(i_flops, i_sec, i_cfg, "infer"),
        }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
