"""XLA op-level breakdown of the jitted train step on the real TPU.

Captures a ``jax.profiler`` trace around steady-state steps of the flagship
config (the exact program ``bench.py`` times), then aggregates device-track
event durations by HLO op category so the 95 ms step can be attributed:
convolutions vs warp einsums vs norm reductions vs elementwise fusions.

Usage: python tools/profile_trace.py [--steps 5] [--batch 8] [--top 40]
Falls back to ``compiled.cost_analysis()`` if device tracing is unsupported
through the axon tunnel.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    """Map a trace event / HLO fusion name to a coarse bucket."""
    n = name.lower()
    if "conv" in n:
        return "conv"
    if "dot" in n or "einsum" in n or "dot_general" in n:
        return "dot(warp/resize)"
    if "reduce-window" in n or "reducewindow" in n:
        return "reduce-window"
    if "all-reduce" in n or "allreduce" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "scatter" in n or "gather" in n or "dynamic" in n:
        return "gather/scatter"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n or "loop" in n or "input" in n or "output" in n:
        return "fusion(elementwise)"
    if "rng" in n:
        return "rng"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/pt_trace")
    ap.add_argument("--mode", default="train", choices=["train", "infer"])
    ap.add_argument("--windowed", type=int, default=0)
    ap.add_argument("--content", default="none",
                    help="content_loss_layer (e.g. block1_conv2: traces the "
                         "flagship full recipe — nn_loss area 5, l1_w 1.0)")
    args = ap.parse_args()

    import jax

    from pose_transfer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from pose_transfer_tpu.data.synthetic import synthetic_compact_batch
    from pose_transfer_tpu.train.engine import (
        GANConfig, create_state, make_train_step)

    extra = {}
    if args.content != "none":
        extra = dict(content_loss_layer=args.content, nn_loss_area_size=5,
                     l1_penalty_weight=1.0)
    config = GANConfig(image_size=(256, 256), pose_dim=18,
                       batch_size=args.batch, warp_skip="mask",
                       gen_type="baseline", training_ratio=1,
                       compute_dtype=jnp.bfloat16,
                       warp_windowed=bool(args.windowed), **extra)
    state, gen, disc = create_state(config, seed=0)

    rng = np.random.default_rng(0)
    mk = lambda: synthetic_compact_batch(  # noqa: E731
        rng, config.batch_size, config.image_size, config.pose_dim,
        warp_skip=config.warp_skip)

    if args.mode == "infer":
        from pose_transfer_tpu.train.engine import make_eval_step
        eval_step = make_eval_step(config, gen)
        raw = jax.device_put(mk())

        def step(state, *_):
            out, _b = eval_step(state.gen_params, raw)
            return state, {"gen": jnp.zeros(3)}, out
        fake = real = gen_batch = None
        lower_args = None
    else:
        step = jax.jit(make_train_step(config, gen, disc),
                       donate_argnums=(0,))
        fake = jax.device_put({k: v[None] for k, v in mk().items()})
        real = jax.device_put({k: v[None] for k, v in mk().items()})
        gen_batch = jax.device_put(mk())

    for _ in range(6):  # compile + tunnel warmup
        state, metrics, _ = step(state, fake, real, gen_batch)
    jax.block_until_ready(state)

    os.makedirs(args.outdir, exist_ok=True)
    try:
        with jax.profiler.trace(args.outdir):
            for _ in range(args.steps):
                state, metrics, _ = step(state, fake, real, gen_batch)
            jax.block_until_ready(state)
    except Exception as e:  # tracing unsupported through the tunnel
        print(f"trace failed ({e}); falling back to cost_analysis")
        if args.mode == "infer":
            lowered = eval_step.lower(state.gen_params, raw)
        else:
            lowered = jax.jit(make_train_step(config, gen, disc)).lower(
                state, fake, real, gen_batch)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for k in sorted(ca):
            print(f"{k}: {ca[k]:.3e}")
        return

    traces = glob.glob(os.path.join(
        args.outdir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace files found under", args.outdir)
        return
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # device tracks: process names containing "TPU" / "/device:"
    pid_is_device = {}
    thread_name = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            pid_is_device[ev["pid"]] = bool(
                re.search(r"tpu|device", pname, re.I)
                and "host" not in pname.lower())
        elif ev.get("name") == "thread_name":
            thread_name[(ev["pid"], ev["tid"])] = \
                ev.get("args", {}).get("name", "")

    # leaf-level op events live on the "XLA Ops" thread; fall back to all
    # device threads if that naming is absent
    ops_threads = {k for k, v in thread_name.items()
                   if pid_is_device.get(k[0]) and "XLA Ops" in v}

    per_thread = collections.Counter()
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or not pid_is_device.get(ev.get("pid")):
            continue
        key = (ev["pid"], ev.get("tid"))
        dur = ev.get("dur", 0) / 1e3  # us → ms
        per_thread[thread_name.get(key, str(key))] += dur
        if ops_threads and key not in ops_threads:
            continue
        name = ev.get("name", "")
        per_op[name] += dur
        per_cat[categorize(name)] += dur
        total += dur

    print("== device time by thread (ms/step) ==")
    for tn, ms in per_thread.most_common():
        print(f"{ms / args.steps:9.3f}  {tn}")

    steps = args.steps
    print(f"\n== device time by category (ms/step over {steps} steps) ==")
    for cat, ms in per_cat.most_common():
        print(f"{ms / steps:9.3f}  {cat}")
    print(f"{total / steps:9.3f}  TOTAL (sum of events; overlaps possible)")

    # attribution: join trace op names with the compiled HLO's per-op
    # source metadata (trace events carry none through the axon tunnel)
    if args.mode == "infer":
        hlo = eval_step.lower(state.gen_params, raw).compile().as_text()
    else:
        hlo = jax.jit(make_train_step(config, gen, disc)).lower(
            state, fake, real, gen_batch).compile().as_text()
    op_src = {}
    for mm in re.finditer(
            r"%([\w.-]+) = [^\n]*?metadata=\{[^}]*?op_name=\"([^\"]*)\""
            r"(?:[^}]*?source_file=\"([^\"]*)\")?"
            r"(?:[^}]*?source_line=(\d+))?", hlo):
        name, op_name, sf, sl = mm.groups()
        src = op_name
        if sf:
            src += f"  [{os.path.basename(sf)}:{sl}]"
        op_src.setdefault(name, src)

    def attribute(name):
        src = op_src.get(name, "")
        # strip jit wrapper prefix noise
        return re.sub(r"^jit\(train_step\)/", "", src)

    per_src = collections.Counter()
    for name, ms in per_op.items():
        src = attribute(name)
        # bucket by source file:line when present, else by op path head
        m = re.search(r"\[([^\]]+)\]$", src)
        key = m.group(1) if m else (src.split("/")[0] or name.split(".")[0])
        per_src[key] += ms

    print(f"\n== top {args.top} source sites (ms/step) ==")
    for key, ms in per_src.most_common(args.top):
        print(f"{ms / steps:9.3f}  {key}")

    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / steps:9.3f}  {name[:44]}  |  {attribute(name)[:180]}")


if __name__ == "__main__":
    main()
