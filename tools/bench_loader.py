"""Host data-path throughput: can the loader feed a real TPU VM?

The device step consumes ``batch_size`` samples per batch, three batches
per train step (two disc draws + one gen draw — reference main.py:81-85).
At the round-2 rate (~305 img/s/chip at 256², one sample per counted
image) the host must assemble ~305 samples/s: JPEG decode ×2 (from/to),
keypoint parse, and the (cached after the first epoch) affine/polygon
fits. This benchmarks ``BatchStream`` alone — no device, no transfers —
so it isolates the host ceiling that matters on a real TPU VM where the
PCIe/DMA transfer is ~free (unlike this dev environment's ~27 MB/s
tunnel, see CLAUDE.md).

Measured here (48-core dev host, synthetic 256² JPEGs, warm fit cache):
~520 samples/s at num_threads=4 — ~1.7× headroom over the current
consumption rate. Threads > 4 measured SLOWER (GIL/allocator contention
on PIL decode); the default stays modest.

Run: ``python tools/bench_loader.py --data_dir /tmp/synth256/
--dataset fasion [--image_size 256] [--batch 32] [--seconds 12]``.
Prints one JSON line per thread count.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--dataset", default="fasion")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--pose_dim", type=int, default=18)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--threads", type=int, nargs="+", default=[2, 4, 8])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # no TPU claim for a host bench
    sys.path.insert(0, ".")
    from pose_transfer_tpu.data.dataset import PoseTransferDataset
    from pose_transfer_tpu.data.loader import BatchStream

    d = args.data_dir.rstrip("/")
    ds_name = args.dataset
    opt = dict(
        gen_type="baseline", num_stacks=4, pose_dim=args.pose_dim,
        image_size=(args.image_size, args.image_size),
        use_input_pose=True, warp_skip="mask", dataset=ds_name,
        images_dir_train=f"{d}/{ds_name}-dataset/train",
        images_dir_test=f"{d}/{ds_name}-dataset/test",
        pairs_file_train=f"{d}/{ds_name}-pairs-train.csv",
        pairs_file_test=f"{d}/{ds_name}-pairs-test.csv",
        pairs_file_train_interpol=f"{d}/{ds_name}-pairs-train-interpol.csv",
        pairs_file_test_interpol=f"{d}/{ds_name}-pairs-test-interpol.csv",
        annotations_file_train=f"{d}/{ds_name}-annotation-train.csv",
        annotations_file_test=f"{d}/{ds_name}-annotation-test.csv",
    )
    ds = PoseTransferDataset(opt, "train")
    for nthreads in args.threads:
        stream = BatchStream(ds, batch_size=args.batch, seed=0,
                             num_threads=nthreads)
        next(stream)  # warm the fit cache + thread pool
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < args.seconds:
            n += next(stream)["image_from"].shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "loader_samples_per_sec",
            "value": round(n / dt, 1),
            "unit": "samples/sec",
            "num_threads": nthreads,
            "image_size": args.image_size,
        }))


if __name__ == "__main__":
    main()
