"""Serving load benchmark: drive PoseTransferServer with concurrent
clients and report throughput + latency percentiles.

Usage: python tools/bench_serve.py [--hw 256] [--batch 8] [--clients 16]
       [--requests 200] [--dtype bfloat16]

Note (this dev environment): each micro-batch pays a host→device transfer
through the ~27 MB/s axon tunnel (~78 ms per 256² batch), which caps
end-to-end serving well below the device program's rate (BENCH_MODE=infer
in bench.py measures the device side alone: ~352 img/s at 256²). On a TPU
VM the transfer is <1 ms and serving approaches the device rate.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    args = ap.parse_args()

    from pose_transfer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from pose_transfer_tpu.data.synthetic import random_skeleton
    from pose_transfer_tpu.serve import PoseTransferServer
    from pose_transfer_tpu.train import GANConfig, create_state

    config = GANConfig(
        image_size=(args.hw, args.hw), pose_dim=18, batch_size=args.batch,
        warp_skip="mask", gen_type="baseline",
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
        else jnp.float32)
    state, gen, _ = create_state(config, seed=0)

    rng = np.random.default_rng(0)
    reqs = []
    for _ in range(64):  # rotating pool of distinct requests
        img = rng.integers(0, 255, (args.hw, args.hw, 3), dtype=np.uint8)
        kp1 = random_skeleton(rng, config.image_size, 18).astype(np.float32)
        kp2 = random_skeleton(rng, config.image_size, 18).astype(np.float32)
        reqs.append((img, kp1, kp2))

    with PoseTransferServer(config, gen, state.gen_params,
                            max_wait_ms=args.max_wait_ms,
                            queue_depth=1024, output_dtype="uint8") as srv:
        srv.generate([reqs[0]])  # compile
        srv.reset_stats()

        remaining = [args.requests]
        lock = threading.Lock()

        def client(ci):
            while True:
                with lock:
                    if remaining[0] <= 0:
                        return
                    remaining[0] -= 1
                    i = remaining[0]
                srv.submit(*reqs[(ci * 31 + i) % len(reqs)]).result(
                    timeout=300)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = srv.stats()

    stats["wall_images_per_sec"] = round(args.requests / wall, 2)
    stats["clients"] = args.clients
    import json
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
