"""TPU-native micro-batching inference server.

The reference has no serving layer (SURVEY.md §1 — its only inference
surface is the offline batch driver ``test.py``, src_deformable/test.py:
25-54). This module adds the serving counterpart for production use:

- **Static-shape micro-batching**: requests accumulate into fixed
  ``batch_size`` programs; partial batches are padded by repeating the last
  request. The compiled step never sees a new shape, so there are no
  shape-dependent recompiles — the TPU serving pattern (XLA compiles once,
  every request rides the same executable).
- **Admission window**: the batcher dispatches when a batch fills or
  ``max_wait_ms`` expires, bounding added latency under low load while
  reaching full-batch throughput under high load.
- **Per-request futures** (``submit``) and a synchronous convenience
  (``generate``); p50/p95 latency and throughput counters (``stats``).

Request contract: the caller provides a source image (uint8 HWC at the
config's image size), its keypoints, and the target keypoints — the same
(K, 2) (y, x) MISSING_VALUE=-1 convention as the annotation CSVs. The
server runs the identical host-side estimation the training pipeline uses
(``data.dataset.warp_fit`` / ``interpol_chain``) and the jitted eval step
(in-graph heatmap/mask rasterization + generator forward).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

from .data.dataset import collate, interpol_chain, warp_fit
from .train.engine import make_eval_step


class PoseTransferServer:
    """Persistent batched pose-transfer generator.

    Args:
      config: ``GANConfig`` (image_size/pose_dim/batch_size/gen_type/...).
      gen: the generator flax module (from ``create_state``/``build_models``).
      gen_params: trained generator params.
      max_wait_ms: admission window for partial batches.
      queue_depth: max queued requests before ``submit`` blocks.
      mesh: optional ``jax.sharding.Mesh`` — serve data-parallel: params
        replicated, each micro-batch sharded over the mesh's devices
        (``batch_size`` must divide evenly). Numerics equal to
        single-device (tests/test_serve.py).
      output_dtype: 'float32' (generator output in [-1, 1]) or 'uint8'
        (deprocessed ON DEVICE before the host fetch — 4× less
        device→host traffic per response; with the no-target-bytes request
        path, measured 27.7 → 40.4 img/s end-to-end 256² serving through
        this environment's ~27 MB/s tunnel, p50 541 → 317 ms at 16
        clients; tools/bench_serve.py).
    """

    def __init__(self, config, gen, gen_params, *, max_wait_ms: float = 5.0,
                 queue_depth: int = 256, mesh=None,
                 output_dtype: str = "float32"):
        if output_dtype not in ("float32", "uint8"):
            raise ValueError(f"unknown output_dtype {output_dtype!r}")
        self._output_dtype = output_dtype
        import jax
        import jax.numpy as jnp
        self._post = jax.jit(
            lambda x: ((jnp.clip(x.astype(jnp.float32), -1.0, 1.0) + 1.0)
                       * 127.5).astype(jnp.uint8))
        self._config = config
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            from .parallel import make_parallel_eval_step
            if config.batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {config.batch_size} must divide over "
                    f"{mesh.devices.size} mesh devices")
            self._params = jax.device_put(
                gen_params, NamedSharding(mesh, PartitionSpec()))
            self._eval = make_parallel_eval_step(config, gen, mesh)
        else:
            self._params = gen_params
            self._eval = make_eval_step(config, gen)
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._max_wait = max_wait_ms / 1e3
        self._lock = threading.Lock()
        self._latencies: list[float] = []
        self._served = 0
        self._batches = 0
        self._t0 = time.time()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @property
    def config(self):
        return self._config

    # ------------------------------------------------------------- requests

    def prepare_request(self, image: np.ndarray, kp_from: np.ndarray,
                        kp_to: np.ndarray) -> dict:
        """Host-side sample assembly: per-pair affine estimation, compact
        layout. No ``image_to``: the target is unknown at serving time, so
        the preparer substitutes the blank target in-graph and the request
        never ships those bytes host→device (data/device.py)."""
        cfg = self._config
        image = np.ascontiguousarray(image, np.uint8)
        if image.shape != (*cfg.image_size, 3):
            raise ValueError(
                f"image must be {(*cfg.image_size, 3)} uint8, "
                f"got {image.shape}")
        kp_from = np.asarray(kp_from, np.float32)
        kp_to = np.asarray(kp_to, np.float32)
        # malformed keypoints must fail HERE: past this point the sample is
        # co-batched, where a bad shape either poisons the whole batch's
        # collate or (uniformly wrong K) retraces the compiled eval step
        for name, kp in (("kp_from", kp_from), ("kp_to", kp_to)):
            if kp.shape != (cfg.pose_dim, 2):
                raise ValueError(
                    f"{name} must be {(cfg.pose_dim, 2)}, got {kp.shape}")
        sample = {
            "image_from": image,
            "kp_from": kp_from,
            "kp_to": kp_to,
        }
        # 'unet' consumes the packed input only — skip the per-request
        # affine/polygon fitting entirely (dead work otherwise)
        if cfg.gen_type == "baseline":
            warps, polys, kinds = warp_fit(
                kp_from, kp_to, cfg.pose_dim, cfg.image_size, cfg.warp_skip)
            sample.update(warps=warps, mask_polys=polys, mask_kinds=kinds)
        elif cfg.gen_type == "stacked":
            interpol, warps, polys, kinds = interpol_chain(
                kp_from, kp_to, cfg.pose_dim, cfg.image_size, cfg.warp_skip,
                cfg.num_stacks)
            sample.update(interpol_kp=interpol, interpol_warps=warps,
                          interpol_polys=polys, interpol_kinds=kinds)
        return sample

    def submit(self, image: np.ndarray, kp_from: np.ndarray,
               kp_to: np.ndarray) -> Future:
        """Enqueue one request; resolves to the generated (H, W, 3) image —
        float32 in [-1, 1], or uint8 when ``output_dtype='uint8'``."""
        if self._stop.is_set():
            raise RuntimeError("server is closed")
        fut: Future = Future()
        sample = self.prepare_request(image, kp_from, kp_to)
        self._q.put((sample, fut, time.perf_counter()))
        # close() may have drained the queue between the _stop check and
        # the put — drain again ourselves so no QUEUED future is stranded
        # (.result() callers block forever otherwise). Only futures still
        # in the queue are failed: a request already dequeued into a
        # running batch is not in the queue and completes normally.
        if self._stop.is_set():
            self._fail_queued()
        return fut

    def generate(self, requests: list[tuple[np.ndarray, np.ndarray,
                                            np.ndarray]]) -> np.ndarray:
        """Synchronous batch convenience: list of (image, kp_from, kp_to)."""
        futs = [self.submit(*r) for r in requests]
        return np.stack([f.result() for f in futs])

    # ------------------------------------------------------------- batcher

    def _loop(self):
        bs = self._config.batch_size
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.perf_counter() + self._max_wait
            while len(items) < bs:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(items)
            except Exception as e:  # surface the failure on every future
                for _, fut, _ in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_batch(self, items):
        bs = self._config.batch_size
        samples = [s for s, _, _ in items]
        # static-shape pad: repeat the last sample; padded outputs dropped
        samples = samples + [samples[-1]] * (bs - len(samples))
        out, _ = self._eval(self._params, collate(samples))
        if self._config.gen_type == "stacked":
            out = out[-1]  # (S, N, H, W, 3) stage stack → final image
        if self._output_dtype == "uint8":
            out_np = np.asarray(self._post(out)[:len(items)])
        else:
            out_np = np.asarray(out[:len(items)], np.float32)
        done = time.perf_counter()
        with self._lock:
            self._served += len(items)
            self._batches += 1
            for _, _, t_in in items:
                self._latencies.append(done - t_in)
            del self._latencies[:-1024]  # keep a recent window
        for (_, fut, _), img in zip(items, out_np):
            # defensive: an already-resolved future would make an unguarded
            # set_result raise InvalidStateError and poison the rest of the
            # batch via _loop's except clause (mid-flight futures are never
            # failed by the close-race drains — they only touch the queue)
            if not fut.done():
                fut.set_result(img)

    # --------------------------------------------------------------- admin

    def reset_stats(self):
        """Zero the counters (drivers call this after the warm-up request so
        compile time doesn't pollute serving latency percentiles)."""
        with self._lock:
            self._latencies.clear()
            self._served = 0
            self._batches = 0
            self._t0 = time.time()

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            served, batches = self._served, self._batches
        pct = lambda p: (lat[min(int(p * len(lat)), len(lat) - 1)]  # noqa
                         if lat else 0.0)
        elapsed = max(time.time() - self._t0, 1e-9)
        return {
            "served": served,
            "batches": batches,
            "mean_batch_fill": served / batches if batches else 0.0,
            "latency_p50_ms": round(pct(0.50) * 1e3, 2),
            "latency_p95_ms": round(pct(0.95) * 1e3, 2),
            "images_per_sec": round(served / elapsed, 2),
        }

    def _fail_queued(self):
        """Fail every queued-but-undispatched request (only safe once
        ``_stop`` is set — the batcher stops dequeuing then)."""
        while True:
            try:
                _, fut, _ = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("server closed"))

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        # fail queued-but-undispatched requests instead of stranding their
        # futures (callers block on .result()); racing late submit()s run
        # the same drain after their put
        self._fail_queued()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
