"""Inference serving driver: HTTP front-end over ``serve.PoseTransferServer``.

The reference ships only the offline batch driver (src_deformable/test.py);
this adds an online serving surface (stdlib-only, no extra dependencies):

  POST /generate   body: .npz with ``image`` (H, W, 3) uint8,
                   ``kp_from``/``kp_to`` (K, 2) float (y, x), -1 = missing
                   → .npz with ``image`` (H, W, 3) uint8 (the render)
  GET  /stats      JSON latency/throughput counters
  GET  /healthz    200 once the model is warm

Concurrent requests are micro-batched into fixed-shape device programs
(see ``pose_transfer_tpu.serve``). Run:

  python -m pose_transfer_tpu.cli.serve --expID <exp> --resume 1 \\
      --dataset fasion --pose_dim 18 [--port 8710] [--max_wait_ms 5]
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..serve import PoseTransferServer
from ..train import checkpoint, create_state
from .opts import Opts, config_from_opt, mesh_from_opt


def build_server(opt) -> PoseTransferServer:
    config = config_from_opt(opt)
    mesh = mesh_from_opt(opt, config)
    if mesh is not None:
        from ..parallel import config_for_mesh
        # device_count drives the auto warp_windowed rule (per-device batch)
        config = config_for_mesh(config, mesh)
    state, gen, _ = create_state(config, seed=opt.seed)
    if opt.generator_checkpoint:
        state = state.replace(gen_params=checkpoint.load_params(
            opt.generator_checkpoint, state.gen_params))
    elif opt.resume:
        state, epoch = checkpoint.resume(state, opt.checkpoints_dir,
                                      require_disc=False)
        print(f"Serving epoch-{epoch} weights")
    return PoseTransferServer(config, gen, state.gen_params,
                              max_wait_ms=opt.max_wait_ms, mesh=mesh,
                              output_dtype="uint8")


class _Handler(BaseHTTPRequestHandler):
    server_version = "pose-transfer-tpu/1.0"
    pts: PoseTransferServer = None  # class attr, set by make_http_server

    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, b"ok", "text/plain")
        elif self.path == "/stats":
            self._send(200, json.dumps(self.pts.stats()).encode(),
                       "application/json")
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):
        if self.path != "/generate":
            self._send(404, b"not found", "text/plain")
            return
        try:  # request faults (bad npz / wrong shapes) → 400
            n = int(self.headers.get("Content-Length", "0"))
            with np.load(io.BytesIO(self.rfile.read(n))) as z:
                image = z["image"]
                kp_from = z["kp_from"]
                kp_to = z["kp_to"]
            fut = self.pts.submit(image, kp_from, kp_to)
        except Exception as e:
            self._send(400, str(e).encode() or b"bad request", "text/plain")
            return
        try:  # execution faults (batch failure, wedge) → 5xx
            out = fut.result(timeout=120)
        except TimeoutError:
            self._send(504, b"generation timed out", "text/plain")
            return
        except Exception as e:
            self._send(500, str(e).encode() or b"generation failed",
                       "text/plain")
            return
        if out.dtype != np.uint8:  # float-output server configs
            out = ((np.clip(out, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
        buf = io.BytesIO()
        np.savez_compressed(buf, image=out)
        self._send(200, buf.getvalue(), "application/octet-stream")


def make_http_server(pts: PoseTransferServer, host: str = "127.0.0.1",
                     port: int = 8710) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,), {"pts": pts})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    opt = Opts().parse(argv)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    pts = build_server(opt)
    # warm the executable so the first request doesn't pay the compile
    h, w = pts.config.image_size
    k = opt.pose_dim
    dummy_kp = np.stack([np.linspace(4, h - 4, k),
                         np.linspace(4, w - 4, k)], 1).astype(np.float32)
    pts.generate([(np.zeros((h, w, 3), np.uint8), dummy_kp, dummy_kp)])
    pts.reset_stats()  # exclude the compile from latency percentiles
    httpd = make_http_server(pts, opt.serve_host, opt.serve_port)
    print(f"Serving on http://{opt.serve_host}:{httpd.server_address[1]} "
          f"(POST /generate, GET /stats)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        threading.Thread(target=httpd.shutdown, daemon=True).start()
        pts.close()


if __name__ == "__main__":
    main()
