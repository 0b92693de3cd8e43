"""Inference serving: micro-batching correctness (padding, batching,
futures), parity with the direct eval step, stats, and the HTTP front-end.
The reference has no serving surface (SURVEY.md §1); this is new capability
built on the same eval path the offline driver uses."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from pose_transfer_tpu.data.synthetic import random_skeleton
from pose_transfer_tpu.serve import PoseTransferServer
from pose_transfer_tpu.train import GANConfig, create_state, make_eval_step
from pose_transfer_tpu.data.dataset import collate


def _config(**over):
    base = dict(image_size=(64, 64), pose_dim=18, batch_size=2,
                warp_skip="mask", gen_type="baseline", check_mode=True)
    base.update(over)
    return GANConfig(**base)


def _requests(config, n, seed=0):
    rng = np.random.default_rng(seed)
    reqs = []
    for _ in range(n):
        img = rng.integers(0, 255, (*config.image_size, 3),
                           dtype=np.uint8)
        kp1 = random_skeleton(rng, config.image_size, config.pose_dim)
        kp2 = random_skeleton(rng, config.image_size, config.pose_dim)
        reqs.append((img, kp1.astype(np.float32), kp2.astype(np.float32)))
    return reqs


def test_serve_matches_direct_eval():
    config = _config()
    state, gen, _ = create_state(config, seed=0)
    reqs = _requests(config, 3)  # odd count: exercises padding
    with PoseTransferServer(config, gen, state.gen_params,
                            max_wait_ms=20.0) as srv:
        outs = srv.generate(reqs)
        stats = srv.stats()

    # direct eval on the same prepared samples, in server-batch layout
    eval_step = make_eval_step(config, gen)
    samples = [srv.prepare_request(*r) for r in reqs]
    direct01, _ = eval_step(state.gen_params, collate(samples[:2]))
    direct2, _ = eval_step(state.gen_params,
                           collate([samples[2], samples[2]]))
    direct = np.concatenate([np.asarray(direct01),
                             np.asarray(direct2)[:1]])
    np.testing.assert_allclose(outs, direct, atol=1e-5)

    assert stats["served"] == 3
    assert stats["batches"] >= 2  # 3 requests cannot fit one batch of 2
    assert stats["latency_p95_ms"] > 0


def test_serve_concurrent_submissions_batch_up():
    config = _config()
    state, gen, _ = create_state(config, seed=0)
    reqs = _requests(config, 6, seed=1)
    with PoseTransferServer(config, gen, state.gen_params,
                            max_wait_ms=200.0) as srv:
        # warm (compile) so the admission window really batches
        srv.generate(_requests(config, 1, seed=9))
        futs = [srv.submit(*r) for r in reqs]
        outs = [f.result(timeout=120) for f in futs]
        stats = srv.stats()
    assert len(outs) == 6
    assert all(o.shape == (*config.image_size, 3) for o in outs)
    # with a wide admission window the 6 requests ride ≤ 6 batches and the
    # mean fill beats one-request-per-batch
    assert stats["mean_batch_fill"] > 1.0


def test_serve_rejects_wrong_shape():
    config = _config()
    state, gen, _ = create_state(config, seed=0)
    with PoseTransferServer(config, gen, state.gen_params) as srv:
        with pytest.raises(ValueError):
            srv.prepare_request(
                np.zeros((32, 32, 3), np.uint8),
                np.zeros((18, 2), np.float32), np.zeros((18, 2), np.float32))
        with pytest.raises(ValueError):  # wrong K: would poison the batch
            srv.prepare_request(
                np.zeros((*srv.config.image_size, 3), np.uint8),
                np.zeros((19, 2), np.float32), np.zeros((18, 2), np.float32))


def test_serve_stacked_smoke():
    config = _config(gen_type="stacked", num_stacks=2)
    state, gen, _ = create_state(config, seed=0)
    with PoseTransferServer(config, gen, state.gen_params) as srv:
        out = srv.generate(_requests(config, 1, seed=2))
    assert out.shape == (1, *config.image_size, 3)
    assert np.isfinite(out).all()


def test_http_roundtrip():
    from pose_transfer_tpu.cli.serve import make_http_server

    config = _config()
    state, gen, _ = create_state(config, seed=0)
    with PoseTransferServer(config, gen, state.gen_params) as srv:
        httpd = make_http_server(srv, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            (img, kp1, kp2), = _requests(config, 1, seed=3)
            buf = io.BytesIO()
            np.savez_compressed(buf, image=img, kp_from=kp1, kp_to=kp2)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=buf.getvalue(),
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                assert resp.status == 200
                with np.load(io.BytesIO(resp.read())) as z:
                    out = z["image"]
            assert out.shape == (*config.image_size, 3)
            assert out.dtype == np.uint8

            # parity with the library path (uint8 deprocess of the float out)
            lib = srv.generate([(img, kp1, kp2)])[0]
            lib_u8 = ((np.clip(lib, -1, 1) + 1) * 127.5).astype(np.uint8)
            np.testing.assert_array_equal(out, lib_u8)

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30) as resp:
                stats = json.loads(resp.read())
            assert stats["served"] >= 2

            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=b"not-npz",
                method="POST")
            try:
                urllib.request.urlopen(bad, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            httpd.shutdown()


def test_serve_mesh_matches_single_device():
    """Data-parallel serving over the 8-device CPU mesh must match the
    single-device server's outputs."""
    import jax

    from pose_transfer_tpu.parallel import config_for_mesh, make_mesh

    assert len(jax.devices()) == 8
    config = _config(batch_size=8)
    state, gen, _ = create_state(config, seed=0)
    reqs = _requests(config, 5, seed=4)  # partial batch over the mesh
    with PoseTransferServer(config, gen, state.gen_params) as single:
        out1 = single.generate(reqs)
    mesh = make_mesh(8)
    with PoseTransferServer(config_for_mesh(config, mesh), gen,
                            state.gen_params, mesh=mesh) as sharded:
        out8 = sharded.generate(reqs)
    np.testing.assert_allclose(out1, out8, atol=1e-5)


def test_serve_mesh_rejects_indivisible_batch():
    from pose_transfer_tpu.parallel import make_mesh

    config = _config(batch_size=2)
    state, gen, _ = create_state(config, seed=0)
    with pytest.raises(ValueError):
        PoseTransferServer(config, gen, state.gen_params, mesh=make_mesh(8))


def test_serve_uint8_output_matches_float():
    """On-device deprocess (output_dtype='uint8') must match the host-side
    conversion of the float output to within one quantization step."""
    config = _config()
    state, gen, _ = create_state(config, seed=0)
    reqs = _requests(config, 2, seed=5)
    with PoseTransferServer(config, gen, state.gen_params) as f32srv:
        ref = f32srv.generate(reqs)
    with PoseTransferServer(config, gen, state.gen_params,
                            output_dtype="uint8") as u8srv:
        u8 = u8srv.generate(reqs)
    assert u8.dtype == np.uint8
    exp = ((np.clip(ref, -1, 1) + 1) * 127.5).astype(np.uint8)
    assert np.abs(u8.astype(np.int32) - exp.astype(np.int32)).max() <= 1
