"""Reference-equivalent PyTorch train-iteration benchmark (CPU).

The reference (saurabhsharma1993/pose-transfer) cannot execute in this
environment — it imports keras, torchvision, skimage and pylab at module
scope (src_deformable/models/networks.py:2, models/pose_gan.py:9,
utils/pose_transform.py:1-5), none of which are installed — and it records
no throughput numbers anywhere (BASELINE.md). This tool therefore times a
**structural twin** of its training iteration, written in plain torch from
SURVEY.md's architecture facts (not copied):

- layer ladders enc (64,128,256,512,512,512,512) / dec
  (512,512,512,512,256,128,3) for 256² (pose_gan.py:17-18);
- Block = (Leaky)ReLU → Conv k4 s2 p1 no-bias down / ConvTranspose k4 s2 +
  crop-1 up → whole-volume instance norm (InstanceNorm3d(1) on
  (N,1,C,H,W), networks.py:159-169) → Dropout2d;
- dual-encoder deformable generator: warp the appearance skip for the
  first 4 stages via tile×10 → affine_grid → grid_sample → mask-resize →
  mask-mul → max over transforms (networks.py:279-288,
  pose_transform.py:16-92);
- patch discriminator (networks.py:329-357);
- dis_update with two fresh batches and the generator forward NOT detached
  (pose_gan.py:117-137), gen_update with per-sample −log(D) loops and
  L1·100 (pose_gan.py:90-108), two Adam(lr=2e-4, β=(0.5, 0.999)).

Structural fidelity is asserted via the reference's logged parameter
fingerprints: generator 82 080 611, discriminator 2 803 782
(src_deformable/logs/gen_full_fasion). Weights are random and inputs are
synthetic — this measures the compute structure, not convergence.

Usage:
  python tools/bench_torch_reference.py [--hw 256] [--batch 8] [--iters 3]
  python tools/bench_torch_reference.py --jax   # our step on the same CPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_torch(hw: int, pose_dim: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class VolumeIN(nn.Module):
        """InstanceNorm3d(1, eps=1e-3, affine=True) applied to the tensor
        unsqueezed to (N,1,C,H,W): whole-volume stats, scalar affine."""

        def __init__(self):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(1))
            self.bias = nn.Parameter(torch.zeros(1))

        def forward(self, x):
            n = x.shape[0]
            flat = x.reshape(n, -1)
            mean = flat.mean(1).view(n, 1, 1, 1)
            var = flat.var(1, unbiased=False).view(n, 1, 1, 1)
            return (x - mean) / torch.sqrt(var + 1e-3) \
                * self.weight + self.bias

    class Block(nn.Module):
        def __init__(self, cin, cout, down=True, bn=True, dropout=False,
                     leaky=True):
            super().__init__()
            self.leaky, self.down = leaky, down
            if down:
                self.conv = nn.Conv2d(cin, cout, 4, 2, 1, bias=False)
            else:
                self.conv = nn.ConvTranspose2d(cin, cout, 4, 2, 0,
                                               bias=False)
            self.norm = VolumeIN() if bn else None
            self.drop = nn.Dropout2d(0.5) if dropout else None

        def forward(self, x):
            x = F.leaky_relu(x, 0.2) if self.leaky else F.relu(x)
            x = self.conv(x)
            if not self.down:
                x = x[:, :, 1:-1, 1:-1]  # Cropping2D(1)
            if self.norm is not None:
                x = self.norm(x)
            if self.drop is not None:
                x = self.drop(x)
            return x

    # ladder selection mirrors pose_gan.py:17-18
    if hw < 256:
        ENC = (64, 128, 256, 512, 512, 512)
        DEC = (512, 512, 512, 256, 128, 3)
    else:
        ENC = (64, 128, 256, 512, 512, 512, 512)
        DEC = (512, 512, 512, 512, 256, 128, 3)

    class Encoder(nn.Module):
        def __init__(self, cin):
            super().__init__()
            mods = [nn.Conv2d(cin, ENC[0], 3, 1, 1)]
            for i in range(1, len(ENC)):
                mods.append(Block(ENC[i - 1], ENC[i],
                                  bn=(i != len(ENC) - 1)))
            self.stages = nn.ModuleList(mods)

        def forward(self, x):
            outs = []
            for m in self.stages:
                x = m(x)
                outs.append(x)
            return outs

    class Decoder(nn.Module):
        def __init__(self, num_skips=2):
            super().__init__()
            mods = []
            for i, nf in enumerate(DEC):
                if i == 0:
                    cin = num_skips * ENC[-1]
                    mods.append(Block(cin, nf, down=False, leaky=False,
                                      dropout=True))
                elif i < len(DEC) - 1:
                    cin = num_skips * ENC[-(i + 1)] + DEC[i - 1]
                    mods.append(Block(cin, nf, down=False, leaky=False,
                                      dropout=(i < 3)))
                else:
                    cin = num_skips * ENC[0] + DEC[i - 1]
                    mods.append(nn.Conv2d(cin, nf, 3, 1, 1))
            self.stages = nn.ModuleList(mods)

        def forward(self, skips):
            out = None
            for i, m in enumerate(self.stages):
                if i == 0:
                    out = m(skips[-1])
                elif i < len(DEC) - 1:
                    out = m(torch.cat([out, skips[-(i + 1)]], 1))
                else:
                    out = torch.tanh(m(F.relu(
                        torch.cat([out, skips[-(i + 1)]], 1))))
            return out

    def warp_layer(feat, theta, masks):
        """tile ×T → affine_grid → grid_sample → resized-mask mul → max
        (pose_transform.py:16-92 structure; θ used as normalized 2×3)."""
        n, c, h, w = feat.shape
        t = theta.shape[1]
        rep = feat.repeat_interleave(t, dim=0)
        grid = F.affine_grid(theta.reshape(n * t, 2, 3),
                             (n * t, c, h, w), align_corners=False)
        warped = F.grid_sample(rep, grid, padding_mode="zeros",
                               align_corners=False)
        m = F.interpolate(masks, size=(h, w), mode="bilinear",
                          align_corners=False)
        warped = warped.reshape(n, t, c, h, w) * m.unsqueeze(2)
        return warped.max(dim=1).values

    class DeformableGen(nn.Module):
        def __init__(self, input_nc):
            super().__init__()
            self.enc_app = Encoder(input_nc - pose_dim)
            self.enc_pose = Encoder(pose_dim)
            self.dec = Decoder(num_skips=2)

        def forward(self, inp, theta, masks):
            app = inp[:, :3 + pose_dim]
            tg_pose = inp[:, 3 + pose_dim:]
            sk_a = self.enc_app(app)
            sk_p = self.enc_pose(tg_pose)
            skips = []
            for i, (a, p) in enumerate(zip(sk_a, sk_p)):
                if i < 4:
                    a = warp_layer(a, theta, masks)
                skips.append(torch.cat([a, p], 1))
            return self.dec(skips)

    class Disc(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.c0 = nn.Conv2d(cin, 64, 4, 2, 0)
            self.b1 = Block(64, 128)
            self.b2 = Block(128, 256)
            self.b3 = Block(256, 512)
            self.b4 = Block(512, 1, bn=False)

        def forward(self, x):
            x = self.b4(self.b3(self.b2(self.b1(self.c0(x)))))
            return torch.sigmoid(x).reshape(x.shape[0], -1)

    input_nc = 3 + 2 * pose_dim
    return DeformableGen(input_nc), Disc(input_nc + 3)


def bench_torch(hw: int, batch: int, iters: int, pose_dim: int = 18):
    import torch

    gen, disc = build_torch(hw, pose_dim)
    n_gen = sum(p.numel() for p in gen.parameters())
    n_disc = sum(p.numel() for p in disc.parameters())
    if hw == 256:
        assert n_gen == 82_080_611, n_gen    # gen_full_fasion log fingerprint
        assert n_disc == 2_803_782, n_disc
    opt_g = torch.optim.Adam(gen.parameters(), 2e-4, (0.5, 0.999))
    opt_d = torch.optim.Adam(disc.parameters(), 2e-4, (0.5, 0.999))
    l1 = torch.nn.L1Loss()

    rng = np.random.default_rng(0)
    input_nc = 3 + 2 * pose_dim

    def mk():
        inp = torch.as_tensor(
            rng.normal(size=(batch, input_nc, hw, hw)).astype(np.float32))
        tgt = torch.as_tensor(
            rng.normal(size=(batch, 3, hw, hw)).astype(np.float32))
        th = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32),
                     (batch, 10, 1, 1))
        th[:, :, :, 2] = rng.uniform(-0.2, 0.2, (batch, 10, 2))
        theta = torch.as_tensor(th)
        masks = torch.as_tensor(
            (rng.random((batch, 10, hw, hw)) > 0.5).astype(np.float32))
        return inp, tgt, theta, masks

    def disc_input(inp, img):
        return torch.cat([inp[:, :3 + pose_dim], img,
                          inp[:, 3 + pose_dim:]], 1)

    def dis_update():
        # two fresh batches; gen forward NOT detached (pose_gan.py:120-137)
        inp_f, _, th_f, m_f = mk()
        inp_r, tgt_r, _, _ = mk()
        fake = gen(inp_f, th_f, m_f)
        rows = torch.cat([disc_input(inp_r, tgt_r),
                          disc_input(inp_f, fake)], 0)
        out = disc(rows)
        loss = 0.0
        for i in range(batch):
            loss = loss - torch.mean(torch.log(out[i] + 1e-7))
        for i in range(batch, 2 * batch):
            loss = loss - torch.mean(torch.log(1 - out[i] + 1e-7))
        loss = loss / batch
        opt_d.zero_grad()
        loss.backward()
        opt_d.step()

    def gen_update():
        inp, tgt, th, m = mk()
        out_img = gen(inp, th, m)
        dout = disc(disc_input(inp, out_img))
        ad = 0.0
        for i in range(batch):
            ad = ad - torch.mean(torch.log(dout[i] + 1e-7))
        loss = ad / batch + 100.0 * l1(out_img, tgt)
        opt_g.zero_grad()
        loss.backward()
        opt_g.step()

    def one_iter():
        dis_update()
        gen_update()

    one_iter()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = (time.perf_counter() - t0) / iters
    return dt, 3 * batch / dt


def bench_jax_cpu(hw: int, batch: int, iters: int,
                  warp_backend: str = "exact"):
    """Our framework's full train step on the same CPU.

    Defaults to the 'exact' gather warp: the dense-matmul backend trades
    ~H× FLOPs for MXU friendliness — a 25× win on TPU, a big loss on CPU
    (510 vs 21 s/iter at 128², measured) — so a CPU deployment picks
    'exact', like torch's grid_sample does.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pose_transfer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from pose_transfer_tpu.data.synthetic import synthetic_compact_batch
    from pose_transfer_tpu.train.engine import (
        GANConfig, create_state, make_train_step)

    config = GANConfig(image_size=(hw, hw), pose_dim=18, batch_size=batch,
                       warp_skip="mask", compute_dtype=jnp.float32,
                       warp_backend=warp_backend)
    state, gen, disc = create_state(config, seed=0)
    step = jax.jit(make_train_step(config, gen, disc))
    rng = np.random.default_rng(0)
    mk = lambda: synthetic_compact_batch(  # noqa: E731
        rng, batch, (hw, hw), 18, warp_skip="mask")
    fake = {k: v[None] for k, v in mk().items()}
    real = {k: v[None] for k, v in mk().items()}
    state, _, _ = step(state, fake, real, mk())
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _, _ = step(state, fake, real, mk())
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    return dt, 3 * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--jax", action="store_true",
                    help="time our framework's step on CPU instead")
    args = ap.parse_args()
    if args.jax:
        dt, ips = bench_jax_cpu(args.hw, args.batch, args.iters)
        name = "jax_cpu_full_step"
    else:
        dt, ips = bench_torch(args.hw, args.batch, args.iters)
        name = "torch_reference_twin_cpu_full_iteration"
    print(json.dumps({"metric": name, "sec_per_iter": round(dt, 3),
                      "images_per_sec": round(ips, 2),
                      "hw": args.hw, "batch": args.batch}))


if __name__ == "__main__":
    main()
