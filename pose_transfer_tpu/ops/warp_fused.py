"""Pallas TPU kernels: windowed warp-fold placement and backward routing.

The deformable warp fold (reference: src_deformable/utils/pose_transform.py
:60-92) is max_t(warp_t(features)·mask_t). The XLA windowed fold
(``ops.warp._fold_windowed``) computes each part's warp only inside its mask
bounding-box window — but places the windows into the running max/argmax
with per-sample ``dynamic_slice``/``dynamic_update_slice`` chains (XLA has
no batched-offset window update that doesn't lower to scatter). At batch 48
those chains are the train step's single biggest cost: 116 ms/step of
gather/scatter events plus the accumulator's per-part HBM round trips
(tools/profile_trace.py, 2026-08-17).

These kernels replace exactly that bookkeeping — placement, mask-zero
semantics, max, argmax — while XLA keeps what it is good at (the batched
ramp-build einsums of the warps themselves):

- ``fold_place``: grid (N, P), parts innermost. The out/argmax blocks stay
  resident in VMEM across all parts of a sample (Mosaic revisiting), so the
  fold's accumulator traffic is ONE write instead of P round trips, and
  window placement is a VMEM slice at a dynamic (sublane-aligned) offset
  instead of a dispatched XLA op per sample.
- ``fold_route``: the backward's router — slices the cotangent/argmax
  windows and zeroes non-winning lanes, emitting the stacked per-part
  window cotangents that feed XLA's transposed einsums.

Both kernels are pure VPU (no dots): their cost is the window traffic
itself.

Dead ends measured on v5e (stage-0 shape 8×256×256×64, T=10, bf16) so they
are not revisited:
- whole-sample fused two-pass warp kernel (grid (N,), T-part loop with
  pass1→transpose→pass2 per part, fold in VMEM): 100.8 ms vs 9.2 ms for
  the XLA full fold. Ablation: pass-1 dots 7.7 ms (ramp build fused, ~free),
  the chunked in-VMEM transpose +5.2 ms, pass-2 +4.7 ms, and **int8 argmax
  select/store +83 ms — Mosaic scalarizes int8 selects** (an int8-argmax
  variant ran 11 232 ms vs 11.7 ms with a bfloat16 argmax). Even with the
  bf16 fix the design floors at ~18 ms: 5 120 sequential (256,256)@(256,64)
  dots cost ~2.3 µs each in fori_loop (no cross-iteration pipelining), 2.7×
  the XLA einsums' fused schedule. Conclusion: don't fight XLA's batched
  GEMMs; fuse the bookkeeping instead. Argmax is bfloat16 in-kernel always
  (exact for part indices ≤ 9 and the -1 sentinel).

Mosaic rules honoured: no int8 anywhere, compares in f32, dynamic starts
only on outer dims or sublane-tile-aligned sublane starts (window x-starts
are X_ALIGN-aligned by ``ops.warp._support_windows``), int32 iota only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RCH = 8        # minimum rows per placement chunk (s_y must divide by it)


def _rch(sy: int) -> int:
    """Rows per placement chunk: the largest of 32/16/8 dividing ``sy``.
    Bigger chunks mean fewer sequential fori_loop iterations per part
    (measured at 256²/b32: RCH 16 → 304.5 img/s vs 8 → 302.7)."""
    for r in (32, 16, 8):
        if sy % r == 0:
            return r
    raise ValueError(f"window rows {sy} not a multiple of {RCH}")
# Window x-start alignment. Mosaic requires dynamic sublane starts aligned
# to the sublane tile; 16 covers bf16 (tile 16) and f32 (tile 8). The
# windows are widened by this much (ops.warp._kernel_window_sizes), so a
# smaller alignment means less extra einsum/traffic width.
X_ALIGN = 16


def _vmem_params():
    # v5e scoped VMEM tops out at 128 MiB; C=64 blocks lane-pad to 128 so
    # budgets run ~2x the nominal buffer sizes.
    return pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)


def _place_kernel(rch, emit_idx, offs_ref, zero_ref, body_ref, wins_ref,
                  mwins_ref, out_ref, *rest):
    """One (sample, part) cell: strict-> max-update of the part's window.

    offs_ref: (1, P, 3) SMEM int32 [y0, x0, part_index] per part
    (x0 X_ALIGN-aligned; part_index is the original part number stored
    into the argmax).
    zero_ref: (1, H, W) 'some non-body part contributes an exact zero
    here' flags (> 0 = true) — consumed by the fused final
    zero-contribution pass at the last part.
    body_ref: (1, H, W, C) pre-masked body warp (initialises the fold).
    wins_ref: (1, 1, SY, SX, C) this part's UNMASKED windowed warp; the
    mask window (mwins_ref, (1, 1, SY, SX)) multiplies in VMEM — the
    pre-masked wins stack never round-trips HBM for the multiply.
    out_ref (+ idx_ref when ``emit_idx``): (1, H, W, C) running max /
    bf16 argmax — resident in VMEM across the part dimension (innermost
    grid dim, constant index map). ``emit_idx=False`` (the primal path:
    disc-phase generator forwards, inference) drops the argmax buffer
    entirely — its init, per-chunk select traffic, and full-res HBM
    writeback are only paid when a VJP will consume it.
    """
    idx_ref = rest[0] if emit_idx else None
    p = pl.program_id(1)
    sy, sx = wins_ref.shape[2], wins_ref.shape[3]
    w, c = out_ref.shape[2], out_ref.shape[3]

    @pl.when(p == 0)
    def _():
        out_ref[...] = body_ref[...]
        if emit_idx:
            idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    y0 = offs_ref[0, p, 0]
    x0 = pl.multiple_of(offs_ref[0, p, 1], X_ALIGN)
    pv = offs_ref[0, p, 2].astype(jnp.float32).astype(jnp.bfloat16)

    def chunk(i, _):
        r0 = y0 + i * rch
        cur = out_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :]
        # mask multiply in f32 (Mosaic only inserts minor dims on 32-bit
        # lanes), rounded back to the wins dtype BEFORE the compare — the
        # f32 product of two bf16 values is exact and its bf16 rounding is
        # bit-identical to XLA's bf16 elementwise multiply, and comparing
        # the rounded value keeps argmax ties identical to the XLA path.
        mw = mwins_ref[0, 0, pl.ds(i * rch, rch)].astype(jnp.float32)
        zf = wins_ref[0, 0, pl.ds(i * rch, rch)].astype(jnp.float32) \
            * mw[..., None]
        z = zf.astype(out_ref.dtype)
        take = z.astype(jnp.float32) > cur.astype(jnp.float32)
        out_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :] = \
            jnp.where(take, z, cur)
        if emit_idx:
            curi = idx_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :]
            idx_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :] = \
                jnp.where(take, jnp.broadcast_to(pv, (rch, sx, c)), curi)
        return 0

    jax.lax.fori_loop(0, sy // rch, chunk, 0)

    # fused zero-contribution pass: where some non-body part contributed
    # an exact zero and the running max is negative, zero wins (idx -1 —
    # a dropped gradient, same subgradient rule as the XLA post-pass this
    # replaces). Runs on the VMEM-resident blocks at the last part, before
    # their single HBM writeback — the out/idx full-res read-modify-write
    # XLA pass this used to be is gone.
    @pl.when(p == pl.num_programs(1) - 1)
    def _():
        # f32 minor-dim insertion (Mosaic 32-bit-lane rule), broadcast
        # against the channel axis via compare
        zero = zero_ref[...].astype(jnp.float32)[..., None]   # (1,H,W,1)
        out = out_ref[...]
        take0 = (zero > 0.0) & (out.astype(jnp.float32) < 0.0)
        out_ref[...] = jnp.where(take0, jnp.zeros((), out.dtype), out)
        if emit_idx:
            idx = idx_ref[...]
            idx_ref[...] = jnp.where(take0, jnp.asarray(-1.0, idx.dtype),
                                     idx)


def fold_place(body: jax.Array, wins: jax.Array, mwins: jax.Array,
               zero_nb: jax.Array, offs: jax.Array,
               interpret: bool = False, emit_idx: bool = True):
    """Window-placement max fold (mask multiply + zero pass fused in).

    Args:
      body: (N, H, W, C) pre-masked full-resolution body warp (part 0).
      wins: (N, P, SY, SX, C) UNMASKED windowed part warps, in fold order.
      mwins: (N, P, SY, SX) resized-mask windows (multiplied in VMEM).
      zero_nb: (N, H, W) flags (> 0) marking pixels where some non-body
        part contributes an exact zero (drives the final zero pass).
      offs: (N, P, 3) int32 [y0, x0, part_index] per part; x0
        X_ALIGN-aligned, in-bounds (``_support_windows`` guarantees both),
        part_index = original part number stored into the argmax.
      emit_idx: emit the argmax output. False on the primal (no-VJP) path
        — XLA cannot dead-code a custom call's unused output, so the
        no-grad forward gets a kernel without the buffer at all.

    Returns:
      out: (N, H, W, C) max-fold, zero pass applied; idx: (N, H, W, C)
        bf16 argmax part index (-1 where zero won), or None when
        ``emit_idx`` is False.
    """
    n, h, w, c = body.shape
    p = wins.shape[1]
    sy, sx = wins.shape[2], wins.shape[3]

    out_block = pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        functools.partial(_place_kernel, _rch(sy), emit_idx),
        grid=(n, p),
        in_specs=[
            pl.BlockSpec((1, p, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sy, sx, c), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sy, sx), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block, out_block] if emit_idx else [out_block],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), body.dtype),
        ] + ([jax.ShapeDtypeStruct((n, h, w, c), jnp.bfloat16)]
             if emit_idx else []),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(offs, zero_nb, body, wins, mwins)
    return res if emit_idx else (res[0], None)


def _place_stream_kernel(rch, emit_idx, offs_ref, acc_in_ref, *rest):
    """Streaming variant of ``_place_kernel``: accumulate one part GROUP
    into an existing fold state (carried through HBM between groups)
    instead of initializing from the body and finishing with the zero
    pass. The in/out state buffers are input_output_aliased, so each
    group costs one extra out+idx HBM round trip vs the monolithic
    kernel — the price of never materializing the whole wins stack.
    Measured by ``tools/bench_fold.py --experiment partstream`` (results
    recorded there).

    VMEM note: with ``emit_idx`` the kernel carries FOUR full-resolution
    state windows (acc/idx in + out) against the monolithic kernel's
    three — at 256²/C=64 (16 MiB per lane-padded block, double-buffered)
    that exceeds the 127 MiB scoped budget and Mosaic refuses to compile;
    the idx-carrying stream therefore cannot even run at the shape the
    wins-stack concern is about. The primal-only variant fits and is what
    the partstream experiment times."""
    if emit_idx:
        idx_in_ref, wins_ref, mwins_ref, out_ref, idx_ref = rest
    else:
        wins_ref, mwins_ref, out_ref = rest
        idx_in_ref = idx_ref = None
    p = pl.program_id(1)
    sy, sx = wins_ref.shape[2], wins_ref.shape[3]
    w, c = out_ref.shape[2], out_ref.shape[3]

    @pl.when(p == 0)
    def _():
        out_ref[...] = acc_in_ref[...]
        if emit_idx:
            idx_ref[...] = idx_in_ref[...]

    y0 = offs_ref[0, p, 0]
    x0 = pl.multiple_of(offs_ref[0, p, 1], X_ALIGN)
    pv = offs_ref[0, p, 2].astype(jnp.float32).astype(jnp.bfloat16)

    def chunk(i, _):
        r0 = y0 + i * rch
        cur = out_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :]
        mw = mwins_ref[0, 0, pl.ds(i * rch, rch)].astype(jnp.float32)
        zf = wins_ref[0, 0, pl.ds(i * rch, rch)].astype(jnp.float32) \
            * mw[..., None]
        z = zf.astype(out_ref.dtype)
        take = z.astype(jnp.float32) > cur.astype(jnp.float32)
        out_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :] = \
            jnp.where(take, z, cur)
        if emit_idx:
            curi = idx_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :]
            idx_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :] = \
                jnp.where(take, jnp.broadcast_to(pv, (rch, sx, c)), curi)
        return 0

    jax.lax.fori_loop(0, sy // rch, chunk, 0)


def fold_place_stream(acc: jax.Array, idx: jax.Array | None,
                      wins: jax.Array, mwins: jax.Array, offs: jax.Array,
                      interpret: bool = False):
    """Fold one part group into (acc, idx) — the verdict-r3 #5 candidate
    'stream part-chunks of the joint einsum through the placement kernel'.
    ``acc``/``idx`` are donated (input_output_aliased): the state updates
    in place, so only one group's (N, Pg, SY, SX, C) wins stack is live at
    a time when sequenced by ``lax.scan``. The caller initializes the
    state from the pre-masked body warp (idx 0) and applies the
    zero-contribution pass after the last group — the monolithic
    ``fold_place`` fuses both into the kernel; this variant pays them as
    XLA passes plus (groups−1) extra state round trips.

    ``idx=None`` runs the primal-only stream (no argmax carry) — the only
    variant that fits VMEM at 256²/C=64 (see ``_place_stream_kernel``).
    Returns (out, idx) with ``idx`` None in that mode."""
    emit_idx = idx is not None
    n, h, w, c = acc.shape
    p = wins.shape[1]
    sy, sx = wins.shape[2], wins.shape[3]
    out_block = pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    win_specs = [
        pl.BlockSpec((1, 1, sy, sx, c), lambda i, j: (i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, sy, sx), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    offs_spec = pl.BlockSpec((1, p, 3), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    res = pl.pallas_call(
        functools.partial(_place_stream_kernel, _rch(sy), emit_idx),
        grid=(n, p),
        in_specs=([offs_spec, out_block, out_block] + win_specs
                  if emit_idx else [offs_spec, out_block] + win_specs),
        out_specs=[out_block, out_block] if emit_idx else [out_block],
        out_shape=[jax.ShapeDtypeStruct((n, h, w, c), acc.dtype)]
        + ([jax.ShapeDtypeStruct((n, h, w, c), idx.dtype)]
           if emit_idx else []),
        input_output_aliases={1: 0, 2: 1} if emit_idx else {1: 0},
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(*((offs, acc, idx, wins, mwins) if emit_idx
        else (offs, acc, wins, mwins)))
    return res if emit_idx else (res[0], None)


def _route_kernel(rch, offs_ref, g_ref, idx_ref, mask0_ref, mwins_ref,
                  gwin_ref, gbody_ref):
    """One (sample, part) cell: route the cotangent window to this part.

    gwin = g[window] · mask_window where idx[window] == part else 0 —
    pre-masked for XLA's transposed einsums, so the routed stack makes
    only one HBM trip. At part 0 the body route (gbody = g·mask0 where
    idx == 0) is emitted from the already-resident g/idx blocks, replacing
    a full-res XLA where+multiply pass.
    g_ref/idx_ref blocks are resident across the part dimension.
    """
    p = pl.program_id(1)
    sy, sx = gwin_ref.shape[2], gwin_ref.shape[3]

    @pl.when(p == 0)
    def _():
        gb = g_ref[...]
        sel0 = idx_ref[...].astype(jnp.float32) == 0.0
        # f32 broadcast/multiply, rounded back (see _place_kernel.chunk)
        m0 = mask0_ref[...].astype(jnp.float32)[..., None]
        gsel = jnp.where(sel0, gb, jnp.zeros((), gb.dtype))
        gbody_ref[...] = (gsel.astype(jnp.float32) * m0).astype(gb.dtype)

    y0 = offs_ref[0, p, 0]
    x0 = pl.multiple_of(offs_ref[0, p, 1], X_ALIGN)
    pv = offs_ref[0, p, 2].astype(jnp.float32)

    def chunk(i, _):
        r0 = y0 + i * rch
        gw = g_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :]
        iw = idx_ref[0, pl.ds(r0, rch), pl.ds(x0, sx), :]
        mw = mwins_ref[0, 0, pl.ds(i * rch, rch)].astype(jnp.float32)
        sel = iw.astype(jnp.float32) == pv
        gsel = jnp.where(sel, gw, jnp.zeros((), gw.dtype))
        gwin_ref[0, 0, pl.ds(i * rch, rch)] = \
            (gsel.astype(jnp.float32) * mw[..., None]).astype(gw.dtype)
        return 0

    jax.lax.fori_loop(0, sy // rch, chunk, 0)


def fold_route(g: jax.Array, idx: jax.Array, mask0: jax.Array,
               mwins: jax.Array, offs: jax.Array,
               sy: int, sx: int, interpret: bool = False):
    """Backward router: stacked per-part window cotangents + body route.

    Args:
      g: (N, H, W, C) fold cotangent.
      idx: (N, H, W, C) bf16 argmax from ``fold_place`` (zero pass applied
        in-kernel — -1 entries route to no part).
      mask0: (N, H, W) resized body mask (multiplies the body route).
      mwins: (N, P, SY, SX) resized-mask windows (multiply the routed
        window cotangents in VMEM).
      offs: as in ``fold_place``.
      sy, sx: static window sizes.

    Returns:
      gwins: (N, P, SY, SX, C) routed, mask-multiplied window cotangents;
      gbody: (N, H, W, C) body-routed cotangent (idx == 0, ·mask0).
    """
    n, h, w, c = g.shape
    p = offs.shape[1]

    return pl.pallas_call(
        functools.partial(_route_kernel, _rch(sy)),
        grid=(n, p),
        in_specs=[
            pl.BlockSpec((1, p, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sy, sx), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, sy, sx, c), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p, sy, sx, c), g.dtype),
            jax.ShapeDtypeStruct((n, h, w, c), g.dtype),
        ],
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(offs, g, idx, mask0, mwins)


def supported(h: int, w: int, c: int, s_y: int, s_x: int,
              itemsize: int = 2) -> bool:
    """Shapes the placement kernels handle: chunked rows, sublane-tileable
    window width/starts, lane-tileable channels — and a VMEM budget that
    fits the v5e scoped limit (the big blocks are double-buffered across
    samples; f32 at 256²/C=64 measures 167 MB > the 127 MB limit, so it
    falls back to the XLA placement path)."""
    if not (s_y % RCH == 0 and s_x % 16 == 0 and w % X_ALIGN == 0
            and c % 8 == 0):
        return False
    pc = -(-c // 128) * 128       # lane padding of the channel dim
    px = -(-s_x // 128) * 128     # lane padding of the mask-window width
    pw = -(-w // 128) * 128       # lane padding of the zero-flag width
    # dominant residents ×2 buffering levels: place = body+out (itemsize)
    # + idx (bf16); route = g+gbody (itemsize) + idx (bf16) — same term.
    resid = 2 * h * w * pc * (2 * itemsize + 2)
    wins = 2 * s_y * s_x * pc * itemsize          # wins / gwin window
    small = 2 * (s_y * px + h * pw) * itemsize    # mwins + zero/mask0
    return resid + wins + small <= 120 * 1024 * 1024
