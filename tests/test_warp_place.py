"""Pallas placement kernels (ops/warp_fused.py) vs the XLA windowed fold.

Runs on the CPU test mesh: ``place_impl='kernel'`` auto-falls back to
Pallas interpret mode off-TPU (``ops.warp._fold_windowed_place``), so these
pin the kernel's *semantics*; hardware parity was verified bit-exact on
v5e (see ops/warp_fused.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose_transfer_tpu.ops.warp import (
    _support_windows,
    warp_fold_matmul,
)

N, H, W, C, T = 2, 64, 64, 16, 4
IMG = (H, W)


def _inputs(fit=True, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(N, H, W, C), dtype)
    warps = np.tile(np.array([1, 0, 0, 0, 1, 0, 0, 0], np.float32),
                    (N, T, 1))
    warps[:, 1] = [0.9, 0.1, 3.0, -0.15, 1.05, -2.0, 0, 0]
    warps[:, 2] = [1.2, -0.3, -5.0, 0.2, 0.8, 4.0, 0, 0]
    warps[:, 3] = [1, 0, 1000, 0, 1, 1000, 0, 0]   # sentinel
    masks = np.zeros((N, T, H, W), np.float32)
    masks[:, 0] = 1.0
    if fit:
        masks[:, 1, 5:30, 8:30] = 1.0    # fits an aligned 32x32 window
        masks[:, 2, 40:60, 33:60] = 1.0
    else:
        masks[:, 1] = 1.0                # sprawls: windowed cond falls back
        masks[:, 2, 40:60, 33:60] = 1.0
    # part 3 mask stays empty (sentinel)
    g = jnp.asarray(rng.randn(N, H, W, C), dtype)
    return f, jnp.asarray(warps), jnp.asarray(masks, dtype), g


@pytest.mark.parametrize("fit", [True, False])
def test_kernel_placement_matches_xla_windowed(fit):
    f, warps, masks, g = _inputs(fit)

    def run(place):
        fold = lambda x: warp_fold_matmul(  # noqa: E731
            x, warps, masks, IMG, "max", True, (), place)
        out, vjp = jax.vjp(fold, f)
        return out, vjp(g)[0]

    out_x, df_x = run("xla")
    out_k, df_k = run("kernel")
    # placement itself is exact; window *alignment* differs between the
    # impls (exactness-neutral), and the kernel path's joint-part einsums
    # (_warp_batch_win_joint) tile the same f32 contractions differently —
    # ulp-level reassociation only (measured max 1.5e-5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(df_k), np.asarray(df_x),
                               atol=5e-5)


def test_kernel_placement_matches_full_fold():
    f, warps, masks, g = _inputs(fit=True)
    fold_full = lambda x: warp_fold_matmul(x, warps, masks, IMG)  # noqa
    fold_k = lambda x: warp_fold_matmul(  # noqa: E731
        x, warps, masks, IMG, "max", True, (), "kernel")
    out_f, vjp_f = jax.vjp(fold_full, f)
    out_k, vjp_k = jax.vjp(fold_k, f)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_f),
                               atol=1e-5)
    # grad atol: the joint-part backward (_warp_batch_t_win_joint) sums
    # all parts inside one f32 contraction; the full fold adds per-part
    # dot outputs sequentially — same math, different association
    # (measured max |Δ| 1.4e-5 on |df| ~0.76, rel ~2e-5)
    np.testing.assert_allclose(np.asarray(vjp_k(g)[0]),
                               np.asarray(vjp_f(g)[0]), atol=5e-5)


def test_kernel_placement_with_static_empty():
    f, warps, masks, g = _inputs(fit=True)
    se = (3,)
    fold_x = lambda x: warp_fold_matmul(  # noqa: E731
        x, warps, masks, IMG, "max", True, se, "xla")
    fold_k = lambda x: warp_fold_matmul(  # noqa: E731
        x, warps, masks, IMG, "max", True, se, "kernel")
    out_x, vjp_x = jax.vjp(fold_x, f)
    out_k, vjp_k = jax.vjp(fold_k, f)
    # 5e-5: joint-part einsum tiling reassociation (see above)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(vjp_k(g)[0]),
                               np.asarray(vjp_x(g)[0]), atol=5e-5)


def test_joint_group_chunking_matches(monkeypatch):
    """PT_WARP_JOINT_GROUP chunks the joint fwd/bwd einsums into part
    groups — results must be identical to the unchunked joint dots, and
    non-positive values must mean 'no chunking' (not crash)."""
    f, warps, masks, g = _inputs(fit=True)
    fold = lambda x: warp_fold_matmul(  # noqa: E731
        x, warps, masks, IMG, "max", True, (), "kernel")
    out_ref, vjp_ref = jax.vjp(fold, f)
    df_ref = vjp_ref(g)[0]
    for val in ("2", "1", "-3"):
        monkeypatch.setenv("PT_WARP_JOINT_GROUP", val)
        out_c, vjp_c = jax.vjp(fold, f)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_ref),
                                   atol=2e-5, err_msg=f"group={val}")
        np.testing.assert_allclose(np.asarray(vjp_c(g)[0]),
                                   np.asarray(df_ref), atol=2e-5,
                                   err_msg=f"group={val}")


def test_aligned_support_windows_cover_and_fit():
    """x_align=32 starts stay 32-aligned, in-bounds, and cover the support
    whenever ``fits``; rounding only ever turns fits off, never on."""
    rng = np.random.RandomState(1)
    masks = np.zeros((4, 3, H, W), np.float32)
    for n in range(4):
        for t in range(3):
            y0, x0 = rng.randint(0, H - 8, 2)
            hh, ww = rng.randint(4, 40, 2)
            masks[n, t, y0:min(H, y0 + hh), x0:min(W, x0 + ww)] = 1.0
    m = jnp.asarray(masks)
    s = H // 2
    y0a, x0a, fits_a, empty_a = map(np.asarray,
                                    _support_windows(m, s, s, x_align=32))
    y0u, x0u, fits_u, empty_u = map(np.asarray, _support_windows(m, s, s))
    assert (x0a % 32 == 0).all() and (x0a + s <= W).all()
    assert (fits_a <= fits_u).all()      # alignment can only shrink fits
    nz = masks > 0
    for n in range(4):
        for t in range(3):
            if not fits_a[n, t] or empty_a[n, t]:
                continue
            ys, xs = np.where(nz[n, t])
            assert ys.min() >= y0a[n, t] and ys.max() < y0a[n, t] + s
            assert xs.min() >= x0a[n, t] and xs.max() < x0a[n, t] + s


def test_batch_chunked_placement_matches(monkeypatch):
    """PT_WARP_PLACE_CHUNK_MB forces the lax.map batch-chunked fold (the
    b64-OOM guard) — forward and gradient must match the single-call
    plan (chunking only sequences independent per-sample folds)."""
    f, warps, masks, g = _inputs(fit=True)
    fold = lambda x: warp_fold_matmul(  # noqa: E731
        x, warps, masks, IMG, "max", True, (), "kernel")
    out_ref, vjp_ref = jax.vjp(fold, f)
    df_ref = vjp_ref(g)[0]
    # per-sample stack at this shape (3 active parts) is ~0.66 MB → a
    # 1 MB cap chunks N=2 into two single-sample calls
    monkeypatch.setenv("PT_WARP_PLACE_CHUNK_MB", "1")
    from pose_transfer_tpu.ops.warp import _place_batch_chunk
    assert _place_batch_chunk(N, H, W, C, 3, 4) == 1
    out_c, vjp_c = jax.vjp(fold, f)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(vjp_c(g)[0]), np.asarray(df_ref),
                               atol=2e-5)


def test_ragged_batch_chunk_matches(monkeypatch):
    """A batch with no divisor under the chunk budget must run k full
    chunks + one smaller tail call (not degrade to 1-sample chunks) and
    match the single-call plan exactly on forward and gradient."""
    from pose_transfer_tpu.ops import warp as warp_mod

    # nc no longer shrinks to a divisor of n: 3 active parts at f32 is
    # ~0.5625 MB/sample → a 2 MB cap fits 3 samples; n=7 must chunk as
    # 3+3+1 (nc=3), not degrade to seven 1-sample calls
    monkeypatch.setenv("PT_WARP_PLACE_CHUNK_MB", "2")
    assert warp_mod._place_batch_chunk(7, H, W, C, 3, 4) == 3
    monkeypatch.delenv("PT_WARP_PLACE_CHUNK_MB")
    f, warps, masks, g = _inputs(fit=True)
    f3 = jnp.concatenate([f, f[:1]])
    w3 = jnp.concatenate([warps, warps[:1]])
    m3 = jnp.concatenate([masks, masks[:1]])
    g3 = jnp.concatenate([g, g[:1]])
    fold = lambda x: warp_fold_matmul(  # noqa: E731
        x, w3, m3, IMG, "max", True, (), "kernel")
    out_ref, vjp_ref = jax.vjp(fold, f3)
    df_ref = vjp_ref(g3)[0]
    monkeypatch.setattr(warp_mod, "_place_batch_chunk",
                        lambda *a, **k: 2)   # 3 = 1×2 + tail of 1
    out_c, vjp_c = jax.vjp(fold, f3)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(vjp_c(g3)[0]), np.asarray(df_ref),
                               atol=2e-5)


@pytest.mark.parametrize("place", ["xla", "kernel"])
@pytest.mark.parametrize("fit", [True, False])
def test_primal_no_idx_matches_vjp_forward(place, fit):
    """The primal (no-AD) fold skips argmax emission (emit_idx=False —
    the disc-phase/inference path); its output must equal the VJP
    forward's bitwise, windowed-or-not, on both placement impls."""
    f, warps, masks, g = _inputs(fit)
    fold = lambda x: warp_fold_matmul(  # noqa: E731
        x, warps, masks, IMG, "max", True, (), place)
    out_primal = fold(f)                  # primal: emit_idx=False
    out_ad, _ = jax.vjp(fold, f)          # AD fwd: emit_idx=True
    np.testing.assert_array_equal(np.asarray(out_primal),
                                  np.asarray(out_ad))


def test_primal_no_idx_matches_full_fold_and_static_empty():
    f, warps, masks, g = _inputs(fit=True)
    for kwargs in (dict(), dict(static_empty=(3,))):
        se = kwargs.get("static_empty", ())
        fold = lambda x: warp_fold_matmul(  # noqa: E731
            x, warps, masks, IMG, "max", False, se)
        np.testing.assert_array_equal(
            np.asarray(fold(f)), np.asarray(jax.vjp(fold, f)[0]))


def test_fold_place_stream_matches_monolithic():
    """``fold_place_stream`` (the part-group streaming variant measured by
    tools/bench_fold.py --experiment partstream — VERDICT r3 next #5's
    suggested structure) must be BIT-exact vs the monolithic
    ``fold_place`` when fed the same wins stack: same strict-max/argmax
    semantics, state carried through the aliased buffers across groups,
    body init and zero-contribution pass applied by the caller."""
    from pose_transfer_tpu.ops import warp as warp_mod
    from pose_transfer_tpu.ops import warp_fused as wf

    f, warps, masks, _ = _inputs(fit=True, dtype=jnp.bfloat16)
    h, w, c = f.shape[1:]
    s_y, s_x = warp_mod._kernel_window_sizes(h, w)
    masks_r = warp_mod.resize_bilinear(masks.astype(f.dtype), (h, w))
    y0, x0, _, _ = _support_windows(masks_r, s_y, s_x, wf.X_ALIGN)
    actives = warp_mod._place_actives(T, ())
    sel = list(actives)
    mwins = jnp.stack([warp_mod._slice_win(masks_r[:, i], y0[:, i],
                                           x0[:, i], s_y, s_x)
                       for i in sel], axis=1)
    offs = warp_mod._place_offs(y0, x0, actives)
    zero_nb = (masks_r[:, 1:] == 0).any(axis=1).astype(f.dtype)
    body = warp_mod._warp_batch(f, warps[:, 0], IMG) \
        * masks_r[:, 0][..., None]
    wins = warp_mod._warp_batch_win_joint(f, warps[:, sel], y0[:, sel],
                                          x0[:, sel], s_y, s_x, IMG)

    out_ref, idx_ref = wf.fold_place(body, wins, mwins, zero_nb, offs,
                                     interpret=True, emit_idx=True)

    acc, idx = body, jnp.zeros(body.shape, jnp.bfloat16)
    for k in range(len(sel)):      # one part per group: 3 groups
        s = slice(k, k + 1)
        acc, idx = wf.fold_place_stream(acc, idx, wins[:, s], mwins[:, s],
                                        offs[:, s], interpret=True)
    take0 = (zero_nb > 0)[..., None] & (acc < 0)
    out = jnp.where(take0, jnp.zeros((), acc.dtype), acc)
    idx = jnp.where(take0, jnp.asarray(-1.0, idx.dtype), idx)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    # primal-only stream (idx=None — the only variant that fits VMEM at
    # 256²/C=64, what --experiment partstream actually times)
    acc = body
    for k in range(len(sel)):
        s = slice(k, k + 1)
        acc, no_idx = wf.fold_place_stream(acc, None, wins[:, s],
                                           mwins[:, s], offs[:, s],
                                           interpret=True)
        assert no_idx is None
    out_p = jnp.where((zero_nb > 0)[..., None] & (acc < 0),
                      jnp.zeros((), acc.dtype), acc)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_ref))
