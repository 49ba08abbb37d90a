"""Fused (shifted-)window attention — Pallas TPU kernel.

Why: the XLA lowering of window attention materializes the per-window score
tensor (nw, heads, N, N) in fp32 in HBM with ~4x tile padding (N=36 pads to
(40,128) lanes) plus a baked (nw, N, N) shift-mask constant — measured 4.95GB
of HLO temps and ~85ms/layer for a (4,624,624,96) input on v5e.  This kernel
keeps scores entirely in VMEM, never materializes the mask (the swin shift
mask is *computed arithmetically* from the window's grid position), and
streams windows through in blocks.

MXU packing: windows are tiny (N=36 or 64 tokens) against the 128-lane MXU,
so ``pack = 128 // N`` windows are concatenated along the token axis and
attended jointly with a block-diagonal mask — off-diagonal scores are set to
-inf before the softmax, making the packed PV matmul *exactly* the per-window
result while using a 108- or 128-wide MXU pass instead of 3-4 narrow ones.

Layout: windows arrive as (nw, N, 3C) packed QKV (already projected — the
projections are dense matmuls XLA already runs well).  Output (nw, N, C).

Shift-mask arithmetic: with torch.roll(-s) + window partition, only the last
window row/column contains wrapped tokens.  Token (ti, tj) of a last-row
window belongs to the wrapped region iff ti >= ws - s (same for columns), so
the region id is 2 bits and masking region_i != region_j reproduces the
reference mask (as an additive -100, the torchvision value).
"""
from __future__ import annotations

import functools

import os as _os_mod

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# perf probe only (NUNIF_TPU_SWIN_SKIP_BIAS=1): drops the bias/mask VPU
# passes from the wpack kernel to bound their cost — WRONG NUMERICS.
# Strict '== "1"' parse (any other value is off) so a stray truthy string
# can neither crash at trace time nor silently flip numerics; warn loudly
# when the probe is active.
_PERF_PROBE_SKIP_BIAS = (
    _os_mod.environ.get("NUNIF_TPU_SWIN_SKIP_BIAS", "0") == "1")
if _PERF_PROBE_SKIP_BIAS:
    import logging as _logging
    _logging.getLogger("nunif_tpu").warning(
        "NUNIF_TPU_SWIN_SKIP_BIAS=1: swin kernel bias/mask passes DISABLED "
        "— outputs are numerically WRONG (perf probe only)")

# perf probe only (NUNIF_TPU_SWIN_SKIP_ATTN=1): replaces the attention
# output with q — bounds the non-attention framework cost (dense matmuls,
# residuals, gelu, HBM) of the fused block.  WRONG NUMERICS.
_PERF_PROBE_SKIP_ATTN = (
    _os_mod.environ.get("NUNIF_TPU_SWIN_SKIP_ATTN", "0") == "1")
if _PERF_PROBE_SKIP_ATTN:
    import logging as _logging
    _logging.getLogger("nunif_tpu").warning(
        "NUNIF_TPU_SWIN_SKIP_ATTN=1: swin kernel attention DISABLED "
        "— outputs are numerically WRONG (perf probe only)")


def _kernel(qkv_ref, bias_ref, out_ref, *, num_heads, head_dim, n_tokens,
            window, shift, n_wh, n_ww, block_packs, pack):
    ws = window
    N = n_tokens
    NP = N * pack
    C = num_heads * head_dim
    blk = pl.program_id(0)

    # token -> packed-window index within the pack group
    tok_win = jax.lax.broadcasted_iota(jnp.int32, (block_packs, NP), 1) // N
    # block-diagonal validity: same packed window (all-true when pack == 1)
    blockdiag = (tok_win[:, :, None] == tok_win[:, None, :]) if pack > 1 \
        else None

    if shift > 0:
        # global window index of every token (block_packs, NP)
        w0 = blk * block_packs * pack
        widx = (w0
                + jax.lax.broadcasted_iota(jnp.int32, (block_packs, NP), 0) * pack
                + tok_win)
        wr = (widx // n_ww) % n_wh
        wc = widx % n_ww
        t = jax.lax.broadcasted_iota(jnp.int32, (block_packs, NP), 1) % N
        ti = t // ws
        tj = t % ws
        wrapped_r = jnp.where((wr == n_wh - 1) & (ti >= ws - shift), 1, 0)
        wrapped_c = jnp.where((wc == n_ww - 1) & (tj >= ws - shift), 2, 0)
        region = wrapped_r + wrapped_c  # (BP, NP)
        same_region = region[:, :, None] == region[:, None, :]
    else:
        same_region = None

    qkv = qkv_ref[:]  # (BP, NP, 3C)
    # log2-domain softmax with a row-max shift: fold log2(e) into the qk
    # scale and bias so the softmax is exp2(s - m)/sum.  The row max (one
    # VPU reduce over the scores already in registers) makes the kernel
    # exact for ANY activation magnitude — trained nets keep logits small,
    # but random-init/fine-tune blowups overflowed the previous fixed-shift
    # variant to inf/inf = NaN on TPU.  The -100 clamp keeps fully-masked
    # rows' denominators nonzero.
    LOG2E = 1.4426950408889634
    scale = jnp.asarray(head_dim ** -0.5 * LOG2E, qkv.dtype)
    for h in range(num_heads):
        # keep MXU inputs in the native (bf16) dtype — fp32 accumulation via
        # preferred_element_type; fp32 input copies would double VMEM traffic
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, :, C + h * head_dim:C + (h + 1) * head_dim]
        v = qkv[:, :, 2 * C + h * head_dim:2 * C + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (BP, NP, NP)
        # tile the (N, N) bias across the pack grid; off-diagonal blocks get
        # the wrong bias but are -inf masked below anyway
        bias_h = bias_ref[h].astype(jnp.float32) * LOG2E
        if pack > 1:
            bias_h = jnp.tile(bias_h, (pack, pack))
        scores = scores + bias_h[None]
        if same_region is not None:
            # -100.0 (×log2e in this domain) matches torchvision's mask value
            scores = jnp.where(same_region, scores,
                               scores - 100.0 * LOG2E)
        if pack > 1:  # at pack==1 blockdiag is all-true — skip the pass
            scores = jnp.where(blockdiag, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp2(jnp.maximum(scores - m, -100.0))
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            probs.astype(qkv.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (BP, NP, d)
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = o.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "shift", "n_wh", "n_ww",
                     "block_windows", "pack", "interpret"))
def fused_window_attention(qkv, bias, *, num_heads, window, shift,
                           n_wh, n_ww, block_windows=48, pack=None,
                           interpret=False):
    """qkv: (nw, N, 3C) with window order (batch, win_row, win_col);
    bias: (heads, N, N) fp32 relative position bias.
    Returns (nw, N, C) in qkv's dtype.
    """
    nw, N, c3 = qkv.shape
    C = c3 // 3
    head_dim = C // num_heads
    assert N == window * window

    # MXU token packing; prefer a pack that divides nw so no host-visible
    # pad copy of the (large) qkv array is needed.  The kernel is MXU
    # issue-rate bound (tiny per-window dots), so packing trades fewer,
    # larger dots against pack^2/pack more softmax elements; with the
    # max-free exp2 softmax the default below measured best on v5e.
    if pack is None:
        pack = 2 if N * 2 == 128 else 1
    while pack > 1 and nw % pack:
        pack -= 1
    # largest block (in windows) <= requested that divides nw
    bw = max(pack, (block_windows // pack) * pack)
    while bw > pack and (nw % bw):
        bw -= pack
    n_pad = (-nw) % bw
    if n_pad:  # only when even `pack` windows don't divide (odd nw)
        qkv = jnp.pad(qkv, ((0, n_pad), (0, 0), (0, 0)))
    nw_p = nw + n_pad
    block_windows = bw
    block_packs = block_windows // pack
    qkv = qkv.reshape(nw_p // pack, N * pack, c3)
    grid = (nw_p // block_windows,)

    out = pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, head_dim=head_dim, n_tokens=N,
            window=window, shift=shift, n_wh=n_wh, n_ww=n_ww,
            block_packs=block_packs, pack=pack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_packs, N * pack, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_packs, N * pack, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw_p // pack, N * pack, C), qkv.dtype),
        interpret=interpret,
    )(qkv, bias)
    out = out.reshape(nw_p, N, C)
    if n_pad:
        out = out[:nw]
    return out


# ---------------------------------------------------------------------------
# v3: whole-block kernel — qkv projection + window attention + out
# projection + MLP + both residuals in ONE pallas_call with all weights
# resident in VMEM.  Eliminates, per swin layer, the XLA-side qkv layout
# copy ({0,2,1}->{2,1,0}, ~2.9ms at full res), the separate qkv bias
# broadcast (~3.1ms), the proj+residual add_add fusion (~3.3ms) and the
# MLP matmul round trips — profiled together at ~40% of non-attention
# frame time for swin_unet_2x at 1080p.

def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf (|err| < 1.5e-7) — Mosaic has no erf
    primitive; this keeps the kernel's gelu numerically 'exact' at bf16
    activation resolution."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _attn_perhead(qkv, bias_ref, same_region, *, num_heads, head_dim, dtype):
    """Per-head window attention: 2*heads tiny dots per window.
    bias_ref layout: (heads, N, N)."""
    C = num_heads * head_dim
    LOG2E = 1.4426950408889634
    scale = jnp.asarray(head_dim ** -0.5 * LOG2E, dtype)
    head_outs = []
    for h in range(num_heads):
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, :, C + h * head_dim:C + (h + 1) * head_dim]
        v = qkv[:, :, 2 * C + h * head_dim:2 * C + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q * scale, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        scores = scores + bias_ref[h].astype(jnp.float32)[None] * LOG2E
        if same_region is not None:
            scores = jnp.where(same_region, scores, scores - 100.0 * LOG2E)
        # row-max shift: exact softmax for any activation magnitude (see
        # _kernel); the clamp bounds denominators away from 0
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp2(jnp.maximum(scores - m, -100.0))
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        head_outs.append(jax.lax.dot_general(
            probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dtype))
    return jnp.concatenate(head_outs, axis=-1)


def _attn_headpack(qkv, bias_ref, same_region_col, *, num_heads, head_dim,
                   dtype, vpu_denom=False):
    """Head-packed window attention: all heads in one wide pass pair.

    The per-head (N,hd)x(hd,N) dots are ~4%-utilized MXU passes (hd=16
    against the 128-deep contraction); packing all heads into block-masked
    wide operands replaces 2*heads+ tiny dots per window with ~4 wide ones:
      khat[p, c] = k[p % N, c] * (c in head p//N)      (P, C) block-masked
      scores[t, h*N+s] = sum_c q[t,c] khat[h*N+s, c]   (N, P) one dot
      vhat_aug = [v tiled/masked | ones-block cols]    (P, C+heads)
      out_unnorm = e @ vhat_aug — the ones columns accumulate each head's
      softmax denominator in the SAME matmul; a tiny (heads->C) 0/1 dot
      broadcasts denominators back over each head's channels.
    bias_ref layout: (N, heads*N), pre-scaled by log2(e).
    same_region_col: (BW, N, P) shift-region equality or None.
    """
    BW, N, _ = qkv.shape
    C = num_heads * head_dim
    P = num_heads * N
    LOG2E = 1.4426950408889634

    lane_head = jax.lax.broadcasted_iota(jnp.int32, (P, C), 1) // head_dim
    row_head = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) // N
    hmask = (lane_head == row_head).astype(dtype)            # (P, C)

    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]
    khat = jnp.tile(k, (1, num_heads, 1)) * hmask[None]      # (BW, P, C)
    vhat = jnp.tile(v, (1, num_heads, 1)) * hmask[None]

    scale = jnp.asarray(head_dim ** -0.5 * LOG2E, dtype)
    scores = jax.lax.dot_general(
        q * scale, khat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BW, N, P)
    scores = scores + bias_ref[:][None]
    if same_region_col is not None:
        scores = jnp.where(same_region_col, scores, scores - 100.0 * LOG2E)

    # a per-row max is constant across each head's segment, so subtracting
    # it leaves every per-head softmax exact; the clamp bounds denominators
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp2(jnp.maximum(scores - m, -100.0)).astype(dtype)

    onescols = (jax.lax.broadcasted_iota(jnp.int32, (P, num_heads), 1)
                == jax.lax.broadcasted_iota(
                    jnp.int32, (P, num_heads), 0) // N).astype(dtype)
    vhat_aug = jnp.concatenate(
        [vhat, jnp.broadcast_to(onescols[None], (BW, P, num_heads))],
        axis=-1)                                             # (BW, P, C+H)
    out_unnorm = jax.lax.dot_general(
        e, vhat_aug, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (BW, N, C+H)

    denom = out_unnorm[:, :, C:]                             # (BW, N, H)
    if vpu_denom:
        # broadcast each head's denominator over its head_dim channels on
        # the VPU (static lane slice + broadcast + concat — Mosaic has no
        # general lane-repeat reshape) instead of a third batched MXU dot;
        # the batched dots are issue-bound, the VPU is mostly idle here
        denom_b = jnp.concatenate(
            [jnp.broadcast_to(denom[:, :, h:h + 1],
                              denom.shape[:2] + (head_dim,))
             for h in range(num_heads)], axis=-1)            # (BW, N, C)
    else:
        rmat = (jax.lax.broadcasted_iota(
            jnp.int32, (num_heads, C), 1) // head_dim
            == jax.lax.broadcasted_iota(
                jnp.int32, (num_heads, C), 0)).astype(jnp.float32)
        denom_b = jax.lax.dot_general(
            denom, rmat, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BW, N, C)
    return (out_unnorm[:, :, :C] / denom_b).astype(dtype)


def _block_compute(x, wr, wc, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                   wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref,
                   *, num_heads, head_dim, window, shift, n_wh, n_ww,
                   attn_variant, shift_mode, out_dtype, win_coords=None,
                   kv_mask=None):
    """Shared whole-block body on pre-formed windows.

    x: (BW, N, C) window tokens in VMEM; wr/wc: (BW, 1) int32 global window
    grid coordinates (for the arithmetic shift mask).  Returns (BW, N, C).

    win_coords (required for wpack variants): callable
    ``(b_idx, t_idx) -> (wr, wc)`` mapping int32 index arrays (any
    broadcast-compatible shape; b_idx = block-row index, t_idx = packed
    element index with m lanes per window) to global window grid
    coordinates — masks for the window-packed kernel are built directly
    at their consumption geometry (lanes for the where path, sublanes
    for the vhat-row fold) because Mosaic cannot relayout-reshape bool
    vectors across sublanes/lanes.
    """
    BW, N, C = x.shape
    xt = x.reshape(BW * N, C)
    rowpack = _rowpack_of(attn_variant)
    wpack = _wpack_of(attn_variant)

    # qkv projection: (BW*N, C) @ (C, 3C) — one well-shaped MXU pass per
    # block instead of an XLA matmul + layout copy + bias pass
    qkv = jax.lax.dot_general(
        xt, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:][None].astype(jnp.float32)).astype(x.dtype)
    if wpack:
        # pre-grouped for the window-packed kernel: a free leading-dim
        # reshape here replaces three in-VMEM sublane relayouts inside it
        qkv = qkv.reshape(BW // wpack, wpack * N, 3 * C)
    else:
        # rowpack: x already arrived as (groups, G*N, C) image-order rows
        qkv = qkv.reshape(BW, N, 3 * C)

    same_region = None
    if shift > 0 and rowpack:
        # pad-shift key-valid mask at sublane geometry (nb, P, 1) — fully
        # shape-static, precomputed on the host (numpy) and streamed in as
        # row/col factor constants; key column p = h*NG + t is token t of
        # the group (h-major)
        assert shift_mode == "pad", "rowpack supports pad shift only"
        assert kv_mask is not None
        same_region = kv_mask                           # (BW, P, 1) bool
    elif shift > 0:
        ncol = N if attn_variant == "perhead" else num_heads * N

        def coords(m):
            """Per-element (window_row, window_col, in-window token) for a
            layout with m lanes per window: packed (BW/G, G*m) when wpack,
            else (BW, m) using the kernel-supplied wr/wc."""
            if wpack:
                b = jax.lax.broadcasted_iota(
                    jnp.int32, (BW // wpack, wpack * m), 0)
                t = jax.lax.broadcasted_iota(
                    jnp.int32, (BW // wpack, wpack * m), 1)
                wr_m, wc_m = win_coords(b, t)
                # lanes cycle j fastest within each window's m columns and
                # m is a multiple of N, so the token index is just t % N
                return wr_m, wc_m, t % N
            t = jax.lax.broadcasted_iota(jnp.int32, (BW, m), 1) % N
            return wr, wc, t

        if shift_mode == "pad":
            # pad-shift: the grid is (n_wh, n_ww) over an image padded by
            # `shift` top-left and `window-shift` bottom-right; a token is
            # valid iff its global coords land in the unpadded extent.
            # Masking invalid KEYS reproduces the roll+region-mask
            # semantics exactly for every valid query (invalid-query rows
            # are cropped by the caller).
            h_valid = (n_wh - 1) * window
            w_valid = (n_ww - 1) * window
            if wpack:
                # per-KEY mask built directly at sublane geometry
                # (BW/G, G*ncol, 1) so _attn_headpack_w can fold it into
                # the vhat_aug ROWS (one bf16 multiply on the PV operand)
                # instead of a where over the fp32 score volume — a
                # (nb,1,P)->(nb,P,1) relayout of the lane-built mask does
                # not lower in Mosaic, so build it here at its final shape
                nb = BW // wpack
                b3 = jax.lax.broadcasted_iota(
                    jnp.int32, (nb, wpack * ncol, 1), 0)
                t3 = jax.lax.broadcasted_iota(
                    jnp.int32, (nb, wpack * ncol, 1), 1)
                wr_c, wc_c = win_coords(b3, t3)
                tok = t3 % N
            else:
                wr_c, wc_c, tok = coords(ncol)
            row = wr_c * window - shift + tok // window
            col = wc_c * window - shift + tok % window
            kv = ((row >= 0) & (row < h_valid)
                  & (col >= 0) & (col < w_valid))   # (BW|BW/G, [G*]ncol)
            same_region = kv if wpack else kv[:, None, :]
        else:
            def region_of(m):
                wr_m, wc_m, tok = coords(m)
                ti = tok // window
                tj = tok % window
                wrapped_r = jnp.where(
                    (wr_m == n_wh - 1) & (ti >= window - shift), 1, 0)
                wrapped_c = jnp.where(
                    (wc_m == n_ww - 1) & (tj >= window - shift), 2, 0)
                return wrapped_r + wrapped_c

            rows = region_of(N)                     # (BW|BW/G, [G*]N)
            cols = region_of(ncol)                  # (BW|BW/G, [G*]ncol)
            same_region = rows[:, :, None] == cols[:, None, :]

    if _PERF_PROBE_SKIP_ATTN:
        attn = qkv[:, :, :C]
    elif rowpack:
        attn = _attn_headpack_w(qkv, bias_ref, same_region,
                                num_heads=num_heads, head_dim=head_dim,
                                wpack=rowpack, dtype=x.dtype)
    elif wpack:
        attn = _attn_headpack_w(qkv, bias_ref, same_region,
                                num_heads=num_heads, head_dim=head_dim,
                                wpack=wpack, dtype=x.dtype)
    elif attn_variant == "perhead":
        attn = _attn_perhead(qkv, bias_ref, same_region,
                             num_heads=num_heads, head_dim=head_dim,
                             dtype=x.dtype)
    elif attn_variant.startswith("headgroup"):
        G = int(attn_variant[len("headgroup"):] or "3")
        attn = _attn_headgroup(qkv, bias_ref, same_region,
                               num_heads=num_heads, head_dim=head_dim,
                               group=G, dtype=x.dtype)
    else:
        attn = _attn_headpack(qkv, bias_ref, same_region,
                              num_heads=num_heads, head_dim=head_dim,
                              dtype=x.dtype,
                              vpu_denom=(attn_variant == "headpack_vd"))
    attn = attn.reshape(BW * N, C)

    # out projection + residual 1
    proj = jax.lax.dot_general(
        attn, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y1 = (proj + bproj_ref[:][None].astype(jnp.float32)
          + xt.astype(jnp.float32)).astype(x.dtype)

    # MLP (norm="none" swin: no LN between) + residual 2
    h1 = jax.lax.dot_general(
        y1, wfc1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = h1 + bfc1_ref[:][None].astype(jnp.float32)
    # erf-gelu (torchvision MLP); polynomial erf, see _erf_poly
    h1 = 0.5 * h1 * (1.0 + _erf_poly(h1 * 0.7071067811865476))
    h1 = h1.astype(x.dtype)
    h2 = jax.lax.dot_general(
        h1, wfc2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = (h2 + bfc2_ref[:][None].astype(jnp.float32)
           + y1.astype(jnp.float32)).astype(out_dtype)
    return out.reshape(BW, N, C)


def _attn_headpack_w(qkv, bias_ref, same_region_col, *, num_heads, head_dim,
                     wpack, dtype):
    """Window-packed head-packed attention: G windows share one dot pair.

    The per-window MXU cost of the batched tiny dots is issue-latency
    bound, NOT weight-load or FLOP bound: tools/microbench_mxu_dots.py
    measures ~370-440 cycles per batch element for headpack (N=36,C=96),
    its lane-padded variant, int8, AND a 3-window token pack — i.e. the
    cost is per *dot instruction element*, independent of its size at
    these shapes.  Packing G windows into one (G*N, C) @ (C, G*heads*N)
    scores pass + one (G*N, P) PV pass amortizes that latency G ways:
    measured 132 ns/window at G=3 vs 444 ns at G=1 (bf16, v5e).

    Cross-window query/key pairs are computed but killed by a -30000
    additive baked into the pre-tiled bias CONSTANT (no runtime mask
    pass): after the row-max shift their exp2 is ~2^-100 ~ 8e-31, zero at
    any useful tolerance, so the packed result equals the per-window one.

    Layout — NO in-VMEM relayouts (Mosaic reshapes that merge batch into
    sublanes are expensive and killed a g-major prototype):
      * qkv arrives pre-grouped: (BW/G, G*N, 3C) — the caller merges G
        windows into the leading dim, a free leading-dim reshape.
      * packed key/value rows are h-major: row r = h*(G*N) + g*N + j, so
        khat/vhat come straight out of jnp.tile(k, (1, heads, 1)) with no
        reorder.
    bias_ref: (G*N, heads*G*N) fp32, pre-scaled by log2(e), relative
      position bias where the query and key window match and -30000
      elsewhere (the cross-window kill mask baked into the constant).
    same_region_col: packed shift mask — (BW/G, G*N, heads*G*N) bool full
      query×key mask (cyclic shift), or (BW/G, heads*G*N, 1) bool per-KEY
      column mask at sublane geometry (pad shift), or None.
    """
    nb, NG, _ = qkv.shape
    G = wpack
    N = NG // G
    C = num_heads * head_dim
    P = num_heads * NG
    LOG2E = 1.4426950408889634

    lane_head = jax.lax.broadcasted_iota(jnp.int32, (P, C), 1) // head_dim
    row_head = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) // NG
    hmask = (lane_head == row_head).astype(dtype)            # (P, C)

    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]
    khat = jnp.tile(k, (1, num_heads, 1)) * hmask[None]      # (nb, P, C)
    vhat = jnp.tile(v, (1, num_heads, 1)) * hmask[None]

    scale = jnp.asarray(head_dim ** -0.5 * LOG2E, dtype)
    scores = jax.lax.dot_general(
        q * scale, khat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (nb, NG, P)
    # pad-shift masks are per-KEY only, passed at sublane geometry
    # (nb, P, 1): instead of a where pass on the fp32 score volume, zero
    # the killed keys' vhat_aug ROWS — e @ vhat then sums exactly the
    # valid keys in BOTH the numerator and the ones-column denominators,
    # one bf16 pass on the (P, C+H) operand (~NG× smaller volume than
    # the where).  Fully-invalid query rows get denom 0; the denominator
    # floor below maps them to 0 instead of NaN (they are cropped by the
    # caller either way).
    kv_rows = None
    if same_region_col is not None and same_region_col.shape[2] == 1:
        kv_rows = same_region_col                            # (nb, P, 1)
    if not _PERF_PROBE_SKIP_BIAS:
        scores = scores + bias_ref[:][None]
        if same_region_col is not None and kv_rows is None:
            scores = jnp.where(same_region_col, scores,
                               scores - 100.0 * LOG2E)

    # static-clamp softmax: exp2 is shift-invariant under the /sum, so no
    # row-max pass is needed — the [-100, 60] clamp makes the kernel
    # NaN-free for ANY activation magnitude (denominators >= exp2(-100),
    # numerators <= exp2(60), sums < 1e21 << fp32 max).  Exact whenever
    # |log2-domain scores| <= 60, i.e. |logits| <= ~41 — far above any
    # trained net; beyond that probabilities saturate instead of the old
    # fixed-shift variant's inf/inf NaN.  Removes the cross-lane max
    # reduce + subtract (~2 VPU passes on the packed score volume).
    e = jnp.exp2(jnp.clip(scores, -100.0, 60.0)).astype(dtype)

    # ones columns accumulate each head's softmax denominator in the PV
    # matmul; h-major rows: row r belongs to head r // (G*N)
    onescols = (jax.lax.broadcasted_iota(jnp.int32, (P, num_heads), 1)
                == jax.lax.broadcasted_iota(jnp.int32, (P, num_heads), 0)
                // NG).astype(dtype)
    vhat_aug = jnp.concatenate(
        [vhat, jnp.broadcast_to(onescols[None], (nb, P, num_heads))],
        axis=-1)                                             # (nb, P, C+H)
    if kv_rows is not None:
        vhat_aug = vhat_aug * kv_rows.astype(dtype)
    out_unnorm = jax.lax.dot_general(
        e, vhat_aug, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (nb, NG, C+H)

    denom = out_unnorm[:, :, C:]                             # (nb, NG, H)
    if kv_rows is not None:
        # floor keeps fully-masked (cropped) query rows at 0, not 0/0;
        # valid rows always have a self key, so denom >= exp2(-100) >> 1e-30
        denom = jnp.maximum(denom, 1e-30)
    rmat = (jax.lax.broadcasted_iota(
        jnp.int32, (num_heads, C), 1) // head_dim
        == jax.lax.broadcasted_iota(
            jnp.int32, (num_heads, C), 0)).astype(jnp.float32)
    denom_b = jax.lax.dot_general(
        denom, rmat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (nb, NG, C)
    return (out_unnorm[:, :, :C] / denom_b).astype(dtype)    # (nb, NG, C)


def _wpack_of(attn_variant):
    """wpack group size G of a 'wpack{G}' variant, else 0."""
    if attn_variant.startswith("wpack"):
        return int(attn_variant[len("wpack"):] or "3")
    return 0


def _rowpack_of(attn_variant):
    """rowpack group size G of a 'rowpack{G}' variant, else 0.

    rowpack = window packing with ZERO in-kernel relayouts: the pack group
    is one full WINDOW-ROW of the image block (G = block width in windows),
    so every group is a contiguous sublane slice of the image-order token
    matrix — the window partition/reverse transposes (measured ~6.7
    ms/layer at full-res C=96, the single largest kernel cost) disappear.
    Tokens stay in image order (ti-major, then column); the permutation is
    baked into the precomputed bias constant and the coordinate arithmetic,
    and _attn_headpack_w is token-order agnostic.  G*ws must be a multiple
    of 8 (Mosaic sublane tile) => G % 4 == 0 for ws == 6.
    """
    if attn_variant.startswith("rowpack"):
        return int(attn_variant[len("rowpack"):] or "4")
    return 0


def _attn_headgroup(qkv, bias_ref, same_region_col, *, num_heads, head_dim,
                    group, dtype):
    """Group-packed window attention: G heads per wide pass pair.

    Full head-packing (_attn_headpack) inflates the scores weight to
    (C, heads*N) — 2+ lane-tiles whose load cycles dominate the per-window
    cost.  Packing G=3 heads keeps BOTH dots at ONE (<=128-lane) MXU tile:
      scores_g: (N, G*hd) @ (G*hd, G*N)   — weight rows G*hd = 48
      out_g:    (N, G*N) @ (G*N, G*hd+G)  — weight rows G*N = 108
    Per window, total weight-load cycles drop from ~192+216 (headpack,
    C=96) to ~96+216, and from ~768+432 (C=192) to ~192+432.
    bias_ref layout: (N, heads*N) pre-scaled by log2(e) (same as headpack).
    """
    BW, N, _ = qkv.shape
    C = num_heads * head_dim
    G = group
    n_groups = num_heads // G
    gc = G * head_dim                                        # group channels
    P = G * N                                                # group keys
    LOG2E = 1.4426950408889634
    scale = jnp.asarray(head_dim ** -0.5 * LOG2E, dtype)

    lane_head = jax.lax.broadcasted_iota(jnp.int32, (P, gc), 1) // head_dim
    row_head = jax.lax.broadcasted_iota(jnp.int32, (P, gc), 0) // N
    hmask = (lane_head == row_head).astype(dtype)            # (P, gc)
    onescols = (jax.lax.broadcasted_iota(jnp.int32, (P, G), 1)
                == jax.lax.broadcasted_iota(
                    jnp.int32, (P, G), 0) // N).astype(dtype)

    outs = []
    for g in range(n_groups):
        c0 = g * gc
        q = qkv[:, :, c0:c0 + gc]
        k = qkv[:, :, C + c0:C + c0 + gc]
        v = qkv[:, :, 2 * C + c0:2 * C + c0 + gc]
        khat = jnp.tile(k, (1, G, 1)) * hmask[None]          # (BW, P, gc)
        vhat = jnp.tile(v, (1, G, 1)) * hmask[None]

        scores = jax.lax.dot_general(
            q * scale, khat, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (BW, N, P)
        scores = scores + bias_ref[:, g * P:(g + 1) * P][None]
        if same_region_col is not None:
            sr = same_region_col[:, :, g * P:(g + 1) * P]
            scores = jnp.where(sr, scores, scores - 100.0 * LOG2E)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp2(jnp.maximum(scores - m, -100.0)).astype(dtype)

        vhat_aug = jnp.concatenate(
            [vhat, jnp.broadcast_to(onescols[None], (BW, P, G))], axis=-1)
        out_un = jax.lax.dot_general(
            e, vhat_aug, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (BW, N, gc+G)

        denom = out_un[:, :, gc:]                            # (BW, N, G)
        rmat = (jax.lax.broadcasted_iota(
            jnp.int32, (G, gc), 1) // head_dim
            == jax.lax.broadcasted_iota(
                jnp.int32, (G, gc), 0)).astype(jnp.float32)
        denom_b = jax.lax.dot_general(
            denom, rmat, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BW, N, gc)
        outs.append((out_un[:, :, :gc] / denom_b).astype(dtype))
    return jnp.concatenate(outs, axis=-1)


def _bias_arg_for(attn_variant, bias, num_heads, N):
    """(bias_arg, block_shape) for the kernel's bias input.

    perhead: (heads, N, N) raw.  head-packed variants: (N, heads*N) with
    log2(e) folded in.  wpack{G}: (G*N, heads*G*N) in the h-major packed
    layout (col = h*(G*N) + g*N + j), with -30000 where the query and key
    window differ — the cross-window kill mask baked into the constant so
    the kernel runs NO mask pass.
    """
    if attn_variant == "perhead":
        return bias.astype(jnp.float32), (num_heads, N, N)
    LOG2E = 1.4426950408889634
    base = (bias.astype(jnp.float32) * LOG2E) \
        .transpose(1, 0, 2).reshape(N, num_heads * N)
    RG = _rowpack_of(attn_variant)
    if RG:
        # rowpack: tokens in IMAGE order within the group — token t of the
        # G-window row has in-window index n(t) = (t // (G*ws))*ws + t % ws
        # and window g(t) = (t % (G*ws)) // ws.  Build the (G*N, H*G*N)
        # bias by one-hot row/col permutation matmuls on the traced base,
        # with -30000 where the query and key windows differ (the
        # cross-window kill baked into the constant, as for wpack).
        H = num_heads
        ws = int(round(N ** 0.5))
        NG = RG * N
        t = np.arange(NG)
        n_t = (t // (RG * ws)) * ws + t % ws
        g_t = (t % (RG * ws)) // ws
        rsel = np.zeros((NG, N), np.float32)
        rsel[t, n_t] = 1.0
        csel = np.zeros((H * N, H * NG), np.float32)
        for h in range(H):
            csel[h * N + n_t, h * NG + t] = 1.0
        tiled = jnp.asarray(rsel) @ base @ jnp.asarray(csel)  # (NG, H*NG)
        g_col = np.tile(g_t, H)
        bias_arg = jnp.where(jnp.asarray(g_t[:, None] == g_col[None, :]),
                             tiled, -30000.0)
        return bias_arg, (NG, H * NG)
    G = _wpack_of(attn_variant)
    if not G:
        return base, (N, num_heads * N)
    H = num_heads
    # one-hot row/col maps (compile-time): row r = g*N+i -> base row i;
    # col c = h*(G*N)+g'*N+j -> base col (h, j), tiled over g'
    rsel = np.kron(np.ones((G, 1), np.float32), np.eye(N, dtype=np.float32))
    ecol = np.kron(np.eye(H, dtype=np.float32),
                   np.kron(np.ones((1, G), np.float32),
                           np.eye(N, dtype=np.float32)))    # (H*N, H*G*N)
    tiled = jnp.asarray(rsel) @ base @ jnp.asarray(ecol)    # (G*N, H*G*N)
    gr = np.arange(G * N) // N
    gc = (np.arange(H * G * N) // N) % G
    bias_arg = jnp.where(jnp.asarray(gr[:, None] == gc[None, :]),
                         tiled, -30000.0)
    return bias_arg, (G * N, H * G * N)


def _round_block_windows(bw, wpack):
    """Largest block size <= bw compatible with the wpack group size."""
    if wpack and bw % wpack:
        bw = max(wpack, (bw // wpack) * wpack)
    return bw


def _kernel_block(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                  wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref, out_ref,
                  *, num_heads, head_dim, n_tokens, window, shift,
                  n_wh, n_ww, block_windows, attn_variant, shift_mode):
    BW = block_windows
    blk = pl.program_id(0)
    widx = blk * BW + jax.lax.broadcasted_iota(jnp.int32, (BW, 1), 0)
    wr = (widx // n_ww) % n_wh                               # (BW, 1)
    wc = widx % n_ww

    G = _wpack_of(attn_variant)
    win_coords = None
    if G:
        def win_coords(b_idx, t_idx):
            # h-major packed lanes: window-in-group g = (t // N) % G for
            # both the (G*N,) query rows and the (heads*G*N,) key columns
            widx_m = blk * BW + b_idx * G + (t_idx // n_tokens) % G
            return (widx_m // n_ww) % n_wh, widx_m % n_ww

    out_ref[:] = _block_compute(
        x_ref[:], wr, wc, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref,
        num_heads=num_heads, head_dim=head_dim, window=window, shift=shift,
        n_wh=n_wh, n_ww=n_ww, attn_variant=attn_variant,
        shift_mode=shift_mode, out_dtype=out_ref.dtype, win_coords=win_coords)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "shift", "n_wh", "n_ww",
                     "block_windows", "attn_variant", "shift_mode",
                     "interpret"))
def fused_swin_block(x, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2,
                     bias, *, num_heads, window, shift, n_wh, n_ww,
                     block_windows=None, attn_variant=None,
                     shift_mode="roll", interpret=False):
    """Whole swin block (norm='none') on pre-partitioned windows.

    x: (nw, N, C) tokens; weights in (in, out) layout; bias (heads, N, N)
    fp32.  Returns (nw, N, C) block output (attention + MLP + residuals).

    shift_mode: "roll" = cyclic-shift windows with wrap-region masks
    (classic swin); "pad" = the caller padded the image by `shift`
    top-left / `window-shift` bottom-right instead (no roll relayout) and
    out-of-extent keys are masked — numerically identical on the valid
    region.
    """
    nw, N, C = x.shape
    head_dim = C // num_heads
    assert N == window * window

    import os as _os
    if block_windows is None:
        # default sized for the 16MB scoped-vmem limit; NUNIF_TPU_SWIN_BW
        # overrides for experiments with --xla_tpu_scoped_vmem_limit_kib
        block_windows = int(_os.environ.get("NUNIF_TPU_SWIN_BW", "32"))
    if attn_variant is None:
        attn_variant = _default_variant(num_heads, shift)
    if _rowpack_of(attn_variant):
        # rowpack is an image-layout-only trick (the pack group must be a
        # contiguous pixel-row slice); window-ordered input gets the
        # measured-best window packing instead
        attn_variant = "wpack2" if num_heads >= 12 else "wpack4"
    bw = _round_block_windows(min(block_windows, nw), _wpack_of(attn_variant))
    pad_n = (-nw) % bw
    if pad_n:
        # keep the full block size and run a few garbage windows instead
        # of shrinking bw (more grid steps costs more than 1 extra block)
        x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0)))
    grid = ((nw + pad_n) // bw,)
    hidden = wfc1.shape[1]

    dt = x.dtype
    wargs = [w.astype(dt) for w in (wqkv, wproj, wfc1, wfc2)]
    bargs = [b.astype(jnp.float32) for b in (bqkv, bproj, bfc1, bfc2)]
    bias_arg, bshape = _bias_arg_for(attn_variant, bias, num_heads, N)
    bias_spec = pl.BlockSpec(bshape, lambda i: (0,) * len(bshape),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _kernel_block, num_heads=num_heads, head_dim=head_dim,
            n_tokens=N, window=window, shift=shift, n_wh=n_wh, n_ww=n_ww,
            block_windows=bw, attn_variant=attn_variant,
            shift_mode=shift_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bw, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((bw, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw + pad_n, N, C), dt),
        # big blocks amortize per-grid-step overhead; raise the Mosaic
        # scoped-vmem budget accordingly (v5e has 128MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wargs[0], bargs[0], wargs[1], bargs[1], wargs[2], bargs[2],
      wargs[3], bargs[3], bias_arg)
    return out[:nw] if pad_n else out


# ---------------------------------------------------------------------------
# v4: image-layout whole-block kernel — consumes (B, H, W, C) frames
# directly; the window partition/reverse happens as VMEM relayouts inside
# the kernel, so NO XLA-side reshape/transpose copies bracket the block
# (profiled at ~9ms/block-edge of pure HBM layout traffic at 1080p).


def _default_variant(num_heads, shift=0):
    """Measured per-(C, shift) best (tools/bench_swin_kernel.py, v5e).

    Window packing dominates everything from round 2: the batched tiny
    dots are issue-latency bound per batch element, so packing G windows
    into one dot pair amortizes that latency G ways while the softmax VPU
    volume grows only linearly.  Round 4 adds rowpack (zero in-kernel
    relayouts, see _rowpack_of): full-res C=96 block edges improve
    20.6 -> 15.4 ms (shift 0) and 38.3 -> 22.1 ms (shift 3); half-res
    C=192 shift 3 improves 19.2 -> 14.4, but unshifted C=192 keeps wpack2
    (9.6 vs rowpack4's 10.7 — heads=12 doubles the packed score volume
    and there is no pad/mask cost to recoup).  tools/bench_swin_img.py,
    v5e, block-edge incl. pad/crop."""
    import os as _os
    env = _os.environ.get("NUNIF_TPU_SWIN_ATTN")
    if env:
        return env
    if num_heads >= 12:
        return "rowpack4" if shift > 0 else "wpack2"
    return "rowpack4"


def _kernel_block_img(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                      wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref,
                      *rest, num_heads, head_dim, window, shift,
                      n_wh, n_ww, rh, cw, row_groups, attn_variant,
                      shift_mode, have_masks=False, have_skip=False):
    rest = list(rest)
    rowm_ref = colm_ref = skip_ref = None
    if have_masks:
        rowm_ref, colm_ref = rest[0], rest[1]
        rest = rest[2:]
    if have_skip:
        skip_ref = rest[0]
        rest = rest[1:]
    (out_ref,) = rest
    ws = window
    C = num_heads * head_dim
    i = pl.program_id(0)                             # batch * row-group
    j = pl.program_id(1)

    x = x_ref[0]                                     # (rh*ws, cw*ws, C)
    if skip_ref is not None:
        # stage-boundary residual (e.g. PatchUp output + U-Net skip) fused
        # into the kernel's first touch — saves the XLA add's extra HBM
        # round trip of the summed tensor at full/half res
        x = x + skip_ref[0]

    RG = _rowpack_of(attn_variant)
    if RG:
        # zero-relayout path: pack group = one full window-row of the
        # block (G == cw), a contiguous sublane slice of the image-order
        # token matrix — the reshapes below are layout-preserving because
        # cw*ws and ws*cw*ws are multiples of the 8-sublane tile
        xw = x.reshape(rh, ws * cw * ws, C)

        kv_mask = None
        if have_masks:
            # shape-static pad-shift validity, precomputed on the host:
            # (rh, P, 1) int8 row factor for this row-group AND (P, 1)
            # int8 column factor for this column block (i8 compares to i1:
            # Mosaic has no vector i8 multiply)
            kv_mask = (rowm_ref[0] != 0) & (colm_ref[0][None] != 0)

        out = _block_compute(
            xw, None, None, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref,
            num_heads=num_heads, head_dim=head_dim, window=ws, shift=shift,
            n_wh=n_wh, n_ww=n_ww, attn_variant=attn_variant,
            shift_mode=shift_mode, out_dtype=out_ref.dtype,
            kv_mask=kv_mask)
        out_ref[0] = out.reshape(rh * ws, cw * ws, C)
        return

    xw = x.reshape(rh, ws, cw, ws, C).transpose(0, 2, 1, 3, 4)
    xw = xw.reshape(rh * cw, ws * ws, C)             # windows in VMEM

    k = jax.lax.broadcasted_iota(jnp.int32, (rh * cw, 1), 0)
    wr = (i % row_groups) * rh + k // cw             # global window row
    wc = j * cw + k % cw

    G = _wpack_of(attn_variant)
    win_coords = None
    if G:
        def win_coords(b_idx, t_idx):
            N = ws * ws
            k_m = b_idx * G + (t_idx // N) % G       # window index in block
            return ((i % row_groups) * rh + k_m // cw, j * cw + k_m % cw)

    out = _block_compute(
        xw, wr, wc, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
        wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref,
        num_heads=num_heads, head_dim=head_dim, window=ws, shift=shift,
        n_wh=n_wh, n_ww=n_ww, attn_variant=attn_variant,
        shift_mode=shift_mode, out_dtype=out_ref.dtype, win_coords=win_coords)

    y = out.reshape(rh, cw, ws, ws, C).transpose(0, 2, 1, 3, 4)
    out_ref[0] = y.reshape(rh * ws, cw * ws, C)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "shift", "shift_mode",
                     "block_rows", "block_cols", "attn_variant",
                     "interpret"))
def fused_swin_block_image(x, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2,
                           bfc2, bias, *, num_heads, window, shift,
                           block_rows=None, block_cols=None,
                           attn_variant=None, shift_mode="pad",
                           skip=None, interpret=False):
    """Whole swin block (norm='none') straight on an image-layout tensor.

    x: (B, H, W, C) with H % window == 0 and W % window == 0 — for shifted
    blocks the caller pads ``shift`` top-left / ``window - shift``
    bottom-right exactly as for ``fused_swin_block(shift_mode='pad')`` and
    crops after.  Windows never exist outside VMEM: each grid step reads a
    (rh*ws, cw*ws, C) image block, forms its rh*cw windows with in-register
    relayouts, runs the full block body, and writes the block back.
    """
    B, H, W, C = x.shape
    ws = window
    assert H % ws == 0 and W % ws == 0, (H, W, ws)
    n_wh, n_ww = H // ws, W // ws
    head_dim = C // num_heads

    import os as _os
    if attn_variant is None:
        attn_variant = _default_variant(num_heads, shift)
    _rg = _rowpack_of(attn_variant)
    if _rg:
        # rowpack: block width IS the pack group (one window-row per
        # group); G % 4 keeps cw*ws a sublane-tile multiple at ws=6
        assert _rg % 4 == 0 or (_rg * window) % 8 == 0, _rg
        if n_ww < _rg:
            # image narrower than the pack group (tiny tiles, model init):
            # fall back to the equivalent window packing
            attn_variant = "wpack2" if num_heads >= 12 else "wpack4"
            _rg = 0
        else:
            if block_rows is None:
                # measured (tools/bench_swin_img.py, C=96): shift 0 best
                # at rh=8 (15.4 vs 17.0 at rh=16), shift 3 best at rh=16
                # (21.6 vs 22.1) — taller blocks amortize the mask DMA
                block_rows = int(_os.environ.get(
                    "NUNIF_TPU_SWIN_RH", "16" if shift > 0 else "8"))
            rh = min(block_rows, n_wh)
            cw = _rg
    if not _rg:
        if block_rows is None:
            block_rows = int(_os.environ.get("NUNIF_TPU_SWIN_RH", "1"))
        if block_cols is None:
            # measured best block widths (tools/bench_swin_img.py): 16
            # windows at C=96, 8 at C=192 — roughly constant VMEM per block
            block_cols = int(_os.environ.get("NUNIF_TPU_SWIN_CW",
                                             str(max(8, 1536 // C))))
        rh = min(block_rows, n_wh)
        cw = min(block_cols, n_ww)
    _g = _wpack_of(attn_variant)
    if _g and (rh * cw) % _g:
        # nearest block width that (a) keeps the wpack group count whole
        # and (b) keeps the Mosaic sublane constraint (block pixel width
        # divisible by 8) that the unpacked defaults already satisfy
        cands = [c for c in range(4, max(2 * cw, _g * 4) + 1, 4)
                 if (rh * c) % _g == 0 and (c * ws) % 8 == 0]
        assert cands, (rh, cw, _g, ws)
        cw = min(cands, key=lambda c: (abs(c - cw), -c))
    if skip is not None:
        assert shift == 0, "skip fusion applies to stage-first blocks only"
        assert skip.shape == x.shape, (skip.shape, x.shape)
    pad_r = (-n_wh) % rh
    pad_c = (-n_ww) % cw
    if pad_r or pad_c:
        # run a few garbage windows instead of shrinking the block; window
        # attention never crosses windows, so garbage windows can't
        # contaminate real ones — the caller's crop discards them.  Mask
        # extents below use the ORIGINAL n_wh/n_ww.
        x = jnp.pad(x, ((0, 0), (0, pad_r * ws), (0, pad_c * ws), (0, 0)))
        if skip is not None:
            skip = jnp.pad(skip, ((0, 0), (0, pad_r * ws),
                                  (0, pad_c * ws), (0, 0)))
    row_groups = (n_wh + pad_r) // rh
    grid = (B * row_groups, (n_ww + pad_c) // cw)
    hidden = wfc1.shape[1]
    N = ws * ws

    dt = x.dtype
    wargs = [w.astype(dt) for w in (wqkv, wproj, wfc1, wfc2)]
    bargs = [b.astype(jnp.float32) for b in (bqkv, bproj, bfc1, bfc2)]
    bias_arg, bshape = _bias_arg_for(attn_variant, bias, num_heads, N)
    bias_spec = pl.BlockSpec(bshape, lambda i, j: (0,) * len(bshape),
                             memory_space=pltpu.VMEM)

    mask_args, mask_specs = [], []
    have_masks = bool(_rg) and shift > 0
    if have_masks:
        # pad-shift key-validity is fully shape-static: precompute the
        # separable row/col factors with numpy and stream the (tiny) block
        # slices in — the kernel runs ONE int8 multiply instead of ~20
        # iota/div/mod/compare passes per block (div-by-6 is a long VPU
        # multiply-shift sequence at (P, 1) geometry)
        NG = cw * N
        t = np.arange(NG)
        ti = t // (cw * ws)
        w_in = (t % (cw * ws)) // ws
        tj = t % ws
        h_valid = (n_wh - 1) * ws
        w_valid = (n_ww - 1) * ws
        ncb = (n_ww + pad_c) // cw
        r_idx = np.arange(row_groups * rh).reshape(row_groups, rh)
        rowv = r_idx[:, :, None] * ws - shift + ti[None, None, :]
        rowm = ((rowv >= 0) & (rowv < h_valid))          # (rg, rh, NG)
        colv = ((np.arange(ncb)[:, None] * cw + w_in[None, :]) * ws
                - shift + tj[None, :])
        colm = ((colv >= 0) & (colv < w_valid))          # (ncb, NG)
        rowm = np.tile(rowm, (1, 1, num_heads))[..., None].astype(np.int8)
        colm = np.tile(colm, (1, num_heads))[..., None].astype(np.int8)
        P = num_heads * NG
        mask_args = [jnp.asarray(rowm), jnp.asarray(colm)]
        mask_specs = [
            pl.BlockSpec((1, rh, P, 1),
                         lambda i, j, rg=row_groups: (i % rg, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    skip_args, skip_specs = [], []
    if skip is not None:
        skip_args = [skip.astype(dt)]
        skip_specs = [pl.BlockSpec(
            (1, rh * ws, cw * ws, C),
            lambda i, j, rg=row_groups: (i // rg, i % rg, j, 0),
            memory_space=pltpu.VMEM)]

    out = pl.pallas_call(
        functools.partial(
            _kernel_block_img, num_heads=num_heads, head_dim=head_dim,
            window=ws, shift=shift, n_wh=n_wh, n_ww=n_ww,
            rh=rh, cw=cw, row_groups=row_groups,
            attn_variant=attn_variant, shift_mode=shift_mode,
            have_masks=have_masks, have_skip=skip is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rh * ws, cw * ws, C),
                         lambda i, j, rg=row_groups: (i // rg, i % rg, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            bias_spec,
        ] + mask_specs + skip_specs,
        out_specs=pl.BlockSpec((1, rh * ws, cw * ws, C),
                               lambda i, j, rg=row_groups: (i // rg, i % rg,
                                                            j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, (n_wh + pad_r) * ws, (n_ww + pad_c) * ws, C), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wargs[0], bargs[0], wargs[1], bargs[1], wargs[2], bargs[2],
      wargs[3], bargs[3], bias_arg, *mask_args, *skip_args)
    if pad_r or pad_c:
        out = out[:, :H, :W]
    return out


# ---------------------------------------------------------------------------
# v2: image-layout kernel — consumes (B*nH, ws, W, 3C) directly; the window
# partition happens as a VMEM transpose inside the kernel, eliminating the
# HBM round trip of the reshape/transpose partition (profiled at ~2x the
# kernel's own cost).

def _kernel_img(qkv_ref, bias_ref, out_ref, *, num_heads, head_dim, window,
                shift, n_wh, n_ww, wchunk, pack):
    ws = window
    N = ws * ws
    NP = N * pack
    C = num_heads * head_dim
    bp = wchunk // pack

    x = qkv_ref[0]                                   # (ws, wchunk*ws, 3C)
    x = x.reshape(ws, wchunk, ws, 3 * C)
    x = x.transpose(1, 0, 2, 3)                      # (wchunk, ws, ws, 3C) VMEM
    qkv = x.reshape(bp, NP, 3 * C)

    tok_win = jax.lax.broadcasted_iota(jnp.int32, (bp, NP), 1) // N
    blockdiag = tok_win[:, :, None] == tok_win[:, None, :]

    if shift > 0:
        i = pl.program_id(0)
        j = pl.program_id(1)
        wr = i % n_wh
        wc = (j * wchunk
              + jax.lax.broadcasted_iota(jnp.int32, (bp, NP), 0) * pack
              + tok_win)
        t = jax.lax.broadcasted_iota(jnp.int32, (bp, NP), 1) % N
        ti = t // ws
        tj = t % ws
        wrapped_r = jnp.where((wr == n_wh - 1) & (ti >= ws - shift), 1, 0)
        wrapped_c = jnp.where((wc == n_ww - 1) & (tj >= ws - shift), 2, 0)
        region = wrapped_r + wrapped_c
        same_region = region[:, :, None] == region[:, None, :]
    else:
        same_region = None

    LOG2E = 1.4426950408889634
    scale = jnp.asarray(head_dim ** -0.5 * LOG2E, qkv.dtype)
    for h in range(num_heads):
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, :, C + h * head_dim:C + (h + 1) * head_dim]
        v = qkv[:, :, 2 * C + h * head_dim:2 * C + (h + 1) * head_dim]
        scores = jax.lax.dot_general(
            q * scale, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        bias_h = bias_ref[h].astype(jnp.float32) * LOG2E
        if pack > 1:
            bias_h = jnp.tile(bias_h, (pack, pack))
        scores = scores + bias_h[None]
        if same_region is not None:
            scores = jnp.where(same_region, scores, scores - 100.0 * LOG2E)
        if pack > 1:
            scores = jnp.where(blockdiag, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp2(jnp.maximum(scores - m, -100.0))
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
        o = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (bp, NP, d)
        # back to image layout, head slice written directly
        y = o.astype(out_ref.dtype).reshape(wchunk, ws, ws, head_dim)
        y = y.transpose(1, 0, 2, 3).reshape(ws, wchunk * ws, head_dim)
        out_ref[0, :, :, h * head_dim:(h + 1) * head_dim] = y


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "shift", "interpret"))
def fused_window_attention_image(qkv_img, bias, *, num_heads, window, shift,
                                 interpret=False):
    """qkv_img: (B, H, W, 3C) AFTER any cyclic roll, H and W multiples of
    window.  Returns (B, H, W, C) attended output in the image layout —
    no window partition ever touches HBM.
    """
    B, H, W, c3 = qkv_img.shape
    C = c3 // 3
    head_dim = C // num_heads
    ws = window
    N = ws * ws
    n_wh, n_ww = H // ws, W // ws

    pack = max(1, 128 // N)
    while pack > 1 and n_ww % pack:
        pack -= 1
    # W chunking: largest divisor of n_ww that is a multiple of pack,
    # <= 32 windows (VMEM blocks ~1-2MB), and whose pixel width is a
    # multiple of 8 (Mosaic sublane-block constraint)
    # NOTE: measured slower than fused_window_attention + XLA partition on
    # v5e (in-kernel sublane transposes dominate at small chunks; full-row
    # blocks explode compile time) — kept for future Mosaic improvements.
    wchunk = n_ww
    for cand in range(min(32, n_ww), pack - 1, -1):
        if (cand % pack == 0 and n_ww % cand == 0
                and (cand * ws) % 8 == 0):
            wchunk = cand
            break
    x = qkv_img.reshape(B * n_wh, ws, W, c3)
    grid = (B * n_wh, n_ww // wchunk)

    out = pl.pallas_call(
        functools.partial(
            _kernel_img, num_heads=num_heads, head_dim=head_dim, window=ws,
            shift=shift, n_wh=n_wh, n_ww=n_ww, wchunk=wchunk, pack=pack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, wchunk * ws, c3), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, wchunk * ws, C),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * n_wh, ws, W, C), qkv_img.dtype),
        interpret=interpret,
    )(x, bias)
    return out.reshape(B, H, W, C)
