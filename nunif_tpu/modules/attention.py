"""Window attention blocks, NHWC (reference: nunif/modules/attention.py:29-738
and torchvision SwinTransformerBlock V1 used by waifu2x/models/swin_unet.py:26).

TPU-first notes:
  * all shapes static: tile contracts guarantee H, W divide the window, so
    there is no dynamic padding; the shifted-window mask is a compile-time
    numpy constant.
  * attention math runs in the compute dtype with fp32 softmax; matmuls use
    ``preferred_element_type=float32`` so the MXU accumulates in fp32.
  * a fused Pallas kernel for the hot path lives in
    nunif_tpu/ops/pallas/window_attention.py; this module is the XLA
    reference implementation and the fallback on CPU.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@functools.lru_cache(maxsize=32)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) index into a ((2wh-1)*(2ww-1),) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).copy()  # (N, N, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=32)
def _rel_bias_onehot(table_len: int, ws: int) -> np.ndarray:
    """(N*N, T) one-hot scatter matrix for the relative-position index."""
    n = ws * ws
    idx = relative_position_index(ws, ws).reshape(-1)
    onehot = np.zeros((n * n, table_len), np.float32)
    onehot[np.arange(n * n), idx] = 1.0
    return onehot


def expand_relative_bias(table, ws: int):
    """(T, heads) bias table -> (heads, N, N) expanded bias.

    Uses a static one-hot matmul instead of ``table[idx]``: the gather
    lowers to ~1300 serial dynamic-slices on TPU (profiled at ~2 ms per
    block — ~28 ms/frame over swin_unet's 14 blocks); the (N^2, T) one-hot
    constant matmul is sub-microsecond.
    """
    n = ws * ws
    onehot = _rel_bias_onehot(table.shape[0], ws)
    rel = jnp.asarray(onehot) @ table.astype(jnp.float32)  # (N*N, heads)
    return rel.reshape(n, n, -1).transpose(2, 0, 1)


@functools.lru_cache(maxsize=32)
def shifted_window_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Swin attention mask for cyclic-shifted windows.

    Returns (num_windows, N, N) float32 with 0 for allowed pairs and -100
    for pairs that wrapped from opposite image borders.
    """
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    nh, nw = h // window, w // window
    wins = img.reshape(nh, window, nw, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(nh * nw, window * window)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class ShiftedWindowAttention(nn.Module):
    """Swin V1 (shifted-)window MHA with relative position bias.

    ``__call__(x)`` takes an image (B, H, W, C).  ``__call__(xw,
    windows=(b, nh, nw))`` takes pre-partitioned shifted windows
    (b*nh*nw, N, C) and returns the same layout — the hot path used by
    SwinTransformerBlock so residual+MLP stay in token layout and the
    roll+partition relayouts fuse into one XLA copy per block edge.
    """
    dim: int
    num_heads: int
    window_size: int = 6
    shift_size: int = 0
    qkv_bias: bool = True
    fused: bool = None  # None = auto (Pallas kernel on TPU, XLA elsewhere)

    @nn.compact
    def __call__(self, x, windows=None):
        ws = self.window_size
        n = ws * ws
        if windows is not None:
            b, nh, nw = windows
            h, w = nh * ws, nw * ws
            c = x.shape[-1]
            shift = self.shift_size if (h > ws or w > ws) else 0
            xw = x
        else:
            b, h, w, c = x.shape
            assert h % ws == 0 and w % ws == 0, (h, w, ws)
            shift = self.shift_size if (h > ws or w > ws) else 0
            nh, nw = h // ws, w // ws
            if shift > 0:
                x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xw = xw.reshape(b * nh * nw, n, c)
        head_dim = c // self.num_heads

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads), jnp.float32)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=xw.dtype,
                       name="qkv")
        proj = nn.Dense(c, dtype=xw.dtype, name="proj")

        rel_bias = expand_relative_bias(bias_table, ws)  # (H, N, N)

        use_fused = self.fused
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"

        if use_fused:
            from ..ops.swin_attention import fused_window_attention
            out = fused_window_attention(
                qkv(xw), rel_bias.astype(jnp.float32),
                num_heads=self.num_heads, window=ws, shift=shift,
                n_wh=nh, n_ww=nw)
            out = proj(out)
            if windows is not None:
                return out
            out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            out = out.reshape(b, h, w, c)
            if shift > 0:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
            return out

        qkv_out = qkv(xw).reshape(-1, n, 3, self.num_heads, head_dim)
        q = qkv_out[:, :, 0].transpose(0, 2, 1, 3)  # (BW, H, N, d)
        k = qkv_out[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_out[:, :, 2].transpose(0, 2, 1, 3)
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + rel_bias[None].astype(attn.dtype)

        if shift > 0:
            mask = jnp.asarray(shifted_window_mask(h, w, ws, shift))
            attn = attn.reshape(b, nh * nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b * nh * nw, self.num_heads, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(xw.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(xw.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, c)
        out = proj(out)

        if windows is not None:
            return out
        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, h, w, c)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out


class MLPBlock(nn.Module):
    """Transformer MLP (torchvision MLP: Linear-GELU-Linear, exact gelu)."""
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=x.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=x.dtype, name="fc2")(x)
        return x


class _DenseParams(nn.Module):
    """Raw Dense-shaped params (same tree paths/inits as nn.Dense) for the
    fused whole-block kernel, which consumes weights directly."""
    d_in: int
    d_out: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.d_in, self.d_out))
        b = self.param("bias", nn.initializers.zeros, (self.d_out,))
        return k, b


class _AttnParams(nn.Module):
    """Param mirror of ShiftedWindowAttention (identical tree)."""
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads), jnp.float32)
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        return table, (wqkv, bqkv), (wproj, bproj)


class _MLPParams(nn.Module):
    """Param mirror of MLPBlock (identical tree)."""
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        fc2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return fc1, fc2


class SwinTransformerBlock(nn.Module):
    """Swin V1 block: x + attn(norm1(x)); x + mlp(norm2(x)).

    norm="none" matches waifu2x swin_unet's NO_NORM_LAYER default
    (reference: waifu2x/models/swin_unet.py:16).
    """
    dim: int
    num_heads: int
    window_size: int = 6
    shift_size: int = 0
    mlp_ratio: float = 2.0
    norm: str = "none"  # "none" | "layernorm_nobias" | "layernorm"

    def _norm(self, name):
        if self.norm == "none":
            return lambda x: x
        if self.norm == "layernorm_nobias":
            return nn.LayerNorm(use_bias=False, name=name)
        return nn.LayerNorm(name=name)

    @nn.compact
    def __call__(self, x, skip=None):
        # ``skip``: optional stage-boundary residual (U-Net PatchUp output
        # + skip connection) added before the block — fused into the image
        # kernel's first VMEM touch on TPU instead of a separate XLA add
        # pass over the full-res tensor.
        # Token-layout orchestration: ONE fused relayout in, ONE out —
        # norms, residuals and the MLP are pointwise per token, so keeping
        # them in window layout lets XLA collapse each block edge into a
        # single copy instead of image-layout round trips around the
        # attention.
        b, hh, ww_, c = x.shape
        ws = self.window_size
        shift = self.shift_size if (hh > ws or ww_ > ws) else 0
        nh, nw = hh // ws, ww_ // ws

        use_fused_block = (self.norm == "none"
                           and jax.default_backend() == "tpu")
        if use_fused_block:
            # whole-block Pallas kernel: qkv + attention + proj + MLP +
            # residuals with weights resident in VMEM (param tree paths
            # identical to the module path below).  Shifted blocks PAD by
            # `shift` instead of jnp.roll: the wraparound roll costs ~3x a
            # plain partition copy at 1080p (measured 20 vs 6 ms/edge) and
            # pad+key-mask is numerically identical on the valid region.
            from ..ops.swin_attention import (fused_swin_block,
                                              fused_swin_block_image)
            table, (wqkv, bqkv), (wproj, bproj) = _AttnParams(
                self.dim, self.num_heads, ws, name="attn")()
            (wfc1, bfc1), (wfc2, bfc2) = _MLPParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
            rel_bias = expand_relative_bias(table, ws).astype(jnp.float32)
            if os.environ.get("NUNIF_TPU_SWIN_IMG", "1") == "1":
                # image-layout kernel: windows are formed in VMEM — no
                # XLA partition/reverse copies around the block at all
                # (measured 42->32 ms/block-edge shift=0, 51->36 shift=3
                # at 1080p C=96; tools/bench_swin_img.py)
                if shift > 0:
                    if skip is not None:
                        x = x + skip
                        skip = None
                    xp = jnp.pad(x, ((0, 0), (shift, ws - shift),
                                     (shift, ws - shift), (0, 0)))
                    nh2, nw2 = nh + 1, nw + 1
                else:
                    xp, nh2, nw2 = x, nh, nw
                y = fused_swin_block_image(
                    xp, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2,
                    rel_bias, num_heads=self.num_heads, window=ws,
                    shift=shift, shift_mode="pad", skip=skip)
                if shift > 0:
                    y = y[:, shift:shift + hh, shift:shift + ww_]
                return y
            if skip is not None:
                x = x + skip
                skip = None
            if shift > 0:
                nh2, nw2 = nh + 1, nw + 1
                xp = jnp.pad(x, ((0, 0), (shift, ws - shift),
                                 (shift, ws - shift), (0, 0)))
            else:
                nh2, nw2 = nh, nw
                xp = x
            xw = xp.reshape(b, nh2, ws, nw2, ws, c)
            xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh2 * nw2,
                                                        ws * ws, c)
            xw = fused_swin_block(
                xw, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2,
                rel_bias, num_heads=self.num_heads, window=ws,
                shift=shift, n_wh=nh2, n_ww=nw2, shift_mode="pad")
            x = xw.reshape(b, nh2, nw2, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, nh2 * ws, nw2 * ws, c)
            if shift > 0:
                x = x[:, shift:shift + hh, shift:shift + ww_]
            return x

        if skip is not None:
            x = x + skip
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, ws * ws, c)
        h = self._norm("norm1")(xw)
        xw = xw + ShiftedWindowAttention(
            self.dim, self.num_heads, self.window_size, self.shift_size,
            name="attn")(h, windows=(b, nh, nw))
        h = self._norm("norm2")(xw)
        xw = xw + MLPBlock(int(self.dim * self.mlp_ratio), self.dim,
                           name="mlp")(h)

        x = xw.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hh, ww_, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        return x


class SwinTransformerBlocks(nn.Module):
    """Stack of blocks with alternating shift (reference:
    waifu2x/models/swin_unet.py:21-44)."""
    dim: int
    num_heads: int
    num_layers: int
    window_size: int = 6
    norm: str = "none"

    @nn.compact
    def __call__(self, x, skip=None):
        # ``skip`` is added before block0 (fused into the TPU kernel's
        # first VMEM touch, see SwinTransformerBlock)
        for i in range(self.num_layers):
            x = SwinTransformerBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                norm=self.norm, name=f"block{i}")(
                x, skip=skip if i == 0 else None)
        return x


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference: nunif/modules/attention.py:29)."""
    channels: int
    reduction: int = 8
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = nn.Dense(self.channels // self.reduction, use_bias=self.bias,
                     dtype=x.dtype, name="fc1")(z)
        z = nn.relu(z)
        z = nn.Dense(self.channels, use_bias=self.bias, dtype=x.dtype,
                     name="fc2")(z)
        return x * jax.nn.sigmoid(z)


def _window_score_bias_input(window_size):
    """reference nunif/modules/attention.py:347-372 (reduction=1)."""
    wh, ww = window_size
    n = wh * ww
    pos = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                               indexing="ij"), axis=2).reshape(n, 2)
    delta = (pos[:, None, :] - pos[None, :, :]).reshape(n * n, 2)
    uniq = sorted({tuple(p) for p in delta.tolist()})
    index = np.array([uniq.index(tuple(d)) for d in delta.tolist()], np.int32)
    uniq = np.array(uniq, np.float32)
    uniq = uniq / np.abs(uniq).max()
    return index, uniq


class WindowScoreBias(nn.Module):
    """Learned relative window attention score bias via a tiny MLP on the
    normalized position deltas (reference nunif/modules/attention.py:375-419,
    reduction=1)."""
    window_size: tuple
    hidden_dim: int = None
    num_heads: int = None

    @nn.compact
    def __call__(self):
        wh, ww = self.window_size
        n = wh * ww
        index, delta = _window_score_bias_input((wh, ww))
        hidden = self.hidden_dim or int((wh * ww) ** 0.5) * 2
        out_dim = self.num_heads or 1
        b = nn.Dense(hidden, name="to_bias_0")(jnp.asarray(delta))
        b = jax.nn.gelu(b, approximate=False)
        b = nn.Dense(out_dim, name="to_bias_2")(b)
        b = b[jnp.asarray(index)]
        if self.num_heads is None:
            return b.reshape(n, n)
        return b.T.reshape(self.num_heads, n, n)


class WindowMHA2d(nn.Module):
    """Rect-window MHA, NHWC (reference nunif/modules/attention.py:118-166).

    shift=(sh, sw) pads by half a window with zeros (the reference pads
    rather than cyclic-rolls) so windows straddle the original boundaries.
    """
    in_channels: int
    num_heads: int
    window_size: tuple = (4, 4)
    qkv_dim: int = None
    shift: tuple = (False, False)

    @nn.compact
    def __call__(self, x, attn_mask=None):
        from .permute import window_partition2, window_reverse2
        wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                  else (self.window_size, self.window_size))
        sh, sw = (self.shift if isinstance(self.shift, (tuple, list))
                  else (self.shift, self.shift))
        pad_h = wh // 2 if sh else 0
        pad_w = ww // 2 if sw else 0
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
        B, H, W, C = x.shape
        qkv_dim = self.qkv_dim or C // self.num_heads
        n = wh * ww

        xw = window_partition2(x, (wh, ww))  # (B*, n, C)
        qkv = nn.Dense(qkv_dim * self.num_heads * 3, dtype=x.dtype,
                       name="qkv_proj")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(-1, n, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (qkv_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if attn_mask is not None:
            # (n,n) or (heads,n,n) score bias
            m = attn_mask if attn_mask.ndim == 3 else attn_mask[None]
            attn = attn + m[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, self.num_heads * qkv_dim)
        out = nn.Dense(C, dtype=x.dtype, name="head_proj")(out)
        out = window_reverse2(out, (wh, ww), H, W)
        if pad_h or pad_w:
            out = out[:, pad_h:H - pad_h, pad_w:W - pad_w, :]
        return out


class GMLP(nn.Module):
    """gMLP token mixer (reference nunif/modules/attention.py:621-651)."""
    embed_dim: int
    seq_len: int
    mlp_ratio: int = 1

    @nn.compact
    def __call__(self, x, norm1=None, norm2=None):
        # x: (B, N, C)
        shortcut = x
        if norm1 is not None:
            x = norm1(x)
        x = nn.Dense(int(self.embed_dim * self.mlp_ratio * 2), dtype=x.dtype,
                     name="proj_in")(x)
        x = jax.nn.gelu(x, approximate=False)
        u, v = jnp.split(x, 2, axis=-1)
        if norm2 is not None:
            v = norm2(v)
        # spatial projection: conv1d over the token dim == dense (N, N)
        w = self.param("proj_spatial_kernel",
                       nn.initializers.uniform(scale=2e-3 / self.embed_dim),
                       (self.seq_len, self.seq_len))
        b = self.param("proj_spatial_bias", nn.initializers.ones,
                       (self.seq_len,))
        v = jnp.einsum("mn,bnc->bmc", w.astype(v.dtype), v) + \
            b.astype(v.dtype)[None, :, None]
        x = u * v
        x = nn.Dense(self.embed_dim, dtype=x.dtype, name="proj_out")(x)
        return x + shortcut


class WindowGMLP2d(nn.Module):
    """Windowed gMLP, NHWC (reference nunif/modules/attention.py:654-693).

    shift pads by half a window with zeros like WindowMHA2d.
    """
    in_channels: int
    window_size: tuple = (4, 4)
    mlp_ratio: int = 2
    shift: bool = False

    @nn.compact
    def __call__(self, x, norm1=None, norm2=None):
        from .permute import window_partition2, window_reverse2
        wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                  else (self.window_size, self.window_size))
        pad_h = wh // 2 if self.shift else 0
        pad_w = ww // 2 if self.shift else 0
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
        B, H, W, C = x.shape
        xw = window_partition2(x, (wh, ww))
        xw = GMLP(C, wh * ww, self.mlp_ratio, name="gmlp")(xw, norm1, norm2)
        out = window_reverse2(xw, (wh, ww), H, W)
        if pad_h or pad_w:
            out = out[:, pad_h:H - pad_h, pad_w:W - pad_w, :]
        return out


class CrossMHA(nn.Module):
    """Cross attention on (B, N, C) sequences (reference
    nunif/modules/attention.py:300-322)."""
    embed_dim: int
    num_heads: int
    qkv_dim: int = None

    @nn.compact
    def __call__(self, q_in, kv_in, attn_mask=None):
        C = self.embed_dim
        qkv_dim = self.qkv_dim or C // self.num_heads
        inner = qkv_dim * self.num_heads
        n_q, n_kv = q_in.shape[1], kv_in.shape[1]
        q = nn.Dense(inner, dtype=q_in.dtype, name="q_proj")(q_in)
        kv = nn.Dense(inner * 2, dtype=q_in.dtype, name="kv_proj")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(-1, n_q, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)
        k = k.reshape(-1, n_kv, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)
        v = v.reshape(-1, n_kv, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (qkv_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if attn_mask is not None:
            m = attn_mask if attn_mask.ndim >= 3 else attn_mask[None]
            attn = attn + m[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q_in.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(q_in.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n_q, inner)
        return nn.Dense(C, dtype=q_in.dtype, name="head_proj")(out)


class WindowCrossMHA2d(nn.Module):
    """Window cross attention, NHWC (reference :324-346)."""
    in_channels: int
    num_heads: int
    window_size: tuple = (4, 4)
    qkv_dim: int = None

    @nn.compact
    def __call__(self, x1, x2, attn_mask=None):
        from .permute import window_partition2, window_reverse2
        wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                  else (self.window_size, self.window_size))
        B, H, W, C = x1.shape
        w1 = window_partition2(x1, (wh, ww))
        w2 = window_partition2(x2, (wh, ww))
        out = CrossMHA(self.in_channels, self.num_heads, self.qkv_dim,
                       name="mha")(w1, w2, attn_mask=attn_mask)
        return window_reverse2(out, (wh, ww), H, W)


class WindowSpatialReductionMHA2d(nn.Module):
    """Window MHA with 2x spatially-reduced K/V (reference :164-211):
    q from every pixel, k/v from a stride-2 conv over the window."""
    in_channels: int
    num_heads: int
    window_size: tuple
    kernel_size: int = 3
    reduction: int = 2
    qkv_dim: int = None

    @nn.compact
    def __call__(self, x, attn_mask=None):
        from .pad import replication_pad2d
        assert self.reduction == 2 and self.kernel_size in (2, 3)
        wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                  else (self.window_size, self.window_size))
        B, H, W, C = x.shape
        qkv_dim = self.qkv_dim or C // self.num_heads
        inner = qkv_dim * self.num_heads
        nh, nw = H // wh, W // ww
        n = wh * ww
        rn = (wh // 2) * (ww // 2)

        # windows as image tiles: (B*nh*nw, wh, ww, C)
        xw = x.reshape(B, nh, wh, nw, ww, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * nh * nw, wh, ww, C)
        if self.kernel_size == 3:
            kv_in = replication_pad2d(jax.lax.stop_gradient(xw), (1, 1, 1, 1))
            kv = nn.Conv(inner * 2, (3, 3), strides=(2, 2), padding="VALID",
                         dtype=x.dtype, name="kv_proj")(kv_in)
        else:
            kv = nn.Conv(inner * 2, (2, 2), strides=(2, 2), padding="VALID",
                         dtype=x.dtype, name="kv_proj")(xw)
        kv = kv.reshape(-1, rn, inner * 2)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Dense(inner, dtype=x.dtype, name="q_proj")(
            xw.reshape(-1, n, C))

        q = q.reshape(-1, n, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)
        k = k.reshape(-1, rn, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)
        v = v.reshape(-1, rn, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (qkv_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if attn_mask is not None:
            m = attn_mask if attn_mask.ndim >= 3 else attn_mask[None]
            attn = attn + m[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, inner)
        out = nn.Dense(C, dtype=x.dtype, name="head_proj")(out)
        out = out.reshape(B, nh, nw, wh, ww, C).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(B, H, W, C)


class OverlapWindowMHA2d(nn.Module):
    """Two window grids offset by half a window, summed (reference
    :214-253)."""
    in_channels: int
    num_heads: int
    window_size: tuple = (4, 4)
    qkv_dim: int = None

    @nn.compact
    def __call__(self, x, attn_mask=None):
        from .permute import window_partition2, window_reverse2
        wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                  else (self.window_size, self.window_size))
        B, H, W, C = x.shape
        qkv_dim = self.qkv_dim or C // self.num_heads
        inner = qkv_dim * self.num_heads
        ph, pw = wh // 2, ww // 2
        n = wh * ww

        qkv = nn.Conv(inner * 3, (1, 1), padding="VALID", dtype=x.dtype,
                      name="qkv_proj")(x)
        head_proj = nn.Conv(C, (1, 1), padding="VALID", dtype=x.dtype,
                            name="head_proj")

        def mha(t):
            q, k, v = jnp.split(t, 3, axis=-1)
            nn_ = t.shape[1]

            def heads(a):
                return a.reshape(-1, nn_, self.num_heads,
                                 qkv_dim).transpose(0, 2, 1, 3)
            q, k, v = heads(q), heads(k), heads(v)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * (qkv_dim ** -0.5), k,
                              preferred_element_type=jnp.float32)
            if attn_mask is not None:
                m = attn_mask if attn_mask.ndim >= 3 else attn_mask[None]
                attn = attn + m[None].astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(t.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                             preferred_element_type=jnp.float32).astype(t.dtype)
            return out.transpose(0, 2, 1, 3).reshape(-1, nn_, inner)

        x1 = mha(window_partition2(qkv, (wh, ww)))
        x1 = window_reverse2(x1, (wh, ww), H, W)
        q2 = jnp.pad(qkv, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        x2 = mha(window_partition2(q2, (wh, ww)))
        x2 = window_reverse2(x2, (wh, ww), H + 2 * ph, W + 2 * pw)
        x2 = x2[:, ph:H + ph, pw:W + pw, :]
        return head_proj(x1 + x2)


class WindowMHA3d(nn.Module):
    """3D window MHA, NDHWC (reference :255-297).  shift pads D by
    reflection and H/W by zeros, half a window each."""
    in_channels: int
    num_heads: int
    window_size: tuple = (4, 4, 4)
    qkv_dim: int = None
    shift: tuple = (False, False, False)

    @nn.compact
    def __call__(self, x, attn_mask=None):
        from .permute import window_partition3, window_reverse3
        wd, wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                      else (self.window_size,) * 3)
        sd, sh, sw = (self.shift if isinstance(self.shift, (tuple, list))
                      else (self.shift,) * 3)
        pd = wd // 2 if sd else 0
        ph = wh // 2 if sh else 0
        pw = ww // 2 if sw else 0
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
        if pd:
            x = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)),
                        mode="reflect")
        B, D, H, W, C = x.shape
        qkv_dim = self.qkv_dim or C // self.num_heads
        inner = qkv_dim * self.num_heads
        n = wd * wh * ww

        xw = window_partition3(x, (wd, wh, ww))
        qkv = nn.Dense(inner * 3, dtype=x.dtype, name="qkv_proj")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(-1, n, self.num_heads, qkv_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (qkv_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if attn_mask is not None:
            m = attn_mask if attn_mask.ndim >= 3 else attn_mask[None]
            attn = attn + m[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, inner)
        out = nn.Dense(C, dtype=x.dtype, name="head_proj")(out)
        out = window_reverse3(out, (wd, wh, ww), D, H, W)
        if pd or ph or pw:
            out = out[:, pd:D - pd if pd else D, ph:H - ph if ph else H,
                      pw:W - pw if pw else W, :]
        return out


class WindowGMLP3d(nn.Module):
    """3D windowed gMLP, NDHWC (reference :696-738)."""
    in_channels: int
    window_size: tuple = (4, 4, 4)
    mlp_ratio: int = 2
    shift: bool = False

    @nn.compact
    def __call__(self, x, norm1=None, norm2=None):
        from .permute import window_partition3, window_reverse3
        wd, wh, ww = (self.window_size if isinstance(self.window_size, (tuple, list))
                      else (self.window_size,) * 3)
        pd = wd // 2 if self.shift else 0
        ph = wh // 2 if self.shift else 0
        pw = ww // 2 if self.shift else 0
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
        if pd:
            x = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)),
                        mode="reflect")
        B, D, H, W, C = x.shape
        xw = window_partition3(x, (wd, wh, ww))
        xw = GMLP(C, wd * wh * ww, self.mlp_ratio, name="gmlp")(xw, norm1, norm2)
        out = window_reverse3(xw, (wd, wh, ww), D, H, W)
        if pd or ph or pw:
            out = out[:, pd:D - pd if pd else D, ph:H - ph if ph else H,
                      pw:W - pw if pw else W, :]
        return out
