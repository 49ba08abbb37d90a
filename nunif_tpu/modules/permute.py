"""Layout / window ops, NHWC (reference: nunif/modules/permute.py:45-218).

TPU-first notes: everything here is pure reshape/transpose so XLA fuses it
into neighbours; window partition keeps the channel axis last (lane dim).
"""
import jax.numpy as jnp


def pixel_shuffle(x, r: int):
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C), matching torch.pixel_shuffle
    semantics for a NCHW->NHWC transposed tensor (channel blocks are
    [C, r, r] ordered)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x, r: int):
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r), inverse of pixel_shuffle."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, r, r
    return x.reshape(b, h, w, c * r * r)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nH*nW, window, window, C)."""
    b, h, w, c = x.shape
    nh, nw = h // window, w // window
    x = x.reshape(b, nh, window, nw, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, window, window, c)


def window_reverse(x, window: int, h: int, w: int):
    """inverse of window_partition."""
    nh, nw = h // window, w // window
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _pair(r):
    return tuple(r) if isinstance(r, (tuple, list)) else (r, r)


def pixel_shuffle2(x, factor):
    """pixel_shuffle with a (rh, rw) tuple factor (reference
    nunif/modules/permute.py pixel_shuffle with tuple scale, used by
    row_flow_v3/MLBW with factor (1, 8))."""
    rh, rw = _pair(factor)
    b, h, w, crr = x.shape
    c = crr // (rh * rw)
    x = x.reshape(b, h, w, c, rh, rw)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * rh, w * rw, c)


def pixel_unshuffle2(x, factor):
    """inverse of pixel_shuffle2."""
    rh, rw = _pair(factor)
    b, hr, wr, c = x.shape
    h, w = hr // rh, wr // rw
    x = x.reshape(b, h, rh, w, rw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h, w, c * rh * rw)


def window_partition2(x, window):
    """(B,H,W,C) -> (B*nH*nW, wh*ww, C) with a rectangular window."""
    wh, ww = _pair(window)
    b, h, w, c = x.shape
    nh, nw = h // wh, w // ww
    x = x.reshape(b, nh, wh, nw, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, wh * ww, c)


def window_reverse2(x, window, h: int, w: int):
    """inverse of window_partition2."""
    wh, ww = _pair(window)
    nh, nw = h // wh, w // ww
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def window_partition3(x, window):
    """(B, D, H, W, C) -> (B*nd*nh*nw, wd*wh*ww, C)
    (reference nunif/modules/permute.py bcdhw_to_bnc, NDHWC here)."""
    wd, wh, ww = window
    B, D, H, W, C = x.shape
    nd, nh, nw = D // wd, H // wh, W // ww
    x = x.reshape(B, nd, wd, nh, wh, nw, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B * nd * nh * nw, wd * wh * ww, C)


def window_reverse3(x, window, d: int, h: int, w: int):
    """inverse of window_partition3."""
    wd, wh, ww = window
    nd, nh, nw = d // wd, h // wh, w // ww
    C = x.shape[-1]
    x = x.reshape(-1, nd, nh, nw, wd, wh, ww, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(-1, d, h, w, C)
