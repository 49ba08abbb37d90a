"""Loss library — pure-functional jnp losses.

Behavioral parity targets (reference files under nunif/modules/):
  charbonnier_loss.py, clamp_loss.py, channel_weighted_loss.py, psnr.py,
  lbp_loss.py (+lbcnn.py), dct_loss.py, fft_loss.py, gradient_loss.py,
  multiscale_loss.py, auxiliary_loss.py, gan_loss.py.

Layout: NHWC.  Losses are plain functions or small factory closures of
signature ``loss(pred, target) -> scalar`` so they compose under jit/grad.
The reference's nn.Module wrappers become functional combinators
(``clamp_loss_of``, ``luminance_weighted``...).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LUMINANCE_WEIGHT = (0.29891, 0.58661, 0.11448)


# ---------------------------------------------------------------- primitives
def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2)


def charbonnier_loss(x, y, eps=1.0e-3):
    return jnp.mean(jnp.sqrt((x - y) ** 2 + eps * eps))


def huber_loss(x, y, delta=1.0):
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d <= delta, 0.5 * d * d, delta * (d - 0.5 * delta)))


def psnr(x, y):
    """Negative PSNR as eval criterion (reference: psnr.py:12-19)."""
    mse = jnp.mean((jnp.clip(x, 0, 1) - jnp.clip(y, 0, 1)) ** 2)
    return -10.0 * jnp.log10(1.0 / (mse + 1.0e-6))


def _to_luminance(x):
    if x.shape[-1] == 3:
        w = jnp.asarray(LUMINANCE_WEIGHT)
        return jnp.sum(x * w, axis=-1, keepdims=True)
    return x


def luminance_psnr(x, y):
    """Negative Y-PSNR (reference: psnr.py:37-56)."""
    mse = jnp.mean((jnp.clip(_to_luminance(x), 0, 1)
                    - jnp.clip(_to_luminance(y), 0, 1)) ** 2)
    return -10.0 * jnp.log10(1.0 / (mse + 1.0e-6))


# ------------------------------------------------------------- combinators
def clamp_loss_of(loss_fn, min_value=0.0, max_value=1.0, eta=0.001,
                  clamp_l1=False):
    """Apply loss on clamped values + eta * unclamped term
    (reference: clamp_loss.py:6-18)."""
    def wrapped(x, y):
        clip = loss_fn(jnp.clip(x, min_value, max_value),
                       jnp.clip(y, min_value, max_value))
        noclip = l1_loss(x, y) if clamp_l1 else loss_fn(x, y)
        return clip + noclip * eta
    return wrapped


def channel_weighted(loss_fn, weights):
    """Per-channel loss with weights (reference: channel_weighted_loss.py:4)."""
    weights = tuple(weights)

    def wrapped(x, y):
        return sum(loss_fn(x[..., i:i + 1], y[..., i:i + 1]) * w
                   for i, w in enumerate(weights))
    return wrapped


def luminance_weighted(loss_fn):
    return channel_weighted(loss_fn, LUMINANCE_WEIGHT)


def average_weighted(loss_fn, in_channels=3):
    return channel_weighted(loss_fn, [1.0 / in_channels] * in_channels)


def multiscale_loss(loss_fn, scale_factors=(1, 2), weights=None):
    """Average loss over box-downscaled pyramids
    (reference: multiscale_loss.py)."""
    from .resize import resize
    weights = weights or [1.0 / len(scale_factors)] * len(scale_factors)

    def wrapped(x, y):
        total = 0.0
        for s, w in zip(scale_factors, weights):
            if s == 1:
                total += loss_fn(x, y) * w
            else:
                h, wd = x.shape[-3] // s, x.shape[-2] // s
                total += loss_fn(resize(x, h, wd, mode="box"),
                                 resize(y, h, wd, mode="box")) * w
        return total
    return wrapped


def auxiliary_loss(loss_fns, weights):
    """Deep-supervision tuple outputs (reference: auxiliary_loss.py)."""
    def wrapped(preds, target):
        assert isinstance(preds, (tuple, list))
        return sum(fn(p, target) * w
                   for p, fn, w in zip(preds, loss_fns, weights))
    return wrapped


# ------------------------------------------------------------------- LBP
@functools.lru_cache(maxsize=64)
def _lbcnn_filters(out_channels: int, in_channels: int, kernel_size: int,
                   sparsity: float = 0.9, seed: int = 71) -> np.ndarray:
    """Random +-1 sparse binary filters (reference: lbcnn.py:14-24).
    Returns HWIO."""
    rng = np.random.default_rng(seed)
    f = rng.binomial(1, 0.5, (out_channels, in_channels, kernel_size,
                              kernel_size)).astype(np.float32) * 2 - 1
    f[rng.uniform(size=f.shape) > sparsity] = 0
    return f.transpose(2, 3, 1, 0)  # HWIO


@functools.lru_cache(maxsize=64)
def _lbp_kernel(in_channels: int, out_channels: int, kernel_size: int,
                seed: int = 71) -> np.ndarray:
    """LBP kernel: filter 0 replaced by scaled identity
    (reference: lbp_loss.py:13-20)."""
    k = _lbcnn_filters(out_channels, in_channels, kernel_size,
                       seed=seed).copy()  # HWIO
    k[..., 0] = 0
    k[kernel_size // 2, kernel_size // 2, :, 0] = 0.5 * kernel_size ** 2
    return k / kernel_size


def lbp_loss(in_channels=1, out_channels=64, kernel_size=3, seed=71,
             base_loss=charbonnier_loss):
    """Local-binary-pattern conv loss (reference: lbp_loss.py:23-50).
    Uses kernel index 0 (the eval kernel); training kernel randomization is
    provided via the ``kernel_index`` argument of the returned fn's factory
    sibling ``lbp_loss_indexed`` if needed."""
    ks = jnp.asarray(_lbp_kernel(in_channels,
                                 out_channels - out_channels % in_channels,
                                 kernel_size, seed=seed))

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, ks.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=in_channels)

    def wrapped(x, y):
        return base_loss(conv(x), conv(y))
    return wrapped


def ylbp_loss(kernel_size=3, out_channels=64):
    """YLBP (reference: lbp_loss.py:53-55)."""
    inner = luminance_weighted(lbp_loss(1, out_channels, kernel_size))
    return clamp_loss_of(inner, clamp_l1=True)


def _rgb_to_yrgb(x, y_clamp=True):
    w = jnp.asarray(LUMINANCE_WEIGHT)
    xc = jnp.clip(x, 0, 1) if y_clamp else x
    y = jnp.sum(xc * w, axis=-1, keepdims=True)
    return jnp.concatenate([y, x], axis=-1)


def yrgb_lbp_loss(kernel_size=5):
    """YRGBLBP (reference: lbp_loss.py:64-74)."""
    inner = clamp_loss_of(
        average_weighted(lbp_loss(1, 64, kernel_size), in_channels=4),
        clamp_l1=True)

    def wrapped(x, y):
        return inner(_rgb_to_yrgb(x), _rgb_to_yrgb(y))
    return wrapped


# ------------------------------------------------------------------- DCT/FFT
@functools.lru_cache(maxsize=16)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n, n) (reference: dct.py)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    b = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    b[0] *= 1.0 / np.sqrt(2.0)
    return b.astype(np.float32)


def dct2(x):
    """2-D DCT over (..., H, W, C) spatial dims."""
    h, w = x.shape[-3], x.shape[-2]
    bh = jnp.asarray(_dct_basis(h))
    bw = jnp.asarray(_dct_basis(w))
    shape = x.shape
    xb = x.reshape((-1,) + shape[-3:])
    y = jnp.einsum("oh,bhwc->bowc", bh, xb,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,bowc->bopc", bw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(shape)


def _window_partition_pad(x, window):
    """(B,H,W,C) -> windows with centered zero pad to multiple of window
    (reference: dct_loss.py:21-27)."""
    b, h, w, c = x.shape
    ph = (-h) % window
    pw = (-w) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
    hh, ww = x.shape[1] // window, x.shape[2] // window
    x = x.reshape(b, hh, window, ww, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)


def dct_loss(window_size=8, base_loss=l1_loss, clamp=False, yrgb=True):
    """Windowed DCT loss (reference: dct_loss.py:11-33,95-97).

    RGB inputs are converted to YRGB first; the clamp variant compares DCTs
    of clamped values plus 0.001 * unclamped L1.
    """
    def one(x, y):
        xw = _window_partition_pad(x, window_size)
        yw = _window_partition_pad(y, window_size)
        if clamp:
            noclip = l1_loss(x, y)
            clip = base_loss(dct2(jnp.clip(xw, 0, 1)), dct2(jnp.clip(yw, 0, 1)))
            return clip + noclip * 0.001
        return base_loss(dct2(xw), dct2(yw))

    def wrapped(x, y):
        if yrgb and x.shape[-1] == 3:
            x, y = _rgb_to_yrgb(x), _rgb_to_yrgb(y)
        return one(x, y)
    return wrapped


def fft_loss(window_size=8, amp_weight=1.0, phase_weight=1.0, clamp=True):
    """Windowed FFT amplitude+phase loss (reference: fft_loss.py)."""
    def wrapped(x, y):
        if clamp:
            x, y = jnp.clip(x, 0, 1), jnp.clip(y, 0, 1)
        from .spectral import dft2
        xw = _window_partition_pad(x, window_size).astype(jnp.float32)
        yw = _window_partition_pad(y, window_size).astype(jnp.float32)
        # DFT as matmuls (modules/spectral.py): no XLA FFT on the axon TPU
        # backend, and at window sizes this is pure MXU work
        xr, xi = dft2(xw)
        yr, yi = dft2(yw)
        ax = jnp.sqrt(xr ** 2 + xi ** 2 + 1e-12)
        ay = jnp.sqrt(yr ** 2 + yi ** 2 + 1e-12)
        amp = jnp.mean(jnp.abs(ax - ay))
        phase = jnp.mean(jnp.sqrt((xr / (ax + 1e-8) - yr / (ay + 1e-8)) ** 2
                                  + (xi / (ax + 1e-8) - yi / (ay + 1e-8)) ** 2
                                  + 1e-12))
        return amp * amp_weight + phase * phase_weight
    return wrapped


def gradient_loss(base_loss=l1_loss):
    """Image-gradient loss (reference: gradient_loss.py)."""
    def grads(x):
        gx = x[:, 1:, :, :] - x[:, :-1, :, :]
        gy = x[:, :, 1:, :] - x[:, :, :-1, :]
        return gx, gy

    def wrapped(x, y):
        xgx, xgy = grads(x)
        ygx, ygy = grads(y)
        return base_loss(x, y) + base_loss(xgx, ygx) + base_loss(xgy, ygy)
    return wrapped


# ------------------------------------------------------------------- GAN
def gan_bce_loss(logits, is_real: bool):
    """Non-saturating BCE GAN loss (reference: gan_loss.py)."""
    labels = jnp.ones_like(logits) if is_real else jnp.zeros_like(logits)
    return jnp.mean(optax_sigmoid_bce(logits, labels))


def optax_sigmoid_bce(logits, labels):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


def gan_hinge_loss_d(real_logits, fake_logits):
    return (jnp.mean(jax.nn.relu(1.0 - real_logits))
            + jnp.mean(jax.nn.relu(1.0 + fake_logits)))


def gan_hinge_loss_g(fake_logits):
    return -jnp.mean(fake_logits)


def gan_softplus_loss_d(real_logits, fake_logits):
    return (jnp.mean(jax.nn.softplus(-real_logits))
            + jnp.mean(jax.nn.softplus(fake_logits)))


def gan_softplus_loss_g(fake_logits):
    return jnp.mean(jax.nn.softplus(-fake_logits))


def r1_regularization(disc_fn, params, real, gamma=10.0):
    """R1 gradient penalty: gamma/2 * E||grad_x D(x)||^2
    (reference: gan_loss.py:137-168)."""
    def d_sum(x):
        return jnp.sum(disc_fn(params, x))
    g = jax.grad(d_sum)(real)
    return 0.5 * gamma * jnp.mean(jnp.sum(g ** 2, axis=(1, 2, 3)))


# --------------------------------------------------------------------------
# Alex11 loss (reference nunif/modules/alex11_loss.py:6-55): AlexNet's
# first-layer 11x11 filters (grayscale-projected, L2-normalized, filter 31
# replaced by identity — weights bundled as _alex11.npy, converted from the
# reference's _alex11.pth) applied per channel; Charbonnier on the
# responses, channel-max, mean.
# --------------------------------------------------------------------------

def _alex11_filter():
    import os
    w = np.load(os.path.join(os.path.dirname(__file__), "_alex11.npy"))
    return jnp.asarray(w)  # (11, 11, 1, 64) HWIO


def alex11_loss(in_channels=3, eps=1.0e-3):
    kernel = _alex11_filter()

    def conv(x):
        C = x.shape[-1]
        w = jnp.tile(kernel.astype(x.dtype), (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    def loss_fn(x, y):
        fy = conv(x * 2.0 - 1.0)
        ft = conv(y * 2.0 - 1.0)
        c = jnp.sqrt((fy.astype(jnp.float32) - ft.astype(jnp.float32)) ** 2
                     + eps ** 2)
        return jnp.mean(jnp.max(c, axis=-1))

    return loss_fn


# --------------------------------------------------------------------------
# Flat color loss (reference nunif/modules/flat_color_loss.py): L2 masked
# to cells whose target is a flat color (kills color noise in flats).
# --------------------------------------------------------------------------

def get_flat_color_mask(y, size=8, eps=1e-5):
    y = jax.lax.stop_gradient(y)
    B, H, W, C = y.shape
    ph = (size - H % size) % size
    pw = (size - W % size) % size
    yp = jnp.pad(y, ((0, 0), (ph // 2, ph - ph // 2),
                     (pw // 2, pw - pw // 2), (0, 0)))
    Hp, Wp = yp.shape[1:3]
    cells = yp.reshape(B, Hp // size, size, Wp // size, size, C)
    center = cells[:, :, :1, :, :1, :]  # nearest-downscale pick (top-left)
    diff_max = jnp.abs(cells - center).max(axis=(2, 4, 5), keepdims=False)
    mask = (diff_max < eps).astype(y.dtype)[..., None, :, None, None]
    mask = jnp.broadcast_to(
        mask.reshape(B, Hp // size, 1, Wp // size, 1, 1),
        (B, Hp // size, size, Wp // size, size, 1)).reshape(B, Hp, Wp, 1)
    return mask[:, ph // 2:ph // 2 + H, pw // 2:pw // 2 + W]


def flat_color_loss(input, target, size=8):
    mask = get_flat_color_mask(target, size=size)
    return jnp.mean(((input - target) ** 2) * mask)


def flat_color_weighted_loss(input, target, size=8):
    return (jnp.mean(jnp.abs(input - target))
            + flat_color_loss(input, target, size=size))


# --------------------------------------------------------------------------
# trivial wrappers (reference identity_loss.py / weighted_loss.py)
# --------------------------------------------------------------------------

def identity_loss():
    """Model output IS the loss (reference identity_loss.py)."""
    def loss_fn(x, y=None):
        return jnp.mean(x)
    return loss_fn


def weighted_loss(loss_fns, weights):
    """Sum of weighted losses on the same (x, y)."""
    def loss_fn(x, y):
        return sum(w * f(x, y) for f, w in zip(loss_fns, weights))
    return loss_fn


# --------------------------------------------------------------------------
# Masked hinge GAN loss (reference nunif/modules/gan_loss.py
# GANMaskHingeLoss): the discriminator loss only counts patch logits whose
# receptive field overlaps the inpainting hole mask.
# --------------------------------------------------------------------------

def _masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def gan_mask_hinge_loss_d(real_logits, fake_logits, mask):
    real = _masked_mean(jnp.minimum(real_logits.astype(jnp.float32) - 1, 0.0),
                        mask)
    fake = _masked_mean(jnp.minimum(-fake_logits.astype(jnp.float32) - 1, 0.0),
                        mask)
    return -(real + fake)


def gan_mask_hinge_loss_g(fake_logits, mask):
    return -_masked_mean(fake_logits.astype(jnp.float32), mask)


# --------------------------------------------------------------------------
# Differentiable pair augments + augmented DCT losses
# (reference nunif/modules/transforms.py diff_rotate/diff_translate and
# dct_loss.py DCTLoss(random_rotate/random_instance_rotate/overlap),
# waifu2x/training/trainer.py _dctirm / "dctir24").
#
# TPU adaptation: the reference expands rotated outputs to the exact
# per-angle bounding box (a dynamic shape).  Under jit we expand every
# rotation to the static diagonal bound instead — same content, slightly
# more zero border; the 0.5/1.0 loss weighting is unchanged.
# Random-augmented criteria take an optional `rng` argument (the trainer
# threads its step PRNG key); with rng=None they fall back to the
# reference's eval behavior (fixed 45 deg / fixed translate).
# --------------------------------------------------------------------------

def rotate_expand(x, angle, out_hw=None):
    """Rotate (B,H,W,C) by per-instance `angle` (radians, (B,) or scalar)
    about the image center; bilinear, zeros padding, output expanded to
    the static diagonal bound (or `out_hw`)."""
    from .grid_sample import grid_sample
    B, H, W, C = x.shape
    angle = jnp.broadcast_to(jnp.asarray(angle, jnp.float32), (B,))
    if out_hw is None:
        d = int(np.ceil(np.sqrt(H * H + W * W)))
        oh = ow = d + (d % 2)
    else:
        oh, ow = out_hw
    yy = jnp.arange(oh, dtype=jnp.float32) - (oh - 1) / 2.0
    xx = jnp.arange(ow, dtype=jnp.float32) - (ow - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    ca = jnp.cos(angle)[:, None, None]
    sa = jnp.sin(angle)[:, None, None]
    ix = ca * gx + sa * gy          # output -> input (inverse rotation)
    iy = -sa * gx + ca * gy
    # normalized align_corners=True coords about the input center
    nx = ix / jnp.maximum((W - 1) / 2.0, 1.0)
    ny = iy / jnp.maximum((H - 1) / 2.0, 1.0)
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                       align_corners=True)


def translate_pair(x, y, rng=None, size=12, instance_random=True):
    """Shift both images by the same random integer offset in
    [-size, size], expanding the canvas by `size` each side (zeros).
    rng=None -> centered (no shift), matching the reference eval path."""
    B, H, W, C = x.shape
    pad = ((0, 0), (2 * size, 2 * size), (2 * size, 2 * size), (0, 0))
    xp = jnp.pad(x, pad)
    yp = jnp.pad(y, pad)
    if rng is None:
        off = jnp.full((B, 2), size, jnp.int32)
    elif instance_random:
        off = jax.random.randint(rng, (B, 2), 0, 2 * size + 1)
    else:
        off = jnp.broadcast_to(
            jax.random.randint(rng, (1, 2), 0, 2 * size + 1), (B, 2))

    def slice_one(img, o):
        return jax.lax.dynamic_slice(
            img, (o[0], o[1], 0), (H + 2 * size, W + 2 * size, C))

    return (jax.vmap(slice_one)(xp, off), jax.vmap(slice_one)(yp, off))


def _dct_window_loss(x, y, window_size, base_loss, clamp, overlap):
    def one(xw, yw):
        if clamp:
            noclip = l1_loss(xw, yw)
            clip = base_loss(dct2(jnp.clip(xw, 0, 1)),
                             dct2(jnp.clip(yw, 0, 1)))
            return clip + noclip * 0.001
        return base_loss(dct2(xw), dct2(yw))

    if window_size is None:
        return one(x, y)
    l1v = one(_window_partition_pad(x, window_size),
              _window_partition_pad(y, window_size))
    if not overlap:
        return l1v
    p = window_size // 2
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    l2v = one(_window_partition_pad(jnp.pad(x, pad), window_size),
              _window_partition_pad(jnp.pad(y, pad), window_size))
    return (l1v + l2v) * 0.5


def dct_loss_ex(window_size=None, base_loss=l1_loss, clamp=False,
                overlap=False, rotate=None, yrgb=True):
    """DCT loss with the reference's full option surface
    (reference dct_loss.py DCTLoss): window_size=None -> whole-image DCT;
    overlap -> second half-window-shifted pass averaged in; rotate in
    {None, "diag", "batch_random", "instance_random"}.

    Returns fn(x, y, rng=None); random rotations need rng (the fn is
    marked needs_rng=True so trainers thread their step key)."""
    def wrapped(x, y, rng=None):
        if yrgb and x.shape[-1] == 3:
            x, y = _rgb_to_yrgb(x), _rgb_to_yrgb(y)
        loss1 = _dct_window_loss(x, y, window_size, base_loss, clamp,
                                 overlap)
        if rotate is None:
            return loss1
        B = x.shape[0]
        if rng is None:
            ang = jnp.full((B,), np.pi / 4, jnp.float32)
        elif rotate == "instance_random":
            ang = jax.random.uniform(rng, (B,), jnp.float32, 0, 2 * np.pi)
        else:  # batch_random / diag
            if rotate == "diag":
                ang = jnp.full((B,), np.pi / 4, jnp.float32)
            else:
                ang = jnp.broadcast_to(
                    jax.random.uniform(rng, (1,), jnp.float32,
                                       0, 2 * np.pi), (B,))
        loss2 = _dct_window_loss(rotate_expand(x, ang), rotate_expand(y, ang),
                                 window_size, base_loss, clamp, overlap)
        return loss1 * 0.5 + loss2

    wrapped.needs_rng = rotate in ("batch_random", "instance_random")
    return wrapped


def weighted_loss_ex(loss_fns, weights, preprocess_pair=None):
    """reference weighted_loss.py WeightedLoss with preprocess_pair:
    the (possibly random) pair augment runs once, each sub-loss sees the
    augmented pair.  Sub-losses may themselves accept rng."""
    def loss_fn(x, y, rng=None):
        r_pre = r_sub = None
        if rng is not None:
            r_pre, r_sub = jax.random.split(rng)
        if preprocess_pair is not None:
            x, y = preprocess_pair(x, y, r_pre)
        total = 0.0
        for i, (f, w) in enumerate(zip(loss_fns, weights)):
            if getattr(f, "needs_rng", False):
                k = None if r_sub is None else jax.random.fold_in(r_sub, i)
                total += w * f(x, y, k)
            else:
                total += w * f(x, y)
        return total

    loss_fn.needs_rng = True
    return loss_fn


def dctirm_loss(rotate=True, translate=True):
    """reference waifu2x/training/trainer.py:53-64 _dctirm."""
    fns = (dct_loss_ex(window_size=4, clamp=True),
           dct_loss_ex(window_size=24, clamp=True,
                       rotate="instance_random" if rotate else None),
           dct_loss_ex(window_size=None, clamp=True))
    pre = (lambda x, y, rng: translate_pair(x, y, rng, size=12)) \
        if translate else None
    return weighted_loss_ex(fns, (0.2, 0.2, 0.6), preprocess_pair=pre)


def dctir24_loss():
    """reference trainer.py "dctir24"."""
    return weighted_loss_ex(
        (dct_loss_ex(window_size=24, clamp=True, rotate="batch_random",
                     overlap=True),),
        (1.0,),
        preprocess_pair=lambda x, y, rng: translate_pair(x, y, rng, size=12))


# --------------------------------------------------------------------------
# Gradient / FFT composites (reference gradient_loss.py, fft_loss.py)
# --------------------------------------------------------------------------

def gradient_only_loss(diag=False, base_loss=l1_loss):
    """reference gradient_loss.py GradientLoss: finite differences with the
    detached (stop-gradient) neighbor, averaged over directions."""
    def grads(x):
        sg = jax.lax.stop_gradient
        out = [x[:, 1:, 1:, :] - sg(x[:, :-1, 1:, :]),
               x[:, 1:, 1:, :] - sg(x[:, 1:, :-1, :])]
        if diag:
            out.append(x[:, 1:, 1:, :] - sg(x[:, :-1, :-1, :]))
            out.append(x[:, 1:, 1:-1, :] - sg(x[:, :-1, 2:, :]))
        return out

    def wrapped(x, y):
        gx, gy = grads(x), grads(y)
        return sum(base_loss(a, b) for a, b in zip(gx, gy)) / len(gx)
    return wrapped


def fft_ri_loss():
    """reference fft_loss.py fft_loss: L1 over stacked (real, imag) of the
    whole-image 2D DFT (ortho norm — the reference's own recommended norm,
    fft_loss.py:24-25)."""
    def wrapped(x, y):
        from .spectral import dft2
        xr, xi = dft2(x.astype(jnp.float32))
        yr, yi = dft2(y.astype(jnp.float32))
        return 0.5 * (jnp.mean(jnp.abs(xr - yr)) + jnp.mean(jnp.abs(xi - yi)))
    return wrapped


def yrgb_l1_lbp_loss(kernel_size=3, weight=0.4):
    """reference lbp_loss.py YRGBL1LBP: clamp-L1 + weight * YRGB-LBP."""
    lbp = yrgb_lbp_loss(kernel_size=kernel_size)
    l1 = clamp_loss_of(l1_loss)

    def wrapped(x, y):
        return l1(x, y) + lbp(x, y) * weight
    return wrapped


def yrgb_flat_lbp_loss(kernel_size=5, weight=0.4):
    """reference lbp_loss.py YRGBFlatLBP: clamp flat-color-weighted L1+L2
    + weight * YRGB-LBP."""
    lbp = yrgb_lbp_loss(kernel_size=kernel_size)
    flat = clamp_loss_of(flat_color_weighted_loss)

    def wrapped(x, y):
        return flat(x, y) + lbp(x, y) * weight
    return wrapped


def yrgb_l1_fft_gradient_loss(fft_weight=0.1, grad_weight=0.1, diag=False):
    """reference fft_loss.py YRGBL1FFTGradientLoss: YRGB-preprocessed
    clamp-L1 + fft + clamp-gradient weighted sum."""
    l1 = clamp_loss_of(l1_loss)
    fft = fft_ri_loss()
    grad = clamp_loss_of(gradient_only_loss(diag=diag))

    def wrapped(x, y):
        x, y = _rgb_to_yrgb(x), _rgb_to_yrgb(y)
        return l1(x, y) + fft(x, y) * fft_weight + grad(x, y) * grad_weight
    return wrapped
