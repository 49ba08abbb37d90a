"""waifu2x turbo_2x — a TPU-shaped 2x super-resolution CNN.

This is NOT a port of a reference architecture: it is the TPU-native
answer to the reference's acceptance protocol for new waifu2x models
(PSNR vs the catrom baseline under the benchmark CLI, reference
waifu2x/docs/training.md:131-147 and waifu2x/benchmark.py) at a FLOP
budget that clears the 30 fps 1080p->4K bar on one v5e — swin_unet_2x
is ~7 TFLOP/frame (~28 fps at 100% bf16 MXU, measured floor 7-9 fps);
turbo_2x is ~2.5 TFLOP/frame of pure dense 3x3 convolutions, the single
best-mapping op family for the MXU.

Design (every choice is an MXU/HBM argument; measured numbers from
tools/profile_waifu2x.py BENCH_ARCH=waifu2x.turbo_2x on v5e):

- **Nothing full-resolution exists anywhere.**  The stem is a 6x6
  stride-2 conv (mathematically identical to space-to-depth + 3x3, but
  with no (H, W) relayout: the v1 s2d reshape alone profiled 10.8
  ms/frame).  The catrom 2x base is a FIXED 6x6 stride-2 conv emitting
  all 16 output subpixels of each half-res cell as channels.  Body,
  base, tail and the residual add all live at (H/2, W/2, {128, 48});
  the only full-res tensor is the final uint8 frame, produced by ONE
  subpixel reorder after quantization (i2i_ps_factor=4 head contract,
  utils/tiling.py ps fast path).
- **Half-resolution body, C=128**: one full 128-lane tile; each body
  conv is an im2col GEMM (K=1152, N=128) that tiles the systolic array
  exactly — profiled 0.85 ms/conv = ~180 TFLOP/s bf16 (~90% MXU).
- **Wide residual blocks, no attention, no normalization**: conv(3x3)
  -> relu -> conv(3x3) + skip, second conv zero-init (identity at init,
  normalization-free stability without LayerNorm's lane reductions).
- **Global catrom residual with a zero-init tail**: an untrained
  turbo_2x IS the catrom baseline exactly (PSNR >= baseline from step
  0, training only adds detail).

The I2I contract (scale=2, offset=16, blend=8) matches swin_unet_2x so
every runtime path (tiling, TTA, alpha, web, CLI) works unchanged.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...models import I2IBaseModel, register_model
from ...modules.permute import pixel_shuffle


def _catrom_w(d, a=-0.5):
    d = abs(d)
    if d < 1.0:
        return (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1
    if d < 2.0:
        return a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a
    return 0.0


def catrom2x_phase_taps(scale: int = 2):
    """(2*scale, 6) matrix: weight of full-res tap row (2i-2+k), k=0..5,
    for output row 2*scale*i + r (align_corners=False: output j samples
    input (j+0.5)/scale - 0.5; for scale=2 the 4 phases sit at
    2i + {-0.25, 0.25, 0.75, 1.25} — all nonzero taps inside the 6-row
    window for scale in {2, 4})."""
    ph = 2 * scale
    m = np.zeros((ph, 6), np.float32)
    for r in range(ph):
        pos = (r + 0.5) / scale - 0.5  # relative to 2i, in full-res rows
        for k in range(6):
            m[r, k] = _catrom_w(pos - (k - 2))
    return m


def catrom2x_halfres_kernel(channels: int = 3, scale: int = 2) -> np.ndarray:
    """Fixed (6, 6, C, (2*scale)^2*C) stride-2 conv kernel: the catrom
    `scale`x upscale with each half-res cell's (2*scale)^2 output
    subpixels as channels (channel-major c*ph^2 + ry*ph + rx — the
    [C, r, r] ordering pixel_shuffle and the renderer's ps fast path
    expect)."""
    taps = catrom2x_phase_taps(scale)
    ph = 2 * scale
    k = np.zeros((6, 6, channels, ph * ph * channels), np.float32)
    for ry in range(ph):
        for rx in range(ph):
            kk = np.outer(taps[ry], taps[rx])  # (6, 6)
            for c in range(channels):
                k[:, :, c, c * ph * ph + ry * ph + rx] = kk
    return k


# stride-2 6x6 window covering full-res rows 2i-2 .. 2i+3
_STRIDE2_PAD = ((2, 3), (2, 3))


class _TurboBody(nn.Module):
    dim: int
    blocks: int

    @nn.compact
    def __call__(self, h):
        for i in range(self.blocks):
            r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=h.dtype,
                        name=f"block{i}_conv1")(h)
            r = nn.relu(r)
            # zero-init second conv: each block starts as identity, so
            # depth never hurts early training (normalization-free)
            r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=h.dtype,
                        kernel_init=nn.initializers.zeros,
                        name=f"block{i}_conv2")(r)
            h = h + r
        return h


@register_model
class Turbo2x(I2IBaseModel):
    """2x SR: fixed half-res catrom base + half-res residual CNN."""
    model_name = "waifu2x.turbo_2x"
    in_channels: int = 3
    out_channels: int = 3
    dim: int = 128
    blocks: int = 8
    pre_shuffle_output: bool = False  # renderer blend-in-head-layout hook

    i2i_scale = 2
    i2i_offset = 16
    i2i_blend_size = 8
    i2i_ps_factor = 4  # head layout is (H/2, W/2, C*16), not (H, W, C*4)
    i2i_default_tile_size = 256
    i2i_default_batch_size = 8
    # stride-2 stem needs even tiles
    i2i_tile_constraints = ((2, 0),)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, H, W, C = x.shape
        dt = x.dtype
        s = self.i2i_scale
        ph = 2 * s  # output subpixels per half-res cell, per axis

        # fixed catrom 2x base: (H/2, W/2, 16*C), all subpixels as
        # channels.  Always fp32: under the bf16 policy the base path's
        # rounding alone floors the whole model ~0.7 dB below the catrom
        # baseline it is supposed to START at (measured 33.31 vs 34.05
        # PSNR on the synthetic eval set), and this conv is ~0.2% of the
        # model's FLOPs so fp32 here costs nothing measurable.
        base_k = jnp.asarray(catrom2x_halfres_kernel(C, s), jnp.float32)
        # Precision.HIGHEST: jax's DEFAULT conv precision truncates f32
        # operands to bf16 (measured ~3e-3 abs error on this very conv),
        # which would put the bf16 floor right back under the base path
        base = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), base_k, window_strides=(2, 2),
            padding=_STRIDE2_PAD,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

        # learned path, entirely at (H/2, W/2)
        h = nn.Conv(self.dim, (6, 6), strides=(2, 2), padding=_STRIDE2_PAD,
                    dtype=dt, name="stem")(x)
        h = _TurboBody(self.dim, self.blocks, name="body")(h)
        tail = nn.Conv(ph * ph * C, (3, 3), padding="SAME", dtype=dt,
                       kernel_init=nn.initializers.zeros, name="tail")(h)

        y = base + tail.astype(jnp.float32)
        off = self.i2i_offset // ph  # offset (output px) in half-res units
        y = y[:, off:H // 2 - off, off:W // 2 - off, :]
        if not train:
            y = jnp.clip(y, 0.0, 1.0)
        if self.pre_shuffle_output:
            return y
        return pixel_shuffle(y, ph)


@register_model
class Turbo4x(Turbo2x):
    """4x SR, same design one octave up: the body still lives at
    (H/2, W/2, dim) — identical FLOPs to turbo_2x per INPUT pixel — and
    the fixed catrom 4x base / zero-init tail emit all 8x8 output
    subpixels of each half-res cell as channels (i2i_ps_factor=8), so
    nothing full-resolution exists before the single post-quantize
    subpixel reorder.  Serves the reference's `--method scale4x` slot
    (reference waifu2x/models/swin_unet.py swin_unet_4x) the TPU way."""
    model_name = "waifu2x.turbo_4x"

    i2i_scale = 4
    i2i_offset = 32
    i2i_blend_size = 16
    i2i_ps_factor = 8
