"""3x3 VALID conv as a Pallas strip kernel — the swin_unet stem hot path.

Why: the stem's second conv (48->96 at ~1080p) dominated the non-attention
residue as an XLA im2col: the (H, W, 9*48) column tensor is materialized in
HBM (a 9-piece dynamic-update-slice fusion ~5.7 ms + a 432-lane relayout
copy ~6.6 ms) and the matmul writes its fp32 accumulator back (~4.6 ms) —
~17 ms/frame of pure layout traffic for a 0.4 TFLOP contraction
(tools/profile_waifu2x.py, r3).  Here each grid step forms the 9-tap
columns in VMEM and runs ONE (strip*W, 9C) x (9C, Cout) MXU pass with bias
+ leaky_relu fused — columns never touch HBM.

The 2-row halo comes from passing the input TWICE with row-block specs i
and min(i+1, last): manual HBM DMA is not an option because Mosaic tiles
the 48-channel minor dim to 128 lanes and rejects sub-tile memref slices.

Used by waifu2x/models/swin_unet.py:Im2ColConv3x3 (reference stem:
waifu2x/models/swin_unet.py:123-133 — two valid 3x3 convs + crop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xn_ref, w_ref, b_ref, out_ref, cols_ref, *, strip, wo,
            cin, cout, crop, lrelu_slope):
    # rows [i*strip, i*strip + 2*strip) of the uncropped conv input are
    # available; output rows map to input rows [i*strip+crop, +strip+2)
    xs = jnp.concatenate([x_ref[0], xn_ref[0]], axis=0)  # (2*strip, W, cin)
    # materialize the 9 taps through the cols scratch: slices carry lazy
    # sublane offsets in their Mosaic layouts and the matmul operand needs
    # one offset-0 value — VMEM stores force the relayout (this is the
    # im2col, but it never leaves VMEM)
    for di in range(3):
        for dj in range(3):
            t = di * 3 + dj
            r0 = crop + di
            c0 = crop + dj
            cols_ref[:, :, t * cin:(t + 1) * cin] = \
                xs[r0:r0 + strip, c0:c0 + wo, :]
    y = jax.lax.dot_general(
        cols_ref[:].reshape(strip * wo, 9 * cin), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b_ref[:][None].astype(jnp.float32)
    if lrelu_slope is not None:
        y = jnp.where(y >= 0, y, y * lrelu_slope)
    out_ref[0] = y.reshape(strip, wo, cout).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("crop", "lrelu_slope", "strip",
                                    "interpret"))
def stem_conv3x3(x, kernel, bias, *, crop=0, lrelu_slope=None, strip=8,
                 interpret=False):
    """x: (B, H, W, Cin); kernel (3, 3, Cin, Cout) + bias (Cout,).

    Returns leaky_relu(conv3x3_valid(x) + bias)[:, crop:-crop, crop:-crop]
    (lrelu only when ``lrelu_slope`` is set; crop=0 skips the slice).
    Requires (H - 2 - 2*crop) % strip == 0 and crop + 2 <= strip — true
    for every valid swin tile (size = 48k + 16) with crop=6, strip=8;
    callers fall back to the XLA im2col otherwise.
    """
    B, H, W, cin = x.shape
    cout = kernel.shape[-1]
    ho = H - 2 - 2 * crop
    wo = W - 2 - 2 * crop
    assert ho % strip == 0 and crop + 2 <= strip, (H, crop, strip)
    n_strips = ho // strip
    # the kernel reads row blocks i and i+1; pad H so block i+1 exists
    # even for the last strip (same-block clamp would mis-index rows)
    pad_h = (n_strips + 1) * strip - H
    if pad_h > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    wmat = kernel.reshape(9 * cin, cout).astype(x.dtype)
    bvec = bias.astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_kernel, strip=strip, wo=wo, cin=cin, cout=cout,
                          crop=crop, lrelu_slope=lrelu_slope),
        grid=(B, n_strips),
        in_specs=[
            pl.BlockSpec((1, strip, W, cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, W, cin), lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, strip, wo, cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ho, wo, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((strip, wo, 9 * cin), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, wmat, bvec)
