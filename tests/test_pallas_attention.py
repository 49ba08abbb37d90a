"""Fused window attention kernel vs the XLA reference path (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nunif_tpu.modules.attention import ShiftedWindowAttention
from nunif_tpu.ops.swin_attention import fused_window_attention

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("shift", [0, 3])
def test_kernel_matches_xla_path(shift):
    b, h, w, c = 2, 18, 24, 48
    heads, ws = 6, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

    attn = ShiftedWindowAttention(dim=c, num_heads=heads, window_size=ws,
                                  shift_size=shift, fused=False)
    params = attn.init(jax.random.PRNGKey(1), x)
    want = np.asarray(attn.apply(params, x))

    # reproduce the fused path manually in interpret mode with the same params
    n = ws * ws
    nh, nw = h // ws, w // ws
    xs = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    xw = xs.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b * nh * nw, n, c)
    p = params["params"]
    qkv = xw @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    from nunif_tpu.modules.attention import relative_position_index
    idx = relative_position_index(ws, ws)
    table = p["relative_position_bias_table"]
    rel = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
    out = fused_window_attention(qkv, rel.astype(jnp.float32),
                                 num_heads=heads, window=ws, shift=shift,
                                 n_wh=nh, n_ww=nw, block_windows=4,
                                 interpret=True)
    out = out @ p["proj"]["kernel"] + p["proj"]["bias"]
    out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, h, w, c)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


def test_window_padding():
    """nw not divisible by block_windows pads and slices correctly."""
    heads, ws, c = 2, 4, 16
    n = ws * ws
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(5, n, 3 * c)).astype(np.float32))
    bias = jnp.zeros((heads, n, n), jnp.float32)
    out = fused_window_attention(qkv, bias, num_heads=heads, window=ws,
                                 shift=0, n_wh=5, n_ww=1, block_windows=4,
                                 interpret=True)
    assert out.shape == (5, n, c)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("shift", [0, 3])
def test_image_kernel_matches_xla_path(shift):
    from nunif_tpu.ops.swin_attention import fused_window_attention_image
    b, h, w, c = 2, 18, 30, 48
    heads, ws = 6, 6
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    attn = ShiftedWindowAttention(dim=c, num_heads=heads, window_size=ws,
                                  shift_size=shift, fused=False)
    params = attn.init(jax.random.PRNGKey(1), x)
    want = np.asarray(attn.apply(params, x))

    p = params["params"]
    xs = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    qkv = xs @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    from nunif_tpu.modules.attention import relative_position_index
    n = ws * ws
    idx = relative_position_index(ws, ws)
    table = p["relative_position_bias_table"]
    rel = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
    out = fused_window_attention_image(qkv, rel.astype(jnp.float32),
                                       num_heads=heads, window=ws,
                                       shift=shift, interpret=True)
    out = out @ p["proj"]["kernel"] + p["proj"]["bias"]
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


@pytest.mark.parametrize("variant", ["perhead", "headpack", "headpack_vd", "headgroup3", "headgroup2", "wpack2", "wpack3"])
def test_fused_swin_block_pad_shift_matches_module(variant):
    """pad-shift kernel orchestration (no jnp.roll; padded grid + key
    masking) == the roll-based module path on the valid region."""
    from nunif_tpu.ops.swin_attention import fused_swin_block
    from nunif_tpu.modules.attention import (SwinTransformerBlock,
                                             relative_position_index)

    shift, ws, n, c = 3, 6, 36, 96
    blk = SwinTransformerBlock(c, 6, ws, shift_size=shift, norm="none")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 24, 36, c)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(blk.apply({"params": params}, x))

    b, hh, ww_ = 2, 24, 36
    nh, nw = hh // ws, ww_ // ws
    nh2, nw2 = nh + 1, nw + 1
    xp = jnp.pad(x, ((0, 0), (shift, ws - shift), (shift, ws - shift),
                     (0, 0)))
    xw = xp.reshape(b, nh2, ws, nw2, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b * nh2 * nw2, n, c)
    a = params["attn"]
    m = params["mlp"]
    idx = relative_position_index(ws, ws)
    rel = a["relative_position_bias_table"][idx.reshape(-1)] \
        .reshape(n, n, 6).transpose(2, 0, 1)
    out = fused_swin_block(
        xw, a["qkv"]["kernel"], a["qkv"]["bias"],
        a["proj"]["kernel"], a["proj"]["bias"],
        m["fc1"]["kernel"], m["fc1"]["bias"],
        m["fc2"]["kernel"], m["fc2"]["bias"],
        jnp.asarray(rel, jnp.float32),
        num_heads=6, window=ws, shift=shift, n_wh=nh2, n_ww=nw2,
        attn_variant=variant, shift_mode="pad", block_windows=8,
        interpret=True)
    out = out.reshape(b, nh2, nw2, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, nh2 * ws, nw2 * ws, c)
    out = out[:, shift:shift + hh, shift:shift + ww_]
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


@pytest.mark.parametrize("variant", ["perhead", "headpack", "headpack_vd", "headgroup3", "headgroup2", "wpack2", "wpack3"])
def test_fused_swin_block_matches_module(monkeypatch, variant):
    """v3 whole-block kernel (interpret mode) == unfused module path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nunif_tpu.ops.swin_attention import fused_swin_block
    from nunif_tpu.modules.attention import SwinTransformerBlock

    for shift in (0, 3):
        blk = SwinTransformerBlock(96, 6, 6, shift_size=shift, norm="none")
        rng = np.random.default_rng(shift)
        x = jnp.asarray(rng.normal(0, 0.5, (1, 24, 36, 96)), jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        want = np.asarray(blk.apply({"params": params}, x))

        # drive the kernel directly from the same params
        ws, n = 6, 36
        nh, nw = 24 // ws, 36 // ws
        xs = x
        if shift:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        xw = xs.reshape(1, nh, ws, nw, ws, 96).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(nh * nw, n, 96)
        from nunif_tpu.modules.attention import relative_position_index
        a = params["attn"]
        m = params["mlp"]
        idx = relative_position_index(ws, ws)
        table = a["relative_position_bias_table"]
        rel = table[idx.reshape(-1)].reshape(n, n, 6).transpose(2, 0, 1)
        out = fused_swin_block(
            xw, a["qkv"]["kernel"], a["qkv"]["bias"],
            a["proj"]["kernel"], a["proj"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"],
            jnp.asarray(rel, jnp.float32),
            num_heads=6, window=ws, shift=shift, n_wh=nh, n_ww=nw,
            attn_variant=variant, interpret=True)
        out = out.reshape(1, nh, nw, ws, ws, 96).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(1, 24, 36, 96)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


@pytest.mark.parametrize("rh,cw", [(1, 4), (2, 3), (3, 7)])
def test_fused_swin_block_image_matches_module(rh, cw):
    """v4 image-layout kernel (windows formed in VMEM, interpret mode) ==
    unfused module path, incl. uneven block grids (garbage-window pad)."""
    from nunif_tpu.ops.swin_attention import fused_swin_block_image
    from nunif_tpu.modules.attention import (SwinTransformerBlock,
                                             relative_position_index)

    ws, n, c = 6, 36, 96
    for shift in (0, 3):
        blk = SwinTransformerBlock(c, 6, ws, shift_size=shift, norm="none")
        rng = np.random.default_rng(shift)
        x = jnp.asarray(rng.normal(0, 0.5, (2, 30, 42, c)), jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        want = np.asarray(blk.apply({"params": params}, x))

        hh, ww_ = x.shape[1], x.shape[2]
        if shift:
            xp = jnp.pad(x, ((0, 0), (shift, ws - shift),
                             (shift, ws - shift), (0, 0)))
        else:
            xp = x
        a, m = params["attn"], params["mlp"]
        idx = relative_position_index(ws, ws)
        rel = a["relative_position_bias_table"][idx.reshape(-1)] \
            .reshape(n, n, 6).transpose(2, 0, 1)
        out = fused_swin_block_image(
            xp, a["qkv"]["kernel"], a["qkv"]["bias"],
            a["proj"]["kernel"], a["proj"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"],
            jnp.asarray(rel, jnp.float32),
            num_heads=6, window=ws, shift=shift, block_rows=rh,
            block_cols=cw, shift_mode="pad", interpret=True)
        if shift:
            out = out[:, shift:shift + hh, shift:shift + ww_]
        else:
            out = out[:, :hh, :ww_]
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


@pytest.mark.parametrize("rh", [1, 3, 8])
def test_fused_swin_block_image_rowpack_matches_module(rh):
    """rowpack (zero-relayout image kernel: pack group = one window-row,
    image-order tokens, permuted bias constant) == unfused module path,
    incl. garbage-window column pad (42px = 7 windows vs G=4)."""
    from nunif_tpu.ops.swin_attention import fused_swin_block_image
    from nunif_tpu.modules.attention import (SwinTransformerBlock,
                                             relative_position_index)

    ws, n, c = 6, 36, 96
    for shift in (0, 3):
        blk = SwinTransformerBlock(c, 6, ws, shift_size=shift, norm="none")
        rng = np.random.default_rng(10 + shift)
        x = jnp.asarray(rng.normal(0, 0.5, (2, 30, 42, c)), jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        want = np.asarray(blk.apply({"params": params}, x))

        hh, ww_ = x.shape[1], x.shape[2]
        if shift:
            xp = jnp.pad(x, ((0, 0), (shift, ws - shift),
                             (shift, ws - shift), (0, 0)))
        else:
            xp = x
        a, m = params["attn"], params["mlp"]
        idx = relative_position_index(ws, ws)
        rel = a["relative_position_bias_table"][idx.reshape(-1)] \
            .reshape(n, n, 6).transpose(2, 0, 1)
        out = fused_swin_block_image(
            xp, a["qkv"]["kernel"], a["qkv"]["bias"],
            a["proj"]["kernel"], a["proj"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"],
            jnp.asarray(rel, jnp.float32),
            num_heads=6, window=ws, shift=shift, block_rows=rh,
            attn_variant="rowpack4", shift_mode="pad", interpret=True)
        if shift:
            out = out[:, shift:shift + hh, shift:shift + ww_]
        else:
            out = out[:, :hh, :ww_]
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5,
                                   err_msg=f"shift={shift} rh={rh}")


def test_fused_swin_block_image_skip_fusion():
    """skip= (stage-boundary residual fused into the kernel's first VMEM
    touch) == adding outside the kernel."""
    from nunif_tpu.ops.swin_attention import fused_swin_block_image
    from nunif_tpu.modules.attention import (SwinTransformerBlock,
                                             relative_position_index)

    ws, n, c = 6, 36, 96
    blk = SwinTransformerBlock(c, 6, ws, shift_size=0, norm="none")
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 24, 30, c)), jnp.float32)
    skip = jnp.asarray(rng.normal(0, 0.5, (1, 24, 30, c)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    a, m = params["attn"], params["mlp"]
    idx = relative_position_index(ws, ws)
    rel = jnp.asarray(a["relative_position_bias_table"][idx.reshape(-1)]
                      .reshape(n, n, 6).transpose(2, 0, 1), jnp.float32)
    args = (a["qkv"]["kernel"], a["qkv"]["bias"], a["proj"]["kernel"],
            a["proj"]["bias"], m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"], rel)
    want = fused_swin_block_image(
        x + skip, *args, num_heads=6, window=ws, shift=0, block_rows=2,
        attn_variant="rowpack4", shift_mode="pad", interpret=True)
    got = fused_swin_block_image(
        x, *args, num_heads=6, window=ws, shift=0, block_rows=2,
        attn_variant="rowpack4", shift_mode="pad", skip=skip,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_stem_conv3x3_matches_xla():
    """Pallas strip conv (in-VMEM im2col + fused crop/lrelu) == plain XLA
    conv + lrelu + crop."""
    from nunif_tpu.ops.conv3x3 import stem_conv3x3

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 30, 46, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 24)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (24,)), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + b
    ref = jnp.where(ref >= 0, ref, ref * 0.1)[:, 2:-2, 2:-2, :]

    out = stem_conv3x3(x, w, b, crop=2, lrelu_slope=0.1, strip=8,
                       interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # no crop / no lrelu
    ref2 = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out2 = stem_conv3x3(x, w, b, strip=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5)


def test_wpack_isolation_under_adversarial_scale():
    """Guard for the wpack numerical cross-window isolation assumption.

    The wpack kernel kills cross-window scores with a -30000 additive baked
    into the bias constant, then clamps log2-scores to [-100, 60]; packed ==
    per-window holds whenever |logits| <= ~41 (ops/swin_attention.py).  This
    asserts the equivalence at adversarially scaled activations near that
    bound so a future model/kernel change that violates the assumption fails
    loudly here instead of silently leaking between packed windows.
    """
    from nunif_tpu.ops.swin_attention import fused_swin_block

    ws, n, c, heads = 6, 36, 96, 6
    nh, nw = 2, 4
    hidden = 2 * c
    base = np.random.default_rng(3).normal(0, 1.0, (nh * nw, n, c))

    def run(scale, variant):
        x = jnp.asarray(base * scale, jnp.float32)
        mk = lambda *s: jnp.asarray(  # noqa: E731
            np.random.default_rng(0).normal(0, 0.05, s), jnp.float32)
        args = (x, mk(c, 3 * c), mk(3 * c), mk(c, c), mk(c),
                mk(c, hidden), mk(hidden), mk(hidden, c), mk(c),
                mk(heads, n, n))
        return np.asarray(fused_swin_block(
            *args, num_heads=heads, window=ws, shift=3, n_wh=nh, n_ww=nw,
            attn_variant=variant, block_windows=8, interpret=True))

    # scale 5 puts the logit tail around |logits| ~ 30-40 — ~10x a trained
    # net's activations, just inside the |logits| <= ~41 guarantee.  Output
    # magnitude is ~25; 0.05 abs = ~2e-3 relative, the measured fp32 gap
    # between the clamp softmax and the row-max softmax at these magnitudes
    a = run(5.0, "wpack2")
    b = run(5.0, "perhead")
    np.testing.assert_allclose(a, b, atol=0.05)

    # far beyond the bound the packed kernel may saturate probabilities,
    # but it must never NaN/inf (the clamp guarantees finite denominators)
    extreme = run(300.0, "wpack2")
    assert np.isfinite(extreme).all()
