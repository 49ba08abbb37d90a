"""Tiled-render numerics tests (reference math: nunif/utils/seam_blending.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunif_tpu.core.dtypes import FP32_POLICY
from nunif_tpu.models import create_model
from nunif_tpu.utils.tiling import (
    make_tile_config, make_blend_filter, TiledRenderer, simple_render,
)
import nunif_tpu.waifu2x  # noqa: F401


def test_tile_config_matches_reference_math():
    # mirror reference create_config for scale=2 offset=14 tile=64 blend=0
    cfg = make_tile_config(100, 130, scale=2, offset=14, tile_size=64, blend_size=0)
    # input_offset = 7, step = 64 - 14 = 50
    assert cfg.input_tile_step_h == 50 and cfg.input_tile_step_w == 50
    assert cfg.output_tile_step_h == 100 and cfg.output_tile_step_w == 100
    # h: need input_h >= 100 + 14 -> blocks*50+64: h=1:114 ok -> h_blocks=... loop
    # emulate reference loop
    def blocks(x, off, step, tile):
        b = n = 0
        while n < x + off * 2:
            n = b * step + tile
            b += 1
        return b, n
    hb, ih = blocks(100, 7, 50, 64)
    wb, iw = blocks(130, 7, 50, 64)
    assert cfg.h_blocks == hb and cfg.w_blocks == wb
    assert cfg.pad == (7, iw - 137, 7, ih - 107)
    assert cfg.y_h == 200 and cfg.y_w == 260


def test_blend_filter_matches_reference():
    # reference: inner ones, then pad rings with value 1 - (i+1)/(blend+1)
    scale, offset, tile, blend = 2, 16, 64, 8
    w = make_blend_filter(scale, offset, tile, blend)
    out = tile * scale - offset * 2
    assert w.shape == (out, out)
    # torch-equivalent construction
    import torch
    import torch.nn.functional as F
    inner = out - blend * 2
    x = torch.ones((1, inner, inner))
    for i in range(blend):
        value = 1 - (1 / (blend + 1)) * (i + 1)
        x = F.pad(x, (1, 1, 1, 1), mode="constant", value=value)
    np.testing.assert_allclose(w, x[0].numpy(), rtol=0, atol=0)


def test_tiled_render_matches_simple_render():
    """Tiling a flat-color / smooth image must equal whole-image render in the
    interior (valid-conv models are shift invariant)."""
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.default_rng(0)
    x = rng.uniform(0.2, 0.8, (70, 90, 3)).astype(np.float32)
    renderer = TiledRenderer(model, params, policy=FP32_POLICY)
    y_tiled = np.asarray(renderer.render(x, tile_size=64, batch_size=2))
    y_simple = np.asarray(jnp.clip(simple_render(x, model, params, policy=FP32_POLICY), 0, 1))
    assert y_tiled.shape == y_simple.shape == (70, 90, 3)
    # interior pixels (away from the replicate-padding border) must agree
    np.testing.assert_allclose(
        y_tiled[10:-10, 10:-10], y_simple[10:-10, 10:-10], atol=2e-5)


def test_tiled_render_upscale_matches_simple_render():
    model = create_model("waifu2x.upconv_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.default_rng(1)
    x = rng.uniform(0.2, 0.8, (50, 61, 3)).astype(np.float32)
    renderer = TiledRenderer(model, params, policy=FP32_POLICY)
    y = np.asarray(renderer.render(x, tile_size=64, batch_size=3))
    assert y.shape == (100, 122, 3)
    y_simple = np.asarray(
        jnp.clip(simple_render(x, model, params, policy=FP32_POLICY), 0, 1))
    assert y_simple.shape == (100, 122, 3)
    # interior pixels (away from replicate-padding border effects) must agree:
    # tile origins land on even input coords so the stride-2 transposed-conv
    # phase is identical between the tiled and whole-image paths
    np.testing.assert_allclose(
        y[20:-20, 20:-20], y_simple[20:-20, 20:-20], atol=3e-5)


def test_rectangular_tiles_match_square():
    """Full-width rectangular tiles give identical output to square tiles."""
    import jax
    from nunif_tpu.models import create_model
    from nunif_tpu.utils import TiledRenderer
    import nunif_tpu.waifu2x  # noqa: F401

    model = create_model("waifu2x.upconv_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params)
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(70, 150, 3)).astype(np.float32)
    y_sq = np.asarray(renderer.render(x, tile_size=64, batch_size=2))
    y_rect = np.asarray(renderer.render(x, tile_size=(64, 128), batch_size=2))
    assert y_rect.shape == y_sq.shape == (140, 300, 3)
    # both blend the same model outputs; interior must agree to bf16 tolerance
    np.testing.assert_allclose(y_rect, y_sq, atol=2e-2)


def test_rect_blend_filter_matches_square_rings():
    from nunif_tpu.utils.tiling import make_blend_filter
    sq = make_blend_filter(2, 14, 64, 4)
    assert sq.shape == (100, 100)
    # ring structure: outermost border lowest weight, interior 1.0
    assert sq[0, 50] < sq[1, 50] < sq[2, 50] < sq[3, 50] < 1.0
    assert sq[50, 50] == 1.0
    rect = make_blend_filter(2, 14, (64, 128), 4)
    assert rect.shape == (100, 228)
    np.testing.assert_allclose(rect[:, :50], sq[:, :50])


def test_single_tile_fast_path_matches_general_and_simple():
    """n_tiles == 1 skips the blend canvas (fast path); its output must equal
    both the forced multi-tile general path and the clipped whole-image
    render (ADVICE r2: the fast path previously had no coverage)."""
    model = create_model("waifu2x.upconv_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params, policy=FP32_POLICY)
    rng = np.random.default_rng(5)
    x = rng.uniform(0.1, 0.9, (50, 50, 3)).astype(np.float32)

    y_single = np.asarray(renderer.render(x, tile_size=64, batch_size=1))
    y_multi = np.asarray(renderer.render(x, tile_size=40, batch_size=2))
    y_simple = np.asarray(
        jnp.clip(simple_render(x, model, params, policy=FP32_POLICY), 0, 1))
    assert y_single.shape == y_multi.shape == y_simple.shape == (100, 100, 3)
    np.testing.assert_allclose(
        y_single[16:-16, 16:-16], y_simple[16:-16, 16:-16], atol=3e-5)
    np.testing.assert_allclose(
        y_single[16:-16, 16:-16], y_multi[16:-16, 16:-16], atol=3e-5)
