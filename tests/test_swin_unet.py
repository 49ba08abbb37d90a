"""swin_unet family shape/contract tests
(reference behavior: waifu2x/models/swin_unet.py _test at :397-415)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunif_tpu.models import create_model
import nunif_tpu.waifu2x  # noqa: F401

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name,scale,offset,out_hw", [
    ("waifu2x.swin_unet_1x", 1, 8, 48),
    ("waifu2x.swin_unet_2x", 2, 16, 96),
    ("waifu2x.swin_unet_4x", 4, 32, 192),
])
def test_swin_unet_shapes(name, scale, offset, out_hw):
    model = create_model(name)
    assert model.i2i_scale == scale and model.i2i_offset == offset
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    y = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, out_hw, out_hw, 3)
    assert y.shape[1] == 64 * scale - 2 * offset


def test_swin_unet_downscaled_2x_shares_trunk_with_4x():
    m4 = create_model("waifu2x.swin_unet_4x")
    p4 = m4.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    m2 = create_model("waifu2x.swin_unet_downscaled", downscale_factor=2)
    assert m2.i2i_scale == 2 and m2.i2i_offset == 16
    # params of the 4x trunk drop straight into the downscaled model (to_2x)
    y = m2.apply({"params": p4}, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, 96, 96, 3)


def test_swin_tile_constraints():
    model = create_model("waifu2x.swin_unet_2x")
    assert model.find_valid_tile_size(64) == 64
    assert model.find_valid_tile_size(100) == 112
    assert model.find_valid_tile_size(256) == 256
    assert not model.is_valid_tile_size(60)


def test_shifted_window_mask_structure():
    from nunif_tpu.modules.attention import shifted_window_mask
    m = shifted_window_mask(12, 12, 6, 3)
    assert m.shape == (4, 36, 36)
    # first window (no wrap) fully visible
    assert np.all(m[0] == 0)
    # last window (wraps both axes) has masked pairs
    assert np.any(m[-1] == -100.0)


def test_window_attention_shift_equivariance():
    """Non-shifted window attention must be invariant to window-aligned rolls."""
    from nunif_tpu.modules.attention import ShiftedWindowAttention
    attn = ShiftedWindowAttention(dim=32, num_heads=2, window_size=6, shift_size=0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 12, 12, 32))
    params = attn.init(jax.random.PRNGKey(2), x)["params"]
    y1 = attn.apply({"params": params}, x)
    y2 = attn.apply({"params": params}, jnp.roll(x, 6, axis=1))
    np.testing.assert_allclose(np.asarray(jnp.roll(y1, 6, axis=1)),
                               np.asarray(y2), atol=1e-5)
