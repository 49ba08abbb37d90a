"""DepthPro: tile split/merge numerics, net shapes, wrapper semantics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nunif_tpu.iw3.depth.depth_pro import (
    DepthPro, DepthProModel, _tile_positions, _split_tiles, _merge_tiles,
)

pytestmark = pytest.mark.slow


def test_tile_positions():
    assert _tile_positions(1536, 384, 288) == [0, 288, 576, 864, 1152]
    assert _tile_positions(768, 384, 288) == [0, 192, 384]
    assert _tile_positions(384, 384, 288) == [0]


def test_split_merge_roundtrip():
    # constant-per-tile features merge back exactly (average of equals)
    # tile origins must be token-aligned (multiples of 16), as in the real
    # configs (384/288, 256/192)
    B, S, tile = 2, 256, 64
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, S, S, 4)),
                    jnp.float32)
    tiles, pos = _split_tiles(x, tile, int(tile * 0.75))
    assert all(p % 16 == 0 for p in pos)
    # "token grid" = pixels here (grid == tile, 16px/token scaled away):
    # emulate by downsampling factor 16 -> use tile//16 grid of means
    g = tile // 16
    tok = tiles.reshape(-1, g, 16, g, 16, 4).mean(axis=(2, 4))
    merged = _merge_tiles(tok, pos, B, g, S // 16)
    ref = x.reshape(B, S // 16, 16, S // 16, 16, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_depth_pro_net_shapes():
    net = DepthPro(encoder="vits", tile_size=64)
    x = jnp.zeros((1, 256, 256, 3))
    params = net.init_params(jax.random.PRNGKey(0), (1, 256, 256, 3))
    cid, fov = net.apply_fn(params, x)
    assert cid.shape == (1, 256, 256, 1)
    assert fov.shape == (1,)
    assert bool(jnp.all(cid >= 0))  # softplus inverse depth


def test_depth_pro_wrapper():
    m = DepthProModel("DepthPro_S")
    m.encoder = "vits"
    m.tile_size = 64
    m.img_size = 256
    m.model, m.params = m.load_model("DepthPro_S")
    assert m.is_metric() is False  # force_disparity
    assert m.is_video_supported() is False
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (180, 320, 3)),
                    jnp.float32)
    d = m.infer(x)
    assert d.shape == (180, 320, 1)
    assert bool(jnp.all(jnp.isfinite(d)))
    assert bool(jnp.all(d > 0))  # disparity, no inversion
    d2 = m.infer(x[None], tta=True)
    assert d2.shape == (1, 180, 320, 1)


def test_depth_pro_factory():
    from nunif_tpu.iw3.depth import create_depth_model, DEPTH_MODEL_TYPES
    assert "DepthPro" in DEPTH_MODEL_TYPES and "DepthPro_S" in DEPTH_MODEL_TYPES
    m = create_depth_model("DepthPro")
    assert m.get_name() == "DepthPro"
