"""DepthPro: tile split/merge numerics, net shapes, wrapper semantics,
and full torch->flax numeric parity at a tiny config."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nunif_tpu.iw3.depth.depth_pro import (
    DepthPro, DepthProModel, _split_tiles, _merge_tiles,
)

pytestmark = pytest.mark.slow


def test_split_tile_grid():
    x = jnp.zeros((2, 1536, 1536, 3))
    tiles, steps = _split_tiles(x, 384, 288)
    assert steps == 5 and tiles.shape == (2 * 25, 384, 384, 3)
    tiles, steps = _split_tiles(jnp.zeros((2, 768, 768, 3)), 384, 192)
    assert steps == 3 and tiles.shape == (2 * 9, 384, 384, 3)
    tiles, steps = _split_tiles(jnp.zeros((2, 384, 384, 3)), 384, 288)
    assert steps == 1


def test_merge_crop_semantics():
    """apple merge: interior tile edges lose `padding` tokens; result grid
    for 5x5 tiles of 24 tokens with padding 3 is 96."""
    B, g, pad, steps = 2, 24, 3, 5
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B * steps * steps, g, g, 4)),
                        jnp.float32)
    merged = _merge_tiles(feats, B, steps, pad)
    assert merged.shape == (B, 96, 96, 4)
    # corner tile contributes its uncropped top-left corner verbatim
    np.testing.assert_array_equal(np.asarray(merged[:, :4, :4]),
                                  np.asarray(feats[:B, :4, :4]))
    # second tile in the row starts at column 21 (24-3), cropped 3 left
    np.testing.assert_array_equal(np.asarray(merged[:, 0, 21]),
                                  np.asarray(feats[B:2 * B, 0, pad]))


def test_depth_pro_net_shapes():
    net = DepthPro(encoder="vitt", tile_size=128, pos_embed_size=8)
    x = jnp.zeros((1, 512, 512, 3))
    params = net.init_params(jax.random.PRNGKey(0), (1, 512, 512, 3))
    cid, fov = net.apply_fn(params, x)
    assert cid.shape == (1, 512, 512, 1)
    assert fov.shape == (1,)
    assert bool(jnp.all(cid >= 0))  # relu inverse depth


def test_depth_pro_wrapper():
    m = DepthProModel("DepthPro_S")
    m.encoder = "vitt"
    m.tile_size = 128
    m.img_size = 512
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


def test_depth_pro_numeric_parity():
    """Full net (3 ViTs + encoder upsamples + decoder + head + fov) vs the
    hand-built apple-layout torch module, converted weights, fp32."""
    torch = pytest.importorskip("torch")
    from torchref.depth_pro import DepthProTorch
    from nunif_tpu.models import torch_convert as tc

    torch.manual_seed(50)
    tm = DepthProTorch(embed_dim=64, depth=2, num_heads=2, tile=128).eval()
    # the depth head's final conv bias is zero-filled in apple's init;
    # randomize so the conversion is actually exercised
    with torch.no_grad():
        tm.head[4].bias.normal_(std=0.1)
    params = tc.convert_depth_pro(tm.state_dict(), "vitt")

    net = DepthPro(encoder="vitt", tile_size=128, pos_embed_size=8)
    ref = net.init_params(jax.random.PRNGKey(0), (1, 512, 512, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    rng = np.random.default_rng(50)
    x = rng.normal(0, 1, size=(1, 3, 512, 512)).astype(np.float32)
    with torch.no_grad():
        want_cid, want_fov = tm(torch.from_numpy(x))
    got_cid, got_fov = net.apply_fn(params,
                                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_fov), want_fov.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_cid)[..., 0],
                               want_cid.numpy()[:, 0], atol=5e-4, rtol=1e-3)
