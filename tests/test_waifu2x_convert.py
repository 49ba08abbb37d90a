"""torch->flax conversion of waifu2x checkpoints: NUMERIC parity for
every family here (upconv_7/vgg_7/cunet/swin_unet/v2/winc/wgmlp)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from nunif_tpu.models import create_model  # noqa: E402
from nunif_tpu.models import torch_convert as tc  # noqa: E402
import nunif_tpu.waifu2x  # noqa: F401,E402

pytestmark = pytest.mark.slow


def _torch_upconv7(in_channels=3, out_channels=3):
    return tnn.Sequential(
        tnn.Conv2d(in_channels, 16, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(16, 32, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(32, 64, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(64, 128, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(128, 128, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(128, 256, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.ConvTranspose2d(256, out_channels, 4, 2, 3),
    )


def test_upconv7_numeric_parity():
    tm = _torch_upconv7().eval()
    sd = {f"net.{k}": v for k, v in tm.state_dict().items()}
    params = tc.convert_upconv7(sd)

    model = create_model("waifu2x.upconv_7")
    ref = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch.clamp(tm(torch.from_numpy(x)), 0, 1).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def test_vgg7_numeric_parity():
    tm = tnn.Sequential(
        tnn.Conv2d(3, 32, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(32, 32, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(32, 64, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(64, 64, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(64, 128, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(128, 128, 3, 1, 0), tnn.LeakyReLU(0.1),
        tnn.Conv2d(128, 3, 3, 1, 0),
    ).eval()
    sd = {f"net.{k}": v for k, v in tm.state_dict().items()}
    params = tc.convert_vgg7(sd)
    model = create_model("waifu2x.vgg_7")
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        want = torch.clamp(tm(torch.from_numpy(x)), 0, 1).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def _swin_parity(scale_factor, model_name, size=64, atol=3e-5):
    from torchref.swin_unet import SwinUNet as TorchSwinUNet
    torch.manual_seed(scale_factor)
    tm = TorchSwinUNet(base_dim=96, base_layers=2,
                       scale_factor=scale_factor).eval()
    sd = tm.state_dict()
    params = tc.convert_swin_unet(sd, base_dim=96, base_layers=2,
                                  scale_factor=scale_factor)
    model = create_model(model_name)
    ref = model.init_params(jax.random.PRNGKey(0), (1, size, size, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    rng = np.random.default_rng(scale_factor)
    x = rng.uniform(size=(1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=atol)


def test_swin_unet_2x_numeric_parity():
    """Full-depth numeric parity incl. shifted-window masks and the
    relative-position-bias table layout (reference swin_unet.py:119-199 +
    torchvision SwinTransformerBlock V1)."""
    _swin_parity(2, "waifu2x.swin_unet_2x")


def test_swin_unet_1x_numeric_parity():
    _swin_parity(1, "waifu2x.swin_unet_1x")


def test_swin_unet_4x_numeric_parity():
    _swin_parity(4, "waifu2x.swin_unet_4x")


def _winc_parity(model_name, torch_kwargs, size=64, atol=3e-5):
    from torchref.winc import SwinUNetV2 as TorchSwinUNetV2
    torch.manual_seed(7)
    tm = TorchSwinUNetV2(**torch_kwargs).eval()
    params = tc.convert_swin_unet_v2(tm.state_dict())
    model = create_model(model_name)
    ref = model.init_params(jax.random.PRNGKey(0), (1, size, size, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    rng = np.random.default_rng(9)
    x = rng.uniform(size=(1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=atol)


def test_swin_unet_v2_2x_numeric_parity():
    """winc_unet 2x conversion: WACBlocks + score-bias MLP + residual
    down/up + SourceResidual (reference swin_unet_v2.py:266-354)."""
    _winc_parity("waifu2x.swin_unet_v2_2x",
                 dict(base_dim=96, lv2_mlp_ratio=2, lv2_ratio=2,
                      scale_factor=2))


def test_swin_unet_v2_1x_numeric_parity():
    _winc_parity("waifu2x.swin_unet_v2_1x",
                 dict(base_dim=64, lv2_mlp_ratio=2, lv2_ratio=2,
                      scale_factor=1))


def test_swin_unet_v2_4x_numeric_parity():
    _winc_parity("waifu2x.swin_unet_v2_4x",
                 dict(base_dim=128, lv2_mlp_ratio=2, lv2_ratio=2,
                      scale_factor=4))


@pytest.mark.parametrize("scale,name", [(1, "waifu2x.cunet"),
                                        (2, "waifu2x.upcunet")])
def test_cunet_numeric_parity(scale, name):
    """Cascaded U-Net conversion incl. SEBlocks and transpose convs
    (reference waifu2x/models/cunet.py:31-121)."""
    from torchref.cunet import CUNet as TorchCUNet
    torch.manual_seed(scale)
    tm = TorchCUNet(scale=scale).eval()
    params = tc.convert_cunet(tm.state_dict(), scale=scale)
    model = create_model(name)
    ref = model.init_params(jax.random.PRNGKey(0), (1, 76, 76, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    rng = np.random.default_rng(scale)
    x = rng.uniform(size=(1, 3, 76, 76)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=3e-5)


def test_wgmlp_numeric_parity():
    """wgmlp_4x conversion: windowed gMLP token mixers, dilated Overscan
    stem, residual down/up (reference waifu2x/models/wgmlp.py:298-354)."""
    from torchref.wgmlp import WGMLP4x as TorchWGMLP4x
    torch.manual_seed(4)
    tm = TorchWGMLP4x(base_dim=128).eval()
    params = tc.convert_wgmlp(tm.state_dict())
    model = create_model("waifu2x.wgmlp_4x")
    ref = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    rng = np.random.default_rng(4)
    x = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=3e-5)


def test_swin_unet_convert_structure():
    """Synthetic torch-shaped state dict converts into the exact flax tree."""
    C, L, heads = 96, 2, 6
    n_bias = (2 * 6 - 1) ** 2

    def blocks(prefix, n, dim):
        sd = {}
        for i in range(n):
            b = f"{prefix}.block.{i}"
            sd[b + ".attn.qkv.weight"] = np.zeros((dim * 3, dim), np.float32)
            sd[b + ".attn.qkv.bias"] = np.zeros((dim * 3,), np.float32)
            sd[b + ".attn.proj.weight"] = np.zeros((dim, dim), np.float32)
            sd[b + ".attn.proj.bias"] = np.zeros((dim,), np.float32)
            sd[b + ".attn.relative_position_bias_table"] = np.zeros(
                (n_bias, heads), np.float32)
            sd[b + ".mlp.0.weight"] = np.zeros((dim * 2, dim), np.float32)
            sd[b + ".mlp.0.bias"] = np.zeros((dim * 2,), np.float32)
            sd[b + ".mlp.3.weight"] = np.zeros((dim, dim * 2), np.float32)
            sd[b + ".mlp.3.bias"] = np.zeros((dim,), np.float32)
        return sd

    sd = {}
    sd["unet.patch.0.weight"] = np.zeros((C // 2, 3, 3, 3), np.float32)
    sd["unet.patch.0.bias"] = np.zeros((C // 2,), np.float32)
    sd["unet.patch.2.weight"] = np.zeros((C, C // 2, 3, 3), np.float32)
    sd["unet.patch.2.bias"] = np.zeros((C,), np.float32)
    sd.update(blocks("unet.swin1", L, C))
    sd["unet.down1.conv.weight"] = np.zeros((C * 2, C, 2, 2), np.float32)
    sd["unet.down1.conv.bias"] = np.zeros((C * 2,), np.float32)
    sd.update(blocks("unet.swin2", L, C * 2))
    sd["unet.down2.conv.weight"] = np.zeros((C * 2, C * 2, 2, 2), np.float32)
    sd["unet.down2.conv.bias"] = np.zeros((C * 2,), np.float32)
    sd.update(blocks("unet.swin3", L * 3, C * 2))
    sd["unet.up2.proj.weight"] = np.zeros((C * 2 * 4, C * 2), np.float32)
    sd["unet.up2.proj.bias"] = np.zeros((C * 2 * 4,), np.float32)
    sd.update(blocks("unet.swin4", L, C * 2))
    sd["unet.up1.proj.weight"] = np.zeros((C * 4, C * 2), np.float32)
    sd["unet.up1.proj.bias"] = np.zeros((C * 4,), np.float32)
    sd.update(blocks("unet.swin5", L, C))
    sd["unet.to_image.proj.weight"] = np.zeros((3 * 4, C), np.float32)
    sd["unet.to_image.proj.bias"] = np.zeros((3 * 4,), np.float32)

    converted = tc.convert_swin_unet(sd, base_dim=C, base_layers=L,
                                     scale_factor=2)
    model = create_model("waifu2x.swin_unet_2x")
    ref = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert ref_map == got_map
