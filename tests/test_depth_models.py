"""Depth subsystem: torch->flax conversion parity at the layer level,
DepthAnything structure, preprocessing grid math, base model EMA + PNG IO."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from nunif_tpu.models import torch_convert as tc  # noqa: E402

pytestmark = pytest.mark.slow


def _t2j(x):
    return jnp.asarray(x.detach().numpy())


class TestTorchConvertPrimitives:
    def test_conv2d_same(self):
        m = tnn.Conv2d(3, 8, 3, padding=1)
        x = torch.randn(2, 3, 10, 12)
        want = m(x).detach().numpy().transpose(0, 2, 3, 1)
        params = tc.conv2d(m.state_dict(), "")
        params = {"kernel": params["kernel"], "bias": params["bias"]}
        flax_conv = nn.Conv(8, (3, 3), padding="SAME")
        got = flax_conv.apply({"params": params}, _t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_conv2d_stride2(self):
        m = tnn.Conv2d(4, 6, 3, stride=2, padding=1)
        x = torch.randn(1, 4, 14, 14)
        want = m(x).detach().numpy().transpose(0, 2, 3, 1)
        params = tc.conv2d(m.state_dict(), "")
        got = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))).apply(
            {"params": params}, _t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    @pytest.mark.parametrize("k", [2, 4])
    def test_conv_transpose(self, k):
        m = tnn.ConvTranspose2d(5, 7, k, stride=k)
        x = torch.randn(1, 5, 6, 6)
        want = m(x).detach().numpy().transpose(0, 2, 3, 1)
        params = tc.conv_transpose2d(m.state_dict(), "")
        got = nn.ConvTranspose(7, (k, k), strides=(k, k), padding="VALID",
                               transpose_kernel=True).apply(
            {"params": params}, _t2j(x.permute(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_linear_and_layernorm(self):
        lin = tnn.Linear(12, 20)
        ln = tnn.LayerNorm(12, eps=1e-6)
        x = torch.randn(3, 12)
        want = lin(ln(x)).detach().numpy()
        p_ln = tc.layer_norm(ln.state_dict(), "")
        p_lin = tc.linear(lin.state_dict(), "")
        h = nn.LayerNorm(epsilon=1e-6).apply({"params": p_ln}, _t2j(x))
        got = nn.Dense(20).apply({"params": p_lin}, h)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_dinov2_block_parity(self):
        """torch DINOv2-style block vs flax Block after conversion."""
        from nunif_tpu.iw3.depth.dinov2 import Block

        dim, heads, N = 32, 4, 11

        class TorchBlock(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
                self.attn_qkv = tnn.Linear(dim, dim * 3)
                self.attn_proj = tnn.Linear(dim, dim)
                self.ls1 = tnn.Parameter(torch.randn(dim) * 0.1)
                self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
                self.fc1 = tnn.Linear(dim, dim * 4)
                self.fc2 = tnn.Linear(dim * 4, dim)
                self.ls2 = tnn.Parameter(torch.randn(dim) * 0.1)

            def forward(self, x):
                B = x.shape[0]
                h = self.norm1(x)
                qkv = self.attn_qkv(h).reshape(B, N, 3, heads, dim // heads)
                q, k, v = qkv.unbind(2)
                q, k, v = (t.transpose(1, 2) for t in (q, k, v))
                a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
                a = a.transpose(1, 2).reshape(B, N, dim)
                x = x + self.attn_proj(a) * self.ls1
                h = self.norm2(x)
                h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
                return x + h * self.ls2

        tm = TorchBlock().eval()
        sd = {f"b.{k}": v for k, v in tm.state_dict().items()}
        params = {
            "norm1": tc.layer_norm(sd, "b.norm1"),
            "attn": {"qkv": tc.linear(sd, "b.attn_qkv"),
                     "proj": tc.linear(sd, "b.attn_proj")},
            "ls1": {"gamma": tc.raw(sd, "b.ls1")},
            "norm2": tc.layer_norm(sd, "b.norm2"),
            "mlp_fc1": tc.linear(sd, "b.fc1"),
            "mlp_fc2": tc.linear(sd, "b.fc2"),
            "ls2": {"gamma": tc.raw(sd, "b.ls2")},
        }
        x = torch.randn(2, N, dim)
        want = tm(x).detach().numpy()
        got = Block(dim, heads).apply({"params": params}, _t2j(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestDepthAnything:
    def test_tiny_forward_shapes(self):
        from nunif_tpu.iw3.depth.dinov2 import DinoVisionTransformer
        from nunif_tpu.iw3.depth.dpt import DPTHead
        enc = DinoVisionTransformer(embed_dim=32, depth=2, num_heads=4,
                                    pos_embed_size=4)
        x = jnp.zeros((1, 56, 70, 3))  # 4x5 patches
        variables = enc.init(jax.random.PRNGKey(0), x, out_indices=[0, 1])
        feats, (ph, pw) = enc.apply(variables, x, out_indices=[0, 1])
        assert (ph, pw) == (4, 5)
        assert feats[0].shape == (1, 20, 32)

        head = DPTHead(features=16, out_channels=(8, 16, 24, 32))
        hv = head.init(jax.random.PRNGKey(1), [feats[0]] * 4, (ph, pw))
        out = head.apply(hv, [feats[0]] * 4, (ph, pw))
        assert out.shape == (1, 56, 70, 1)
        assert float(jnp.min(out)) >= 0  # relu head

    def test_metric_head_range(self):
        from nunif_tpu.iw3.depth.dpt import DPTHead
        head = DPTHead(features=16, out_channels=(8, 16, 24, 32), max_depth=20.0)
        f = jnp.zeros((1, 20, 16))
        hv = head.init(jax.random.PRNGKey(2), [f] * 4, (4, 5))
        out = head.apply(hv, [f] * 4, (4, 5))
        assert float(jnp.max(out)) <= 20.0 and float(jnp.min(out)) >= 0.0

    def test_preprocess_size(self):
        from nunif_tpu.iw3.depth.depth_anything import compute_preprocess_size
        h, w = compute_preprocess_size(1080, 1920, 392)
        assert h % 14 == 0 and w % 14 == 0
        assert min(h, w) >= 392
        # aspect cap
        h2, w2 = compute_preprocess_size(100, 1000, 392)
        assert w2 <= 4 * h2 + 14

    def test_null_depth_and_factory(self):
        from nunif_tpu.iw3.depth import create_depth_model
        m = create_depth_model("NULL").load(resolution=98)
        x = jnp.ones((1, 64, 64, 3)) * 0.5
        d = m.infer(x)
        assert d.shape == (1, 98, 98, 1)
        zoe = create_depth_model("ZoeD_N")
        assert type(zoe).__name__ == "ZoeDepthModel"
        with pytest.raises(ValueError):
            create_depth_model("bogus")

    def test_convert_depth_anything_structure(self):
        """Synthetic vits state dict converts into the exact flax tree."""
        from nunif_tpu.iw3.depth.depth_anything import DepthAnything
        from nunif_tpu.models.torch_convert import convert_depth_anything

        model = DepthAnything(encoder="vits")
        ref_params = model.init_params(jax.random.PRNGKey(0), (1, 56, 56, 3))

        sd = {}
        sd["pretrained.cls_token"] = np.zeros((1, 1, 384), np.float32)
        sd["pretrained.pos_embed"] = np.zeros((1, 1 + 37 * 37, 384), np.float32)
        sd["pretrained.patch_embed.proj.weight"] = np.zeros((384, 3, 14, 14), np.float32)
        sd["pretrained.patch_embed.proj.bias"] = np.zeros((384,), np.float32)
        sd["pretrained.norm.weight"] = np.ones((384,), np.float32)
        sd["pretrained.norm.bias"] = np.zeros((384,), np.float32)
        for i in range(12):
            b = f"pretrained.blocks.{i}"
            sd[b + ".norm1.weight"] = np.ones((384,), np.float32)
            sd[b + ".norm1.bias"] = np.zeros((384,), np.float32)
            sd[b + ".attn.qkv.weight"] = np.zeros((1152, 384), np.float32)
            sd[b + ".attn.qkv.bias"] = np.zeros((1152,), np.float32)
            sd[b + ".attn.proj.weight"] = np.zeros((384, 384), np.float32)
            sd[b + ".attn.proj.bias"] = np.zeros((384,), np.float32)
            sd[b + ".ls1.gamma"] = np.full((384,), 1e-5, np.float32)
            sd[b + ".norm2.weight"] = np.ones((384,), np.float32)
            sd[b + ".norm2.bias"] = np.zeros((384,), np.float32)
            sd[b + ".mlp.fc1.weight"] = np.zeros((1536, 384), np.float32)
            sd[b + ".mlp.fc1.bias"] = np.zeros((1536,), np.float32)
            sd[b + ".mlp.fc2.weight"] = np.zeros((384, 1536), np.float32)
            sd[b + ".mlp.fc2.bias"] = np.zeros((384,), np.float32)
            sd[b + ".ls2.gamma"] = np.full((384,), 1e-5, np.float32)
        oc = [48, 96, 192, 384]
        for i, o in enumerate(oc):
            sd[f"depth_head.projects.{i}.weight"] = np.zeros((o, 384, 1, 1), np.float32)
            sd[f"depth_head.projects.{i}.bias"] = np.zeros((o,), np.float32)
        sd["depth_head.resize_layers.0.weight"] = np.zeros((48, 48, 4, 4), np.float32)
        sd["depth_head.resize_layers.0.bias"] = np.zeros((48,), np.float32)
        sd["depth_head.resize_layers.1.weight"] = np.zeros((96, 96, 2, 2), np.float32)
        sd["depth_head.resize_layers.1.bias"] = np.zeros((96,), np.float32)
        sd["depth_head.resize_layers.3.weight"] = np.zeros((384, 384, 3, 3), np.float32)
        sd["depth_head.resize_layers.3.bias"] = np.zeros((384,), np.float32)
        for i, o in enumerate(oc, start=1):
            sd[f"depth_head.scratch.layer{i}_rn.weight"] = np.zeros((64, o, 3, 3), np.float32)
            rf = f"depth_head.scratch.refinenet{i}"
            for u in ("resConfUnit1", "resConfUnit2"):
                for cv in ("conv1", "conv2"):
                    sd[f"{rf}.{u}.{cv}.weight"] = np.zeros((64, 64, 3, 3), np.float32)
                    sd[f"{rf}.{u}.{cv}.bias"] = np.zeros((64,), np.float32)
            sd[f"{rf}.out_conv.weight"] = np.zeros((64, 64, 1, 1), np.float32)
            sd[f"{rf}.out_conv.bias"] = np.zeros((64,), np.float32)
        sd["depth_head.scratch.output_conv1.weight"] = np.zeros((32, 64, 3, 3), np.float32)
        sd["depth_head.scratch.output_conv1.bias"] = np.zeros((32,), np.float32)
        sd["depth_head.scratch.output_conv2.0.weight"] = np.zeros((32, 32, 3, 3), np.float32)
        sd["depth_head.scratch.output_conv2.0.bias"] = np.zeros((32,), np.float32)
        sd["depth_head.scratch.output_conv2.2.weight"] = np.zeros((1, 32, 1, 1), np.float32)
        sd["depth_head.scratch.output_conv2.2.bias"] = np.zeros((1,), np.float32)

        converted = convert_depth_anything(sd, "vits")

        ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
        conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
        ref_map = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
        conv_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in conv_flat}
        assert ref_map == conv_map


class TestBaseDepthModel:
    def test_depth_png_roundtrip(self, tmp_path):
        from nunif_tpu.iw3.depth.base import BaseDepthModel
        d = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8, 1))
        p = str(tmp_path / "d.png")
        BaseDepthModel.save_normalized_depth(d, p, min_depth_value=0.25,
                                             max_depth_value=0.75)
        loaded, meta = BaseDepthModel.load_depth(p)
        assert loaded.shape == (8, 8, 1)
        # scaled back into [0.25, 0.75]
        want = np.asarray(d) * 0.5 + 0.25
        np.testing.assert_allclose(np.asarray(loaded), want, atol=1e-3)

    def test_minmax_normalize_with_reset(self):
        from nunif_tpu.iw3.depth.null_model import NullDepthModel
        m = NullDepthModel().load()
        m.enable_ema(decay=0.9, buffer_size=2)
        d = jnp.asarray(np.random.default_rng(0).uniform(
            size=(4, 8, 8, 1)).astype(np.float32))
        out = m.minmax_normalize(d, reset_ema=[False, False, False, True])
        assert len(out) == 4
