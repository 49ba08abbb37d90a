"""torch->flax conversion of depth backbones: FULL-TREE numeric parity for
Depth-Anything v2, ZoeDepth, Video-Depth-Anything and DA3-mono (each vs a
hand-built torch oracle of the published architecture, DepthPro-bar), plus
piecewise module parity and raw-checkpoint load paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nunif_tpu.models import torch_convert as tc  # noqa: E402

pytestmark = pytest.mark.slow


def test_depth_anything_v2_numeric_parity():
    """Full DINOv2-S + DPT head forward at the native 37x37 pos-embed grid
    (reference consumes this arch via torch.hub, iw3/depth_anything_model
    .py:196-226)."""
    from torchref.dinovit import DepthAnythingV2 as TorchDA
    from nunif_tpu.models import create_model
    import nunif_tpu.iw3  # noqa: F401

    torch.manual_seed(20)
    tm = TorchDA().eval()
    params = tc.convert_depth_anything(tm.state_dict(), "vits")

    model = create_model("iw3.depth_anything", encoder="vits")
    ref = model.init_params(jax.random.PRNGKey(0), (1, 518, 518, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    rng = np.random.default_rng(20)
    x = rng.normal(0, 1, size=(1, 3, 518, 518)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # (1, 1, H, W)
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got[..., 0], want[:, 0], atol=5e-4,
                               rtol=1e-3)


def test_vda_temporal_module_numeric_parity():
    """AnimateDiff-style motion module: GroupNorm -> proj_in -> 2x
    (PE + temporal attention) -> GEGLU FF -> zero-init proj_out."""
    from torchref.dinovit import TemporalModule as TorchTM
    from nunif_tpu.iw3.depth.vda import TemporalModule

    torch.manual_seed(21)
    tm = TorchTM(64, num_heads=8, max_len=32).eval()
    # zero-init proj_out hides bugs; randomize
    with torch.no_grad():
        tm.temporal_transformer.proj_out.weight.normal_(std=0.05)
    params = tc._temporal_module(
        {"m." + k: v for k, v in tm.state_dict().items()}, "m")

    fm = TemporalModule(64, num_heads=8, max_len=32)
    rng = np.random.default_rng(21)
    x = rng.normal(0, 1, size=(2, 6, 64, 8, 10)).astype(np.float32)
    # torch (B, T, C, H, W) -> flax (B, T, H, W, C)
    xf = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    ref = fm.init(jax.random.PRNGKey(0), xf)["params"]
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fm.apply({"params": params}, xf))
    np.testing.assert_allclose(got.transpose(0, 1, 4, 2, 3), want,
                               atol=3e-5)


def test_da3mono_disparity_numeric_parity():
    """Quantile-feature MLP depth->disparity (reference
    iw3/models/da3mono_disparity.py:13-80)."""
    import torch.nn as tnn
    from nunif_tpu.models import create_model
    import nunif_tpu.iw3  # noqa: F401

    class TorchDA3Mono(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = tnn.Sequential(
                tnn.Linear(64, 128), tnn.SiLU(),
                tnn.Linear(128, 128), tnn.SiLU(),
                tnn.Linear(128, 2), tnn.ReLU())

        def forward(self, depth):
            B = depth.shape[0]
            flat, _ = torch.sort(depth.reshape(B, -1), dim=-1)
            n = flat.shape[-1]
            idx = torch.linspace(1, n - 2, 62).long()
            feats = torch.cat([flat[:, :1], flat[:, idx], flat[:, -1:]],
                              dim=-1)
            h = self.mlp(feats)
            shift = h[:, 0].reshape(-1, 1, 1, 1)
            sky = h[:, 1].reshape(-1, 1, 1, 1)
            mx = depth.amax(dim=(1, 2, 3), keepdim=True)
            depth = torch.where(depth == mx, depth + sky, depth)
            return 1.0 / (depth + shift)

    torch.manual_seed(23)
    tm = TorchDA3Mono().eval()
    params = tc.convert_da3mono_disparity(tm.state_dict())
    model = create_model("iw3.da3mono_disparity")

    rng = np.random.default_rng(23)
    x = (rng.uniform(0.5, 50.0, size=(2, 1, 40, 56))).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-5)


def test_midas_beit_core_numeric_parity():
    """MiDaS DPT-BEiT core (ZoeDepth's relative-depth backbone) at the
    native 24x24 grid: BEiT q/v-bias attention + per-block relative
    position bias + DPT project-readout neck (released MiDaS v3.1 key
    layout)."""
    from torchref.beit import MidasBeit
    from nunif_tpu.iw3.depth.midas import MidasCore

    torch.manual_seed(30)
    tm = MidasBeit().eval()  # beit_b_384 config
    params = tc.convert_midas_core(tm.state_dict(), "beit_b_384")

    model = MidasCore(backbone="beit_b_384")
    rng = np.random.default_rng(30)
    x = rng.normal(0, 1, size=(1, 3, 384, 384)).astype(np.float32)
    xf = jnp.asarray(x.transpose(0, 2, 3, 1))
    ref = model.init(jax.random.PRNGKey(0), xf)["params"]
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    with torch.no_grad():
        want_rel, want_feats = tm(torch.from_numpy(x))
    rel, feats = model.apply({"params": params}, xf)
    np.testing.assert_allclose(np.asarray(rel), want_rel.numpy(),
                               atol=5e-4, rtol=1e-3)
    for g, w in zip(feats, want_feats):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
            atol=5e-4, rtol=1e-3)


def test_zoedepth_bins_head_numeric_parity():
    """ZoeDepth metric-bins head: seed bins -> attractor refinement ->
    conditional log-binomial expectation (released single-domain key
    layout)."""
    from torchref.zoe_head import ZoeBinsHead
    from nunif_tpu.iw3.depth.zoedepth import MetricBinsHead

    torch.manual_seed(31)
    tm = ZoeBinsHead().eval()
    params = tc.convert_zoedepth_head(tm.state_dict())

    fm = MetricBinsHead()
    rng = np.random.default_rng(31)
    H, W = 32, 32  # rel-depth resolution; feature pyramid below
    rel = rng.uniform(0, 1, size=(1, H, W)).astype(np.float32)
    feats_t = [
        torch.from_numpy(rng.normal(0, 1, (1, 32, H, W)).astype(np.float32)),      # out32
        torch.from_numpy(rng.normal(0, 1, (1, 256, H // 16, W // 16)).astype(np.float32)),  # btlnck
        torch.from_numpy(rng.normal(0, 1, (1, 256, H // 16, W // 16)).astype(np.float32)),
        torch.from_numpy(rng.normal(0, 1, (1, 256, H // 8, W // 8)).astype(np.float32)),
        torch.from_numpy(rng.normal(0, 1, (1, 256, H // 4, W // 4)).astype(np.float32)),
        torch.from_numpy(rng.normal(0, 1, (1, 256, H // 2, W // 2)).astype(np.float32)),
    ]
    with torch.no_grad():
        want = tm(torch.from_numpy(rel), feats_t).numpy()

    feats_f = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in feats_t]
    ref = fm.init(jax.random.PRNGKey(0), jnp.asarray(rel), feats_f)["params"]
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    got = np.asarray(fm.apply({"params": params}, jnp.asarray(rel), feats_f))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=1e-4, rtol=1e-4)


def test_da3_loads_raw_safetensors(tmp_path):
    """DA3 mono load(checkpoint=<da3mono .safetensors>) converts the raw
    hub state dict (reference iw3/depth_anything_v3_model.py MODEL_FILES)."""
    from safetensors.torch import save_file
    from torchref.dinovit import DepthAnythingV2 as TorchDA
    from nunif_tpu.iw3.depth.da3 import DepthAnythingV3MonoModel

    torch.manual_seed(44)
    tm = TorchDA().eval()
    sd = dict(tm.state_dict())
    w = sd["depth_head.scratch.output_conv2.2.weight"]
    sd["depth_head.scratch.output_conv2.2.weight"] = \
        w.repeat(2, 1, 1, 1).contiguous()
    sd["depth_head.scratch.output_conv2.2.bias"] = \
        sd["depth_head.scratch.output_conv2.2.bias"].repeat(2).contiguous()
    sd = {k: v.contiguous() for k, v in sd.items()}
    path = str(tmp_path / "da3mono-large.safetensors")
    save_file(sd, path)

    dm = DepthAnythingV3MonoModel("Any_V3_Mono")
    dm.encoder = "vits"
    dm.load(checkpoint=path, limit_resolution=True)
    rng = np.random.default_rng(44)
    x = rng.uniform(size=(1, 70, 98, 3)).astype(np.float32)
    out = dm.infer(jnp.asarray(x))
    assert np.isfinite(np.asarray(out)).all()


def test_depth_anything_loads_raw_pth(tmp_path):
    """create_depth_model(...).load(checkpoint=<raw hub .pth>) converts a
    torch.hub-style state dict directly."""
    from torchref.dinovit import DepthAnythingV2 as TorchDA
    from nunif_tpu.iw3.depth import create_depth_model

    torch.manual_seed(34)
    tm = TorchDA().eval()
    path = str(tmp_path / "depth_anything_v2_vits.pth")
    torch.save(tm.state_dict(), path)

    dm = create_depth_model("Any_V2_S").load(checkpoint=path,
                                             limit_resolution=True)
    rng = np.random.default_rng(34)
    x = rng.uniform(size=(1, 70, 98, 3)).astype(np.float32)
    out = dm.infer(jnp.asarray(x))
    assert np.isfinite(np.asarray(out)).all()


def test_zoedepth_full_tree_numeric_parity():
    """FULL ZoeDepth tree (MiDaS BEiT core + metric-bins head) numeric
    parity at the DepthPro bar (reference iw3/zoedepth_model.py:249
    consumes this assembly via torch.hub): end-to-end forward on the same
    weights, not just piecewise modules — assembly (resize flags, feature
    ordering, residuals) is where silent drift hides."""
    from torchref.beit import MidasBeit
    from torchref.zoe_head import ZoeBinsHead
    from nunif_tpu.iw3.depth.zoedepth import ZoeDepthNet

    torch.manual_seed(35)

    class Core(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.core = MidasBeit()

    class TorchZoe(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.core = Core()
            head = ZoeBinsHead()
            for name, mod in head.named_children():
                setattr(self, name, mod)
            self._head = (head,)  # hidden from state_dict (tuple)

        def forward(self, x):
            rel, feats = self.core.core(x)
            return self._head[0](rel, feats)

    tm = TorchZoe().eval()
    params = tc.convert_zoedepth(tm.state_dict(), "beit_b_384")

    model = ZoeDepthNet(core="beit_b_384")
    rng = np.random.default_rng(35)
    x = rng.normal(0, 1, size=(1, 3, 384, 384)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # (1, 1, H, W)
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got[..., 0], want[:, 0], atol=5e-4,
                               rtol=1e-3)


def test_vda_full_tree_numeric_parity():
    """FULL Video-Depth-Anything tree numeric parity: DINOv2 trunk + DPT
    head + all 4 motion modules, T=2 frames end-to-end on the same
    converted weights (reference consumes the assembly via torch.hub,
    iw3/video_depth_anything_model.py:110-192)."""
    from torchref.dinovit import VideoDepthAnythingTorch
    from nunif_tpu.iw3.depth.vda import VideoDepthAnything

    torch.manual_seed(36)
    tm = VideoDepthAnythingTorch().eval()
    with torch.no_grad():  # zero-init proj_out hides motion-module bugs
        for mm in tm.head.motion_modules:
            mm.temporal_transformer.proj_out.weight.normal_(std=0.05)
            mm.temporal_transformer.proj_out.bias.normal_(std=0.05)
    params = tc.convert_vda(tm.state_dict(), "vits")

    model = VideoDepthAnything(encoder="vits", num_frames=32)
    rng = np.random.default_rng(36)
    x = rng.normal(0, 1, size=(1, 2, 3, 518, 518)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # (B, T, 1, H, W)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 1, 3, 4, 2))))
    np.testing.assert_allclose(got[..., 0], want[:, :, 0], atol=5e-4,
                               rtol=1e-3)


def test_da3_full_tree_numeric_parity():
    """FULL DA3-mono tree numeric parity: DINOv2 trunk + 2-channel DPT
    head -> (softplus depth, sigmoid sky) end-to-end (reference consumes
    the assembly via torch.hub, iw3/depth_anything_v3_model.py)."""
    from torchref.dinovit import DepthAnythingV3MonoTorch
    from nunif_tpu.iw3.depth.da3 import DepthAnythingV3Mono

    torch.manual_seed(37)
    tm = DepthAnythingV3MonoTorch().eval()
    params = tc.convert_depth_anything(tm.state_dict(), "vits")

    model = DepthAnythingV3Mono(encoder="vits")
    rng = np.random.default_rng(37)
    x = rng.normal(0, 1, size=(1, 3, 518, 518)).astype(np.float32)
    with torch.no_grad():
        want_depth, want_sky = tm(torch.from_numpy(x))
    got = model.apply_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               want_depth.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["sky"]),
                               want_sky.numpy(), atol=5e-4, rtol=1e-3)
