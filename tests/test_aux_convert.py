"""torch->flax conversion of aux models: SuperPoint, U2NETP (+sod_v1)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nunif_tpu.models import torch_convert as tc  # noqa: E402

pytestmark = pytest.mark.slow


def _randomize_bn(tm, rng):
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.5, m.running_mean.shape).astype(
                        np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, m.running_var.shape).astype(
                        np.float32)))


def test_superpoint_numeric_parity():
    """Dense score/descriptor maps after NMS, incl. the post-activation
    BatchNorm -> affine fold (reference nunif/utils/superpoint.py:55-134)."""
    from torchref.superpoint import SuperPoint as TorchSuperPoint
    from nunif_tpu.utils.superpoint import SuperPoint
    torch.manual_seed(10)
    rng = np.random.default_rng(10)
    tm = TorchSuperPoint().eval()
    _randomize_bn(tm, rng)
    params = tc.convert_superpoint(tm.state_dict())

    model = SuperPoint(dense_output=True)
    ref = model.init_params(jax.random.PRNGKey(0), (1, 64, 80, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    x = rng.uniform(size=(1, 3, 64, 80)).astype(np.float32)
    with torch.no_grad():
        want_scores, want_desc = tm(torch.from_numpy(x))
    out = model.apply_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["scores_dense"]),
                               want_scores.numpy(), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(out["descriptors_dense"]).transpose(0, 3, 1, 2),
        want_desc.numpy(), atol=3e-5)


@pytest.mark.parametrize("name,heads", [
    ("cliqa.jpeg_quality", ["quality_output", "subsampling_output"]),
    ("cliqa.grain_noise_level", ["noise_level_output"]),
    ("cliqa.scale_factor", ["scale_factor_output"]),
])
def test_cliqa_numeric_parity(name, heads):
    """cliqa predictor trunks+heads with BN folded into convs (reference
    cliqa/models/*.py); flax models use norm='none' for converted
    checkpoints."""
    import torchref.cliqa as trc
    from nunif_tpu.models import create_model
    import nunif_tpu.cliqa  # noqa: F401
    cls = {"cliqa.jpeg_quality": trc.JPEGQuality,
           "cliqa.grain_noise_level": trc.GrainNoiseLevel,
           "cliqa.scale_factor": trc.ScaleFactor}[name]
    torch.manual_seed(14)
    rng = np.random.default_rng(14)
    tm = cls().eval()
    _randomize_bn(tm, rng)
    params = tc.convert_cliqa(tm.state_dict(), heads)

    model = create_model(name, norm="none")
    ref = model.init_params(jax.random.PRNGKey(0), (2, 64, 64, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = model.apply_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    if not isinstance(want, tuple):
        want, got = (want,), (got,)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=5e-5)


def test_light_outpaint_v1_numeric_parity():
    """stlizer outpaint net (reference stlizer/models/light_outpaint_v1.py
    :89-174)."""
    from torchref.outpaint import LightOutpaintV1 as TorchOutpaint
    from nunif_tpu.models import create_model
    import nunif_tpu.stlizer.light_outpaint_v1  # noqa: F401
    torch.manual_seed(15)
    tm = TorchOutpaint().eval()
    params = tc.convert_light_outpaint_v1(tm.state_dict())
    model = create_model("stlizer.light_outpaint_v1")

    rng = np.random.default_rng(15)
    H, W = 128, 192  # multiple of 64: no pad branch, matches reference
    x = rng.uniform(size=(1, 3, H, W)).astype(np.float32)
    mask = np.zeros((1, 1, H, W), np.float32)
    mask[:, :, :, :16] = 1.0
    mask[:, :, :, -16:] = 1.0
    x = x * (1 - mask)

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    mj = jnp.asarray(mask.transpose(0, 2, 3, 1))
    ref = model.init(jax.random.PRNGKey(0), xj, mask=mj,
                     train=False)["params"]
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    got = np.asarray(model.apply_fn(params, xj, mask=mj))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=3e-5)


def test_vgg16_lpips_trunk_numeric_parity():
    """VGG16 feature trunk tap activations (reference nunif/modules/
    lpips.py VGG backbone; torchvision vgg16 `features` key layout)."""
    from nunif_tpu.modules.lpips import VGG16Features
    torch.manual_seed(13)
    cfg = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
           (128, 256), (256, 256), (256, 256), "M",
           (256, 512), (512, 512), (512, 512), "M",
           (512, 512), (512, 512), (512, 512)]
    layers = []
    for c in cfg:
        if c == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(c[0], c[1], 3, padding=1))
            layers.append(torch.nn.ReLU())
    tm = torch.nn.Sequential(*layers).eval()
    sd = {f"features.{i}.{k}": v for i, m in enumerate(tm)
          for k, v in m.state_dict().items()}
    params = tc.convert_vgg16_features(sd)

    model = VGG16Features()
    rng = np.random.default_rng(13)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    taps = model.apply({"params": params},
                       jnp.asarray(x.transpose(0, 2, 3, 1)))
    # torch taps: after relu1_2 (idx 3), relu2_2 (8), relu3_3 (15),
    # relu4_3 (22), relu5_3 (29)... with this Sequential the tap indices
    # are after each stage's last ReLU
    tap_after = [4, 9, 16, 23, 30]
    with torch.no_grad():
        h = torch.from_numpy(x)
        want = []
        for i, m in enumerate(tm):
            h = m(h)
            if i + 1 in tap_after:
                want.append(h.numpy())
    assert len(want) == 5
    for g, w in zip(taps, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   atol=5e-5)


def test_transnetv2_numeric_parity():
    """Both logit heads over a 27x48 clip, incl. the per-DDCNN BatchNorm3d
    fold into the dilation-branch convs (reference
    nunif/utils/transnetv2.py:7-310)."""
    from torchref.transnetv2 import TransNetV2 as TorchTransNetV2
    from nunif_tpu.utils.transnetv2 import TransNetV2
    torch.manual_seed(12)
    rng = np.random.default_rng(12)
    tm = TorchTransNetV2().eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.5, m.running_mean.shape).astype(
                        np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, m.running_var.shape).astype(
                        np.float32)))
    params = tc.convert_transnetv2(tm.state_dict())

    model = TransNetV2()
    ref = model.init_params(jax.random.PRNGKey(0), (1, 8, 27, 48, 3))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    x = rng.integers(0, 256, size=(1, 8, 27, 48, 3)).astype(np.float32)
    with torch.no_grad():
        want1, want2 = tm(torch.from_numpy(x))
    got1, got2 = model.apply_fn(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(got2), want2.numpy(), atol=5e-5)


@pytest.mark.parametrize("in_ch", [3, 6])
def test_u2netp_numeric_parity(in_ch):
    """All 7 sigmoid outputs with BN-folded convs (reference
    nunif/utils/u2netp.py:321-432); in_ch=6 covers iw3.sod_v1's trunk."""
    from torchref.u2netp import U2NETP as TorchU2NETP
    from nunif_tpu.utils.u2netp import U2NETP
    torch.manual_seed(11)
    rng = np.random.default_rng(11)
    tm = TorchU2NETP(in_ch=in_ch).eval()
    _randomize_bn(tm, rng)
    params = tc.convert_u2netp(tm.state_dict())

    model = U2NETP()
    ref = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, in_ch))
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map

    x = rng.uniform(size=(1, in_ch, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = model.apply_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                   w.numpy(), atol=3e-5)
