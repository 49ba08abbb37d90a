"""Cross-implementation golden tests: run the ACTUAL reference code at
/root/reference (torch CPU, read-only import) against nunif_tpu on the
SAME weights and inputs.

This is the only test class that can catch pipeline-contract drift (pad
semantics, tile seams, TTA ordering, warp grid conventions) rather than
module drift — every other parity test compares against hand-built torch
oracles inside this repo.

torchvision is not installed in this environment; the reference import
chain needs it at import time (nunif/transforms/std.py) and the swin_unet
model class needs torchvision's SwinTransformerBlock at construction.  A
minimal stub provides both — the block implementation is this repo's
hand-built torchvision-V1-parity block (tests/torchref/swin_unet.py),
which is itself numerically validated against the flax kernels, so the
REFERENCE pipeline code (waifu2x/utils.py tiled+TTA+alpha convert,
nunif/utils/seam_blending.py, iw3/backward_warp.py) runs unmodified.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _install_torchvision_stub():
    """Minimal torchvision so the reference import chain resolves."""
    if "torchvision" in sys.modules:
        return
    from torchref.swin_unet import SwinTransformerBlockV1

    class SwinTransformerBlock(SwinTransformerBlockV1):
        # torchvision signature (reference swin_unet.py:26-37 passes these)
        def __init__(self, dim, num_heads, window_size, shift_size,
                     mlp_ratio=4.0, dropout=0.0, attention_dropout=0.0,
                     stochastic_depth_prob=0.0, norm_layer=None,
                     attn_layer=None):
            assert dropout == 0.0 and attention_dropout == 0.0
            assert stochastic_depth_prob == 0.0
            super().__init__(dim, num_heads, list(window_size),
                             list(shift_size), mlp_ratio=mlp_ratio,
                             norm_layer=norm_layer)

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    models = types.ModuleType("torchvision.models")
    swin = types.ModuleType("torchvision.models.swin_transformer")

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        LANCZOS = "lanczos"

    functional.InterpolationMode = InterpolationMode
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = functional
    swin.SwinTransformerBlock = SwinTransformerBlock
    tv.transforms = transforms
    tv.models = models
    models.swin_transformer = swin
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.swin_transformer"] = swin


@pytest.fixture(scope="module")
def reference():
    _install_torchvision_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import nunif  # noqa: F401  (reference package)
    yield


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(1.0 / mse)


def _save_reference_upconv7(tmpdir):
    """Random-init reference upconv_7 saved in the reference checkpoint
    format; returns (model_dir, state_dict)."""
    from nunif.models import save_model
    from waifu2x.models.upconv_7 import UpConv7

    torch.manual_seed(70)
    m = UpConv7()
    save_model(m, os.path.join(tmpdir, "scale2x.pth"))
    return tmpdir, m.state_dict()


def test_waifu2x_convert_golden_upconv7(reference, tmp_path):
    """Reference Waifu2x.convert (tiled render + seam blending + TTA path
    off, alpha off; /root/reference/waifu2x/utils.py:218-297) vs
    nunif_tpu's Waifu2x runtime on the same converted weights and PNG-like
    input.  PSNR >= 50 dB."""
    from waifu2x.utils import Waifu2x as RefWaifu2x

    model_dir, sd = _save_reference_upconv7(str(tmp_path))
    ref = RefWaifu2x(model_dir=model_dir, gpus=[-1])
    ref._load_model("scale", 0)

    rng = np.random.default_rng(70)
    img = rng.uniform(0.05, 0.95, (70, 90, 3)).astype(np.float32)
    x_t = torch.from_numpy(img.transpose(2, 0, 1))
    with torch.inference_mode():
        want, _ = ref.convert(x_t, None, "scale", 0, tile_size=64,
                              batch_size=2)
    want = want.numpy().transpose(1, 2, 0)

    # ours: convert the same torch state dict and render the same image
    from nunif_tpu.models import torch_convert as tc
    from nunif_tpu.models import create_model
    from nunif_tpu.utils.tiling import TiledRenderer
    from nunif_tpu.core.dtypes import FP32_POLICY
    import nunif_tpu.waifu2x  # noqa: F401

    params = tc.convert_upconv7(sd)
    model = create_model("waifu2x.upconv_7")
    renderer = TiledRenderer(model, params, policy=FP32_POLICY)
    got = np.asarray(renderer.render(img, tile_size=64, batch_size=2))

    assert got.shape == want.shape == (140, 180, 3)
    psnr = _psnr(got, np.clip(want, 0, 1))
    assert psnr >= 50.0, f"PSNR {psnr:.1f} dB < 50"


def test_waifu2x_convert_golden_swin_unet_tta_alpha(reference, tmp_path):
    """Reference Waifu2x.convert with TTA=True and a REAL alpha channel
    (alpha border padding + model-upscaled alpha) vs nunif_tpu's runtime
    on the same weights — exercises TTA ordering and the alpha pipeline
    contract end-to-end."""
    from nunif.models import save_model
    from waifu2x.models.swin_unet import SwinUNet2x as RefSwinUNet2x
    from waifu2x.utils import Waifu2x as RefWaifu2x

    torch.manual_seed(71)
    m = RefSwinUNet2x()
    save_model(m, os.path.join(str(tmp_path), "scale2x.pth"))
    sd = m.state_dict()

    ref = RefWaifu2x(model_dir=str(tmp_path), gpus=[-1])
    ref._load_model("scale", 0)

    rng = np.random.default_rng(71)
    img = rng.uniform(0.05, 0.95, (70, 90, 3)).astype(np.float32)
    alpha = np.ones((1, 70, 90), np.float32)
    alpha[:, 20:40, 30:60] = rng.uniform(0.0, 1.0, (20, 30))
    with torch.inference_mode():
        want_rgb, want_a = ref.convert(
            torch.from_numpy(img.transpose(2, 0, 1)),
            torch.from_numpy(alpha), "scale", 0,
            tile_size=64, batch_size=2, tta=True)
    want_rgb = want_rgb.numpy().transpose(1, 2, 0)
    want_a = want_a.numpy()[0]

    from nunif_tpu.models import torch_convert as tc
    from nunif_tpu.models import create_model
    from nunif_tpu.core.dtypes import FP32_POLICY
    from nunif_tpu.waifu2x.runtime import Waifu2x as TpuWaifu2x
    import nunif_tpu.waifu2x  # noqa: F401

    params = tc.convert_swin_unet(sd, base_dim=96, base_layers=2,
                                  scale_factor=2)
    model = create_model("waifu2x.swin_unet_2x")
    w2x = TpuWaifu2x(model_dir="/nonexistent", policy=FP32_POLICY)
    w2x.set_slot("scale", None, model, params)

    got_rgb, got_a = w2x.convert(
        img, alpha=alpha.transpose(1, 2, 0), method="scale",
        tile_size=64, batch_size=2, tta=True)
    got_rgb = np.asarray(got_rgb)
    got_a = np.asarray(got_a)[..., 0]

    assert got_rgb.shape == want_rgb.shape == (140, 180, 3)
    psnr = _psnr(got_rgb, np.clip(want_rgb, 0, 1))
    assert psnr >= 50.0, f"rgb PSNR {psnr:.1f} dB < 50"
    psnr_a = _psnr(got_a, np.clip(want_a, 0, 1))
    assert psnr_a >= 50.0, f"alpha PSNR {psnr_a:.1f} dB < 50"


def test_iw3_apply_divergence_golden(reference):
    """Reference apply_divergence grid_sample path (one frame,
    /root/reference/iw3/utils.py:292-391 -> iw3/backward_warp.py:96) vs
    nunif_tpu's backward warp on the same depth map — catches warp grid
    convention drift (divergence scaling, convergence shift, border
    handling)."""
    from iw3.backward_warp import apply_divergence_grid_sample

    rng = np.random.default_rng(72)
    H, W = 60, 80
    img = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
    depth = rng.uniform(0, 1, (1, H, W)).astype(np.float32)

    divergence, convergence = 2.0, 0.5
    with torch.inference_mode():
        want_l, want_r = apply_divergence_grid_sample(
            torch.from_numpy(img[None]), torch.from_numpy(depth[None]),
            divergence, convergence, "both")
    want_l = want_l.numpy()[0].transpose(1, 2, 0)
    want_r = want_r.numpy()[0].transpose(1, 2, 0)

    from nunif_tpu.iw3.backward_warp import (
        apply_divergence_grid_sample as tpu_grid_sample)
    got_l, got_r = tpu_grid_sample(
        jnp.asarray(img.transpose(1, 2, 0))[None],
        jnp.asarray(depth[0])[None, ..., None],
        divergence, convergence)
    got_l = np.asarray(got_l[0])
    got_r = np.asarray(got_r[0])

    # production path streams image terms in bf16 (documented in
    # modules/grid_sample.warp_x_bounded — the TPU analogue of the
    # reference's fp16 inference): PSNR-level agreement
    assert _psnr(got_l, want_l) >= 50.0, _psnr(got_l, want_l)
    assert _psnr(got_r, want_r) >= 50.0, _psnr(got_r, want_r)

    # the fp32 gather path must match torch grid_sample tightly
    from nunif_tpu.modules.grid_sample import warp_x
    base = float(max(H, W))
    ss = divergence * 0.01
    delta_px = ((depth[0] * ss - ss * convergence)
                * (base / W) * ((W - 1) / 2.0))
    exact_l = np.asarray(jnp.clip(warp_x(
        jnp.asarray(img.transpose(1, 2, 0))[None],
        jnp.asarray(-delta_px)[None]), 0, 1)[0])
    np.testing.assert_allclose(exact_l, want_l, atol=5e-5)


def _install_av_stub():
    """Minimal `av` so `nunif.utils.video` (imported by the reference
    stlizer pipeline) resolves; no video decoding happens in these tests."""
    if "av" in sys.modules:
        return
    import enum

    av = types.ModuleType("av")
    av.__version__ = "15.0.0"
    av.codecs_available = set()
    av.time_base = 1000000
    video_mod = types.ModuleType("av.video")
    reformatter = types.ModuleType("av.video.reformatter")

    # enum-valued like pyav's (reference video.py reads `.value` at import
    # time: /root/reference/nunif/utils/video.py:74); values are libsws ids
    class ColorRange(enum.Enum):
        MPEG = 1
        JPEG = 2

    class Colorspace(enum.Enum):
        ITU709 = 1
        ITU601 = 5

    reformatter.ColorRange = ColorRange
    reformatter.Colorspace = Colorspace
    video_mod.reformatter = reformatter
    av.video = video_mod

    # nunif.utils.pyav_extra does `from av.sidedata.sidedata import Type`
    sidedata_pkg = types.ModuleType("av.sidedata")
    sidedata_mod = types.ModuleType("av.sidedata.sidedata")

    class SideDataType(enum.Enum):
        MASTERING_DISPLAY_METADATA = 23
        CONTENT_LIGHT_LEVEL = 24

    sidedata_mod.Type = SideDataType
    sidedata_pkg.sidedata = sidedata_mod
    av.sidedata = sidedata_pkg
    av.error = types.SimpleNamespace(FFMpegError=OSError)

    # `hdr2sdr` builds its output via av.video.frame.VideoFrame.from_ndarray
    # (reference video.py:399); the stub just holds the ndarray.
    frame_mod = types.ModuleType("av.video.frame")

    class VideoFrame:
        @staticmethod
        def from_ndarray(arr, format=None):
            f = VideoFrame()
            f.arr = arr
            f.format = format
            return f

        from_image = from_ndarray

    frame_mod.VideoFrame = VideoFrame
    video_mod.frame = frame_mod

    sys.modules["av"] = av
    sys.modules["av.video"] = video_mod
    sys.modules["av.video.frame"] = frame_mod
    sys.modules["av.video.reformatter"] = reformatter
    sys.modules["av.sidedata"] = sidedata_pkg
    sys.modules["av.sidedata.sidedata"] = sidedata_mod


@pytest.mark.parametrize("method", ["forward_fill", "forward"])
def test_iw3_forward_warp_golden(reference, method):
    """Reference depth-ordered bilinear forward warp + layered-hole fix +
    shift fill (/root/reference/iw3/forward_warp.py:140-257, the actual
    torch sort+index_copy+while-loop implementation) vs nunif_tpu's
    closed-form scatter-max formulation on the same inputs."""
    from iw3.forward_warp import (
        apply_divergence_forward_warp as ref_forward_warp)

    rng = np.random.default_rng(73)
    B, H, W = 1, 16, 48
    c = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    # depth: coarse structure (a foreground block for layered holes /
    # disocclusion coverage) + a unique tie-breaking jitter per pixel so
    # the reference argsort depth order is unambiguous (torch argsort is
    # not stable; equal depths would make the golden comparison flaky)
    depth = (rng.integers(0, 12, (B, 1, H, W)) / 15.0).astype(np.float32)
    depth[:, :, 4:12, 16:32] = 0.9
    jitter = rng.permutation(H * W).reshape(1, 1, H, W) * 1e-6
    depth = (depth + jitter).astype(np.float32)

    with torch.inference_mode():
        want_l, want_r = ref_forward_warp(
            torch.from_numpy(c), torch.from_numpy(depth), 4.0, 0.5,
            method=method, synthetic_view="both")
    want_l = want_l.numpy().transpose(0, 2, 3, 1)
    want_r = want_r.numpy().transpose(0, 2, 3, 1)

    from nunif_tpu.iw3.forward_warp import (
        apply_divergence_forward_warp as tpu_forward_warp)
    got_l, got_r = tpu_forward_warp(
        jnp.asarray(c.transpose(0, 2, 3, 1)),
        jnp.asarray(depth.transpose(0, 2, 3, 1)),
        4.0, 0.5, method=method, synthetic_view="both")

    np.testing.assert_allclose(np.asarray(got_l),
                               np.clip(want_l, 0, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_r),
                               np.clip(want_r, 0, 1), atol=2e-4)


def _ref_sbs_args():
    """Minimal args namespace for the reference apply_divergence."""
    import argparse
    ns = argparse.Namespace()
    ns.state = {"convergence_model": None}
    ns.convergence = 0.5
    ns.divergence = 2.0
    ns.mapper = "softplus"
    ns.method = "row_flow_v3"
    ns.synthetic_view = "both"
    ns.warp_steps = None
    ns.preserve_screen_border = False
    ns.disable_amp = True
    ns.stereo_width = None
    return ns


def test_iw3_apply_divergence_row_flow_v3_golden(reference):
    """Reference apply_divergence full nn path (mapper -> row_flow_v3 ->
    delta warp; /root/reference/iw3/utils.py:292-391 +
    iw3/backward_warp.py:124-260) vs nunif_tpu on converted weights."""
    _install_av_stub()
    from iw3.utils import apply_divergence as ref_apply_divergence
    from iw3.models.row_flow_v3 import RowFlowV3 as RefRowFlowV3

    torch.manual_seed(74)
    tm = RefRowFlowV3().eval()
    tm.delta_output = True  # inference mode (set at load by the ref CLI)
    args = _ref_sbs_args()

    rng = np.random.default_rng(74)
    B, H, W = 2, 64, 96
    im = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    depth = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)

    with torch.inference_mode():
        want_l, want_r = ref_apply_divergence(
            torch.from_numpy(depth), torch.from_numpy(im), args, tm)
    want_l = want_l.numpy().transpose(0, 2, 3, 1)
    want_r = want_r.numpy().transpose(0, 2, 3, 1)

    from nunif_tpu.models import torch_convert as tc
    from nunif_tpu.models import create_model
    from nunif_tpu.iw3.backward_warp import apply_divergence_nn_LR
    from nunif_tpu.iw3.mapper import get_mapper
    import nunif_tpu.iw3  # noqa: F401

    params = tc.convert_row_flow_v3(tm.state_dict())
    model = create_model("sbs.row_flow_v3")
    d = get_mapper(args.mapper)(jnp.asarray(depth.transpose(0, 2, 3, 1)))
    got_l, got_r = apply_divergence_nn_LR(
        model, params, jnp.asarray(im.transpose(0, 2, 3, 1)), d,
        args.divergence, args.convergence, synthetic_view="both")

    psnr_l = _psnr(np.asarray(got_l), np.clip(want_l, 0, 1))
    psnr_r = _psnr(np.asarray(got_r), np.clip(want_r, 0, 1))
    assert psnr_l >= 50.0, f"left PSNR {psnr_l:.1f} dB < 50"
    assert psnr_r >= 50.0, f"right PSNR {psnr_r:.1f} dB < 50"


def test_iw3_apply_divergence_mlbw_golden(reference):
    """Reference apply_divergence MLBW path (multi-layer blend warp,
    delta_weight formulation; iw3/backward_warp.py:262-343) vs nunif_tpu
    on converted weights."""
    _install_av_stub()
    from iw3.utils import apply_divergence as ref_apply_divergence
    from iw3.models.mlbw import MLBW as RefMLBW

    torch.manual_seed(75)
    tm = RefMLBW(num_layers=2).eval()
    tm.delta_output = True  # inference mode (set at load by the ref CLI)
    args = _ref_sbs_args()
    args.method = "mlbw_l2"

    rng = np.random.default_rng(75)
    B, H, W = 1, 64, 96
    im = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    depth = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)

    with torch.inference_mode():
        want_l, want_r = ref_apply_divergence(
            torch.from_numpy(depth), torch.from_numpy(im), args, tm)
    want_l = want_l.numpy().transpose(0, 2, 3, 1)
    want_r = want_r.numpy().transpose(0, 2, 3, 1)

    from nunif_tpu.models import torch_convert as tc
    from nunif_tpu.models import create_model
    from nunif_tpu.iw3.backward_warp import apply_divergence_nn_LR
    from nunif_tpu.iw3.mapper import get_mapper
    import nunif_tpu.iw3  # noqa: F401

    params = tc.convert_mlbw(tm.state_dict())
    model = create_model("sbs.mlbw_l2")
    d = get_mapper(args.mapper)(jnp.asarray(depth.transpose(0, 2, 3, 1)))
    got_l, got_r = apply_divergence_nn_LR(
        model, params, jnp.asarray(im.transpose(0, 2, 3, 1)), d,
        args.divergence, args.convergence, synthetic_view="both")

    psnr_l = _psnr(np.asarray(got_l), np.clip(want_l, 0, 1))
    psnr_r = _psnr(np.asarray(got_r), np.clip(want_r, 0, 1))
    assert psnr_l >= 50.0, f"left PSNR {psnr_l:.1f} dB < 50"
    assert psnr_r >= 50.0, f"right PSNR {psnr_r:.1f} dB < 50"


def test_iw3_ema_scaler_mapper_golden(reference):
    """Reference EMAMinMaxScaler sequence (lookahead buffer + EMA +
    normalize; /root/reference/iw3/depth_scaler.py:33-143) composed with
    the mapper curve vs nunif_tpu's scaler over the same frame stream."""
    from iw3.depth_scaler import EMAMinMaxScaler as RefScaler
    from iw3.mapper import get_mapper as ref_get_mapper

    from nunif_tpu.iw3.depth_scaler import EMAMinMaxScaler as TpuScaler
    from nunif_tpu.iw3.mapper import get_mapper as tpu_get_mapper

    rng = np.random.default_rng(76)
    frames = [rng.uniform(-2.0, 5.0, (1, 24, 32)).astype(np.float32) * s
              for s in (1.0, 1.5, 0.7, 2.0, 1.1, 0.9, 1.3, 1.8)]

    for mapper in ("none", "softplus", "softplus2", "div_6", "mul_1"):
        ref = RefScaler(decay=0.9, buffer_size=3)
        tpu = TpuScaler(decay=0.9, buffer_size=3)
        ref_map = ref_get_mapper(mapper)
        tpu_map = tpu_get_mapper(mapper)
        want_out, got_out = [], []
        for f in frames:
            w = ref.update(torch.from_numpy(f))
            if w is not None:
                want_out.append(ref_map(w).numpy())
            g = tpu.update(jnp.asarray(f))
            if g is not None:
                got_out.append(np.asarray(tpu_map(g)))
        want_out.extend(ref_map(w).numpy() for w in ref.flush())
        got_out.extend(np.asarray(tpu_map(g)) for g in tpu.flush())

        assert len(want_out) == len(got_out) == len(frames), mapper
        for i, (w, g) in enumerate(zip(want_out, got_out)):
            np.testing.assert_allclose(g, w, atol=2e-5,
                                       err_msg=f"{mapper} frame {i}")


@pytest.mark.parametrize("method", ["gaussian", "savgol"])
def test_stlizer_smoothing_golden(reference, method):
    """Reference stlizer trajectory smoothing (cumsum + conv1d kernel fix
    terms; /root/reference/stlizer/multipass_pipeline.py:272-351) vs
    nunif_tpu's smooth_trajectory on the same trajectory."""
    _install_av_stub()
    from stlizer.multipass_pipeline import pass3_smoothing, calc_scene_weight

    rng = np.random.default_rng(77)
    n = 120
    fps = 30.0
    shift_x = rng.normal(0, 2.0, n)
    shift_y = rng.normal(0, 1.5, n)
    angle = rng.normal(0, 0.01, n)
    scores = np.clip(rng.uniform(0.05, 0.9, n), 0, 1).astype(np.float32)

    sw_ref = calc_scene_weight(torch.from_numpy(scores), device="cpu")
    # pass3_smoothing weights by scene_weight and cumsums internally
    # (multipass_pipeline.py:337-348)
    want = pass3_smoothing(
        torch.from_numpy(shift_x), torch.from_numpy(shift_y),
        torch.from_numpy(angle), sw_ref, method, 2.0, fps, 320, "cpu")

    from nunif_tpu.stlizer.pipeline import smooth_trajectory, calc_scene_weight as tpu_csw
    sw = tpu_csw(scores)
    np.testing.assert_allclose(np.asarray(sw), sw_ref.numpy(), atol=1e-6)
    got = smooth_trajectory(shift_x, shift_y, angle, np.asarray(sw),
                            method, 2.0, fps, 320)
    for g, w, name in zip(got, want, ("x", "y", "a")):
        np.testing.assert_allclose(np.asarray(g).ravel(),
                                   w.numpy().ravel(), atol=1e-4,
                                   err_msg=name)


@pytest.mark.parametrize("trc,cs", [
    (16, "bt709"), (18, "bt709"), (16, "bt601"), (18, "bt601")])
def test_hdr2sdr_golden(reference, trc, cs):
    """Reference HDR->SDR tone map (PQ/HLG EOTF + Hable + gamut matrix +
    BT.709 OETF; /root/reference/nunif/utils/video.py:309-417, the actual
    torch implementation) vs nunif_tpu's jitted hable mode on the same
    rgb48 frame."""
    _install_av_stub()
    from nunif.utils.video import hdr2sdr

    from nunif_tpu.video.hdr import hdr2sdr_frames

    rng = np.random.default_rng(78)
    H, W = 48, 64
    rgb48 = (rng.uniform(0.0, 1.0, (H, W, 3)) * 65535).astype(np.uint16)
    # include exact black/white and the PQ 203-nit anchor row
    rgb48[0] = 0
    rgb48[1] = 65535
    rgb48[2] = int(0.5807 * 65535)

    frame = types.SimpleNamespace(
        colorspace=9, color_range=2, pts=0, dts=0, time_base=None,
        opaque=None,
        to_ndarray=lambda **kw: rgb48)
    want = hdr2sdr(frame, trc, cs).arr.astype(np.float32) / 65535.0

    got = np.asarray(hdr2sdr_frames(
        rgb48[None], trc=trc, out_uint16=True, mode="hable",
        output_colorspace=cs))[0].astype(np.float32) / 65535.0

    # reference truncates to uint16, ours rounds: <=1 LSB; plus fp32
    # reassociation between torch.mm and the einsum
    np.testing.assert_allclose(got, want, atol=8.0 / 65535.0)


def test_stlizer_pass1_match_golden(reference):
    """Reference keypoint cosine matching (stlizer pass 1 core;
    /root/reference/nunif/utils/superpoint.py:207-224) vs nunif_tpu's
    masked static-shape find_match_index on the same descriptors."""
    from nunif.utils.superpoint import find_match_index as ref_match

    from nunif_tpu.utils.superpoint import find_match_index as tpu_match

    rng = np.random.default_rng(79)
    K, D = 64, 256
    d1 = rng.normal(size=(K, D)).astype(np.float32)
    d2 = rng.normal(size=(K, D)).astype(np.float32)
    # make some strong correspondences so both sides of the threshold occur
    d2[:40] = d1[rng.permutation(64)[:40]] + rng.normal(
        0, 0.05, (40, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    kp = rng.uniform(0, 320, (K, 2)).astype(np.float32)

    i1_ref, i2_ref, score_ref = ref_match(
        {"descriptors": torch.from_numpy(d1)},
        {"descriptors": torch.from_numpy(d2)},
        threshold=0.9, return_score_all=True)

    ones = np.ones((K,), bool)
    i1, i2, valid, sims = tpu_match(
        {"descriptors": jnp.asarray(d1), "valid": jnp.asarray(ones),
         "keypoints": jnp.asarray(kp)},
        {"descriptors": jnp.asarray(d2), "valid": jnp.asarray(ones),
         "keypoints": jnp.asarray(kp)},
        threshold=0.9)

    valid = np.asarray(valid)
    assert valid.sum() > 10  # the test must exercise both branches
    np.testing.assert_array_equal(np.asarray(i1)[valid], i1_ref.numpy())
    np.testing.assert_array_equal(np.asarray(i2)[valid], i2_ref.numpy())
    np.testing.assert_allclose(np.asarray(sims), score_ref.numpy(),
                               atol=1e-5)


def test_stlizer_pass2_transform_golden(reference):
    """Reference robust batched transform estimation (stlizer pass 2;
    /root/reference/nunif/utils/superpoint.py:233-328: Adam + cosine
    annealing + sigma outlier rejection) vs nunif_tpu's fori_loop/optax
    find_transform on the same correspondences."""
    from nunif.utils.superpoint import find_transform as ref_find

    from nunif_tpu.utils.superpoint import find_transform as tpu_find

    rng = np.random.default_rng(80)
    B, K = 4, 96
    xy1 = rng.uniform(40, 280, (B, K, 2)).astype(np.float32)
    true_shift = rng.uniform(-6, 6, (B, 1, 2)).astype(np.float32)
    true_angle = rng.uniform(-1.5, 1.5, (B,)).astype(np.float32)
    c, s = np.cos(np.radians(true_angle)), np.sin(np.radians(true_angle))
    center = np.full((B, 1, 2), 160.0, np.float32)
    rel = xy1 - center
    xy2 = np.stack([rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None],
                    rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]],
                   axis=-1) + center + true_shift
    xy2 += rng.normal(0, 0.3, xy2.shape).astype(np.float32)
    xy2[:, :8] += rng.uniform(20, 60, (B, 8, 2)).astype(np.float32)  # outliers
    mask = np.ones((B, K), bool)
    mask[:, 90:] = False  # variable-count padding like pack_points

    shift_ref, scale_ref, angle_ref, _ = ref_find(
        torch.from_numpy(xy1), torch.from_numpy(xy2),
        center=torch.from_numpy(center),
        mask=torch.from_numpy(mask)[..., None].expand(B, K, 2),
        iteration=50, sigma=2.0, disable_scale=True)

    shift, scale, angle = tpu_find(
        jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(center),
        jnp.asarray(mask), iteration=50, sigma=2.0, disable_scale=True)

    # both should recover the synthetic transform AND agree with each
    # other (same optimizer math; fp32 reassociation only)
    np.testing.assert_allclose(np.asarray(shift), shift_ref.numpy(),
                               atol=0.15)
    np.testing.assert_allclose(np.asarray(angle).ravel(),
                               angle_ref.numpy().ravel(), atol=0.05)
    np.testing.assert_allclose(np.asarray(shift), true_shift.reshape(B, 2),
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(scale), scale_ref.numpy().ravel(),
                               atol=1e-6)  # both disabled -> exactly 1


def test_vda_streaming_scene_flush_golden(reference):
    """Reference scene-flush semantics for streaming depth (the per-frame
    normalize -> flush lookahead -> reset-EMA ordering at a cut;
    /root/reference/iw3/base_depth_model.py:182-194, driven by
    /root/reference/iw3/utils.py:698-702 segment_pts) vs nunif_tpu's
    batched update_batch(reset_flags) over the same multi-batch depth
    stream with EMA decay and a lookahead buffer."""
    from iw3.base_depth_model import BaseDepthModel as RefBase

    from nunif_tpu.iw3.depth.base import BaseDepthModel as TpuBase

    class RefStub(RefBase):
        @classmethod
        def get_name(cls):
            return "stub"

        @classmethod
        def supported(cls, model_type):
            return True

        def load_model(self, model_type, resolution=None, device=None):
            return None

        def infer(self, x, **kwargs):
            return x

        def is_metric(self):
            return False

        @classmethod
        def has_checkpoint_file(cls, model_type):
            return False

        @classmethod
        def get_model_path(cls, model_type):
            return ""

        @classmethod
        def multi_gpu_supported(cls, model_type):
            return False

        @classmethod
        def force_update(cls):
            pass

    class TpuStub(TpuBase):
        @classmethod
        def get_name(cls):
            return "stub"

        @classmethod
        def supported(cls, model_type):
            return True

        def load_model(self, model_type, **kwargs):
            return None, None

        def infer(self, x, **kwargs):
            return x

        def is_metric(self):
            return False

    ref = RefStub("stub")
    tpu = TpuStub("stub")
    ref.enable_ema(decay=0.85, buffer_size=3)
    tpu.enable_ema(decay=0.85, buffer_size=3)

    rng = np.random.default_rng(81)
    # 3 batches of 6 frames; scene cuts AFTER frames 4 and 13 (mid-batch
    # and cross-batch relative to the lookahead buffer)
    frames = rng.uniform(-1.0, 4.0, (18, 1, 16, 24)).astype(np.float32)
    cuts = {4, 13}

    want, got = [], []
    for b in range(3):
        chunk = frames[b * 6:(b + 1) * 6]
        flags = [(b * 6 + i) in cuts for i in range(6)]
        out_ref = ref.minmax_normalize(torch.from_numpy(chunk),
                                       reset_ema=list(flags))
        want.extend(o.numpy() for o in out_ref)
        out_tpu = tpu.minmax_normalize(
            jnp.asarray(chunk.transpose(0, 2, 3, 1)), reset_ema=list(flags))
        got.extend(np.asarray(o).transpose(2, 0, 1) for o in out_tpu)
    want.extend(o.numpy() for o in ref.flush_minmax_normalize())
    got.extend(np.asarray(o).transpose(2, 0, 1)
               for o in tpu.flush_minmax_normalize())

    assert len(want) == len(got) == 18
    for i, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(g, w, atol=3e-5, err_msg=f"frame {i}")
