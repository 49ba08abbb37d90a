"""Direct .pth loading: reference-envelope checkpoints convert and cache."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nunif_tpu.models.io import load_model  # noqa: E402
from nunif_tpu.models.pth_import import supported_torch_models  # noqa: E402
import nunif_tpu.waifu2x  # noqa: F401,E402

pytestmark = pytest.mark.slow


def _save_reference_style(tmp_path, name, kwargs, sd):
    path = str(tmp_path / f"{name.replace('.', '_')}.pth")
    torch.save({"nunif_model": 1, "name": name, "kwargs": kwargs,
                "state_dict": sd, "updated_at": "test"}, path)
    return path


def test_load_pth_swin_unet_2x(tmp_path):
    from torchref.swin_unet import SwinUNet as TorchSwinUNet
    torch.manual_seed(0)
    tm = TorchSwinUNet(base_dim=96, base_layers=2, scale_factor=2).eval()
    path = _save_reference_style(tmp_path, "waifu2x.swin_unet_2x", {},
                                 tm.state_dict())

    model, params, meta = load_model(path)
    assert meta["name"] == "waifu2x.swin_unet_2x"
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=3e-5)

    # second load comes from the .nztm cache and matches
    assert os.path.exists(path + ".nztm")
    model2, params2, _meta2 = load_model(path)
    got2 = np.asarray(model2.apply_fn(
        params2, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got2, got, atol=1e-6)


def test_load_pth_row_flow_v3(tmp_path):
    from torchref.iw3_models import RowFlowV3 as TorchRowFlowV3
    import nunif_tpu.iw3  # noqa: F401
    torch.manual_seed(1)
    tm = TorchRowFlowV3().eval()
    path = _save_reference_style(tmp_path, "sbs.row_flow_v3", {},
                                 tm.state_dict())
    model, params, meta = load_model(path)
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 3, 63, 70)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def test_load_pth_mlbw_alias(tmp_path):
    from torchref.iw3_models import MLBW as TorchMLBW
    import nunif_tpu.iw3  # noqa: F401
    torch.manual_seed(2)
    tm = TorchMLBW(num_layers=2).eval()
    path = _save_reference_style(
        tmp_path, "sbs.mlbw", {"num_layers": 2, "base_dim": 32},
        tm.state_dict())
    model, params, _meta = load_model(path)
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 3, 63, 70)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    delta, weight = model.apply_fn(params,
                                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(delta).transpose(0, 3, 1, 2),
                               want[0].numpy(), atol=2e-5)


def test_supported_model_list_covers_inference_surface():
    names = supported_torch_models()
    for required in ("waifu2x.swin_unet_2x", "waifu2x.swin_unet_v2_4x",
                     "waifu2x.cunet", "waifu2x.upconv_7", "sbs.row_flow_v3",
                     "sbs.mlbw", "inpaint.light_inpaint_v1",
                     "inpaint.light_video_inpaint_v1", "iw3.depth_aa",
                     "iw3.sod_v1", "cliqa.jpeg_quality",
                     "stlizer.light_outpaint_v1"):
        assert required in names, required
