"""torch->flax conversion of iw3 stereo models: numeric parity for
row_flow_v2/v3 and MLBW variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nunif_tpu.models import create_model  # noqa: E402
from nunif_tpu.models import torch_convert as tc  # noqa: E402
import nunif_tpu.iw3  # noqa: F401,E402

pytestmark = pytest.mark.slow


def _structure_match(model, params, shape, with_mask=False):
    if with_mask:
        x = jnp.zeros(shape, jnp.float32)
        m = jnp.zeros(shape[:3] + (1,), jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), x, mask=m,
                         train=False)["params"]
    else:
        ref = model.init_params(jax.random.PRNGKey(0), shape)
    ref_map = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_map = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_map == got_map


def test_row_flow_v2_numeric_parity():
    from torchref.iw3_models import RowFlowV2 as TorchRowFlowV2
    torch.manual_seed(0)
    tm = TorchRowFlowV2().eval()
    params = tc.convert_row_flow_v2(tm.state_dict())
    model = create_model("sbs.row_flow_v2")
    _structure_match(model, params, (1, 64, 70, 3))

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 3, 64, 70)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def test_row_flow_v3_numeric_parity():
    from torchref.iw3_models import RowFlowV3 as TorchRowFlowV3
    torch.manual_seed(1)
    tm = TorchRowFlowV3().eval()
    params = tc.convert_row_flow_v3(tm.state_dict())
    model = create_model("sbs.row_flow_v3")
    _structure_match(model, params, (1, 63, 70, 3))

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 3, 63, 70)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def test_light_inpaint_v1_numeric_parity():
    from torchref.inpaint import LightInpaintV1 as TorchLightInpaintV1
    torch.manual_seed(3)
    tm = TorchLightInpaintV1().eval()
    params = tc.convert_light_inpaint_v1(tm.state_dict())
    model = create_model("inpaint.light_inpaint_v1")
    _structure_match(model, params, (1, 100, 120, 3), with_mask=True)

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 3, 100, 120)).astype(np.float32)
    mask = (rng.uniform(size=(1, 1, 100, 120)) > 0.8).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        mask=jnp.asarray(mask.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


@pytest.mark.parametrize("name,kwargs", [
    ("inpaint.light_video_inpaint_v1", dict(base_dim=96, lv2_mlp_ratio=1)),
    ("inpaint.light_video_inpaint_v1_medium",
     dict(base_dim=128, lv2_mlp_ratio=2)),
])
def test_light_video_inpaint_v1_numeric_parity(name, kwargs):
    from torchref.inpaint import LightVideoInpaintV1 as TorchLVI
    torch.manual_seed(5)
    tm = TorchLVI(**kwargs).eval()
    params = tc.convert_light_video_inpaint_v1(tm.state_dict())
    model = create_model(name)
    _structure_match(model, params, (12, 40, 48, 3), with_mask=True)

    rng = np.random.default_rng(5)
    x = rng.uniform(size=(12, 3, 40, 48)).astype(np.float32)
    mask = (rng.uniform(size=(12, 1, 40, 48)) > 0.8).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        mask=jnp.asarray(mask.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=3e-5)


def test_depth_aa_numeric_parity():
    from torchref.inpaint import DepthAA as TorchDepthAA
    torch.manual_seed(6)
    tm = TorchDepthAA().eval()
    # zero-init proj_out would hide bugs; randomize it
    with torch.no_grad():
        tm.proj_out.weight.normal_(std=0.05)
    params = tc.convert_depth_aa(tm.state_dict())
    model = create_model("iw3.depth_aa")
    _structure_match(model, params, (1, 50, 60, 1))

    rng = np.random.default_rng(6)
    x = rng.uniform(size=(1, 1, 50, 60)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply_fn(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


@pytest.mark.parametrize("name,kwargs", [
    ("sbs.mlbw_l2", dict(num_layers=2)),
    ("sbs.mlbw_l4", dict(num_layers=4)),
    ("sbs.mlbw_l2s", dict(num_layers=2, small=True)),
    ("sbs.mask_mlbw_l2", dict(num_layers=2, hole_mask=True)),
])
def test_mlbw_numeric_parity(name, kwargs):
    from torchref.iw3_models import MLBW as TorchMLBW
    torch.manual_seed(2)
    tm = TorchMLBW(**kwargs).eval()
    params = tc.convert_mlbw(tm.state_dict(),
                             small=kwargs.get("small", False))
    model = create_model(name)
    _structure_match(model, params, (1, 63, 70, 3))

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 3, 63, 70)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = model.apply_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    if kwargs.get("hole_mask"):
        delta, weight, mask = got
        np.testing.assert_allclose(
            np.asarray(mask).transpose(0, 3, 1, 2), want[2].numpy(),
            atol=2e-5)
    else:
        delta, weight = got
    np.testing.assert_allclose(
        np.asarray(delta).transpose(0, 3, 1, 2), want[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(weight).transpose(0, 3, 1, 2), want[1].numpy(), atol=2e-5)
