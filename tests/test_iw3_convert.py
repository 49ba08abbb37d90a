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


def _structure_match(model, params, shape):
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
