"""torch->flax conversion of aux models: SuperPoint, U2NETP (+sod_v1)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nunif_tpu.models import torch_convert as tc  # noqa: E402


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
