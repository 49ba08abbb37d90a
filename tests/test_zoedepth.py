"""ZoeDepth: BEiT core, metric bins head, NK router, wrapper semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nunif_tpu.iw3.depth.midas import MidasCore, _relative_position_index
from nunif_tpu.iw3.depth.zoedepth import (
    ZoeDepthNet, ZoeDepthNKNet, ZoeDepthModel, zoe_preprocess,
    zoe_preprocess_shape, inv_attractor,
)

pytestmark = pytest.mark.slow


def test_relative_position_index():
    idx = _relative_position_index(3, 3)
    assert idx.shape == (10, 10)
    num_rel = 5 * 5
    assert idx[0, 0] == num_rel + 2
    assert (idx[0, 1:] == num_rel).all()
    assert (idx[1:, 0] == num_rel + 1).all()
    # symmetric pairs map to mirrored offsets, zero offset on the diagonal
    center = idx[1:, 1:]
    assert (np.diag(center) == center[0, 0]).all()
    assert idx.max() < num_rel + 3


def test_midas_core_shapes():
    # tiny BEiT-ish config via beit_b_384 at 64x96 (grid 4x6)
    core = MidasCore(backbone="beit_b_384")
    x = jnp.zeros((1, 64, 96, 3))
    params = core.init(jax.random.PRNGKey(0), x)["params"]
    rel, feats = core.apply({"params": params}, x)
    assert rel.shape == (1, 64, 96)
    out32, btlnck, r4, r3, r2, r1 = feats
    assert out32.shape == (1, 64, 96, 32)
    assert btlnck.shape[1:3] == (2, 3)       # grid/2
    assert r4.shape[1:3] == (4, 6)
    assert r1.shape[1:3] == (32, 48)


def test_inv_attractor_pull():
    # attractor at +0.1 from the center pulls it toward the attractor
    d = inv_attractor(jnp.asarray(0.1), alpha=300.0)
    assert 0 < float(d) < 0.1


def test_zoedepth_net_positive_depth():
    net = ZoeDepthNet(core="beit_b_384", n_bins=16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1
    params = net.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    d = net.apply_fn(params, x)
    assert d.shape == (1, 64, 64, 1)
    assert bool(jnp.all(d > 0))          # softplus bins => positive metric
    assert bool(jnp.all(jnp.isfinite(d)))


def test_zoedepth_nk_router():
    net = ZoeDepthNKNet(core="beit_b_384", n_bins=8)
    params = net.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    d = net.apply_fn(params, x)
    assert d.shape == (1, 64, 64, 1)
    assert bool(jnp.all(jnp.isfinite(d)))


def test_zoe_preprocess_shape_math():
    # landscape 1080p at default 384/512, mod 32: reference math
    fh, fw, ph, pw = zoe_preprocess_shape(1080, 1920, 384, 512, 32)
    assert (fh + 2 * ph) % 32 == 0
    assert fh + 2 * ph == 384
    x = jnp.zeros((1, 1080, 1920, 3))
    xp, ph2, pw2 = zoe_preprocess(x, 384, 512, 32)
    assert (ph2, pw2) == (ph, pw)
    assert xp.shape[1] == 384 and xp.shape[2] % 32 == 0


def test_zoe_wrapper_infer_negated_metric():
    m = ZoeDepthModel("ZoeD_N")
    m.core = "beit_b_384"  # small core for the test
    m.model, m.params = m.load_model("ZoeD_N", resolution=64)
    assert m.is_metric()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (70, 90, 3)),
                    jnp.float32)
    d = m.infer(x)
    assert d.ndim == 3 and d.shape[-1] == 1
    assert bool(jnp.all(d < 0))  # depth sign inverted (reference :130)
    # flip TTA path
    d2 = m.infer(x[None], tta=True)
    assert d2.ndim == 4
    assert bool(jnp.all(jnp.isfinite(d2)))


def test_zoe_factory():
    from nunif_tpu.iw3.depth import create_depth_model, DEPTH_MODEL_TYPES
    for t in ["ZoeD_N", "ZoeD_K", "ZoeD_NK", "ZoeD_Any_N", "ZoeD_Any_K"]:
        assert t in DEPTH_MODEL_TYPES
        m = create_depth_model(t)
        assert m.is_metric()
