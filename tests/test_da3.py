"""Depth-Anything-V3 mono: sky-weighted disparity, wrapper, refiner."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nunif_tpu.iw3.depth.da3 import (
    DepthAnythingV3Mono, DepthAnythingV3MonoModel, da3_disparity,
)
from nunif_tpu.iw3.models.da3mono_disparity import (
    DA3MonoDisparity, extract_features, FEAT_DIM,
)

pytestmark = pytest.mark.slow


def test_da3_net_outputs():
    net = DepthAnythingV3Mono(encoder="vits")
    params = net.init_params(jax.random.PRNGKey(0), (1, 28, 28, 3))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = net.apply_fn(params, x)
    assert out["depth"].shape == (2, 28, 28)
    assert out["sky"].shape == (2, 28, 28)
    assert bool(jnp.all(out["depth"] >= 0))
    assert bool(jnp.all((out["sky"] >= 0) & (out["sky"] <= 1)))


def test_da3_disparity_sky_weighting():
    depth = jnp.ones((1, 8, 8)) * 2.0
    sky = jnp.zeros((1, 8, 8))
    d = da3_disparity(depth, sky)
    np.testing.assert_allclose(np.asarray(d), 1.0 / 2.2, rtol=1e-5)
    # full-sky image -> zeros
    d2 = da3_disparity(depth, jnp.ones((1, 8, 8)))
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-7)
    # partial sky attenuates disparity toward 0
    sky3 = jnp.zeros((1, 8, 8)).at[:, :2].set(1.0)
    d3 = da3_disparity(depth, sky3)
    assert float(d3[0, 0, 0, 0]) == 0.0
    np.testing.assert_allclose(float(d3[0, 4, 4, 0]), 1.0 / 2.2, rtol=1e-5)


def test_da3_disparity_raw_output_quantile():
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(1, 5, (1, 16, 16)), jnp.float32)
    sky = jnp.zeros((1, 16, 16)).at[:, :4].set(1.0)
    d = da3_disparity(depth, sky, raw_output=True)
    q = float(jnp.quantile(depth[:, 4:], 0.99))
    assert float(d.max()) <= q + 1e-5
    assert bool(jnp.all(jnp.isfinite(d)))


def test_da3_wrapper_and_scaler_modes():
    m = DepthAnythingV3MonoModel("Any_V3_Mono")
    assert m.scaler.mode == "max"
    m01 = DepthAnythingV3MonoModel("Any_V3_Mono_01")
    assert m01.scaler.mode == "minmax"
    assert not m.is_metric()

    m.encoder = "vits"
    m.model, m.params = m.load_model("Any_V3_Mono", resolution=28)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 30, 40, 3)),
                    jnp.float32)
    d = m.infer(x, tta=True)
    assert d.ndim == 4 and d.shape[0] == 2 and d.shape[-1] == 1
    assert bool(jnp.all(jnp.isfinite(d)))


def test_da3_factory():
    from nunif_tpu.iw3.depth import create_depth_model, DEPTH_MODEL_TYPES
    assert "Any_V3_Mono" in DEPTH_MODEL_TYPES
    m = create_depth_model("Any_V3_Mono_01")
    assert m.get_name() == "DepthAnythingV3Mono"


def test_extract_features_sorted():
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 12, 12, 1)),
                    jnp.float32)
    f = extract_features(x)
    assert f.shape == (2, FEAT_DIM)
    assert bool(jnp.all(jnp.diff(f, axis=-1) >= -1e-7))  # monotone
    assert float(f[0, 0]) == float(x[0].min())
    assert float(f[0, -1]) == float(x[0].max())


def test_da3mono_disparity_model():
    from nunif_tpu.models import create_model
    model = create_model("iw3.da3mono_disparity")
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 16, 1))
    depth = jnp.asarray(np.random.default_rng(3).uniform(1, 4, (2, 16, 16, 1)),
                        jnp.float32)
    disp = model.apply_fn(params, depth)
    assert disp.shape == depth.shape
    assert bool(jnp.all(disp > 0))
    assert bool(jnp.all(jnp.isfinite(disp)))
