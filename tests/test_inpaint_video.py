"""Video inpainting + MLBW-inpaint methods."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nunif_tpu.iw3.models.light_video_inpaint_v1 import (
    LightVideoInpaintV1, video_inpaint_infer, SEQ_LEN,
)
from nunif_tpu.iw3.mlbw_inpaint import MLBWInpaint, MLBWInpaintVideo

pytestmark = pytest.mark.slow


def _clip(n, h=64, w=64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (n, h, w, 3)), jnp.float32)
    mask = jnp.zeros((n, h, w, 1)).at[:, 20:36, 20:36].set(1.0)
    return x, mask


def test_video_inpaint_forward():
    model = LightVideoInpaintV1()
    x, mask = _clip(SEQ_LEN)
    params = model.init(jax.random.PRNGKey(0), x, mask=mask,
                        train=False)["params"]
    out = model.apply_fn(params, x, mask=mask)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # unmasked pixels pass through the source exactly (eval composite)
    np.testing.assert_allclose(np.asarray(out[:, :10, :10]),
                               np.asarray(x[:, :10, :10]), atol=1e-5)


def test_video_inpaint_temporal_mixing():
    model = LightVideoInpaintV1()
    x, mask = _clip(SEQ_LEN)
    params = model.init(jax.random.PRNGKey(0), x, mask=mask,
                        train=False)["params"]
    # at random init the reference's proj_spatial kernels are ~2e-3/C so the
    # cross-frame signal is below fp32 resolution; give the temporal blocks
    # trained-magnitude mixing weights so the path is measurable
    rng = np.random.default_rng(0)
    for blk in ("enc2_1", "enc2_3"):
        k = params[blk]["gmlp"]["gmlp"]["proj_spatial_kernel"]
        params[blk]["gmlp"]["gmlp"]["proj_spatial_kernel"] = jnp.asarray(
            rng.normal(0, 0.2, k.shape), jnp.float32)
    out1 = model.apply_fn(params, x, mask=mask)
    # changing ONLY frame 0 must change frame 6's inpainted region
    x2 = x.at[0].set(1.0 - x[0])
    out2 = model.apply_fn(params, x2, mask=mask)
    diff = jnp.abs(out1[6, 20:36, 20:36] - out2[6, 20:36, 20:36])
    assert float(diff.max()) > 1e-7


def test_video_inpaint_infer_pads_clip():
    model = LightVideoInpaintV1()
    x, mask = _clip(SEQ_LEN)
    params = model.init(jax.random.PRNGKey(0), x, mask=mask,
                        train=False)["params"]
    x5, m5 = _clip(5)
    out = video_inpaint_infer(model, params, x5, m5)
    assert out.shape == x5.shape


def test_mlbw_inpaint_image():
    m = MLBWInpaint()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    left, right = m.infer(x, depth, divergence=2.0, convergence=0.5)
    assert left.shape == x.shape and right.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(left)))
    l2, r2 = m.infer(x, depth, 2.0, 0.5, synthetic_view="right")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(x))
    assert m.flush() == (None, None)


def test_mlbw_inpaint_video_queue():
    m = MLBWInpaintVideo()
    rng = np.random.default_rng(2)
    total_out = 0
    N = 15
    for i in range(N):
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        d = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
        left, right = m.infer(x, d, divergence=2.0, convergence=0.5)
        if left is not None:
            assert left.shape[0] == right.shape[0]
            total_out += left.shape[0]
    left, right = m.flush()
    if left is not None:
        total_out += left.shape[0]
    assert total_out == N
