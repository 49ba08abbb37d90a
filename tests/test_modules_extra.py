"""New module-library components: FFC, pools, filters, masks, attention
variants, embedding/fusion, alex11/flat-color/LPIPS losses."""
import numpy as np
import jax
import jax.numpy as jnp

from nunif_tpu.modules.fourier_unit import FourierUnit
from nunif_tpu.modules.pool import soft_pool2d, soft_pool_downscale
from nunif_tpu.modules.gaussian_filter import (
    gaussian_blur, get_gaussian_kernel2d,
)
from nunif_tpu.modules.local_std_mask import (
    compute_local_std_mask, local_std_mask,
)
from nunif_tpu.modules.jaccard import jaccard_index
from nunif_tpu.modules.embedding import PositionalSeeding
from nunif_tpu.modules.fusion import Lerp, AdaptiveWeightedAdd
from nunif_tpu.modules.attention import (
    CrossMHA, WindowCrossMHA2d, WindowSpatialReductionMHA2d,
    OverlapWindowMHA2d, WindowMHA3d, WindowGMLP3d,
)
from nunif_tpu.modules.losses import (
    alex11_loss, flat_color_loss, get_flat_color_mask, identity_loss,
    weighted_loss, l1_loss, l2_loss,
)


def _rng(*shape):
    return jnp.asarray(np.random.default_rng(0).normal(size=shape),
                       jnp.float32)


def test_fourier_unit():
    m = FourierUnit(8, 8)
    x = _rng(2, 16, 16, 8)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    m2 = FourierUnit(8, 12)  # channel-changing residual
    params2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(params2, x).shape == (2, 16, 16, 12)


def test_soft_pool2d():
    x = _rng(1, 8, 8, 4) * 0.5
    y = soft_pool2d(x, 2)
    assert y.shape == (1, 4, 4, 4)
    # softpool of a constant map is that constant
    c = jnp.full((1, 8, 8, 4), 0.3)
    np.testing.assert_allclose(np.asarray(soft_pool2d(c, 2)), 0.3, rtol=1e-4)
    assert soft_pool_downscale(x, 4).shape == (1, 2, 2, 4)


def test_gaussian_blur():
    k = get_gaussian_kernel2d(5)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    x = jnp.ones((1, 12, 12, 3))
    y = gaussian_blur(x, 5)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-5)  # DC preserved


def test_local_std_mask():
    flat = jnp.full((1, 20, 20, 1), 0.5)
    noisy = flat + _rng(1, 20, 20, 1) * 0.5
    w_flat = compute_local_std_mask(flat)
    w_noisy = compute_local_std_mask(noisy)
    assert float(w_flat.mean()) <= 0.1 + 1e-6      # min_weight floor
    assert float(w_noisy.mean()) > float(w_flat.mean())
    out = local_std_mask(noisy, noisy)
    assert out.shape == noisy.shape


def test_jaccard_index():
    a = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    assert jaccard_index(a, a) == 1.0
    b = jnp.zeros((1, 8, 8, 1))
    assert jaccard_index(b, b) == 1.0  # empty union => 1
    assert 0.0 <= jaccard_index(a, b) <= 1.0


def test_positional_seeding():
    m = PositionalSeeding(4, 8, 2)
    x = _rng(3, 4)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (3, 2, 2, 8)


def test_fusion():
    x, e = _rng(2, 4, 4, 3), _rng(2, 4, 4, 3)
    lerp = Lerp()
    p = lerp.init(jax.random.PRNGKey(0), x, e)
    # zero-init weight => t=0.5 midpoint
    np.testing.assert_allclose(np.asarray(lerp.apply(p, x, e)),
                               np.asarray((x + e) / 2), rtol=1e-5)
    add = AdaptiveWeightedAdd(n=2)
    p2 = add.init(jax.random.PRNGKey(0), x, e)
    np.testing.assert_allclose(np.asarray(add.apply(p2, x, e)),
                               np.asarray((x + e) / 2), rtol=1e-5)


def test_cross_mha():
    m = CrossMHA(16, 4)
    q, kv = _rng(2, 9, 16), _rng(2, 9, 16)
    params = m.init(jax.random.PRNGKey(0), q, kv)
    assert m.apply(params, q, kv).shape == (2, 9, 16)


def test_window_cross_mha2d():
    m = WindowCrossMHA2d(16, 4, (4, 4))
    x1, x2 = _rng(1, 8, 8, 16), _rng(1, 8, 8, 16)
    params = m.init(jax.random.PRNGKey(0), x1, x2)
    assert m.apply(params, x1, x2).shape == x1.shape


def test_window_spatial_reduction_mha2d():
    m = WindowSpatialReductionMHA2d(16, 4, (8, 8))
    x = _rng(1, 16, 16, 16)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


def test_overlap_window_mha2d():
    m = OverlapWindowMHA2d(16, 4, (4, 4))
    x = _rng(1, 8, 8, 16)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


def test_window_mha3d():
    m = WindowMHA3d(16, 4, (2, 4, 4), shift=(True, True, True))
    x = _rng(1, 4, 8, 8, 16)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


def test_window_gmlp3d():
    m = WindowGMLP3d(16, (2, 4, 4), shift=True)
    x = _rng(1, 4, 8, 8, 16)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


def test_alex11_loss():
    loss = alex11_loss()
    x = jnp.clip(_rng(1, 32, 32, 3) * 0.2 + 0.5, 0, 1)
    assert float(loss(x, x)) < 2e-3   # charbonnier eps floor
    y = jnp.clip(x + 0.3, 0, 1)
    assert float(loss(x, y)) > float(loss(x, x))


def test_flat_color_mask_and_loss():
    # left half flat, right half noise
    y = jnp.full((1, 16, 16, 3), 0.5)
    y = y.at[:, :, 8:].set(jnp.clip(_rng(1, 16, 8, 3) * 0.3 + 0.5, 0, 1))
    mask = get_flat_color_mask(y, size=8)
    assert float(mask[:, :, :8].mean()) == 1.0
    assert float(mask[:, :, 8:].mean()) == 0.0
    x = y + 0.1
    assert float(flat_color_loss(x, y)) > 0


def test_identity_weighted_loss():
    x, y = _rng(2, 4, 4, 1), _rng(2, 4, 4, 1)
    assert np.isclose(float(identity_loss()(x)), float(x.mean()))
    w = weighted_loss([l1_loss, l2_loss], [0.5, 2.0])
    expect = 0.5 * float(l1_loss(x, y)) + 2.0 * float(l2_loss(x, y))
    np.testing.assert_allclose(float(w(x, y)), expect, rtol=1e-6)


def test_lpips():
    from nunif_tpu.modules.lpips import LPIPS
    m = LPIPS()
    x = jnp.clip(_rng(1, 32, 32, 3) * 0.2 + 0.5, 0, 1)
    params = m.init(jax.random.PRNGKey(0), x, x, normalize=True)
    d_same = m.apply(params, x, x, normalize=True)
    assert d_same.shape == (1,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
    y = jnp.clip(x + 0.4, 0, 1)
    assert float(m.apply(params, x, y, normalize=True)[0]) > 0
