"""Loss library tests (reference semantics: nunif/modules/*_loss.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunif_tpu.modules import losses as L


def _pair(shape=(2, 16, 16, 3), seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=shape).astype(np.float32)
    y = rng.uniform(size=shape).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_charbonnier_close_to_l1():
    x, y = _pair()
    c = float(L.charbonnier_loss(x, y, eps=1e-6))
    l = float(L.l1_loss(x, y))
    assert abs(c - l) < 1e-3


def test_psnr_identity_and_noise():
    x, _ = _pair()
    assert float(L.psnr(x, x)) == pytest.approx(-60.0, abs=0.1)  # mse=0 -> -10*log10(1e6)
    noisy = jnp.clip(x + 0.1, 0, 1)
    assert float(L.psnr(x, noisy)) > float(L.psnr(x, x))


def test_luminance_psnr_matches_reference_weights():
    x, y = _pair()
    w = jnp.asarray(L.LUMINANCE_WEIGHT)
    xl = jnp.sum(x * w, -1, keepdims=True)
    yl = jnp.sum(y * w, -1, keepdims=True)
    mse = jnp.mean((xl - yl) ** 2)
    expect = -10 * jnp.log10(1 / (mse + 1e-6))
    assert float(L.luminance_psnr(x, y)) == pytest.approx(float(expect), abs=1e-5)


def test_clamp_loss_combinator():
    x, y = _pair()
    f = L.clamp_loss_of(L.l1_loss)
    # in-range values: clamp is identity -> loss = l1 * (1 + eta)
    expect = float(L.l1_loss(x, y)) * 1.001
    assert float(f(x, y)) == pytest.approx(expect, rel=1e-5)


def test_channel_weighted():
    x, y = _pair()
    f = L.luminance_weighted(L.l1_loss)
    manual = sum(float(L.l1_loss(x[..., i:i+1], y[..., i:i+1])) * w
                 for i, w in enumerate(L.LUMINANCE_WEIGHT))
    assert float(f(x, y)) == pytest.approx(manual, rel=1e-5)


def test_dct2_is_orthonormal():
    x, _ = _pair((1, 8, 8, 1))
    y = L.dct2(x)
    # Parseval: energy preserved
    assert float(jnp.sum(x ** 2)) == pytest.approx(float(jnp.sum(y ** 2)), rel=1e-4)


def test_dct2_matches_scipy():
    from scipy.fft import dctn
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(8, 8)).astype(np.float32)
    ref = dctn(x, type=2, norm="ortho")
    got = np.asarray(L.dct2(jnp.asarray(x)[None, :, :, None]))[0, :, :, 0]
    np.testing.assert_allclose(ref, got, atol=1e-5)


def test_lbp_loss_zero_for_identical():
    x, _ = _pair()
    f = L.lbp_loss(in_channels=1)
    v = float(f(x[..., :1], x[..., :1]))
    # charbonnier floor is eps=1e-3
    assert v == pytest.approx(1e-3, rel=0.01)


def test_ylbp_runs_and_decreases_for_similar():
    x, y = _pair()
    f = L.ylbp_loss()
    far = float(f(x, y))
    near = float(f(x, x * 0.99 + y * 0.01))
    assert near < far


def test_gan_losses():
    logits = jnp.asarray([1.0, -1.0])
    assert float(L.gan_hinge_loss_g(logits)) == pytest.approx(0.0, abs=1e-6)
    d = float(L.gan_hinge_loss_d(jnp.asarray([2.0]), jnp.asarray([-2.0])))
    assert d == pytest.approx(0.0, abs=1e-6)
    bce = float(L.gan_bce_loss(jnp.asarray([0.0]), True))
    assert bce == pytest.approx(np.log(2), rel=1e-4)


def test_r1_regularization():
    def disc(params, x):
        return jnp.sum(x * params["w"], axis=(1, 2, 3))
    params = {"w": jnp.ones((1, 4, 4, 1)) * 2.0}
    x = jnp.zeros((3, 4, 4, 1))
    # grad wrt x = w everywhere -> ||g||^2 = 16*4 = 64; 0.5*10*64 = 320
    v = float(L.r1_regularization(disc, params, x, gamma=10.0))
    assert v == pytest.approx(320.0, rel=1e-5)


def test_auxiliary_and_multiscale():
    x, y = _pair()
    aux = L.auxiliary_loss([L.l1_loss, L.l1_loss], [1.0, 0.5])
    v = float(aux((x, x), y))
    assert v == pytest.approx(1.5 * float(L.l1_loss(x, y)), rel=1e-5)
    ms = L.multiscale_loss(L.l1_loss, scale_factors=(1, 2))
    assert float(ms(x, y)) > 0
