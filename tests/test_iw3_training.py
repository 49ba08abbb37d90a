"""iw3 training addons: inpaint (recon + masked GAN), sod, depth_aa,
da3mono — one tiny epoch each."""
import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def _base_args(tmp_path, **kw):
    d = dict(model_dir=str(tmp_path / "models"), data_dir=str(tmp_path / "d"),
             max_epoch=1, optimizer="adam", learning_rate=1e-4,
             scheduler="none", seed=71, resume=False, ema_decay=None,
             batch_size=2, num_samples=4)
    d.update(kw)
    return argparse.Namespace(**d)


def test_inpaint_dataset():
    from nunif_tpu.iw3.training.inpaint.dataset import (
        InpaintDataset, VideoInpaintDataset, make_hole_mask,
    )
    rng = np.random.default_rng(0)
    m = make_hole_mask(rng, 64)
    assert m.shape == (64, 64, 1)
    assert 0 < m.mean() < 0.9
    ds = InpaintDataset(None, size=48, num_samples=4)
    b = next(iter(ds.batches(2)))
    assert b["y"].shape == (2, 48, 48, 3)
    assert b["mask"].shape == (2, 48, 48, 1)
    vds = VideoInpaintDataset(None, size=48, num_samples=2, seq_len=12)
    vb = next(iter(vds.batches()))
    assert vb["y"].shape == (12, 48, 48, 3)


def test_inpaint_train_recon(tmp_path):
    from nunif_tpu.iw3.training.inpaint.trainer import train_main
    args = _base_args(tmp_path, arch="inpaint.light_inpaint_v1", size=64,
                      discriminator=None, discriminator_weight=1.0,
                      generator_start_step=0)
    assert train_main(args) == 0
    assert any(f.endswith(".nztm") for f in os.listdir(args.model_dir))


def test_inpaint_train_gan(tmp_path):
    from nunif_tpu.iw3.training.inpaint.trainer import train_main
    args = _base_args(tmp_path, arch="inpaint.light_inpaint_v1", size=64,
                      discriminator="ffc", discriminator_weight=1.0,
                      generator_start_step=0)
    assert train_main(args) == 0


def test_ffc_discriminator_mask_output():
    from nunif_tpu.iw3.models.discriminator import FFCDiscriminator
    d = FFCDiscriminator()
    x = jnp.zeros((1, 96, 96, 3))
    mask = jnp.zeros((1, 96, 96, 1)).at[:, 16:32, 16:32].set(1.0)
    params = d.init(jax.random.PRNGKey(0), x, mask=mask)["params"]
    logits, mgrid = d.apply_fn(params, x, mask=mask)
    assert logits.shape == mgrid.shape
    assert bool(mgrid.any()) and not bool(mgrid.all())
    # no mask -> logits only
    out = d.apply_fn(params, x)
    assert out.shape == logits.shape


def test_l3c_discriminator():
    from nunif_tpu.iw3.models.discriminator import (
        InpaintL3ConditionalDiscriminator,
    )
    d = InpaintL3ConditionalDiscriminator()
    x = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64, 1)).at[:, :8].set(1.0)
    params = d.init(jax.random.PRNGKey(0), x, c=x, mask=mask)["params"]
    logits, mgrid = d.apply_fn(params, x, c=x, mask=mask)
    assert logits.shape == mgrid.shape


def test_mask_hinge_loss():
    from nunif_tpu.modules.losses import (
        gan_mask_hinge_loss_d, gan_mask_hinge_loss_g,
    )
    real = jnp.full((1, 4, 4, 1), 2.0)
    fake = jnp.full((1, 4, 4, 1), -2.0)
    mask = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
    # perfectly separated -> zero hinge loss
    np.testing.assert_allclose(
        float(gan_mask_hinge_loss_d(real, fake, mask)), 0.0, atol=1e-6)
    assert float(gan_mask_hinge_loss_g(fake, mask)) > 0


def test_sod_train(tmp_path):
    from nunif_tpu.iw3.training.sod import train_main
    args = _base_args(tmp_path, size=64)
    assert train_main(args) == 0


def test_depth_aa_train(tmp_path):
    from nunif_tpu.iw3.training.depth_aa import train_main
    args = _base_args(tmp_path, size=64, loss="l1")
    assert train_main(args) == 0


def test_da3mono_train_and_benchmark(tmp_path):
    from nunif_tpu.iw3.training.da3mono import train_main, benchmark_main
    args = _base_args(tmp_path, size=64)
    assert train_main(args) == 0
    score = benchmark_main(size=64, n=4)
    assert np.isfinite(score)


def test_addons_registered():
    from nunif_tpu.addon import load_addons
    mods = [m.__name__ for m, _fn in load_addons("train")]
    for name in ("inpaint", "sod", "depth_aa", "da3mono"):
        assert any(name in m for m in mods), (name, mods)
