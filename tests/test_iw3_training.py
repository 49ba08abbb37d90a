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


def test_find_mapper_fits():
    """The grid fits recover the reference's published parameter tables
    (reference iw3/training/find_mapper.py:94-96, 124-126)."""
    from nunif_tpu.iw3.training.find_mapper import (
        fit_softplus_v1_to_v2, fit_softplus_to_hardplus, dump_curves,
    )
    r = fit_softplus_v1_to_v2(6.0, n_bias=50, n_scale=50)
    assert abs(r["bias"] - 0.5) < 0.05 and abs(r["scale"] - 12) < 1.0
    r = fit_softplus_to_hardplus(2.0, n_bias=200)
    assert abs(r["bias"] - 0.515) < 0.02  # reference table: mul_2 bias


def test_find_mapper_curve_dump(tmp_path):
    """headless CSV replacement for the reference's matplotlib checks"""
    from nunif_tpu.iw3.training.find_mapper import dump_curves
    out = dump_curves(["none", "mul_2"], path=str(tmp_path / "c.csv"), n=64)
    data = np.loadtxt(out, delimiter=",", skiprows=1)
    assert data.shape == (64, 3)
    assert np.all(np.diff(data[:, 2]) >= -1e-6)  # mapper is monotone


def test_count_mask(tmp_path):
    from nunif_tpu.iw3.training.sbs.count_mask import count_mask_ratio
    from PIL import Image
    import numpy as _np
    d = tmp_path / "masks"
    d.mkdir()
    m = _np.zeros((10, 10), _np.uint8)
    m[:2, :5] = 255  # 10 fg, 90 bg
    Image.fromarray(m).save(d / "a_ML.png")
    Image.fromarray(_np.zeros((10, 10), _np.uint8)).save(d / "b_ML.png")
    Image.fromarray(m).save(d / "ignored.png")  # wrong suffix: skipped
    bg, fg = count_mask_ratio(str(d), progress_every=0)
    assert fg == 10 and bg == 190


def test_sample_frames(tmp_path):
    from nunif_tpu.iw3.training.sample_frames import sample_frames, md5_name
    from nunif_tpu.video import backend
    if not backend.available():
        pytest.skip("native video backend unavailable")
    from tests.test_video import _make_video
    src = str(tmp_path / "in.mp4")
    _make_video(src, n_frames=24, fps=12)
    out = str(tmp_path / "frames")
    n = sample_frames(src, out, samples=6)
    files = sorted(os.listdir(out))
    assert n == len(files) and 4 <= n <= 8
    assert all(f.startswith(md5_name("in.mp4")) for f in files)
