"""waifu2x training pipeline: degradations, generators, dataset, criterion,
end-to-end tiny fit, benchmark math."""
import os

import numpy as np
import pytest
from PIL import Image

from nunif_tpu.waifu2x.training.degrade import (
    RandomDownscale, RandomJPEGNoise, add_jpeg_noise, choose_jpeg_quality,
)
from nunif_tpu.waifu2x.training.generators import (
    gen_screentone, gen_dot_grid, gen_text_image,
)
from nunif_tpu.waifu2x.training.dataset import Waifu2xDataset

pytestmark = pytest.mark.slow


class TestDegrade:
    def test_jpeg_quality_tables(self):
        import random
        random.seed(0)
        for style in ("art", "photo"):
            for lv in (0, 1, 2, 3):
                for _ in range(20):
                    qs = choose_jpeg_quality(style, lv)
                    assert len(qs) >= 1
                    assert all(1 <= q <= 98 for q in qs), (style, lv, qs)

    def test_add_jpeg_noise_degrades(self):
        im = gen_screentone(128, seed=3)
        noisy = add_jpeg_noise(im, 30, "4:2:0")
        a = np.asarray(im, np.float32)
        b = np.asarray(noisy, np.float32)
        assert np.abs(a - b).mean() > 0.5  # visible artifacts
        assert noisy.size == im.size

    def test_random_downscale(self):
        im = gen_dot_grid(128, seed=5)
        for sf in (2, 4):
            d = RandomDownscale(sf)
            x, y = d(im, im)
            assert x.size == (128 // sf, 128 // sf)
            assert y.size == (128, 128)

    def test_random_jpeg_noise_keeps_size(self):
        import random
        random.seed(1)
        im = gen_text_image(64, seed=7)
        j = RandomJPEGNoise("art", 3)
        x, y = j(im, im)
        assert x.size == im.size


class TestGenerators:
    @pytest.mark.parametrize("fn", [gen_screentone, gen_dot_grid,
                                    gen_text_image])
    def test_deterministic_and_rgb(self, fn):
        a = fn(96, seed=11)
        b = fn(96, seed=11)
        assert a.mode == "RGB" and a.size == (96, 96)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # non-constant image
        assert np.asarray(a).std() > 1.0


class TestDataset:
    def test_shapes_and_offset(self):
        ds = Waifu2xDataset(None, model_offset=14, scale_factor=2,
                            tile_size=32, noise_level=1, style="art",
                            synthetic_p=1.0, num_samples=8)
        x, y = ds.sample_pair(0)
        assert x.shape == (32, 32, 3)
        assert y.shape == (64 - 28, 64 - 28, 3)
        assert 0.0 <= x.min() and x.max() <= 1.0

    def test_batches(self):
        ds = Waifu2xDataset(None, model_offset=0, scale_factor=1,
                            tile_size=24, synthetic_p=1.0, num_samples=12)
        batches = list(ds.batches(4, n_threads=2))
        assert len(batches) == 3
        assert batches[0]["x"].shape == (4, 24, 24, 3)
        assert batches[0]["y"].shape == (4, 24, 24, 3)

    def test_file_dataset(self, tmp_path):
        for i in range(2):
            gen_screentone(96, seed=i).save(tmp_path / f"{i}.png")
        ds = Waifu2xDataset(str(tmp_path), model_offset=0, scale_factor=2,
                            tile_size=32, num_samples=4)
        x, y = ds.sample_pair(0)
        assert x.shape == (32, 32, 3) and y.shape == (64, 64, 3)


class TestCriterion:
    def test_all_losses_compute(self):
        import jax.numpy as jnp
        from nunif_tpu.waifu2x.training.trainer import create_criterion
        x = jnp.ones((1, 16, 16, 3)) * 0.6
        y = jnp.ones((1, 16, 16, 3)) * 0.5
        for name in ["l1", "y_l1", "charbonnier", "y_charbonnier", "lbp",
                     "lbp5", "lbpm", "lbp5m", "yrgb_lbp", "yrgb_lbp5",
                     "yrgb_l1lbp", "yrgb_l1lbp5", "yrgb_flatlbp5",
                     "alex11", "y_l1fftgrad", "dct", "dctir24", "fft",
                     "ident"]:
            v = float(create_criterion(name)(x, y))
            assert np.isfinite(v) and v >= 0, name
        for name in ["aux_lbp", "aux_charbonnier", "aux_y_charbonnier",
                     "aux_alex11", "aux_lbp_ident"]:
            aux = create_criterion(name)((x, x), y)
            assert np.isfinite(float(aux)), name

    def test_rng_losses_compute(self):
        # dctirm randomly rotates/translates each step (reference _dctirm)
        import jax
        import jax.numpy as jnp
        from nunif_tpu.waifu2x.training.trainer import create_criterion
        x = jnp.linspace(0, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
        fn = create_criterion("dctirm")
        assert getattr(fn, "needs_rng", False)
        v1 = float(fn(x, x + 0.02, rng=jax.random.PRNGKey(0)))
        v2 = float(fn(x, x + 0.02, rng=jax.random.PRNGKey(7)))
        assert np.isfinite(v1) and np.isfinite(v2) and v1 > 0

    @pytest.mark.slow
    def test_feature_net_losses_compute(self):
        # LPIPS / DINOv2 / L4SN feature criteria (random-init trunks)
        import jax.numpy as jnp
        from nunif_tpu.waifu2x.training.trainer import create_criterion
        x = jnp.linspace(0, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
        y = x + 0.01
        for name in ["l1lpips", "l1dinov2", "l1l4sn"]:
            v = float(create_criterion(name)(x, y))
            assert np.isfinite(v) and v > 0, name

    def test_full_reference_loss_table_present(self):
        # every key of the reference LOSS_FUNCTIONS table
        # (reference waifu2x/training/trainer.py:67-117) must resolve
        from nunif_tpu.waifu2x.training.trainer import create_criterion
        names = ["l1", "y_l1", "charbonnier", "y_charbonnier",
                 "lbp", "lbpm", "lbp5", "lbp5m",
                 "yrgb_l1lbp5", "yrgb_l1lbp", "yrgb_flatlbp5",
                 "yrgb_lbp5", "yrgb_lbp", "alex11", "y_l1fftgrad",
                 "dct", "dctirm", "dctir24",
                 "aux_lbp", "aux_alex11", "aux_charbonnier",
                 "aux_y_charbonnier",
                 "l1lpips", "l1lpips_std_mask", "l1lpips_dct24",
                 "l1dinov2", "l1dinov2_10", "yrgb_lbp_dinov2",
                 "l1l4sn", "l1l4sn2", "l1l4sn_swd",
                 "aux_lbp_ident", "ident", "fft"]
        import nunif_tpu.waifu2x.training.trainer as T
        src = open(T.__file__).read()
        for name in names:
            assert f'"{name}"' in src, name

    def test_unknown_loss(self):
        from nunif_tpu.waifu2x.training.trainer import create_criterion
        with pytest.raises(ValueError):
            create_criterion("bogus")


class TestTrainEndToEnd:
    def test_tiny_fit_improves_and_exports(self, tmp_path):
        import argparse
        from nunif_tpu.waifu2x.training.trainer import Waifu2xTrainerApp
        args = argparse.Namespace(
            arch="waifu2x.vgg_7", style="art", noise_level=-1, size=64,
            loss=None, synthetic_p=1.0, da_unsharpmask_p=0,
            da_grayscale_p=0, bicubic_only=False, deblur=0,
            data_dir=None, model_dir=str(tmp_path), batch_size=4,
            num_samples=16, max_epoch=2, optimizer="adam",
            learning_rate=2e-4, weight_decay=0.0, scheduler="none",
            backward_steps=1, ema_decay=None, num_workers=2, seed=71,
            resume=False)
        app = Waifu2xTrainerApp(args)
        trainer = app.fit()
        exported = [f for f in os.listdir(tmp_path) if f.endswith(".nztm")]
        assert exported
        from nunif_tpu.models.io import load_model
        m, params, meta = load_model(str(tmp_path / exported[0]))
        assert m.model_name == "waifu2x.vgg_7"


class TestBenchmarkMath:
    def test_psnr(self):
        from nunif_tpu.waifu2x.benchmark import psnr, y_psnr
        a = np.zeros((8, 8, 3), np.float32)
        b = np.full((8, 8, 3), 0.1, np.float32)
        assert abs(psnr(a, b) - 20.0) < 1e-3
        assert psnr(a, a) > 90
        assert y_psnr(a, b) > 0
