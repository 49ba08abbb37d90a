"""cliqa: model shapes, patch extraction, predictors, filter CLI, training."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nunif_tpu.models import create_model
import nunif_tpu.cliqa  # noqa: F401
from nunif_tpu.cliqa.utils import (
    extract_patches, predict_jpeg_quality, predict_grain_noise_psnr,
    predict_resize_quality,
)


@pytest.fixture(scope="module")
def jpeg_model():
    m = create_model("cliqa.jpeg_quality")
    p = m.init_params(jax.random.PRNGKey(0), (1, 128, 128, 3))
    return m, p


class TestModels:
    @pytest.mark.slow
    def test_jpeg_quality_outputs(self, jpeg_model):
        m, p = jpeg_model
        q, s = m.apply_fn(p, jnp.zeros((2, 128, 128, 3)))
        assert q.shape == (2, 1) and s.shape == (2, 1)

    def test_single_output_models(self):
        for name in ("cliqa.grain_noise_level", "cliqa.scale_factor"):
            m = create_model(name)
            p = m.init_params(jax.random.PRNGKey(0), (1, 128, 128, 3))
            out = m.apply_fn(p, jnp.zeros((1, 128, 128, 3)))
            assert out.shape == (1, 1)


class TestPatches:
    def test_extract_topk_variance(self):
        im = np.zeros((256, 256, 3), np.float32)
        im[128:, 128:] = np.random.default_rng(0).uniform(
            size=(128, 128, 3)).astype(np.float32)
        patches = extract_patches(im, 1, patch_size=128)
        assert patches.shape == (1, 128, 128, 3)
        assert patches.std() > 0.1  # picked the noisy quadrant

    def test_small_image_padded(self):
        im = np.ones((64, 64, 3), np.float32) * 0.5
        patches = extract_patches(im, 4, patch_size=128)
        assert patches.shape == (1, 128, 128, 3)

    def test_predictors_run(self, jpeg_model):
        m, p = jpeg_model
        im = np.random.default_rng(1).uniform(
            size=(160, 160, 3)).astype(np.float32)
        q, sub = predict_jpeg_quality(m, p, im)
        assert 0 <= q <= 100 and 0 <= sub <= 1
        m2 = create_model("cliqa.grain_noise_level")
        p2 = m2.init_params(jax.random.PRNGKey(0), (1, 128, 128, 3))
        psnr = predict_grain_noise_psnr(m2, p2, im)
        assert 0 <= psnr <= 50
        m3 = create_model("cliqa.scale_factor")
        p3 = m3.init_params(jax.random.PRNGKey(0), (1, 128, 128, 3))
        rq = predict_resize_quality(m3, p3, im)
        assert isinstance(rq, int)


class TestFilterCLI:
    def test_filter_copies(self, tmp_path):
        from nunif_tpu.waifu2x.training.generators import gen_screentone
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        src.mkdir()
        for i in range(2):
            gen_screentone(160, seed=i).save(src / f"{i}.png")
        from nunif_tpu.cliqa.filter_cli import main
        # threshold -1e9 keeps everything even with random weights
        rc = main(["noise", "-i", str(src), "-o", str(dst),
                   "--filter", "-1000000000"])
        assert rc == 0
        assert len(os.listdir(dst)) == 2


class TestCliqaDataset:
    def test_targets(self):
        from nunif_tpu.cliqa.training import CliqaDataset
        for kind, tlen in (("jpeg", 2), ("noise", 1), ("resize", 1)):
            ds = CliqaDataset(None, kind, patch_size=64, num_samples=2,
                              synthetic_p=1.0)
            x, y = ds.sample_pair(0)
            assert x.shape == (64, 64, 3)
            assert y.shape == (tlen,)
        b = next(iter(ds.batches(2)))
        assert b["x"].shape == (2, 64, 64, 3)
