"""Waifu2x runtime tests (reference behavior: waifu2x/utils.py convert,
nunif/transforms/tta.py, nunif/utils/alpha.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunif_tpu.models import create_model, save_model
from nunif_tpu.transforms import tta_split, tta_merge
from nunif_tpu.utils.alpha import alpha_border_pad
from nunif_tpu.waifu2x.runtime import Waifu2x
import nunif_tpu.waifu2x  # noqa: F401

pytestmark = pytest.mark.slow


def test_tta_roundtrip_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(12, 10, 3)).astype(np.float32))
    parts = tta_split(x)
    assert len(parts) == 8
    merged = tta_merge(parts)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(x), atol=1e-6)


def test_alpha_border_pad_diffuses_color():
    rgb = np.zeros((8, 8, 3), np.float32)
    rgb[2:6, 2:6] = 1.0  # opaque white square
    alpha = np.zeros((8, 8, 1), np.float32)
    alpha[2:6, 2:6] = 1.0
    out = np.asarray(alpha_border_pad(jnp.asarray(rgb), jnp.asarray(alpha), 4))
    # transparent border pixels must now carry the white color
    assert out[0, 0, 0] > 0.9
    assert out[3, 3, 0] == pytest.approx(1.0)


def test_waifu2x_convert_with_alpha(tmp_path):
    model = create_model("waifu2x.upconv_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    w2x = Waifu2x(model_dir=str(tmp_path))
    w2x.set_slot("scale", None, model, params)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(40, 52, 3)).astype(np.float32)
    alpha = np.ones((40, 52, 1), np.float32)
    alpha[:10] = 0.0
    rgb, out_alpha = w2x.convert(x, alpha, method="scale", tile_size=64,
                                 batch_size=4)
    assert rgb.shape == (80, 104, 3)
    assert out_alpha.shape == (80, 104, 1)
    # transparent region stays transparent
    assert float(out_alpha[:18].max()) <= 0.6


def test_waifu2x_model_dir_loading(tmp_path):
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(1), (1, 32, 32, 3))
    save_model(model, params, os.path.join(tmp_path, "noise1.nztm"))
    w2x = Waifu2x(model_dir=str(tmp_path))
    assert w2x.has_model_file("noise", 1)
    assert not w2x.has_model_file("noise", 2)
    x = np.full((30, 30, 3), 0.5, np.float32)
    rgb, _ = w2x.convert(x, None, method="noise", noise_level=1, tile_size=48,
                         batch_size=2)
    assert rgb.shape == (30, 30, 3)


def test_waifu2x_tta_convert(tmp_path):
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(1), (1, 32, 32, 3))
    w2x = Waifu2x(model_dir=str(tmp_path))
    w2x.set_slot("noise", 0, model, params)
    x = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    rgb, _ = w2x.convert(x, None, method="noise", noise_level=0,
                         tile_size=48, batch_size=2, tta=True)
    assert rgb.shape == (32, 32, 3)


def test_shipped_turbo_checkpoint_beats_catrom():
    """The bundled models/waifu2x/turbo/scale2x.nztm is the repo's
    acceptance artifact (docs/waifu2x.md): it must load and beat the
    catrom baseline PSNR on eval-set images (the reference's acceptance
    protocol for a waifu2x model, reference waifu2x/docs/training.md:
    131-147)."""
    import os
    from nunif_tpu.waifu2x.runtime import default_model_dir
    from nunif_tpu.waifu2x.benchmark import _np_resize, psnr
    from nunif_tpu.waifu2x.training import generators as G
    from nunif_tpu.models.io import load_model
    from nunif_tpu.utils.tiling import TiledRenderer

    d = default_model_dir()
    if d is None or not os.path.exists(os.path.join(d, "scale2x.nztm")):
        pytest.skip("bundled checkpoint not present")
    model, params, _ = load_model(os.path.join(d, "scale2x.nztm"))
    renderer = TiledRenderer(model, params)

    # two eval-set members (tools/make_eval_set.py SPEC seeds)
    gains = []
    for fn, seed in ((G.gen_text_image, 900005), (G.gen_shapes, 900007)):
        hr = np.asarray(fn(size=128, seed=seed), np.float32)[..., :3] / 255.0
        lr = _np_resize(hr, 64, 64)
        sr = np.asarray(renderer.render(lr, tile_size=64, batch_size=1))
        up = _np_resize(lr, 128, 128, mode="catrom", antialias=False)
        gains.append(psnr(sr, hr) - psnr(up, hr))
    # mean gain over the sampled images must be clearly positive
    assert float(np.mean(gains)) > 0.1, gains
