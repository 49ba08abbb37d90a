"""diff-augment, pair transforms, cutmix/mixup, perlin, rgb noise,
ImageLoader."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from nunif_tpu.transforms.diff_augment import (
    diff_translate, diff_pair_random_translate, diff_pair_random_rotate,
    diff_pair_random_downsample,
)
from nunif_tpu.transforms.pair import (
    RandomCrop, CenterCrop, RandomHardExampleCrop, RandomFlip, Compose,
)
from nunif_tpu.transforms.mix import mixup, cutmix
from nunif_tpu.utils.perlin2d import (
    generate_perlin_noise_2d, generate_fractal_noise_2d,
)
from nunif_tpu.utils.rgb_noise import rgb_noise_like, apply_rgb_noise


def test_diff_translate_exact():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = diff_translate(x, jnp.asarray([1]), jnp.asarray([0]))
    # shifted right by 1, left column zero-filled
    np.testing.assert_allclose(np.asarray(y[0, 0, :, 0]), [0, 0, 1, 2])
    y2 = diff_translate(x, jnp.asarray([0]), jnp.asarray([-1]))
    np.testing.assert_allclose(np.asarray(y2[0, -1, :, 0]), [0, 0, 0, 0])


def test_diff_pair_same_transform():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    xt, yt = diff_pair_random_translate(key, x, x)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(yt))
    xr, yr = diff_pair_random_rotate(key, x, x)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(yr))
    xd, yd = diff_pair_random_downsample(key, x, x)
    np.testing.assert_allclose(np.asarray(xd), np.asarray(yd))
    assert xd.shape == x.shape  # static shape restored


def test_diff_rotate_grad_flows():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 8, 8, 1))

    def f(x):
        a, _ = diff_pair_random_rotate(key, x, x)
        return jnp.sum(a ** 2)

    g = jax.grad(f)(x)
    assert bool(jnp.any(g != 0))


def test_pair_crops():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    y2 = np.repeat(np.repeat(x, 2, 0), 2, 1)  # 2x target
    xc, yc = RandomCrop(16, y_offset=4, y_scale=2)(rng, x, y2)
    assert xc.shape == (16, 16, 3)
    assert yc.shape == (16 * 2 - 8, 16 * 2 - 8, 3)
    xc, yc = CenterCrop(16)(rng, x, x)
    assert xc.shape == yc.shape == (16, 16, 3)
    xc, yc = RandomHardExampleCrop(8)(rng, x, x + 0.1)
    assert xc.shape == (8, 8, 3)
    xf, yf = RandomFlip()(rng, x, x)
    np.testing.assert_allclose(xf, yf)
    xc, yc = Compose([RandomCrop(16), RandomFlip()])(rng, x, x)
    np.testing.assert_allclose(xc, yc)


def test_mixup_cutmix():
    rng = np.random.default_rng(0)
    a = np.zeros((4, 8, 8, 3), np.float32)
    b = np.ones((4, 8, 8, 3), np.float32)
    m = mixup(rng, a, b, alpha=0.25)
    np.testing.assert_allclose(m, 0.25)
    c = cutmix(rng, a, b, mask_min=0.3, mask_max=0.5)
    frac = c.mean()
    assert 0.02 < frac < 0.5  # a rectangle of ones pasted
    assert set(np.unique(c)) <= {0.0, 1.0}


def test_perlin():
    key = jax.random.PRNGKey(0)
    n = generate_perlin_noise_2d(key, (32, 32), (4, 4))
    assert n.shape == (32, 32)
    assert float(jnp.abs(n).max()) <= 1.5
    assert float(n.std()) > 0.05
    f = generate_fractal_noise_2d(key, (32, 32), (2, 2), octaves=3)
    assert f.shape == (32, 32)
    # tileable: wrap columns match
    t = generate_perlin_noise_2d(key, (32, 32), (4, 4), tileable=(True, True))
    assert t.shape == (32, 32)


def test_rgb_noise():
    key = jax.random.PRNGKey(0)
    rgb = jnp.full((1, 16, 16, 3), 0.5)
    noise = rgb_noise_like(key, rgb, level=2)
    assert noise.shape == rgb.shape
    out = apply_rgb_noise(rgb, noise, strength=0.2)
    assert out.shape == rgb.shape
    assert bool(jnp.all((out >= 0) & (out <= 1)))
    assert float(jnp.abs(out - rgb).mean()) > 1e-4  # grain applied
    # light decay attenuates grain on bright pixels vs decay disabled
    bright = jnp.full((1, 16, 16, 3), 0.9)
    with_decay = jnp.abs(apply_rgb_noise(bright, noise,
                                         light_decay=True) - bright).mean()
    no_decay = jnp.abs(apply_rgb_noise(bright, noise,
                                       light_decay=False) - bright).mean()
    assert float(no_decay) > float(with_decay)


def test_image_loader(tmp_path):
    from PIL import Image
    from nunif_tpu.utils.image_loader import ImageLoader, list_images
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.uniform(size=(8, 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"im{i}.png")
    (tmp_path / "skip.txt").write_text("not an image")
    files = list_images(str(tmp_path))
    assert len(files) == 5
    loader = ImageLoader(directory=str(tmp_path))
    items = list(loader)
    assert len(items) == 5
    x, meta = items[0]
    assert x.shape == (8, 8, 3)
    # broken file tolerated
    (tmp_path / "bad.png").write_bytes(b"broken")
    items2 = list(ImageLoader(directory=str(tmp_path)))
    assert len(items2) == 6
    assert sum(1 for x, m in items2 if x is None) == 1


class TestDownloader:
    """reference nunif/utils/downloader.py:10 (file:// URLs in tests)."""

    def test_download_file_and_checksum(self, tmp_path):
        import hashlib
        from nunif_tpu.utils.downloader import download_file, DownloadError
        src = tmp_path / "src.bin"
        src.write_bytes(b"hello nunif" * 100)
        url = src.as_uri()
        dst = str(tmp_path / "out" / "dst.bin")
        good = hashlib.sha256(src.read_bytes()).hexdigest()
        seen = []
        download_file(url, dst, progress_callback=lambda d, t: seen.append(d),
                      sha256=good)
        assert open(dst, "rb").read() == src.read_bytes()
        assert seen and seen[-1] == len(src.read_bytes())
        import pytest as _pytest
        with _pytest.raises(DownloadError):
            download_file(url, str(tmp_path / "bad.bin"), sha256="0" * 64)
        assert not (tmp_path / "bad.bin").exists()

    def test_archive_downloader_versioned(self, tmp_path):
        import zipfile
        from nunif_tpu.utils.downloader import ArchiveDownloader
        zpath = tmp_path / "models.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("m/a.nztm", b"AAA")
            z.writestr("m/b.nztm", b"BBB")
        d = ArchiveDownloader(str(tmp_path / "cache"))
        out = d.get_extracted(zpath.as_uri(), version="3")
        assert open(os.path.join(out, "m", "a.nztm"), "rb").read() == b"AAA"
        # version stamp short-circuits re-extract
        os.unlink(os.path.join(out, "m", "a.nztm"))
        out2 = d.get_extracted(zpath.as_uri(), version="3")
        assert not os.path.exists(os.path.join(out2, "m", "a.nztm"))
        # bumped version re-extracts
        d.get_extracted(zpath.as_uri(), version="4")
        assert os.path.exists(os.path.join(out, "m", "a.nztm"))

    def test_zip_slip_rejected(self, tmp_path):
        import zipfile
        import pytest as _pytest
        from nunif_tpu.utils.downloader import ArchiveDownloader, DownloadError
        zpath = tmp_path / "evil.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("../evil.txt", b"x")
        d = ArchiveDownloader(str(tmp_path / "cache2"))
        with _pytest.raises(DownloadError):
            d.get_extracted(zpath.as_uri(), version="1")
