"""HaldCLUT -> .cube converter (reference iw3/player/haldclut2cube.py)."""
import numpy as np
from PIL import Image

from nunif_tpu.iw3.haldclut2cube import (
    parse_hald, resize_lut, save_cube, convert)


def _identity_hald(level=4):
    """Identity HaldCLUT image of the given level (grid = level^2)."""
    n = level * level                      # grid size
    side = level ** 3                      # square image side
    # red fastest, then green, then blue: row-major (b, g, r) stream
    stream = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                  indexing="ij"), axis=-1)  # (b, g, r, 3)=bgr
    rgb = np.stack([stream[..., 2], stream[..., 1], stream[..., 0]], -1)
    img = (rgb.reshape(side, side, 3) * (255.0 / (n - 1))).round()
    return img.astype(np.uint8)


def test_parse_identity_hald(tmp_path):
    img = _identity_hald(4)
    p = tmp_path / "identity.png"
    Image.fromarray(img).save(p)
    lut = parse_hald(str(p))
    assert lut.shape == (16, 16, 16, 3)
    # identity: lut[b, g, r] == (r, g, b) / (n-1)
    n = 16
    idx = np.arange(n) / (n - 1)
    np.testing.assert_allclose(lut[0, 0, :, 0], idx, atol=1 / 255)
    np.testing.assert_allclose(lut[0, :, 0, 1], idx, atol=1 / 255)
    np.testing.assert_allclose(lut[:, 0, 0, 2], idx, atol=1 / 255)


def test_resize_identity_stays_identity():
    n = 16
    r, g, b = np.meshgrid(*([np.arange(n) / (n - 1)] * 3), indexing="ij")
    lut = np.stack([b, g, r], axis=-1).astype(np.float32)  # [B][G][R]->rgb
    out = resize_lut(lut, 33)
    # trilinear resampling of a linear lattice is exact
    i = np.arange(33) / 32.0
    np.testing.assert_allclose(out[0, 0, :, 0], i, atol=1e-6)
    np.testing.assert_allclose(out[:, 0, 0, 2], i, atol=1e-6)


def test_resize_matches_8corner_stencil():
    rng = np.random.default_rng(0)
    lut = rng.uniform(size=(9, 9, 9, 3)).astype(np.float32)
    out = resize_lut(lut, 17)
    # direct 8-corner trilinear at a few probe points
    pos = np.linspace(0, 8, 17)
    for bi in (3, 10):
        for gi in (0, 7):
            for ri in (5, 16):
                pb, pg, pr = pos[bi], pos[gi], pos[ri]
                b0, g0, r0 = (min(int(np.floor(v)), 7) for v in (pb, pg, pr))
                wb, wg, wr = pb - b0, pg - g0, pr - r0
                acc = np.zeros(3)
                for db in (0, 1):
                    for dg in (0, 1):
                        for dr in (0, 1):
                            w = ((wb if db else 1 - wb)
                                 * (wg if dg else 1 - wg)
                                 * (wr if dr else 1 - wr))
                            acc += w * lut[b0 + db, g0 + dg, r0 + dr]
                np.testing.assert_allclose(out[bi, gi, ri], acc, atol=1e-5)


def test_cube_file_format(tmp_path):
    img = _identity_hald(4)
    p = tmp_path / "film.png"
    Image.fromarray(img).save(p)
    out = convert(str(p), str(tmp_path), size=5)
    lines = open(out).read().splitlines()
    assert lines[1] == 'TITLE "film"'
    assert lines[2] == "LUT_3D_SIZE 5"
    body = [ln for ln in lines if ln and not ln.startswith(("#", "TITLE",
                                                            "LUT"))]
    assert len(body) == 5 ** 3
    # red fastest: first 5 rows ramp red, constant g/b
    vals = np.array([[float(v) for v in ln.split()] for ln in body[:5]])
    assert np.all(np.diff(vals[:, 0]) > 0.1)
    np.testing.assert_allclose(vals[:, 1], vals[0, 1], atol=1 / 50)


def test_save_cube_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    lut = rng.uniform(size=(4, 4, 4, 3)).astype(np.float32)
    path = tmp_path / "x.cube"
    save_cube(lut, str(path), "x")
    body = [ln for ln in open(path).read().splitlines()
            if ln and not ln.startswith(("#", "TITLE", "LUT"))]
    back = np.array([[float(v) for v in ln.split()] for ln in body],
                    np.float32).reshape(4, 4, 4, 3)
    np.testing.assert_allclose(back, lut, atol=1e-6)
