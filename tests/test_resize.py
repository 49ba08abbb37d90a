"""Resize parity vs torch F.interpolate (reference semantics used throughout
waifu2x/iw3: swin_unet.py:253, antialiased_bicubic, depth preprocess)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nunif_tpu.modules.resize import resize, resize_matrix


@pytest.mark.parametrize("out_hw,mode,antialias", [
    ((74, 106), "bicubic", False),
    ((74, 106), "bilinear", False),
    ((18, 26), "bicubic", True),
    ((18, 26), "bilinear", True),
    ((100, 40), "bicubic", False),
    ((37, 53), "bicubic", True),  # identity
])
def test_resize_matches_torch(out_hw, mode, antialias):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 37, 53, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.interpolate(xt, size=out_hw, mode=mode,
                       align_corners=False, antialias=antialias).numpy()
    yj = np.asarray(resize(x, *out_hw, mode=mode, antialias=antialias))
    yj = yj.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(yt, yj, atol=1e-5)


def test_resize_matrix_rows_sum_to_one():
    for args in [(37, 74, "bicubic", False), (37, 18, "bicubic", True),
                 (128, 37, "lanczos", True), (64, 32, "box", True)]:
        m = resize_matrix(*args)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
