"""Tests for aux tools: gen_test_video, downscaling_test, inpaint benchmark,
find_mask_threshold (reference: stlizer/training/gen_test_video.py,
waifu2x/training/downscaling_test.py, iw3/training/inpaint/benchmark.py,
iw3/training/sbs/find_mask_threshold.py)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def _png(path, h=96, w=128, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    Image.fromarray((rng.uniform(size=(h, w, 3)) * 255).astype(
        np.uint8)).save(path)
    return path


class TestGenTestVideo:
    def test_trajectory_properties(self):
        from nunif_tpu.stlizer.gen_test_video import make_shake_trajectory
        tx, ty, ang = make_shake_trajectory(100, noise_scale=10.0, seed=1)
        assert tx.shape == (100,) and ty.shape == (100,)
        assert np.abs(tx).max() < 100 and np.std(tx) > 0.5
        # rotation in radians, small
        assert np.abs(ang).max() < 0.1
        tx2, _, _ = make_shake_trajectory(100, noise_scale=10.0, shift=False)
        assert np.allclose(tx2, 0)

    def test_generate_and_stabilize_smoke(self, tmp_path):
        from nunif_tpu.stlizer.gen_test_video import generate_shaky_video
        src = _png(str(tmp_path / "s.png"))
        out = str(tmp_path / "shaky.mp4")
        n, (tx, ty, ang) = generate_shaky_video(
            src, out, seconds_per_image=1.0, fps=8, noise_scale=6.0)
        assert n == 8 and os.path.exists(out)
        from nunif_tpu.video import backend
        r = backend.VideoReader(out)
        assert (r.width, r.height) == (128, 96)
        r.close()


class TestDownscalingTest:
    def test_variants(self, tmp_path):
        from nunif_tpu.waifu2x.training.downscaling_test import (
            downscale_variants, VARIANTS)
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        got = list(downscale_variants(x, scale=2))
        assert len(got) == len(VARIANTS)
        for name, lo, p in got:
            assert lo.shape == (32, 32, 3)
            assert 5.0 < p < 60.0

    def test_cli(self, tmp_path):
        from nunif_tpu.waifu2x.training.downscaling_test import main
        src = _png(str(tmp_path / "img.png"), 64, 64)
        out = str(tmp_path / "out")
        assert main(["-i", src, "-o", out]) == 0
        assert len(os.listdir(out)) >= 8


class TestInpaintBenchmark:
    def test_masked_psnr(self):
        from nunif_tpu.iw3.training.inpaint.benchmark import masked_psnr
        y = jnp.ones((2, 16, 16, 3)) * 0.5
        mask = jnp.zeros((2, 16, 16, 1)).at[:, 4:8, 4:8].set(1.0)
        # perfect prediction inside holes -> very high PSNR
        p = masked_psnr(y, y, mask)
        assert p.shape == (2,) and float(p.min()) > 50
        # half-gray error only inside holes
        bad = y.at[:, 4:8, 4:8, :].add(0.5)
        p2 = masked_psnr(bad, y, mask)
        assert float(p2.max()) < 10

    def test_benchmark_random_init(self):
        from nunif_tpu.iw3.training.inpaint.benchmark import benchmark_main
        r = benchmark_main(num_samples=4, batch_size=2, size=64)
        assert "masked_psnr" in r and np.isfinite(r["masked_psnr"])


class TestFindMaskThreshold:
    def test_sweep_with_random_model(self, tmp_path):
        from nunif_tpu.models import create_model
        from nunif_tpu.models.io import save_model
        from nunif_tpu.iw3.backward_warp import make_input_tensor
        import nunif_tpu.iw3.models  # noqa: F401
        model = create_model("sbs.mask_mlbw_l2")
        x = make_input_tensor(jnp.zeros((1, 64, 64, 3)),
                              jnp.zeros((1, 64, 64, 1)), 2.0, 0.5, 64)
        params = model.init(jax.random.PRNGKey(0), x, train=False)["params"]
        ckpt = str(tmp_path / "mask.nztm")
        save_model(model, params, ckpt)

        rgb_dir = tmp_path / "rgb"
        dep_dir = tmp_path / "depth"
        rgb_dir.mkdir()
        dep_dir.mkdir()
        _png(str(rgb_dir / "0001.png"), 64, 64)
        # smooth depth ramp
        from PIL import Image
        d = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
        Image.fromarray(d, mode="L").save(dep_dir / "0001.png")

        from nunif_tpu.iw3.training.sbs.find_mask_threshold import sweep
        scores = sweep(str(rgb_dir), str(dep_dir), ckpt,
                       thresholds=(0.3, 0.5))
        assert set(scores) == {0.3, 0.5}
        for v in scores.values():
            assert 0.0 <= v <= 1.0

    def test_forward_nonwarp_mask_has_holes(self):
        from nunif_tpu.iw3.training.sbs.find_mask_threshold import (
            forward_nonwarp_mask)
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.uniform(size=(1, 64, 192, 3)), jnp.float32)
        # step edge in depth -> disocclusion wider than a pixel
        # (divergence 10 on 192px -> ~9.6px shift at the step)
        depth = jnp.zeros((1, 64, 192, 1)).at[:, :, 96:, :].set(1.0)
        m = forward_nonwarp_mask(rgb, depth, divergence=10.0)
        assert float(m.sum()) > 0


def test_make_eval_set_deterministic(tmp_path):
    """tools/make_eval_set.py materializes the same 10 images every run
    (the docs/waifu2x.md quality table is measured on this set)."""
    import subprocess
    import sys
    import hashlib
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "tools", "make_eval_set.py")
    digests = []
    for sub in ("a", "b"):
        out = tmp_path / sub
        subprocess.run([sys.executable, script, "-o", str(out),
                        "--size", "64"], check=True, cwd=root)
        files = sorted(os.listdir(out))
        assert len(files) == 10
        digests.append([hashlib.md5((out / f).read_bytes()).hexdigest()
                        for f in files])
    assert digests[0] == digests[1]
