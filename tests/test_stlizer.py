"""stlizer + SuperPoint: transform recovery, warp inverse, smoothing,
scene weight, cache, end-to-end smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nunif_tpu.utils.superpoint import (
    SuperPoint, find_match_index, find_transform, apply_transform,
    batched_nms,
)
from nunif_tpu.stlizer.pipeline import (
    calc_scene_weight, gaussian_kernel1d, smooth1d, smooth_trajectory,
)

pytestmark = pytest.mark.slow


class TestFindTransform:
    def test_recovers_shift_and_rotation(self):
        rng = np.random.default_rng(0)
        K = 64
        pts = rng.uniform(20, 300, size=(1, K, 2)).astype(np.float32)
        center = np.array([[160.0, 160.0]], np.float32).reshape(1, 1, 2)
        angle = np.radians(3.0)
        R = np.array([[np.cos(angle), -np.sin(angle)],
                      [np.sin(angle), np.cos(angle)]], np.float32)
        shift = np.array([5.0, -3.0], np.float32)
        pts2 = (pts - center) @ R.T + center + shift
        sh, sc, an = find_transform(
            jnp.asarray(pts), jnp.asarray(pts2), jnp.asarray(center),
            jnp.ones((1, K), bool), iteration=100, sigma=2.0,
            disable_scale=True)
        assert abs(float(an[0]) - 3.0) < 0.3
        assert abs(float(sh[0, 0]) - 5.0) < 0.7
        assert abs(float(sh[0, 1]) + 3.0) < 0.7

    def test_outlier_rejection(self):
        rng = np.random.default_rng(1)
        K = 64
        pts = rng.uniform(20, 300, size=(1, K, 2)).astype(np.float32)
        shift = np.array([8.0, 0.0], np.float32)
        pts2 = pts + shift
        pts2[0, :6] += rng.uniform(-80, 80, size=(6, 2))  # outliers
        center = np.full((1, 1, 2), 160.0, np.float32)
        sh, _, _ = find_transform(
            jnp.asarray(pts), jnp.asarray(pts2), jnp.asarray(center),
            jnp.ones((1, K), bool), iteration=100, sigma=1.5,
            disable_scale=True, disable_rotate=True)
        assert abs(float(sh[0, 0]) - 8.0) < 1.0


class TestApplyTransform:
    def test_shift_moves_content(self):
        x = np.zeros((1, 32, 32, 1), np.float32)
        x[0, 10, 10, 0] = 1.0
        y = apply_transform(jnp.asarray(x), jnp.asarray([[4.0, 2.0]]),
                            jnp.ones((1,)), jnp.zeros((1,)),
                            jnp.full((1, 2), 16.0), padding_mode="zeros")
        yy, xx = np.unravel_index(np.argmax(np.asarray(y)[0, :, :, 0]),
                                  (32, 32))
        assert (xx, yy) == (14, 12)

    def test_identity(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
        y = apply_transform(x, jnp.zeros((1, 2)), jnp.ones((1,)),
                            jnp.zeros((1,)), jnp.full((1, 2), 8.0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


class TestSuperPoint:
    def test_output_contract(self):
        m = SuperPoint(max_num_keypoints=64, detection_threshold=0.0)
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 1))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        out = m.apply_fn(params, x)
        assert out["keypoints"].shape == (1, 64, 2)
        assert out["descriptors"].shape == (1, 64, 256)
        kps = np.asarray(out["keypoints"][0])
        assert kps.min() >= 0 and kps.max() < 64
        # interior keypoints have unit descriptors
        norms = np.linalg.norm(np.asarray(out["descriptors"][0]), axis=-1)
        interior = ((kps > 4) & (kps < 59)).all(axis=-1)
        if interior.any():
            np.testing.assert_allclose(norms[interior], 1.0, atol=1e-3)

    def test_nms_suppresses_neighbors(self):
        s = np.zeros((1, 32, 32), np.float32)
        s[0, 10, 10] = 1.0
        s[0, 10, 12] = 0.9  # within radius 4 of the max
        out = np.asarray(batched_nms(jnp.asarray(s), 4))
        assert out[0, 10, 10] == 1.0
        assert out[0, 10, 12] == 0.0

    def test_matching(self):
        K, D = 8, 16
        rng = np.random.default_rng(5)
        d = rng.normal(size=(K, D)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        perm = rng.permutation(K)
        kp1 = {"descriptors": jnp.asarray(d), "valid": jnp.ones(K, bool),
               "keypoints": jnp.zeros((K, 2))}
        kp2 = {"descriptors": jnp.asarray(d[perm]),
               "valid": jnp.ones(K, bool), "keypoints": jnp.zeros((K, 2))}
        i1, i2, valid, sims = find_match_index(kp1, kp2, threshold=0.9)
        assert np.all(np.asarray(valid))
        np.testing.assert_array_equal(np.asarray(i2), np.argsort(perm)[np.asarray(i1)])


class TestSmoothing:
    def test_scene_weight(self):
        w = calc_scene_weight([0.9, 0.4, 0.8, 0.9])
        assert w[0] == 0.0 and w[-1] == 0.0
        assert w[1] < 0.01  # scene-change frame

    def test_gaussian_smoothing_reduces_jitter(self):
        rng = np.random.default_rng(7)
        n = 200
        jitter = rng.normal(0, 2, n).astype(np.float64)
        sx, sy, sa = smooth_trajectory(
            jitter, jitter, np.zeros(n), np.ones(n), "gaussian",
            smoothing_seconds=1.0, fps=30, resolution=320)
        traj = jitter.cumsum()
        assert np.std(np.diff(traj + sx)) < np.std(np.diff(traj)) * 0.5

    def test_grad_opt_smoothing(self):
        rng = np.random.default_rng(9)
        n = 60
        jitter = rng.normal(0, 2, n)
        sx, sy, sa = smooth_trajectory(
            jitter, jitter * 0.5, np.zeros(n), np.ones(n), "grad_opt",
            smoothing_seconds=1.0, fps=30, resolution=320)
        traj = jitter.cumsum()
        assert np.std(np.diff(traj + sx)) < np.std(np.diff(traj))

    def test_kernel_normalized(self):
        k = gaussian_kernel1d(31)
        assert abs(k.sum() - 1.0) < 1e-9
        y = smooth1d(np.ones(50), k)
        np.testing.assert_allclose(y, 1.0, atol=1e-9)


class TestCache:
    def test_roundtrip(self, tmp_path):
        from nunif_tpu.stlizer.cache import save_cache, load_cache
        src = tmp_path / "v.mp4"
        src.write_bytes(b"fake video")
        save_cache(str(src), str(tmp_path / "cache"),
                   shift_x=np.ones(3), shift_y=np.zeros(3),
                   angle=np.zeros(3), scene_weight=np.ones(3),
                   fps=30.0, resize_scale=2.0, center=(160, 90))
        c = load_cache(str(src), str(tmp_path / "cache"))
        assert c is not None
        np.testing.assert_array_equal(c["shift_x"], np.ones(3))
        assert float(c["fps"]) == 30.0
        assert load_cache(str(tmp_path / "nope.mp4"),
                          str(tmp_path / "cache")) is None


class TestEndToEnd:
    def test_stabilize_smoke(self, tmp_path):
        from nunif_tpu.video import backend
        if not backend.available():
            pytest.skip("no video backend")
        from nunif_tpu.video import generate_video, VideoOutputConfig
        from nunif_tpu.stlizer.pipeline import stabilize_video
        rng = np.random.default_rng(0)
        base = (rng.uniform(size=(96, 128, 3)) * 255).astype(np.uint8)

        def gen():
            for i in range(10):
                dx = int(3 * np.sin(i))
                yield np.roll(base, dx, axis=1)

        src = str(tmp_path / "shaky.mp4")
        dst = str(tmp_path / "stable.mp4")
        generate_video(src, gen(), 128, 96, fps=10,
                       config=VideoOutputConfig(crf=18))
        info = stabilize_video(src, dst, resolution=64, batch_size=4,
                               cache_dir=str(tmp_path / "cache"))
        assert info["frames"] >= 9
        r = backend.VideoReader(dst)
        assert (r.width, r.height) == (128, 96)
        r.close()


def test_light_outpaint_v1():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nunif_tpu.stlizer.light_outpaint_v1 import (
        LightOutpaintV1, outpaint_infer,
    )
    model = LightOutpaintV1()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    mask = jnp.zeros((1, 64, 64, 1)).at[:, :, :8].set(1.0)
    params = model.init(jax.random.PRNGKey(0), x * (1 - mask), mask=mask,
                        train=False)["params"]
    out = model.apply_fn(params, x * (1 - mask), mask=mask)
    assert out.shape == x.shape
    # outside the mask the source passes through
    np.testing.assert_allclose(np.asarray(out[:, :, 16:]),
                               np.asarray(x[:, :, 16:]), atol=1e-5)
    # train mode returns (composited, raw)
    out2, z = model.apply_fn(params, x * (1 - mask), mask=mask, train=True)
    assert z.shape == x.shape
    # infer with downscale path
    big = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 96, 160, 3)),
                      jnp.float32)
    bmask = jnp.zeros((1, 96, 160, 1)).at[:, :, :10].set(1.0)
    out3 = outpaint_infer(model, params, big * (1 - bmask), bmask, max_size=64)
    assert out3.shape == big.shape


def test_outpaint_training(tmp_path):
    import argparse
    from nunif_tpu.stlizer.training import train_main, OutpaintDataset
    ds = OutpaintDataset(None, size=64, num_samples=2)
    b = next(iter(ds.batches(2)))
    assert b["y"].shape == (2, 64, 64, 3)
    args = argparse.Namespace(
        model_dir=str(tmp_path / "m"), data_dir=str(tmp_path / "d"),
        max_epoch=1, optimizer="adam", learning_rate=1e-4, scheduler="none",
        seed=71, resume=False, ema_decay=None, batch_size=2, num_samples=2,
        size=64)
    assert train_main(args) == 0


def test_apply_transform_two_pass_matches_gather():
    """Catmull-Smith two-pass shear warp (the TPU fast path) == the 2-D
    gather grid_sample path for in-envelope stabilization transforms."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nunif_tpu.utils.superpoint import (apply_transform,
                                            _apply_transform_two_pass)

    rng = np.random.default_rng(0)
    B, H, W = 2, 64, 96
    # smooth image: bilinear resampling paths agree to fp tolerance on
    # smooth content; random noise would amplify the two-pass's different
    # rounding at equal positions
    base = rng.normal(0, 1, (B, 12, 16, 3))
    x = jnp.asarray(np.kron(base, np.ones((1, 8, 8, 1))) / 3.0,
                    jnp.float32)
    x = jnp.asarray(jax.image.resize(x, (B, H, W, 3), "linear"))
    shift = jnp.asarray([[3.0, -2.0], [-4.5, 1.25]], jnp.float32)
    scale = jnp.asarray([1.0, 1.02], jnp.float32)
    angle = jnp.asarray([0.8, -1.2], jnp.float32)
    center = jnp.asarray([[W / 2, H / 2]] * B, jnp.float32)

    want = np.asarray(apply_transform(x, shift, scale, angle, center))
    got = np.asarray(_apply_transform_two_pass(x, shift, scale, angle,
                                               center, max_shift=16))
    # interior comparison: border handling differs at the rotated corner
    # wedges (two-pass clamps per axis, gather clamps the 2-D position)
    m = 8
    # tolerance: warp_x_bounded streams the image in bf16 (~1e-3 at this
    # magnitude) and bilinear-of-bilinear smooths O(curvature) ~ 4e-3 on
    # this content — both inherent to the fast path, not bugs
    np.testing.assert_allclose(got[:, m:-m, m:-m], want[:, m:-m, m:-m],
                               atol=8e-3)

    # identity transform is exact
    ident = np.asarray(_apply_transform_two_pass(
        x, jnp.zeros((B, 2)), jnp.ones((B,)), jnp.zeros((B,)), center,
        max_shift=8))
    np.testing.assert_allclose(ident, np.asarray(x), atol=4e-3)  # bf16
