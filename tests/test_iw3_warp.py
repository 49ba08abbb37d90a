"""iw3 stereo-core numerics: grid_sample vs torch, forward warp vs a slow
reference implementation of the torch algorithm, mappers, scaler, dilation."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from nunif_tpu.modules.grid_sample import grid_sample, warp_x  # noqa: E402
from nunif_tpu.modules.pool import max_pool2d, avg_pool2d  # noqa: E402

pytestmark = pytest.mark.slow


def _rand(shape, seed=0):
    return np.random.default_rng(seed).uniform(size=shape).astype(np.float32)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest", "bicubic"])
    @pytest.mark.parametrize("padding", ["border", "zeros", "reflection"])
    def test_torch_parity(self, mode, padding):
        x = _rand((2, 9, 13, 3), 1)
        grid = (_rand((2, 7, 11, 2), 2) * 2.4 - 1.2).astype(np.float32)
        ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                      mode=mode, padding_mode=padding))
        theirs = TF.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(grid), mode=mode, padding_mode=padding,
            align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_warp_x_matches_grid_sample(self):
        x = _rand((1, 8, 16, 3), 3)
        delta_px = (_rand((1, 8, 16), 4) * 6 - 3).astype(np.float32)
        ours = np.asarray(warp_x(jnp.asarray(x), jnp.asarray(delta_px)))
        # equivalent full grid
        H, W = 8, 16
        gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             indexing="ij")
        gx = gx[None] + delta_px * 2.0 / (W - 1)
        grid = np.stack([gx, np.broadcast_to(gy[None], gx.shape)], axis=-1).astype(np.float32)
        ref = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                     mode="bilinear", padding_mode="border"))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestPool:
    def test_max_pool(self):
        x = _rand((2, 10, 12, 3), 5)
        ours = np.asarray(max_pool2d(jnp.asarray(x), 3))
        theirs = TF.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                               3, stride=1, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_avg_pool_no_pad_count(self):
        x = _rand((1, 9, 9, 2), 6)
        ours = np.asarray(avg_pool2d(jnp.asarray(x), 7))
        theirs = TF.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                               7, stride=1, padding=3,
                               count_include_pad=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestMapper:
    def test_known_values(self):
        from nunif_tpu.iw3.mapper import get_mapper
        x = np.linspace(0, 1, 33).astype(np.float32)
        # independent torch-free formulas
        import math
        for name in ["none", "pow2", "softplus", "softplus2", "mul_1",
                     "inv_mul_2", "div_6", "shift_14"]:
            y = np.asarray(get_mapper(name)(jnp.asarray(x)))
            assert y.shape == x.shape
            assert np.all(np.isfinite(y))
            # endpoint normalization: f(0)=0, f(1)=1 for these families
            assert abs(float(y[0]) - 0.0) < 1e-4, name
            assert abs(float(y[-1]) - 1.0) < 1e-4, name
            assert np.all(np.diff(y) > -1e-5), f"{name} not monotone"

    def test_chain_and_interp(self):
        from nunif_tpu.iw3.mapper import get_mapper
        x = jnp.linspace(0, 1, 17)
        a = np.asarray(get_mapper("mul_1")(x))
        b = np.asarray(get_mapper("mul_2")(x))
        half = np.asarray(get_mapper("mul_1+mul_2=0.5")(x))
        np.testing.assert_allclose(half, 0.5 * a + 0.5 * b, atol=1e-6)
        chained = np.asarray(get_mapper("pow2:pow2")(x))
        np.testing.assert_allclose(chained, np.asarray(x) ** 4, atol=1e-6)

    def test_resolve_mapper_name(self):
        from nunif_tpu.iw3.mapper import resolve_mapper_name
        assert resolve_mapper_name(None, 0, metric_depth=False) == "none"
        assert resolve_mapper_name(None, 3, metric_depth=False) == "mul_3"
        assert resolve_mapper_name(None, -3, metric_depth=False) == "inv_mul_3"
        assert resolve_mapper_name(None, 0, metric_depth=True) == "div_6"
        assert resolve_mapper_name("auto", 0, metric_depth=True) == "div_6"
        assert resolve_mapper_name(None, 1.5, metric_depth=False) == "mul_1+mul_2=0.5"


class TestEMAScaler:
    def test_simple_minmax(self):
        from nunif_tpu.iw3.depth_scaler import EMAMinMaxScaler
        s = EMAMinMaxScaler(decay=0, buffer_size=1)
        f = jnp.asarray(np.array([[1.0, 3.0], [2.0, 5.0]], np.float32))
        out = s.update(f)
        np.testing.assert_allclose(np.asarray(out), (np.asarray(f) - 1) / 4, atol=1e-6)

    def test_lookahead_buffer_and_flush(self):
        from nunif_tpu.iw3.depth_scaler import EMAMinMaxScaler
        s = EMAMinMaxScaler(decay=0.9, buffer_size=3)
        frames = [jnp.full((2, 2), float(i)) for i in range(5)]
        outs = []
        for f in frames:
            r = s.update(f)
            if r is not None:
                outs.append(r)
        outs.extend(s.flush())
        assert len(outs) == 5
        # first frame normalized with window min 0 max 2 -> 0
        np.testing.assert_allclose(np.asarray(outs[0]), 0.0, atol=1e-6)

    def test_ema_tracks(self):
        from nunif_tpu.iw3.depth_scaler import EMAMinMaxScaler
        s = EMAMinMaxScaler(decay=0.75, buffer_size=1)
        s.update(jnp.asarray(np.array([0.0, 10.0], np.float32)))
        s.update(jnp.asarray(np.array([0.0, 20.0], np.float32)))
        # ema max: 10*0.75 + 20*0.25 = 12.5
        assert abs(s.max_value - 12.5) < 1e-6


def _np_forward_warp(c, depth, divergence, convergence, fill, view="both"):
    """Slow loop implementation of the torch reference algorithm
    (iw3/forward_warp.py:88-244) for parity checking.  NCHW numpy."""
    B, C, H, W0 = c.shape
    if view != "both":
        divergence *= 2
    base = W0  # width_base=True
    pad = int(base * divergence * 0.01 + 2)
    c = np.pad(c, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="edge")
    depth = np.pad(depth, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="edge")
    W = W0 + 2 * pad
    shift_size = divergence * 0.01 * base * 0.5
    index_shift = depth[:, 0] * shift_size - shift_size * convergence
    xi = np.arange(W, dtype=np.float32)
    # append x index channel
    cx = np.concatenate([c, np.broadcast_to(xi, (B, 1, H, W))], axis=1)
    Cp = C + 1

    def warp(sign):
        out_f = np.full((B, H, W, Cp + 1), -1.0, np.float32)
        out_f[..., 0] = 0
        out_c = out_f.copy()
        # depth-ascending order, ties by flat index ascending (stable)
        for b in range(B):
            for h in range(H):
                order = np.argsort(depth[b, 0, h], kind="stable")
                for x in order:
                    fx = np.clip(x + sign * index_shift[b, h, x], 0, W - 1)
                    fl = int(np.clip(np.floor(fx), 0, W - 1))
                    cl = int(np.clip(np.ceil(fx), 0, W - 1))
                    cw = np.clip(fx - fl, 1e-5, 1 - 1e-5)
                    out_f[b, h, fl, 0] = 1 - cw
                    out_f[b, h, fl, 1:] = cx[b, :, h, x]
                    out_c[b, h, cl, 0] = cw
                    out_c[b, h, cl, 1:] = cx[b, :, h, x]
        wsum = out_f[..., 0] + out_c[..., 0]
        out = (out_f[..., 1:] * out_f[..., 0:1] + out_c[..., 1:] * out_c[..., 0:1])
        with np.errstate(invalid="ignore", divide="ignore"):
            out = out / wsum[..., None]
        out = np.nan_to_num(out, nan=-1.0)
        return out  # B,H,W,Cp

    def unpad(x):
        return x[:, :, pad:W - pad]

    def fill_dir(img, sign):
        # nearest defined neighbor in direction sign (+1: right)
        out = img.copy()
        B_, H_, W_, C_ = img.shape
        for b in range(B_):
            for h in range(H_):
                for x in range(W_):
                    if out[b, h, x, 0] >= 0:
                        continue
                    rng = range(x + 1, W_) if sign > 0 else range(x - 1, -1, -1)
                    for j in rng:
                        if img[b, h, j, 0] >= 0:
                            out[b, h, x] = img[b, h, j]
                            break
        return out

    def fix_layered(img, idx, sign):
        # sign>0: converge to suffix-min, hole where row > suffix-min to the
        # right; sign<0: converge to prefix-MAX, hole where row < prefix-max
        # to the left (reference iw3/forward_warp.py:45-59; the sign<0
        # direction is validated against the ACTUAL reference loop by
        # test_golden_reference.test_iw3_forward_warp_golden)
        B_, H_, W_, _ = idx.shape
        img = img.copy()
        idx = idx.copy()
        for b in range(B_):
            for h in range(H_):
                row = idx[b, h, :, 0]
                if sign > 0:
                    sm = np.minimum.accumulate(row[::-1])[::-1]
                    nxt = np.concatenate([sm[1:], row[-1:]])
                    hole = row > nxt + 1e-3  # float-noise guard as impl
                    idx[b, h, :, 0] = np.minimum(row, nxt)
                else:
                    pm = np.maximum.accumulate(row)
                    nxt = np.concatenate([row[:1], pm[:-1]])
                    hole = row < nxt - 1e-3
                    idx[b, h, :, 0] = np.maximum(row, nxt)
                img[b, h, hole] = -2
        return img, idx

    results = {}
    for name, sign, fsign, lsign in [("left", +1, -1, +1), ("right", -1, +1, -1)]:
        if view == "right" and name == "left":
            continue
        if view == "left" and name == "right":
            continue
        w = unpad(warp(sign))
        eye, idx = w[..., :-1], w[..., -1:]
        idx = fill_dir(idx, fsign)
        eye, idx = fix_layered(eye, idx, lsign)
        if fill:
            eye = fill_dir(eye, fsign)
        results[name] = np.clip(eye, 0, 1)
    return results


class TestForwardWarp:
    @pytest.mark.parametrize("fill", [True, False])
    def test_parity_vs_reference_algorithm(self, fill):
        from nunif_tpu.iw3.forward_warp import depth_order_bilinear_forward_warp
        rng = np.random.default_rng(7)
        B, H, W = 1, 4, 24
        c = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
        # quantized depth so ordering has no float ambiguity
        depth = (rng.integers(0, 16, size=(B, 1, H, W)) / 15.0).astype(np.float32)
        ref = _np_forward_warp(c, depth, divergence=4.0, convergence=0.5, fill=fill)

        left, right = depth_order_bilinear_forward_warp(
            jnp.asarray(c.transpose(0, 2, 3, 1)),
            jnp.asarray(depth.transpose(0, 2, 3, 1)),
            divergence=4.0, convergence=0.5,
            fill=fill, synthetic_view="both")
        np.testing.assert_allclose(np.asarray(left), ref["left"], atol=2e-4)
        np.testing.assert_allclose(np.asarray(right), ref["right"], atol=2e-4)

    def test_single_view(self):
        from nunif_tpu.iw3.forward_warp import depth_order_bilinear_forward_warp
        rng = np.random.default_rng(9)
        c = rng.uniform(size=(1, 4, 16, 3)).astype(np.float32)
        depth = (rng.integers(0, 8, size=(1, 4, 16, 1)) / 7.0).astype(np.float32)
        left, right = depth_order_bilinear_forward_warp(
            jnp.asarray(c), jnp.asarray(depth), 3.0, 0.5,
            fill=True, synthetic_view="right")
        np.testing.assert_allclose(np.asarray(left), c)
        assert right.shape == c.shape
        assert np.all(np.asarray(right) >= 0)

    def test_mask_output(self):
        from nunif_tpu.iw3.forward_warp import depth_order_bilinear_forward_warp
        rng = np.random.default_rng(11)
        c = rng.uniform(size=(1, 4, 16, 3)).astype(np.float32)
        depth = np.zeros((1, 4, 16, 1), np.float32)
        depth[0, :, 8:] = 1.0  # hard edge -> disocclusion holes
        l, r, lm, rm = depth_order_bilinear_forward_warp(
            jnp.asarray(c), jnp.asarray(depth), 5.0, 0.0,
            fill=True, synthetic_view="both", return_mask=True)
        assert lm.shape == (1, 4, 16, 1)
        assert float(jnp.max(lm)) <= 1.0 and float(jnp.min(lm)) >= 0.0


class TestBackwardWarp:
    def test_grid_sample_divergence(self):
        from nunif_tpu.iw3.backward_warp import apply_divergence_grid_sample
        rng = np.random.default_rng(13)
        c = rng.uniform(size=(2, 8, 16, 3)).astype(np.float32)
        depth = rng.uniform(size=(2, 8, 16, 1)).astype(np.float32)
        left, right = apply_divergence_grid_sample(
            jnp.asarray(c), jnp.asarray(depth), 2.0, 0.5, synthetic_view="both")
        assert left.shape == c.shape and right.shape == c.shape
        # zero divergence -> identity
        l0, r0 = apply_divergence_grid_sample(
            jnp.asarray(c), jnp.asarray(depth), 0.0, 0.5)
        # bounded warp streams image terms in bf16 (input-quantization
        # tolerance, same class as the reference's fp16 inference)
        np.testing.assert_allclose(np.asarray(l0), c, atol=4e-3)
        np.testing.assert_allclose(np.asarray(r0), c, atol=4e-3)

    def test_input_tensor_channels(self):
        from nunif_tpu.iw3.backward_warp import make_input_tensor
        c = jnp.zeros((1, 8, 8, 3))
        d = jnp.ones((1, 8, 8, 1)) * 0.5
        x8 = make_input_tensor(c, d, 2.0, 0.5, image_width=8)
        assert x8.shape == (1, 8, 8, 8)
        x3 = make_input_tensor(None, d, 2.0, 0.5, image_width=8)
        assert x3.shape == (1, 8, 8, 3)


class TestDilation:
    def test_dilate_edge_shapes(self):
        from nunif_tpu.iw3.dilation import dilate_edge, edge_weight
        x = jnp.asarray(_rand((2, 16, 16, 1), 17))
        w = edge_weight(x)
        assert w.shape == x.shape
        assert float(jnp.min(w)) >= 0 and float(jnp.max(w)) <= 1
        y = dilate_edge(x, 2)
        assert y.shape == x.shape

    def test_dilate_inner_outer(self):
        from nunif_tpu.iw3.dilation import dilate_inner, dilate_outer
        m = np.zeros((1, 1, 8, 1), np.float32)
        m[0, 0, 4] = 1
        outer = np.asarray(dilate_outer(jnp.asarray(m), 2))
        inner = np.asarray(dilate_inner(jnp.asarray(m), 2))
        assert outer[0, 0, 5, 0] == 1 and outer[0, 0, 6, 0] == 1
        assert outer[0, 0, 3, 0] == 0
        assert inner[0, 0, 3, 0] == 1 and inner[0, 0, 2, 0] == 1
        assert inner[0, 0, 5, 0] == 0

    def test_closing_removes_pinholes(self):
        from nunif_tpu.iw3.dilation import closing
        m = np.ones((1, 9, 9, 1), np.float32)
        m[0, 4, 4] = 0
        out = np.asarray(closing(jnp.asarray(m)))
        assert out[0, 4, 4, 0] == 1.0


class TestAnaglyphComposition:
    def test_all_types(self):
        from nunif_tpu.iw3.anaglyph import apply_anaglyph_redcyan, ANAGLYPH_TYPES
        l = jnp.asarray(_rand((1, 8, 8, 3), 19))
        r = jnp.asarray(_rand((1, 8, 8, 3), 23))
        for t in ANAGLYPH_TYPES:
            out = apply_anaglyph_redcyan(l, r, t)
            assert out.shape == (1, 8, 8, 3)
            assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1

    def test_postprocess_formats(self):
        from nunif_tpu.iw3.composition import postprocess_image, StereoFormat
        l = jnp.asarray(_rand((1, 12, 16, 3), 29))
        r = jnp.asarray(_rand((1, 12, 16, 3), 31))
        full = postprocess_image(l, r, StereoFormat())
        assert full.shape == (1, 12, 32, 3)
        half = postprocess_image(l, r, StereoFormat(half_sbs=True))
        assert half.shape == (1, 12, 16, 3)
        tb = postprocess_image(l, r, StereoFormat(tb=True))
        assert tb.shape == (1, 24, 16, 3)
        ana = postprocess_image(l, r, StereoFormat(anaglyph="dubois"))
        assert ana.shape == (1, 12, 16, 3)
        ce = postprocess_image(l, r, StereoFormat(cross_eyed=True))
        np.testing.assert_allclose(np.asarray(ce[:, :, :16]), np.asarray(r), atol=1e-6)

    def test_vr180(self):
        from nunif_tpu.iw3.composition import postprocess_image, StereoFormat
        l = jnp.asarray(_rand((1, 8, 8, 3), 37))
        r = jnp.asarray(_rand((1, 8, 8, 3), 41))
        out = postprocess_image(l, r, StereoFormat(vr180=True))
        assert out.shape == (1, 12, 24, 3)


class TestDepthAAAndSOD:
    def test_depth_aa_residual_zero_init(self):
        import jax
        from nunif_tpu.models import create_model
        from nunif_tpu.iw3.models import depth_aa_infer
        m = create_model("iw3.depth_aa")
        params = m.init_params(jax.random.PRNGKey(0), (1, 34, 50, 1))
        x = jnp.asarray(_rand((1, 34, 50, 1), 43))
        y = m.apply_fn(params, x)
        assert y.shape == x.shape
        # zero-init output proj => identity at init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
        yi = depth_aa_infer(m, params, x * 10 + 5)
        assert yi.shape == x.shape

    def test_sod_v1(self):
        import jax
        from nunif_tpu.models import create_model
        m = create_model("iw3.sod_v1")
        params = m.init_params(jax.random.PRNGKey(0), (1, 96, 96, 4))
        y = m.apply_fn(params, jnp.zeros((1, 96, 96, 4)))
        assert y.shape == (1, 96, 96, 1)

    def test_convergence_estimator(self):
        from nunif_tpu.iw3.convergence_estimator import (
            ConvergenceEstimator, depth_position_from_ratio)
        sal = jnp.ones((1, 8, 8, 1))
        depth = jnp.broadcast_to(
            jnp.linspace(0, 1, 64).reshape(1, 8, 8, 1), (1, 8, 8, 1))
        pos = depth_position_from_ratio(sal, depth, 0.5)
        assert 0.4 < float(pos[0]) < 0.6
        est = ConvergenceEstimator(0.5, enable_ema=True, decay=0.5)
        rgb = jnp.zeros((2, 96, 96, 3))
        d = jnp.zeros((2, 96, 96, 1))
        out = est(rgb, d, reset_pts=[False, True])
        assert out.shape == (2,)
        assert est.convergence_ema is None  # reset on last frame


class TestBoundedWarps:
    def test_warp_x_bounded_matches_gather(self):
        from nunif_tpu.modules.grid_sample import warp_x, warp_x_bounded
        x = jnp.asarray(_rand((2, 6, 40, 3), 51))
        delta = jnp.asarray((_rand((2, 6, 40), 52) * 10 - 5).astype(np.float32))
        a = np.asarray(warp_x(x, delta, padding_mode="border"))
        b = np.asarray(warp_x_bounded(x, delta, max_shift=6))
        # bf16 image-term streaming: bounded warp matches the exact gather
        # to input-quantization tolerance
        np.testing.assert_allclose(a, b, atol=4e-3)

    def test_forward_warp_bounded_matches_scatter(self):
        from nunif_tpu.iw3.forward_warp import _warp_one, _warp_one_bounded
        rng = np.random.default_rng(53)
        B, H, W = 1, 4, 48
        c = jnp.asarray(rng.uniform(size=(B, H, W, 4)).astype(np.float32))
        d = jnp.asarray((rng.integers(0, 16, size=(B, H, W)) / 15.0)
                        .astype(np.float32))
        shift = d * 3.0 - 1.5
        a = np.asarray(_warp_one(c, d, shift))
        b = np.asarray(_warp_one_bounded(c, d, shift, max_shift=4))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_warp_x_bounded_pallas_matches_xla(self):
        """The VMEM-resident Pallas warp (interpret mode) == the XLA
        chunked-accumulation path, incl. H not divisible by the strip."""
        from nunif_tpu.modules.grid_sample import (_warp_x_bounded_pallas,
                                                   warp_x_bounded)
        x = jnp.asarray(_rand((2, 11, 40, 3), 61))
        delta = jnp.asarray((_rand((2, 11, 40), 62) * 10 - 5)
                            .astype(np.float32))
        a = np.asarray(warp_x_bounded(x, delta, max_shift=6))
        b = np.asarray(_warp_x_bounded_pallas(x, delta, max_shift=6,
                                              interpret=True))
        np.testing.assert_allclose(a, b, atol=2e-6)
