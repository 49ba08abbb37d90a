"""cunet / swin_unet_v2 / discriminator shape and contract tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nunif_tpu.models import create_model, get_model_names
import nunif_tpu.waifu2x  # noqa: F401 — register

pytestmark = pytest.mark.slow


def _run(name, size, batch=1, **kwargs):
    m = create_model(name, **kwargs)
    params = m.init_params(jax.random.PRNGKey(0), (1, size, size, 3))
    x = jnp.zeros((batch, size, size, 3))
    y = m.apply_fn(params, x)
    return m, y


class TestCUNet:
    def test_cunet_offset(self):
        m, y = _run("waifu2x.cunet", 64)
        # scale 1, offset 28: out = 64 - 56 = 8
        assert y.shape == (1, 8, 8, 3)
        assert m.i2i_offset == 28 and m.i2i_scale == 1

    def test_upcunet_offset(self):
        m, y = _run("waifu2x.upcunet", 64)
        # scale 2, offset 36: out = 128 - 72 = 56
        assert y.shape == (1, 56, 56, 3)
        assert m.i2i_offset == 36 and m.i2i_scale == 2

    def test_train_aux_output(self):
        m = create_model("waifu2x.cunet")
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        z, z1 = m.apply_fn(params, jnp.zeros((1, 64, 64, 3)), train=True)
        assert z.shape == z1.shape == (1, 8, 8, 3)

    def test_tile_constraint(self):
        m = create_model("waifu2x.cunet")
        assert m.is_valid_tile_size(64)
        assert not m.is_valid_tile_size(65)


class TestSwinUNetV2:
    @pytest.mark.parametrize("name,scale,offset", [
        ("waifu2x.swin_unet_v2_1x", 1, 9),
        ("waifu2x.swin_unet_v2_2x", 2, 18),
    ])
    def test_shapes(self, name, scale, offset):
        m, y = _run(name, 64)
        assert m.i2i_scale == scale and m.i2i_offset == offset
        expect = 64 * scale - offset * 2
        assert y.shape == (1, expect, expect, 3)
        assert float(jnp.min(y)) >= 0 and float(jnp.max(y)) <= 1

    def test_small_variant(self):
        m, y = _run("waifu2x.swin_unet_v2_1xs", 64)
        assert y.shape == (1, 46, 46, 3)

    def test_alias(self):
        assert "waifu2x.winc_unet_2x" in get_model_names()
        m = create_model("waifu2x.winc_unet_2x")
        assert m.model_name == "waifu2x.swin_unet_v2_2x"

    def test_tile_validator(self):
        m = create_model("waifu2x.swin_unet_v2_2x")
        assert m.is_valid_tile_size(64)   # (64-16) divisible by 12 and 16
        assert not m.is_valid_tile_size(60)
        assert m.find_valid_tile_size(60) == 64

    def test_downscaled(self):
        m = create_model("waifu2x.swin_unet_v2_downscaled",
                         downscale_factor=2, base_dim=32)
        assert m.i2i_scale == 2 and m.i2i_offset == 18
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        y = m.apply_fn(params, jnp.zeros((1, 64, 64, 3)))
        # 4x output 256-4*36/... unet at 4x: 64*4 - 4*... ToImage crop etc.
        assert y.shape[1] == (64 * 4 - 36 * 2 - 0) // 2 or y.shape[1] > 0


class TestDiscriminators:
    def test_l3(self):
        m, y = _run("waifu2x.l3_discriminator", 64)
        assert y.ndim == 4 and y.shape[-1] == 1

    def test_v1(self):
        m, y = _run("waifu2x.v1_discriminator", 128)
        assert y.ndim == 4 and y.shape[-1] == 1

    def test_l3v1_pair_and_weights(self):
        m = create_model("waifu2x.l3v1_discriminator")
        params = m.init_params(jax.random.PRNGKey(0), (1, 128, 128, 3))
        l3, v1 = m.apply_fn(params, jnp.zeros((2, 128, 128, 3)))
        assert l3.shape[0] == 2 and v1.shape[0] == 2
        assert m.loss_weights == (0.8, 0.2)

    def test_conditional(self):
        m = create_model("waifu2x.l3v1_conditional_discriminator")
        x = jnp.zeros((1, 128, 128, 3))
        c = jnp.zeros((1, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x, c)
        l3, v1 = m.apply(variables, x, c)
        assert l3.shape[0] == 1

    def test_spectral_norm_bounds_gain(self):
        from nunif_tpu.waifu2x.models.discriminator import _spectral_sigma
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.normal(size=(3, 3, 16, 8)).astype(np.float32))
        sigma = float(_spectral_sigma(k, n_iter=20))
        w = np.asarray(k).reshape(-1, 8)
        true = np.linalg.svd(w, compute_uv=False)[0]
        assert abs(sigma - true) / true < 0.05


class TestWGMLPAndInpaint:
    def test_wgmlp_4x(self):
        m, y = _run("waifu2x.wgmlp_4x", 64)
        assert m.i2i_scale == 4 and m.i2i_offset == 36
        assert y.shape == (1, 64 * 4 - 72, 64 * 4 - 72, 3)

    def test_light_inpaint(self):
        import jax
        import nunif_tpu.iw3  # noqa — register inpaint model
        from nunif_tpu.iw3.models.light_inpaint_v1 import (
            LightInpaintV1, inpaint_infer)
        m = LightInpaintV1()
        x = jnp.zeros((1, 64, 64, 3))
        mask = jnp.zeros((1, 64, 64, 1)).at[:, 20:30, 20:30].set(1.0)
        params = m.init(jax.random.PRNGKey(0), x, mask=mask)["params"]
        y = inpaint_infer(m, params, x, mask)
        assert y.shape == x.shape
        assert float(jnp.min(y)) >= 0 and float(jnp.max(y)) <= 1

    def test_forward_inpaint_method(self):
        import numpy as np
        from nunif_tpu.iw3.forward_inpaint import ForwardInpaint
        fi = ForwardInpaint()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)).astype(np.float32))
        d = jnp.asarray(rng.uniform(size=(1, 32, 48, 1)).astype(np.float32))
        left, right = fi.infer(x, d, 2.0, 0.5)
        assert left.shape == x.shape and right.shape == x.shape


def test_json_model_loader(tmp_path):
    """Round-trip: flax params -> lua-waifu2x JSON -> loader -> identical."""
    import json
    import numpy as np
    import jax
    from nunif_tpu.models import create_model
    from nunif_tpu.waifu2x.models.json_model import load_json_model

    model = create_model("waifu2x.upconv_7")
    params = model.init_params(jax.random.PRNGKey(3), (1, 64, 64, 3))
    layers = []
    for i in range(6):
        k = np.asarray(params[f"Conv_{i}"]["kernel"])  # HWIO
        layers.append({
            "class_name": "nn.SpatialConvolutionMM",
            "weight": k.transpose(3, 2, 0, 1).tolist(),  # OIHW
            "bias": np.asarray(params[f"Conv_{i}"]["bias"]).tolist(),
        })
    kt = np.asarray(params["ConvTranspose2dTorch_0"]["kernel"])
    # invert the loader's flip+transpose: (khf,kwf,I,O) -> torch (I,O,kh,kw)
    torch_w = kt[::-1, ::-1].transpose(2, 3, 0, 1)
    layers.append({
        "class_name": "nn.SpatialFullConvolution",
        "weight": torch_w.tolist(),
        "bias": np.asarray(params["ConvTranspose2dTorch_0"]["bias"]).tolist(),
    })
    jf = tmp_path / "scale2.0x_model.json"
    jf.write_text(json.dumps(layers))

    model2, params2 = load_json_model(str(jf))
    assert model2.model_name == "waifu2x.upconv_7"
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_u3c_discriminator():
    import jax
    import jax.numpy as jnp
    from nunif_tpu.models import create_model
    d = create_model("waifu2x.u3_conditional_discriminator")
    x = jnp.zeros((1, 64, 64, 3))
    c = jnp.zeros((1, 32, 32, 3))  # low-res condition, fit_to_size upsamples
    params = d.init(jax.random.PRNGKey(0), x, c=c, train=True)["params"]
    z2, z1 = d.apply_fn(params, x, c=c, train=True)
    assert z2.shape[1] > z1.shape[1]  # two scales
    assert d.loss_weights == (0.9, 0.1)


def test_patchdown_matmul_parity(monkeypatch):
    """space-to-depth matmul PatchDown == nn.Conv PatchDown on the same
    params (checkpoint-interchangeable; NUNIF_TPU_PATCHDOWN selects)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nunif_tpu.waifu2x.models.swin_unet import PatchDown

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 16, 20, 8)), jnp.float32)
    monkeypatch.setenv("NUNIF_TPU_PATCHDOWN", "conv")
    m1 = PatchDown(12)
    p = m1.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(m1.apply({"params": p}, x))
    monkeypatch.setenv("NUNIF_TPU_PATCHDOWN", "matmul")
    m2 = PatchDown(12)  # fresh instance: flax caches traced fns per module
    got = np.asarray(m2.apply({"params": p}, x))
    np.testing.assert_allclose(got, want, atol=2e-6)
    p2 = m2.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p2))


def test_patchup_v1_parity(monkeypatch):
    """6-d single-transpose PatchUp decomposition (NUNIF_TPU_PATCHUP=v1,
    the TPU default) == the two-step v0 decomposition."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nunif_tpu.waifu2x.models.swin_unet import PatchUp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 8, 10, 16)), jnp.float32)
    monkeypatch.setenv("NUNIF_TPU_PATCHUP", "v0")
    m0 = PatchUp(4)
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(m0.apply({"params": p}, x))
    monkeypatch.setenv("NUNIF_TPU_PATCHUP", "v1")
    m1 = PatchUp(4)
    got = np.asarray(m1.apply({"params": p}, x))
    np.testing.assert_allclose(got, want, atol=1e-6)


class TestTurbo2x:
    """TPU-native turbo_2x: catrom polyphase base + half-res residual CNN
    (no reference analogue; acceptance protocol is PSNR vs the catrom
    baseline, reference waifu2x/docs/training.md:131-147)."""

    def test_init_is_catrom_baseline(self):
        """Zero-init tail => an untrained model IS the catrom 2x upscale."""
        from nunif_tpu.models import create_model
        from nunif_tpu.modules.resize import resize

        m = create_model("waifu2x.turbo_2x")
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        rng = np.random.default_rng(0)
        x = rng.uniform(0.1, 0.9, (2, 64, 64, 3)).astype(np.float32)
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                                 train=False))
        assert got.shape == (2, 96, 96, 3)  # 2*64 - 2*offset(16)
        want = np.asarray(resize(jnp.asarray(x), 128, 128, mode="catrom",
                                 antialias=False))
        want = np.clip(want[:, 16:112, 16:112], 0, 1)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_pre_shuffle_layout(self):
        import dataclasses
        from nunif_tpu.models import create_model
        from nunif_tpu.modules.permute import pixel_shuffle

        m = create_model("waifu2x.turbo_2x")
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        y = m.apply({"params": params}, x, train=False)
        yps = dataclasses.replace(m, pre_shuffle_output=True).apply(
            {"params": params}, x, train=False)
        # ps factor 4: the head layout is half-res with all 16 subpixels
        # as channels — nothing full-resolution before the uint8 shuffle
        assert yps.shape == (1, 24, 24, 48)
        np.testing.assert_allclose(np.asarray(pixel_shuffle(yps, 4)),
                                   np.asarray(y), atol=1e-6)

    def test_tiled_render_matches_whole(self):
        """Tiled render (seam blend path) vs whole-image render; trained-
        like random weights (not the zero tail) to exercise the body."""
        from nunif_tpu.models import create_model
        from nunif_tpu.utils.tiling import TiledRenderer, simple_render
        from nunif_tpu.core.dtypes import FP32_POLICY

        m = create_model("waifu2x.turbo_2x", dim=32, blocks=2)
        params = m.init_params(jax.random.PRNGKey(1), (1, 64, 64, 3))
        # randomize the zero-init tail so the test sees non-baseline output
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(
                jax.random.PRNGKey(2), p.shape, p.dtype), params)
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (70, 90, 3)).astype(np.float32)
        renderer = TiledRenderer(m, params, policy=FP32_POLICY)
        got = np.asarray(renderer.render(x, tile_size=64, batch_size=2))
        want = np.asarray(simple_render(x, m, params, policy=FP32_POLICY))
        assert got.shape == want.shape == (140, 180, 3)
        # interior must agree to fp tolerance; seams are blended
        d = np.abs(got - want)
        assert d.mean() < 2e-3 and np.median(d) < 1e-4

    def test_training_gradients_flow(self):
        from nunif_tpu.models import create_model

        m = create_model("waifu2x.turbo_2x", dim=16, blocks=1)
        params = m.init_params(jax.random.PRNGKey(0), (1, 32, 32, 3))

        def loss_fn(p, x, y):
            out = m.apply({"params": p}, x, train=True)
            return jnp.mean((out - y) ** 2)

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        out = m.apply({"params": params}, x, train=True)
        g = jax.grad(loss_fn)(params, x, jnp.zeros_like(out))
        gn = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
        assert np.isfinite(gn) and gn > 0


class TestTurbo4x:
    """turbo_4x: the same half-res design serving `--method scale4x`
    (fixed catrom 4x base, 8x8 subpixels per half-res cell, ps factor 8)."""

    def test_init_is_catrom_baseline(self):
        from nunif_tpu.models import create_model
        from nunif_tpu.modules.resize import resize

        m = create_model("waifu2x.turbo_4x")
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        rng = np.random.default_rng(0)
        x = rng.uniform(0.1, 0.9, (2, 64, 64, 3)).astype(np.float32)
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                                 train=False))
        assert got.shape == (2, 192, 192, 3)  # 4*64 - 2*offset(32)
        want = np.asarray(resize(jnp.asarray(x), 256, 256, mode="catrom",
                                 antialias=False))
        want = np.clip(want[:, 32:224, 32:224], 0, 1)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_pre_shuffle_layout(self):
        import dataclasses
        from nunif_tpu.models import create_model
        from nunif_tpu.modules.permute import pixel_shuffle

        m = create_model("waifu2x.turbo_4x", dim=16, blocks=1)
        params = m.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        y = m.apply({"params": params}, x, train=False)
        yps = dataclasses.replace(m, pre_shuffle_output=True).apply(
            {"params": params}, x, train=False)
        assert yps.shape == (1, 24, 24, 192)
        np.testing.assert_allclose(np.asarray(pixel_shuffle(yps, 8)),
                                   np.asarray(y), atol=1e-6)

    def test_tiled_render_matches_whole(self):
        from nunif_tpu.models import create_model
        from nunif_tpu.utils.tiling import TiledRenderer, simple_render
        from nunif_tpu.core.dtypes import FP32_POLICY

        m = create_model("waifu2x.turbo_4x", dim=16, blocks=1)
        params = m.init_params(jax.random.PRNGKey(1), (1, 64, 64, 3))
        params = jax.tree.map(
            lambda p: p + 0.01 * jax.random.normal(
                jax.random.PRNGKey(2), p.shape, p.dtype), params)
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1, (70, 90, 3)).astype(np.float32)
        renderer = TiledRenderer(m, params, policy=FP32_POLICY)
        got = np.asarray(renderer.render(x, tile_size=64, batch_size=2))
        want = np.asarray(simple_render(x, m, params, policy=FP32_POLICY))
        assert got.shape == want.shape == (280, 360, 3)
        d = np.abs(got - want)
        assert d.mean() < 2e-3 and np.median(d) < 1e-4
