"""StableHLO export artifacts + profiler hooks."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_export_roundtrip(tmp_path):
    from nunif_tpu.models import create_model
    from nunif_tpu.models.export import export_model, ExportedModel
    import nunif_tpu.waifu2x  # noqa: F401

    model = create_model("waifu2x.upconv_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    path = tmp_path / "upconv7.nzhlo"
    export_model(model, params, str(path), (2, 64, 64, 3))
    loaded = ExportedModel(str(path))
    assert loaded.input_shape == (2, 64, 64, 3)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    y_exported = loaded(x)
    y_direct = model.apply_fn(params, x)
    np.testing.assert_allclose(np.asarray(y_exported), np.asarray(y_direct),
                               rtol=1e-5, atol=1e-6)


def test_export_baked(tmp_path):
    from nunif_tpu.models import create_model
    from nunif_tpu.models.export import export_model, ExportedModel
    import nunif_tpu.waifu2x  # noqa: F401

    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(1), (1, 32, 32, 3))
    path = tmp_path / "vgg7.nzhlo"
    export_model(model, params, str(path), (1, 32, 32, 3), bake_params=True)
    loaded = ExportedModel(str(path))
    x = jnp.zeros((1, 32, 32, 3))
    assert loaded(x).shape == (1, 18, 18, 3)  # offset 7 per side


def test_export_cli(tmp_path):
    from nunif_tpu.models import create_model, save_model
    from nunif_tpu.cli.export_model import main
    import nunif_tpu.waifu2x  # noqa: F401

    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(2), (1, 32, 32, 3))
    ckpt = tmp_path / "m.nztm"
    save_model(model, params, str(ckpt))
    out = tmp_path / "m.nzhlo"
    assert main(["-i", str(ckpt), "-o", str(out),
                 "--tile-size", "32", "--batch-size", "1"]) == 0
    assert out.exists()


def test_stage_timer_and_memory_stats():
    from nunif_tpu.core.profiler import StageTimer, device_memory_stats
    t = StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()
    stats = device_memory_stats()
    assert len(stats) >= 1 and "device" in stats[0]


def test_resolve_alias():
    from nunif_tpu.models.register import resolve_alias
    import nunif_tpu.waifu2x.models  # noqa: F401
    assert resolve_alias("waifu2x.upconv_7") == "waifu2x.upconv_7"
    assert resolve_alias("nonexistent.model") == "nonexistent.model"


def test_export_helper_ops_roundtrip(tmp_path):
    """Reference onnx_helper_models.py equivalents as StableHLO programs."""
    import numpy as np
    from nunif_tpu.models.export import export_helper_ops, ExportedModel
    from nunif_tpu.transforms.tta import tta_split, tta_merge
    import jax.numpy as jnp

    paths = export_helper_ops(str(tmp_path), tile_size=32)
    assert len(paths) == 7
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)

    split = ExportedModel(paths["tta_split"])
    parts = np.asarray(split(x))
    want = np.stack([np.asarray(p) for p in tta_split(jnp.asarray(x[0]))])
    np.testing.assert_allclose(parts[:, 0], want, atol=1e-6)

    merge = ExportedModel(paths["tta_merge"])
    merged = np.asarray(merge(parts))
    np.testing.assert_allclose(
        merged[0], np.asarray(tta_merge(tuple(jnp.asarray(p) for p in want))),
        atol=1e-6)

    blend = ExportedModel(paths["seam_blend_filter"])
    f = np.asarray(blend(np.ones((1, 1, 1, 1), np.float32)))
    assert f.shape[1:3] == (32 * 2 - 16 * 2, 32 * 2 - 16 * 2)
    assert f.max() <= 1.0 and f.min() > 0.0
