"""StableHLO export artifacts + profiler hooks."""
import numpy as np
import jax
import jax.numpy as jnp


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
