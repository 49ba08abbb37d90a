"""Model registry + self-describing checkpoint tests
(reference behavior: nunif/models/register.py:76-95, utils.py:15-74)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nunif_tpu.models import (
    create_model, get_model_names, save_model, load_model,
    flatten_params, unflatten_params, merge_state_dict, mean_state_dict,
)
import nunif_tpu.waifu2x  # noqa: F401  register models


def test_registry_contains_waifu2x_models():
    names = get_model_names()
    assert "waifu2x.upconv_7" in names
    assert "waifu2x.vgg_7" in names


def test_create_model_and_forward():
    model = create_model("waifu2x.upconv_7")
    assert model.i2i_scale == 2 and model.i2i_offset == 14
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    y = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)), train=False)
    # valid convs shrink by 6px each side, transpose conv: 2*(64-12)-4 = 100
    assert y.shape == (1, 100, 100, 3)
    assert y.shape[1] == 64 * 2 - 2 * model.i2i_offset


def test_vgg7_shape():
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    y = model.apply({"params": params}, jnp.zeros((2, 64, 64, 3)), train=False)
    assert y.shape == (2, 50, 50, 3)


def test_checkpoint_roundtrip(tmp_path):
    model = create_model("waifu2x.vgg_7", in_channels=3, out_channels=3)
    params = model.init_params(jax.random.PRNGKey(1), (1, 32, 32, 3))
    path = os.path.join(tmp_path, "m.nztm")
    save_model(model, params, path, train_kwargs={"lr": 1e-4})
    model2, params2, meta = load_model(path)
    assert model2.model_name == model.model_name
    assert meta["train_kwargs"]["lr"] == 1e-4
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    y1 = model.apply({"params": params}, x, train=False)
    y2 = model2.apply({"params": params2}, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=0, atol=0)


def test_flatten_unflatten_identity():
    tree = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)}, "d": np.arange(4)}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    tree2 = unflatten_params(flat)
    np.testing.assert_array_equal(tree2["a"]["b"], tree["a"]["b"])


def test_weight_averaging():
    a = {"w": np.full((2,), 2.0, np.float32)}
    b = {"w": np.full((2,), 4.0, np.float32)}
    m = merge_state_dict(a, b, alpha=0.25)
    np.testing.assert_allclose(m["w"], [3.5, 3.5])
    mm = mean_state_dict([a, b])
    np.testing.assert_allclose(mm["w"], [3.0, 3.0])


def test_partition_params_megatron_rules():
    """TP partitioning places qkv column-wise and proj row-wise."""
    import jax
    from jax.sharding import PartitionSpec as P
    from nunif_tpu.parallel import (make_mesh, partition_params,
                                    MEGATRON_TP_RULES)
    import flax.linen as nn
    import jax.numpy as jnp

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(32, name="qkv")(x)
            x = nn.Dense(16, name="proj")(x)
            x = nn.Dense(7, name="head")(x)  # 7 not divisible by tp=2
            return x

    m = M()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    mesh = make_mesh(shape=(4, 2), axis_names=("dp", "tp"))
    placed = partition_params(mesh, params, MEGATRON_TP_RULES)
    assert placed["qkv"]["kernel"].sharding.spec == P(None, "tp")
    assert placed["proj"]["kernel"].sharding.spec == P("tp", None)
    # non-divisible head falls back to replicated
    assert placed["head"]["kernel"].sharding.spec in (P(), P(None, None))
    # proj bias untouched by rules -> replicated
    assert placed["proj"]["bias"].sharding.spec in (P(), P(None,))
