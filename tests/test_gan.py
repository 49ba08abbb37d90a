"""GAN training step: shapes, warmup gating, adaptive weight, r1 cadence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nunif_tpu.training.gan import GANConfig, make_gan_train_step

pytestmark = pytest.mark.slow


def _toy():
    import flax.linen as nn

    class G(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), padding="SAME", name="c1")(x)
            h = nn.relu(h)
            return nn.Conv(3, (3, 3), padding="SAME", name="last")(h)

    class D(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
            h = nn.relu(h)
            return nn.Conv(1, (3, 3), padding="SAME")(h)

    return G(), D()


def test_gan_step_runs_and_improves_recon():
    g, d = _toy()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    gp = g.init(jax.random.PRNGKey(0), x)["params"]
    dp = d.init(jax.random.PRNGKey(1), y)["params"]

    cfg = GANConfig(gan_loss="hinge", r1_interval=2, ema_decay=0.99,
                    generator_start_step=3)
    init, step = make_gan_train_step(
        lambda p, b: g.apply({"params": p}, b["x"]),
        lambda p, img, c: d.apply({"params": p}, img),
        lambda f, t: jnp.mean(jnp.abs(f - t)),
        optax.adam(1e-3), optax.adam(1e-3), cfg,
        last_layer_path=("last", "kernel"))
    state = init(gp, dp)
    batch = {"x": x, "y": y}
    losses = []
    for i in range(6):
        state, m = step(state, batch)
        losses.append(float(m["recon"]))
        if i < 3:
            # generator warmup: adversarial weight gated to 0
            assert float(m["disc_weight"]) == 0.0
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    assert state.g_ema_params is not None


def test_multi_head_discriminator():
    import flax.linen as nn
    g, _ = _toy()

    class D2(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = nn.Conv(1, (3, 3), padding="SAME", name="a")(x)
            b = nn.Conv(1, (1, 1), padding="VALID", name="b")(x)
            return a, b

    d = D2()
    x = jnp.zeros((1, 8, 8, 3))
    gp = g.init(jax.random.PRNGKey(0), x)["params"]
    dp = d.init(jax.random.PRNGKey(1), x)["params"]
    cfg = GANConfig(r1_gamma=0.0)
    init, step = make_gan_train_step(
        lambda p, b: g.apply({"params": p}, b["x"]),
        lambda p, img, c: d.apply({"params": p}, img),
        lambda f, t: jnp.mean((f - t) ** 2),
        optax.sgd(1e-3), optax.sgd(1e-3), cfg,
        d_loss_weights=(0.8, 0.2))
    state = init(gp, dp)
    state, m = step(state, {"x": x, "y": x})
    assert np.isfinite(float(m["d"]))
