"""Training framework tests (reference behavior: nunif/training/trainer.py,
env.py grad-accum + NaN guard, sampler.py OHEM)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nunif_tpu.models import create_model
from nunif_tpu.training import (
    TrainState, make_train_step, Trainer, TrainerConfig,
    HardExampleSampler, MiningMethod, build_schedule, wd_mask,
    calculate_adaptive_weight,
)
import nunif_tpu.waifu2x  # noqa: F401


def _tiny_problem():
    """Learn y = 2x with a 1-layer 'model'."""
    params = {"w": jnp.zeros((1,))}

    def loss_fn(p, batch, rng):
        x, y = batch
        pred = x * p["w"]
        loss = jnp.mean((pred - y) ** 2)
        return loss, {}
    return params, loss_fn


def test_train_step_converges():
    params, loss_fn = _tiny_problem()
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)
    x = jnp.ones((8, 1)); y = x * 2.0
    for _ in range(100):
        state, m = step(state, (x, y), jax.random.PRNGKey(0))
    assert float(state.params["w"][0]) == pytest.approx(2.0, abs=1e-3)
    assert int(state.nan_count) == 0


def test_train_step_nan_guard_skips_update():
    params, loss_fn = _tiny_problem()
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)
    x = jnp.full((4, 1), jnp.nan); y = jnp.ones((4, 1))
    state, m = step(state, (x, y), jax.random.PRNGKey(0))
    assert int(state.nan_count) == 1
    assert float(state.params["w"][0]) == 0.0  # update skipped
    assert not bool(m["finite"])


def test_grad_accumulation_equivalent():
    params, loss_fn = _tiny_problem()
    tx = optax.sgd(0.1)
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1); y = x * 2

    # fresh param trees per state: the train step donates its input state
    s1 = TrainState.create({"w": jnp.zeros((1,))}, tx)
    s1, _ = make_train_step(loss_fn, tx)(s1, (x, y), jax.random.PRNGKey(0))

    s2 = TrainState.create({"w": jnp.zeros((1,))}, tx)
    s2, _ = make_train_step(loss_fn, tx, accum_steps=4)(s2, (x, y), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s1.params["w"]),
                               np.asarray(s2.params["w"]), rtol=1e-5)


def test_ema_tracking():
    params, loss_fn = _tiny_problem()
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx, use_ema=True)
    step = make_train_step(loss_fn, tx, ema_decay=0.9)
    x = jnp.ones((4, 1)); y = x * 2
    state, _ = step(state, (x, y), jax.random.PRNGKey(0))
    # ema = 0.9*0 + 0.1*new_w
    assert float(state.ema_params["w"][0]) == pytest.approx(
        0.1 * float(state.params["w"][0]), rel=1e-5)


def test_trainer_fit_and_resume(tmp_path):
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 16, 3))

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(size=(4, 2, 2, 3)).astype(np.float32)

    def loss_fn(p, batch, rng_key):
        bx, by = batch
        pred = model.apply({"params": p}, bx, train=True)
        return jnp.mean(jnp.abs(pred - by)), {}

    cfg = TrainerConfig(model_dir=str(tmp_path), max_epoch=2,
                        optimizer="adam", learning_rate=1e-4)
    tr = Trainer(cfg, model, params, loss_fn, steps_per_epoch=1)
    tr.fit(lambda: [(x, y)])
    assert os.path.exists(tr.checkpoint_path)
    assert tr.last_epoch == 2

    cfg2 = TrainerConfig(model_dir=str(tmp_path), max_epoch=3,
                         optimizer="adam", learning_rate=1e-4, resume=True)
    tr2 = Trainer(cfg2, model, params, loss_fn, steps_per_epoch=1)
    assert tr2.last_epoch == 2  # resumed
    tr2.fit(lambda: [(x, y)])
    assert tr2.last_epoch == 3


def test_hard_example_sampler():
    s = HardExampleSampler(10, method=MiningMethod.LINEAR, scale_factor=4.0)
    for i in range(10):
        s.update_loss(i, float(i))
    s.update_weights()
    # hardest sample (9) gets 4x the weight of easiest (0)
    assert s.weights[9] / s.weights[0] == pytest.approx(4.0, rel=1e-6)
    idx = s.epoch_indexes()
    assert len(idx) == 10
    top = HardExampleSampler(10, method=MiningMethod.TOP10, scale_factor=4.0)
    for i in range(10):
        top.update_loss(i, float(i))
    top.update_weights()
    assert top.weights[9] > top.weights[0]


def test_schedules():
    s = build_schedule("cosine", 1.0, steps_per_epoch=10, t_0=2)
    assert s(0) == pytest.approx(1.0)
    assert s(10) == pytest.approx(0.5, abs=0.01)  # halfway through cycle
    s2 = build_schedule("step", 1.0, steps_per_epoch=10, step_size=1, gamma=0.5)
    assert s2(0) == 1.0 and s2(10) == 0.5 and s2(20) == 0.25
    s3 = build_schedule("multistep", 1.0, 10, milestones=[1, 2], gamma=0.1)
    assert s3(25) == pytest.approx(0.01)


@pytest.mark.slow
def test_wd_mask_excludes_bias_and_norm():
    model = create_model("waifu2x.swin_unet_2x", base_dim=48)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    mask = wd_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_name = {"/".join(p.key for p in path): v for path, v in flat}
    biases = [k for k in by_name if k.endswith("bias")]
    tables = [k for k in by_name if "relative_position_bias_table" in k]
    kernels = [k for k in by_name if k.endswith("kernel")]
    assert biases and all(not by_name[k] for k in biases)
    assert tables and all(not by_name[k] for k in tables)
    assert kernels and all(by_name[k] for k in kernels)


def test_wd_mask_excludes_bn_running_stats():
    """FrozenBatchNorm mean/var live in the params tree with zero
    gradients; weight decay must never shrink them (ADVICE r4)."""
    params = {"bn0": {"scale": np.ones((8,)), "bias": np.zeros((8,)),
                      "mean": np.zeros((8,)), "var": np.ones((8,))},
              "conv0": {"kernel": np.ones((3, 3, 8, 8)),
                        "bias": np.zeros((8,))}}
    mask = wd_mask(params)
    assert not mask["bn0"]["mean"] and not mask["bn0"]["var"]
    assert not mask["bn0"]["scale"] and mask["conv0"]["kernel"]
    # excluded even if a future refactor makes the stats 2-D
    params["bn0"]["mean"] = np.zeros((8, 1))
    assert not wd_mask(params)["bn0"]["mean"]


def test_trainer_eval_params_fn_hook(tmp_path):
    """eval_params_fn transforms params before eval AND best-export
    (vgg11 BN recalibration wiring, ADVICE r4)."""
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 16, 3))
    rng = np.random.default_rng(0)
    xs = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    batch = {"x": xs, "y": xs[:, 7:-7, 7:-7].copy()}

    def loss_fn(p, b, k):
        pred = model.apply({"params": p}, b["x"], train=True)
        return jnp.mean(jnp.abs(pred - b["y"])), {}

    seen = []

    def eval_fn(p, b):
        pred = model.apply({"params": p}, b["x"], train=False)
        return jnp.mean(jnp.abs(pred - b["y"]))

    def eval_params_fn(p):
        seen.append(True)
        return p

    cfg = TrainerConfig(model_dir=str(tmp_path), max_epoch=1,
                        learning_rate=1e-4)
    tr = Trainer(cfg, model, params, loss_fn, eval_fn, steps_per_epoch=1,
                 eval_params_fn=eval_params_fn)
    tr.fit(lambda: iter([batch]), lambda: iter([batch]))
    assert seen  # hook ran before eval/export


def test_adaptive_weight():
    w = calculate_adaptive_weight(jnp.asarray(2.0), jnp.asarray(1.0))
    assert float(w) == pytest.approx(2.0, rel=1e-4)
    assert float(calculate_adaptive_weight(jnp.asarray(100.0), jnp.asarray(1.0))) == 10.0


def test_ohem_wired_into_fit(tmp_path):
    """VERDICT r1 item 8: epoch loss feedback shifts sampling weights
    toward high-loss samples (reference waifu2x/training/trainer.py:274,
    548)."""
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 16, 3))

    rng = np.random.default_rng(0)
    n = 8
    xs = rng.uniform(size=(n, 16, 16, 3)).astype(np.float32)
    ys = xs[:, 7:-7, 7:-7].copy()
    # samples 6,7 have unlearnable targets -> persistently high loss
    ys[6:] = 1.0 - ys[6:]

    def loss_fn(p, batch, rng_key):
        pred = model.apply({"params": p}, batch["x"], train=True)
        return jnp.mean(jnp.abs(pred - batch["y"])), {}

    sampler = HardExampleSampler(n, method=MiningMethod.LINEAR, seed=0)

    def loader():
        # batches of 2 in fixed order so indexes map to loss levels
        idx = sampler.epoch_indexes()[:n]
        for i in range(0, n, 2):
            sel = idx[i:i + 2]
            yield {"x": xs[sel], "y": ys[sel],
                   "index": np.asarray(sel, np.int64)}

    cfg = TrainerConfig(model_dir=str(tmp_path), max_epoch=3,
                        optimizer="adam", learning_rate=1e-3)
    tr = Trainer(cfg, model, params, loss_fn, steps_per_epoch=4)
    tr.fit(loader, hard_sampler=sampler)
    w = sampler.weights
    # hard samples (6,7) must end with above-average sampling weight
    assert w[6] > w.mean() or w[7] > w.mean(), w


def test_waifu2x_dataset_batches_with_sampler():
    from nunif_tpu.waifu2x.training.dataset import Waifu2xDataset
    ds = Waifu2xDataset(None, num_samples=16, model_offset=7,
                        scale_factor=1, tile_size=32, style="art",
                        noise_level=-1, synthetic_p=1.0, training=True,
                        seed=0)
    sampler = HardExampleSampler(16, seed=1)
    batches = list(ds.batches(4, n_threads=2, sampler=sampler))
    assert batches and all("index" in b for b in batches)
    idx = np.concatenate([b["index"] for b in batches])
    assert idx.min() >= 0 and idx.max() < 16


def test_schedules_trace_under_jit():
    """optax calls the schedule with a TRACED count inside the jitted
    update — every schedule must trace (the first real cosine training
    run hit ConcretizationTypeError from math.cos on a tracer)."""
    import jax
    from nunif_tpu.training.schedules import build_schedule

    for name, kw in (("none", {}), ("step", {}),
                     ("multistep", {"milestones": [1, 3]}),
                     ("cosine", {}), ("cosine", {"t_mult": 2}),
                     ("cosine", {"warmup_epochs": 1})):
        sched = build_schedule(name, 1e-3, 10, **kw)
        v = jax.jit(sched)(jnp.asarray(25))
        assert np.isfinite(float(v)) and 0 <= float(v) <= 1e-3 * 1.001, \
            (name, kw)
        # host eval with a plain int must agree
        np.testing.assert_allclose(float(v), float(sched(25)), rtol=1e-6)


def test_steps_per_dispatch_equivalent(tmp_path):
    """k optimizer steps fused into one scanned dispatch == k separate
    dispatches (deterministic loss; remainder exercises the single-step
    fallback path)."""
    model = create_model("waifu2x.vgg_7")
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 16, 3))

    rng = np.random.default_rng(7)
    batches = [
        {"x": rng.uniform(size=(2, 16, 16, 3)).astype(np.float32),
         "y": rng.uniform(size=(2, 2, 2, 3)).astype(np.float32),
         "index": np.array([2 * i, 2 * i + 1])}
        for i in range(6)
    ]

    def loss_fn(p, batch, rng_key):
        pred = model.apply({"params": p}, batch["x"], train=True)
        return jnp.mean(jnp.abs(pred - batch["y"])), {}

    def run(k):
        cfg = TrainerConfig(model_dir=str(tmp_path / f"k{k}"), max_epoch=1,
                            optimizer="adam", learning_rate=1e-3,
                            steps_per_dispatch=k)
        tr = Trainer(cfg, model, params, loss_fn, steps_per_epoch=6)
        sampler = HardExampleSampler(12, method=MiningMethod.LINEAR)
        tr.fit(lambda: [dict(b) for b in batches], hard_sampler=sampler)
        return tr, sampler

    tr1, s1 = run(1)
    # k=4: one fused group of 4 + a 2-batch remainder through the
    # single-step path
    tr4, s4 = run(4)
    flat1 = jax.tree_util.tree_leaves(tr1.state.params)
    flat4 = jax.tree_util.tree_leaves(tr4.state.params)
    for a, b in zip(flat1, flat4):
        # scanned vs per-batch programs compile differently: f32
        # reassociation through adam's rsqrt gives ~1e-4 rel drift
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)
    assert int(tr4.state.step) == 6
    # per-step losses reached the sampler identically
    np.testing.assert_allclose(s1.weights, s4.weights, rtol=1e-4)
