"""Trainer — host-side training lifecycle (reference: nunif/training/trainer.py).

Owns: seeding, model/optimizer/schedule creation, epoch loop, eval,
best/checkpoint saving with resume, CSV loss log.  The per-batch math lives
in the jitted step from ``env.make_train_step``.

Checkpoint format: flax msgpack of the full TrainState + json meta, written
atomically; the best model is additionally exported as a self-describing
inference checkpoint via models.io.save_model.
"""
from __future__ import annotations

import csv
import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

from ..core.logger import logger
from ..core.rng import RNG
from ..models import save_model
from .env import TrainState, make_train_step, make_eval_step
from .schedules import build_schedule
from .wd_groups import wd_mask


def create_optimizer(name: str, lr_schedule, *, weight_decay: float = 0.0,
                     params=None, grad_clip: Optional[float] = None,
                     **kw) -> optax.GradientTransformation:
    """Optimizer zoo (reference trainer.py:183-236: adam/adamw/sgd/lion)."""
    name = name.lower()
    mask = wd_mask(params) if (params is not None and weight_decay) else None
    if name == "adam":
        opt = optax.adam(lr_schedule, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999))
    elif name == "adamw":
        opt = optax.adamw(lr_schedule, b1=kw.get("b1", 0.9),
                          b2=kw.get("b2", 0.999),
                          weight_decay=weight_decay, mask=mask)
    elif name == "sgd":
        opt = optax.sgd(lr_schedule, momentum=kw.get("momentum", 0.9),
                        nesterov=kw.get("nesterov", True))
    elif name == "lion":
        opt = optax.lion(lr_schedule, b1=kw.get("b1", 0.9),
                         b2=kw.get("b2", 0.99),
                         weight_decay=weight_decay, mask=mask)
    elif name in ("schedulefree", "schedulefree_adamw"):
        # reference trainer.py:214-236 (RAdamScheduleFree); evaluation must
        # read optax.contrib.schedule_free_eval_params(opt_state, params)
        base = optax.adamw(lr_schedule, b1=0.0, b2=kw.get("b2", 0.999),
                           weight_decay=weight_decay, mask=mask)
        opt = optax.contrib.schedule_free(
            base, learning_rate=lr_schedule, b1=kw.get("b1", 0.9))
    else:
        raise ValueError(f"unknown optimizer: {name}")
    if grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


@dataclasses.dataclass
class TrainerConfig:
    model_dir: str = "models"
    max_epoch: int = 200
    optimizer: str = "adam"
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None
    scheduler: str = "none"
    scheduler_kw: dict = dataclasses.field(default_factory=dict)
    accum_steps: int = 1          # reference --backward-step
    # optimizer steps fused into one device program per dispatch
    # (env.make_train_step steps_per_dispatch — amortizes host dispatch
    # latency; 1 = a dispatch per batch like the reference's train loop)
    steps_per_dispatch: int = 1
    ema_decay: Optional[float] = None
    seed: int = 71
    nan_limit: int = 100          # reference env.py tolerate <=100 NaNs
    resume: bool = False
    checkpoint_name: str = "checkpoint"
    save_every_epoch: bool = False
    # data-parallel device mesh (jax.sharding.Mesh with a "dp" axis) — the
    # TPU equivalent of the reference's DataParallel training
    # (reference nunif/models/register.py:44-49); None = single device
    mesh: object = None


class Trainer:
    """Generic trainer. Apps subclass or compose:

      trainer = Trainer(cfg, model, params, loss_fn, eval_fn)
      trainer.fit(train_loader_fn, eval_loader_fn)

    loaders are callables returning an iterator of batches (pytrees of
    numpy/jax arrays) per epoch — the host-side data pipeline.
    """

    def __init__(self, cfg: TrainerConfig, model, params,
                 loss_fn: Callable, eval_fn: Optional[Callable] = None,
                 steps_per_epoch: int = 1000,
                 best_is_min: bool = True,
                 eval_params_fn: Optional[Callable] = None):
        """eval_params_fn: optional params -> params transform applied
        before eval and before best-model export (e.g. BatchNorm running-
        stat recalibration, imagenet.training.calibrate_bn)."""
        self.cfg = cfg
        self.model = model
        self.eval_params_fn = eval_params_fn
        self.rng = RNG(cfg.seed)
        self.best_is_min = best_is_min

        schedule = build_schedule(cfg.scheduler, cfg.learning_rate,
                                  steps_per_epoch, **cfg.scheduler_kw)
        self.tx = create_optimizer(
            cfg.optimizer, schedule, weight_decay=cfg.weight_decay,
            params=params, grad_clip=cfg.grad_clip)
        self.state = TrainState.create(params, self.tx,
                                       use_ema=cfg.ema_decay is not None)
        self.mesh = cfg.mesh
        if self.mesh is not None:
            # replicate params/opt state; batches are dp-sharded in fit()
            # and GSPMD inserts the gradient psum (SURVEY.md §2.6(1))
            from ..parallel.mesh import replicated
            import jax as _jax
            s = replicated(self.mesh)
            self.state = _jax.tree_util.tree_map(
                lambda x: _jax.device_put(x, s) if hasattr(x, "shape") else x,
                self.state)
        self.train_step = make_train_step(
            loss_fn, self.tx, accum_steps=cfg.accum_steps,
            ema_decay=cfg.ema_decay)
        self.train_step_multi = None
        if cfg.steps_per_dispatch > 1:
            self.train_step_multi = make_train_step(
                loss_fn, self.tx, accum_steps=cfg.accum_steps,
                ema_decay=cfg.ema_decay,
                steps_per_dispatch=cfg.steps_per_dispatch)
        self.eval_step = make_eval_step(eval_fn) if eval_fn else None

        self.last_epoch = 0
        self.best_score = float("inf") if best_is_min else float("-inf")
        os.makedirs(cfg.model_dir, exist_ok=True)
        self.loss_csv = os.path.join(
            cfg.model_dir, f"loss_{int(time.time())}.csv")
        if cfg.resume:
            self._load_checkpoint()

    # ------------------------------------------------------------ checkpoint
    @property
    def checkpoint_path(self):
        return os.path.join(self.cfg.model_dir,
                            f"{self.cfg.checkpoint_name}.ckpt")

    def _save_checkpoint(self):
        blob = serialization.to_bytes(self.state)
        meta = {"last_epoch": self.last_epoch, "best_score": self.best_score}
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(json.dumps(meta).encode() + b"\n")
            f.write(blob)
        os.replace(tmp, self.checkpoint_path)
        logger.debug("checkpoint saved: %s", self.checkpoint_path)

    def _load_checkpoint(self):
        if not os.path.exists(self.checkpoint_path):
            logger.info("no checkpoint to resume from: %s", self.checkpoint_path)
            return
        with open(self.checkpoint_path, "rb") as f:
            meta = json.loads(f.readline().decode())
            blob = f.read()
        self.state = serialization.from_bytes(self.state, blob)
        self.last_epoch = meta["last_epoch"]
        self.best_score = meta["best_score"]
        logger.info("resumed from epoch %d (best %.5f)",
                    self.last_epoch, self.best_score)

    def export_best_model(self, params, suffix=""):
        path = os.path.join(self.cfg.model_dir,
                            f"{self.model.model_name.replace('.', '_')}{suffix}.nztm")
        # record serializable train args only (the mesh is a live object)
        train_kwargs = {f.name: getattr(self.cfg, f.name)
                        for f in dataclasses.fields(self.cfg)
                        if f.name != "mesh"}
        save_model(self.model, params, path, train_kwargs=train_kwargs)
        return path

    # ----------------------------------------------------------------- loop
    def fit(self, train_loader_fn: Callable[[], Iterable],
            eval_loader_fn: Optional[Callable[[], Iterable]] = None,
            on_epoch_end: Optional[Callable] = None,
            hard_sampler=None):
        """hard_sampler: HardExampleSampler receiving per-batch loss
        feedback at epoch end (reference waifu2x/training/trainer.py:274,
        548 — batch losses written to each index, weights recomputed per
        epoch)."""
        cfg = self.cfg
        k = cfg.steps_per_dispatch if self.train_step_multi is not None else 1
        for epoch in range(self.last_epoch, cfg.max_epoch):
            t0 = time.time()
            losses = []   # one entry per dispatch: scalar or (group,) array
            batch_indexes = []
            group = []

            def flush(group):
                if len(group) == k and k > 1:
                    # full group: ONE device program runs k optimizer steps
                    batches = jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *group)
                    if self.mesh is not None:
                        from jax.sharding import NamedSharding, PartitionSpec
                        s = NamedSharding(self.mesh,
                                          PartitionSpec(None, "dp"))
                        batches = jax.tree_util.tree_map(
                            lambda x: jax.device_put(x, s), batches)
                    self.state, metrics = self.train_step_multi(
                        self.state, batches, self.rng.next())
                    losses.append(metrics["loss"])  # (k,)
                else:
                    # remainder (or k == 1): per-batch jitted step
                    for b in group:
                        if self.mesh is not None:
                            from ..parallel.mesh import shard_batch
                            b = shard_batch(self.mesh, b)
                        self.state, metrics = self.train_step(
                            self.state, b, self.rng.next())
                        losses.append(metrics["loss"])

            for batch in train_loader_fn():
                if isinstance(batch, dict) and "index" in batch:
                    batch = dict(batch)
                    batch_indexes.append(batch.pop("index"))
                group.append(batch)
                if len(group) == k:
                    flush(group)
                    group = []
            flush(group)
            # one sync per epoch; flatten per-dispatch entries to per-step
            losses = list(np.concatenate(
                [np.atleast_1d(np.asarray(v)) for v in jax.device_get(losses)]
            )) if losses else []
            losses = [float(v) for v in losses]
            if hard_sampler is not None and batch_indexes:
                for idx, loss in zip(batch_indexes, losses):
                    hard_sampler.update_losses(
                        idx, np.full(len(idx), loss))
                hard_sampler.update_weights()
            nan_count = int(self.state.nan_count)
            if nan_count > cfg.nan_limit:
                raise RuntimeError(f"too many NaN losses: {nan_count}")
            train_loss = float(np.mean([v for v in losses])) if losses else 0.0

            eval_params = (self.state.ema_params
                           if self.state.ema_params is not None
                           else self.state.params)
            if self.eval_params_fn is not None:
                eval_params = self.eval_params_fn(eval_params)

            eval_score = None
            if self.eval_step is not None and eval_loader_fn is not None:
                scores = []
                for batch in eval_loader_fn():
                    scores.append(self.eval_step(eval_params, batch))
                vals = jax.device_get(scores)
                eval_score = float(np.mean([list(v.values())[0] if isinstance(v, dict) else v
                                            for v in vals]))

            self.last_epoch = epoch + 1
            self._log_epoch(epoch, train_loss, eval_score, time.time() - t0)
            self._save_checkpoint()

            score = eval_score if eval_score is not None else train_loss
            improved = (score < self.best_score) if self.best_is_min \
                else (score > self.best_score)
            if improved:
                self.best_score = score
                self.export_best_model(jax.device_get(eval_params))
                logger.info("epoch %d: new best %.5f", epoch, score)
            if cfg.save_every_epoch:
                self.export_best_model(jax.device_get(self.state.params),
                                       suffix=f".epoch{epoch}")
            if on_epoch_end:
                on_epoch_end(self, epoch, train_loss, eval_score)
        return self.state

    def _log_epoch(self, epoch, train_loss, eval_score, elapsed):
        logger.info("epoch %d: train_loss=%.5f eval=%s (%.1fs)",
                    epoch, train_loss,
                    f"{eval_score:.5f}" if eval_score is not None else "-",
                    elapsed)
        new = not os.path.exists(self.loss_csv)
        with open(self.loss_csv, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["epoch", "train_loss", "eval_score", "elapsed_sec"])
            w.writerow([epoch, train_loss, eval_score, round(elapsed, 2)])
