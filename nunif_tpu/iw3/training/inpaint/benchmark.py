"""Inpaint model quality benchmark: masked PSNR (+ LPIPS) on the eval set.

Behavioral parity target: reference iw3/training/inpaint/benchmark.py —
per-sample PSNR restricted to hole pixels (mse weighted by the mask), mean
over the eval split, optional LPIPS.  Works on image (InpaintDataset) and
video (VideoInpaintDataset) checkpoints.

Usage:
    python -m nunif_tpu.iw3.training.inpaint.benchmark \
        --checkpoint-file m.nztm [--data-dir d] [--video]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ....core.logger import logger
from .dataset import InpaintDataset, VideoInpaintDataset


def masked_psnr(pred, target, mask):
    """Per-sample PSNR over masked (hole) pixels only
    (reference benchmark.py:15-30)."""
    pred = jnp.clip(pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)
    mask = jnp.broadcast_to(mask, pred.shape).astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    se = ((pred - target) ** 2 * mask).sum(axis=axes)
    cnt = jnp.maximum(mask.sum(axis=axes), 1.0)
    mse = se / cnt
    return 10.0 * jnp.log10(1.0 / (mse + 1e-6))


def benchmark_main(checkpoint=None, data_dir=None, video=False,
                   size=128, num_samples=64, batch_size=8, lpips=False,
                   seed=71):
    from ....models import create_model
    from ....models.io import load_model
    if checkpoint:
        model, params, _ = load_model(checkpoint)
    else:
        from ... import models as _m  # noqa: F401
        name = ("inpaint.light_video_inpaint_v1" if video
                else "inpaint.light_inpaint_v1")
        model = create_model(name)
        if video:
            from ...models.light_video_inpaint_v1 import SEQ_LEN
            xz = jnp.zeros((SEQ_LEN, size, size, 3), jnp.float32)
            mz = jnp.zeros((SEQ_LEN, size, size, 1), jnp.float32)
        else:
            xz = jnp.zeros((1, size, size, 3), jnp.float32)
            mz = jnp.zeros((1, size, size, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), xz, mask=mz,
                            train=False)["params"]
        logger.warning("inpaint benchmark: random-init %s "
                       "(no --checkpoint-file)", name)

    if video:
        ds = VideoInpaintDataset(data_dir, size=size,
                                 num_samples=max(num_samples // 8, 4),
                                 seed=seed, training=False)
    else:
        ds = InpaintDataset(data_dir, size=size, num_samples=num_samples,
                            seed=seed, training=False)

    @jax.jit
    def infer(params, x, mask):
        y = model.apply({"params": params}, x, mask=mask, train=False)
        if isinstance(y, tuple):
            y = y[0]
        return y

    lpips_fn = None
    if lpips:
        from ....modules.lpips import LPIPS
        _lpips = LPIPS()
        _dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        _lp = _lpips.init(jax.random.PRNGKey(0), _dummy, _dummy,
                          normalize=True)
        lpips_fn = jax.jit(lambda a, b: _lpips.apply(_lp, a, b,
                                                     normalize=True))

    psnrs, lpipss = [], []
    for batch in ds.batches(batch_size):
        y = jnp.asarray(batch["y"], jnp.float32)
        mask = jnp.asarray(batch["mask"], jnp.float32)
        if mask.ndim == y.ndim - 1:
            mask = mask[..., None]
        x = y * (1.0 - mask)
        pred = infer(params, x, mask)
        # composite: only hole pixels come from the model
        comp = y * (1.0 - mask) + pred * mask
        psnrs.append(np.asarray(masked_psnr(comp, y, mask)))
        if lpips_fn is not None:
            flat_c = comp.reshape((-1,) + comp.shape[-3:])
            flat_y = y.reshape((-1,) + y.shape[-3:])
            lpipss.append(float(lpips_fn(flat_c, flat_y).mean()))
    mean_psnr = float(np.concatenate([p.reshape(-1) for p in psnrs]).mean())
    result = {"masked_psnr": mean_psnr}
    if lpipss:
        result["lpips"] = float(np.mean(lpipss))
    return result


def main(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data-dir", "-i", default=None,
                   help="eval image dir (synthetic images when omitted)")
    p.add_argument("--checkpoint-file", default=None)
    p.add_argument("--video", action="store_true")
    p.add_argument("--lpips", action="store_true")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--num-samples", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args(argv)
    r = benchmark_main(checkpoint=args.checkpoint_file,
                       data_dir=args.data_dir, video=args.video,
                       size=args.size, num_samples=args.num_samples,
                       batch_size=args.batch_size, lpips=args.lpips)
    for k, v in r.items():
        print(f"{k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
