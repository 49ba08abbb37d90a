"""Sweep the mask-MLBW hole-mask sigmoid threshold against forward-warp
ground-truth occlusion masks.

Behavioral parity target: reference iw3/training/sbs/find_mask_threshold.py
— for RGB+depth pairs, compute (a) the forward-warp non-warp (hole) mask
and (b) the mask-model's thresholded hole mask, report mean IOU per
threshold so the best inference threshold can be picked; plus a
``--visualize`` mode dumping the two masks side by side.

Usage:
    python -m nunif_tpu.iw3.training.sbs.find_mask_threshold \
        --rgb-dir rgb/ --depth-dir depth/ --checkpoint-file mask_mlbw.nztm
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ....core.logger import logger
from ....modules.jaccard import jaccard_index
from ....utils.image_loader import list_images
from ....utils.pil_io import load_image, save_image
from ...forward_warp import depth_order_bilinear_forward_warp
from ...backward_warp import make_input_tensor, postprocess_hole_mask
from ...dilation import mask_closing


def forward_nonwarp_mask(rgb, depth, divergence=2.0, convergence=0.5):
    """Ground-truth hole masks from the depth-ordered forward warp
    (reference find_mask_threshold.py forward_nonwarp_mask)."""
    _l, _r, left_mask, right_mask = depth_order_bilinear_forward_warp(
        rgb, depth, divergence, convergence, fill=False, return_mask=True)
    m = jnp.maximum(left_mask.astype(jnp.float32),
                    right_mask.astype(jnp.float32))
    return mask_closing((m > 0.9).astype(jnp.float32), n_iter=1)


def model_hole_mask(model, params, rgb, depth, divergence=2.0,
                    convergence=0.5, threshold=0.4):
    """Thresholded hole-mask prediction of a sbs.mask_mlbw_* model."""
    B, H, W, _ = rgb.shape
    x = make_input_tensor(rgb, depth, divergence, convergence, W)
    out = model.apply({"params": params}, x, train=False)
    logits = out[2] if isinstance(out, (tuple, list)) and len(out) >= 3 \
        else None
    assert logits is not None, \
        "checkpoint is not a hole-mask model (sbs.mask_mlbw_*)"
    return postprocess_hole_mask(logits, (H, W), threshold)


def sweep(rgb_dir, depth_dir, checkpoint, divergence=2.0,
          thresholds=(0.2, 0.3, 0.4, 0.5, 0.6, 0.7),
          visualize_dir=None, limit=None):
    from ....models.io import load_model
    rgb_files = list_images(rgb_dir)
    depth_files = list_images(depth_dir)
    if len(rgb_files) != len(depth_files) or not rgb_files:
        raise ValueError(
            f"rgb/depth mismatch: {len(rgb_files)} vs {len(depth_files)}")
    if limit:
        rgb_files, depth_files = rgb_files[:limit], depth_files[:limit]
    model, params, _ = load_model(checkpoint)

    results = {t: [] for t in thresholds}
    for i, (rf, df) in enumerate(zip(rgb_files, depth_files)):
        rgb, _m1 = load_image(rf)
        dep, _m2 = load_image(df, color="gray")
        rgb = jnp.asarray(rgb[None, ..., :3], jnp.float32)
        dep = jnp.asarray(dep[None, ..., :1], jnp.float32)
        gt = forward_nonwarp_mask(rgb, dep, divergence)
        for t in thresholds:
            pred = model_hole_mask(model, params, rgb, dep, divergence,
                                   threshold=t)
            iou = float(jaccard_index(pred, gt))
            results[t].append(iou)
            if visualize_dir and t == thresholds[len(thresholds) // 2]:
                os.makedirs(visualize_dir, exist_ok=True)
                vis = np.concatenate([np.asarray(gt[0]),
                                      np.asarray(pred[0])], axis=1)
                save_image(np.repeat(vis, 3, axis=-1),
                           os.path.join(visualize_dir, f"mask_{i:04d}.png"))
    return {t: float(np.mean(v)) for t, v in results.items()}


def main(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--rgb-dir", required=True)
    p.add_argument("--depth-dir", required=True)
    p.add_argument("--checkpoint-file", required=True)
    p.add_argument("--divergence", type=float, default=2.0)
    p.add_argument("--visualize-dir", default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    scores = sweep(args.rgb_dir, args.depth_dir, args.checkpoint_file,
                   divergence=args.divergence,
                   visualize_dir=args.visualize_dir, limit=args.limit)
    best = max(scores, key=scores.get)
    for t, s in sorted(scores.items()):
        mark = " <-- best" if t == best else ""
        print(f"threshold={t:.2f} IOU={s:.4f}{mark}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
