"""Synthetic shaky-video generator for stabilizer testing.

Behavioral parity target: reference stlizer/training/gen_test_video.py —
takes still image(s), applies a smoothed gaussian random-walk of
shift-x/shift-y/rotation per frame (two noise bands: fast small + slow
large), and encodes a test clip whose camera shake the stabilizer should
remove.  No per-object motion.

TPU re-design: all frames are warped in one vmapped affine grid-sample
program on device, then streamed to the encoder.

Usage:
    python -m nunif_tpu.stlizer.gen_test_video -i image.png -o shaky.mp4
"""
from __future__ import annotations

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..modules.grid_sample import grid_sample
from ..utils.pil_io import load_image
from .pipeline import gaussian_kernel1d, smooth1d


def _band_noise(rng, n, scale, k_fast=3, k_slow=15):
    """Two-band smoothed gaussian noise (reference gen_test_video.py:52-63)."""
    fast = smooth1d(rng.standard_normal(n) * scale * 0.8,
                    gaussian_kernel1d(k_fast))
    slow = smooth1d(rng.standard_normal(n) * scale * 0.2,
                    gaussian_kernel1d(k_slow))
    return (fast + slow).astype(np.float32)


def make_shake_trajectory(n_frames: int, noise_scale: float = 10.0,
                          shift: bool = True, rotate: bool = True,
                          seed: int = 71):
    """Returns (tx, ty, angle_rad) arrays of length n_frames (pixels/rad)."""
    rng = np.random.default_rng(seed)
    sw = 1.0 if shift else 0.0
    rw = 1.0 if rotate else 0.0
    tx = _band_noise(rng, n_frames, noise_scale * sw)
    ty = _band_noise(rng, n_frames, noise_scale * sw)
    ang = _band_noise(rng, n_frames, noise_scale * 0.05 * rw) * (np.pi / 180.0)
    return tx, ty, ang


@jax.jit
def _warp_frames(img, tx, ty, ang):
    """img (H,W,3) [0,1]; tx/ty pixels, ang rad -> (B,H,W,3) warped frames."""
    H, W = img.shape[0], img.shape[1]
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0

    def one(t_x, t_y, a):
        ca, sa = jnp.cos(a), jnp.sin(a)
        # inverse affine: rotate about center then translate
        x0 = xx - cx
        y0 = yy - cy
        sx = ca * x0 - sa * y0 + cx + t_x
        sy = sa * x0 + ca * y0 + cy + t_y
        # normalized [-1,1] grid for grid_sample
        gx = sx / (W - 1) * 2.0 - 1.0
        gy = sy / (H - 1) * 2.0 - 1.0
        grid = jnp.stack([gx, gy], axis=-1)[None]
        return grid_sample(img[None], grid, mode="bilinear",
                           padding_mode="reflection")[0]

    return jax.vmap(one)(tx, ty, ang)


def generate_shaky_video(image_paths, output_path: str,
                         noise_scale: float = 10.0, fps: int = 30,
                         seconds_per_image: float = 5.0,
                         shift: bool = True, rotate: bool = True,
                         seed: int = 71, batch_size: int = 16):
    from ..video import generate_video, VideoOutputConfig
    if isinstance(image_paths, str):
        image_paths = [image_paths]
    imgs = []
    for p in image_paths:
        x, _meta = load_image(p)
        # mod-8 crop like the reference (gen_test_video.py:19-24)
        h = x.shape[0] - x.shape[0] % 8
        w = x.shape[1] - x.shape[1] % 8
        imgs.append(x[:h, :w, :3])
    assert all(i.shape == imgs[0].shape for i in imgs), \
        "all input images must have the same size"
    n_per = int(round(fps * seconds_per_image))
    tx, ty, ang = make_shake_trajectory(
        n_per * len(imgs), noise_scale, shift, rotate, seed)

    def frames():
        k = 0
        for img in imgs:
            dimg = jnp.asarray(img)
            for s in range(0, n_per, batch_size):
                e = min(s + batch_size, n_per)
                batch = _warp_frames(dimg, jnp.asarray(tx[k + s:k + e]),
                                     jnp.asarray(ty[k + s:k + e]),
                                     jnp.asarray(ang[k + s:k + e]))
                batch = np.asarray(
                    (jnp.clip(batch, 0, 1) * 255 + 0.5).astype(jnp.uint8))
                yield from batch
            k += n_per

    h, w = imgs[0].shape[:2]
    n = generate_video(output_path, frames(), w, h, fps=fps,
                       config=VideoOutputConfig(preset="medium", crf=20,
                                                audio_copy=False))
    return n, (tx, ty, ang)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="generate a synthetic shaky test video",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--input", "-i", nargs="+", required=True)
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--noise-scale", type=float, default=10.0)
    p.add_argument("--disable-shift", action="store_true")
    p.add_argument("--disable-rotate", action="store_true")
    p.add_argument("--seconds", type=float, default=5.0,
                   help="seconds per input image")
    p.add_argument("--seed", type=int, default=71)
    args = p.parse_args(argv)
    n, _ = generate_shaky_video(
        args.input, args.output, noise_scale=args.noise_scale,
        shift=not args.disable_shift, rotate=not args.disable_rotate,
        seconds_per_image=args.seconds, seed=args.seed)
    print(f"wrote {n} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
