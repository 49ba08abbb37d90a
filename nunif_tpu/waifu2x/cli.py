"""waifu2x CLI (reference: waifu2x/cli.py + waifu2x/ui_utils.py:217-436).

Usage:
  python -m nunif_tpu.waifu2x.cli -i in.png -o out.png --method scale --noise-level 1
  python -m nunif_tpu.waifu2x.cli -i in_dir/ -o out_dir/ --method noise_scale ...

Video input is handled when the input is a video file (see
nunif_tpu/utils/video.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..core.logger import logger
from ..utils import pil_io
from .runtime import Waifu2x, METHODS

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp", ".tif", ".tiff")
VIDEO_EXTS = (".mp4", ".mkv", ".avi", ".webm", ".mov", ".m2ts", ".ts")


def _tile_size_arg(v):
    """int or "HxW" (rectangular tiles, e.g. 592x1936)."""
    if v is None:
        return None
    s = str(v).lower()
    if "x" in s:
        h, w = s.split("x")
        return (int(h), int(w))
    return int(s)

def create_parser():
    p = argparse.ArgumentParser(
        prog="nunif_tpu.waifu2x",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--input", "-i", required=True,
                   help="input file, directory, or text file of paths")
    p.add_argument("--output", "-o", required=True,
                   help="output file or directory")
    p.add_argument("--method", "-m", default="noise_scale", choices=METHODS)
    p.add_argument("--noise-level", "-n", type=int, default=0,
                   choices=[0, 1, 2, 3])
    p.add_argument("--model-dir", type=str, default=None,
                   help="model checkpoint directory")
    p.add_argument("--arch", type=str, default=None,
                   help="initialize this architecture with random weights "
                        "instead of loading a checkpoint (for testing)")
    p.add_argument("--tile-size", type=_tile_size_arg, default=None,
                   help="tile size: int or HxW (e.g. 592x1936)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--devices", type=int, default=1,
                   help="shard tile minibatches over the first N devices "
                        "(dp mesh; the reference's multi-GPU --gpu list)")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--format", "-f", default="png",
                   choices=["png", "webp", "jpeg"])
    p.add_argument("--quality", "-q", type=int, default=95)
    p.add_argument("--resume", action="store_true",
                   help="skip outputs that already exist")
    p.add_argument("--recursive", "-r", action="store_true")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--image-lib", default="pil", choices=["pil"])
    # video options (reference waifu2x/ui_utils.py video args subset)
    p.add_argument("--video-codec", default="libx264",
                   help="libx264/libx265/libvpx-vp9/mpeg4/utvideo")
    p.add_argument("--crf", type=int, default=20)
    p.add_argument("--preset", default="ultrafast")
    p.add_argument("--pix-fmt", default="yuv420p",
                   choices=["yuv420p", "yuv444p", "yuv420p10le", "rgb24",
                            "gbrp", "gbrp10le", "gbrp16le"])
    p.add_argument("--max-fps", type=float, default=128.0)
    p.add_argument("--video-batch", type=int, default=4,
                   help="frames per device batch for video")
    p.add_argument("--style", default=None,
                   choices=["art", "photo", "scan", "art_scan"],
                   help="model style; selects <model-dir>/<style> when "
                        "that subdirectory exists")
    p.add_argument("--depth", type=int, default=8, choices=[8, 16],
                   help="output bit depth (16 = 16-bit PNG / rgb48 video)")
    p.add_argument("--rotate-left", action="store_true",
                   help="rotate 90 CCW before processing (video)")
    p.add_argument("--rotate-right", action="store_true",
                   help="rotate 90 CW before processing (video)")
    p.add_argument("--grain", action="store_true",
                   help="add film grain after denoising")
    p.add_argument("--grain-strength", type=float, default=0.2)
    p.add_argument("--grain-speed", type=float, default=0.8,
                   help="noise update speed (video)")
    p.add_argument("--start-time", default=None,
                   help="video trim start (seconds or hh:mm:ss)")
    p.add_argument("--end-time", default=None,
                   help="video trim end (seconds or hh:mm:ss)")
    p.add_argument("--yes", "-y", action="store_true",
                   help="overwrite existing video outputs")
    p.add_argument("--video-format", "-vf", default="mp4",
                   choices=["mp4", "mkv", "avi"])
    p.add_argument("--video-bitrate", default=None)
    p.add_argument("--tune", nargs="+", default=[])
    p.add_argument("--profile-level", default=None)
    p.add_argument("--colorspace", default="auto",
                   choices=["auto", "unspecified", "copy",
                            "bt709", "bt709-pc", "bt709-tv",
                            "bt601", "bt601-pc", "bt601-tv"])
    return p


def parse_time(v):
    """seconds float or [hh:]mm:ss (reference --start-time format)."""
    if v is None:
        return None
    s = str(v)
    if ":" not in s:
        return float(s)
    parts = [float(p) for p in s.split(":")]
    t = 0.0
    for p in parts:
        t = t * 60.0 + p
    return t


def _iter_inputs(args):
    inp = args.input
    if os.path.isdir(inp):
        for root, _dirs, files in os.walk(inp):
            for f in sorted(files):
                if f.lower().endswith(IMAGE_EXTS):
                    yield os.path.join(root, f)
            if not args.recursive:
                break
    elif inp.lower().endswith(".txt"):
        with open(inp) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield line
    else:
        yield inp


def _output_path(args, in_path):
    if os.path.isdir(args.output) or args.output.endswith(os.sep) \
            or (not os.path.splitext(args.output)[1]):
        os.makedirs(args.output, exist_ok=True)
        stem = os.path.splitext(os.path.basename(in_path))[0]
        return os.path.join(args.output, stem + "." + args.format)
    return args.output


def _build_runtime(args) -> Waifu2x:
    model_dir = args.model_dir
    if not model_dir:
        # bundled TPU-native turbo zoo (see runtime.default_model_dir)
        from .runtime import default_model_dir
        model_dir = default_model_dir() or ""
        if model_dir:
            logger.info("using bundled model dir %s", model_dir)
    if model_dir and args.style:
        # reference selects the style sub-directory of the model zoo
        styled = os.path.join(model_dir, args.style)
        if os.path.isdir(styled):
            model_dir = styled
    mesh = None
    if getattr(args, "devices", 1) and args.devices > 1:
        import jax
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(devices=jax.devices()[:args.devices])
    w2x = Waifu2x(model_dir=model_dir, mesh=mesh)
    if args.arch:
        import jax
        from ..models import create_model
        import nunif_tpu.waifu2x.models  # noqa: F401
        model = create_model(args.arch)
        params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        key_noise = args.noise_level if args.method.startswith("noise") else None
        w2x.set_slot(args.method, key_noise, model, params)
        logger.warning("using RANDOM weights for %s (testing mode)", args.arch)
    return w2x


def process_images(args, w2x: Waifu2x):
    save_pool = ThreadPoolExecutor(max_workers=2)
    futures = []
    n = 0
    t0 = time.time()
    for in_path in _iter_inputs(args):
        out_path = _output_path(args, in_path)
        if args.resume and os.path.exists(out_path):
            continue
        x, meta = pil_io.load_image(
            in_path, color="gray" if args.grayscale else "rgb")
        alpha = None
        if x.shape[-1] == 4:
            alpha = x[..., 3:4]
            x = x[..., :3]
        rgb, out_alpha = w2x.convert(
            x, alpha, method=args.method, noise_level=args.noise_level,
            tile_size=args.tile_size, batch_size=args.batch_size, tta=args.tta)
        if args.grain:
            import jax
            from ..utils.rgb_noise import rgb_noise_like, apply_rgb_noise
            import jax.numpy as jnp
            key = jax.random.PRNGKey(n)
            noise = rgb_noise_like(key, jnp.asarray(rgb))
            # image grain uses half strength (reference ui_utils.py:58-61)
            rgb = apply_rgb_noise(jnp.asarray(rgb), noise,
                                  strength=args.grain_strength * 0.5)
        rgb = np.asarray(rgb)
        if out_alpha is not None:
            rgb = np.concatenate([rgb, np.asarray(out_alpha)], axis=-1)
        if args.depth == 16 and args.format == "png":
            rgb = (np.clip(rgb, 0.0, 1.0) * 65535.0 + 0.5).astype(np.uint16)
        kwargs = {}
        if args.format in ("jpeg", "webp"):
            kwargs["quality"] = args.quality
        futures.append(save_pool.submit(
            pil_io.save_image, rgb, out_path, meta, **kwargs))
        n += 1
    for f in futures:
        f.result()
    save_pool.shutdown()
    dt = time.time() - t0
    logger.info("processed %d images in %.2fs (%.2f img/s)",
                n, dt, n / dt if dt else 0)


def process_video(args, w2x: Waifu2x):
    from .. import video as VU
    import jax
    import jax.numpy as jnp
    from ..utils.rgb_noise import rgb_noise_like, apply_rgb_noise

    if os.path.exists(args.output) and not (args.yes or args.resume):
        logger.warning("output exists (use --yes to overwrite): %s",
                       args.output)
        return
    grain_state = {"key": jax.random.PRNGKey(0), "buffer": None}

    def frame_fn(frames):
        # frames: (N, H, W, 3) uint8 -> device float, upscale per frame,
        # return device array (writer thread forces readiness)
        if args.rotate_left:
            frames = np.rot90(frames, 1, axes=(1, 2)).copy()
        elif args.rotate_right:
            frames = np.rot90(frames, 3, axes=(1, 2)).copy()
        x = frames.astype(np.float32) / 255.0
        outs = [w2x.convert(f, None, method=args.method,
                            noise_level=args.noise_level,
                            tile_size=args.tile_size,
                            batch_size=args.batch_size, tta=args.tta)[0]
                for f in x]
        out = jnp.stack(outs)
        if args.grain:
            # EMA noise buffer (reference ui_utils.py:167-175)
            grain_state["key"], k = jax.random.split(grain_state["key"])
            noise = rgb_noise_like(k, out[0])
            if grain_state["buffer"] is None:
                grain_state["buffer"] = noise
            else:
                grain_state["buffer"] = (
                    grain_state["buffer"] * (1.0 - args.grain_speed)
                    + noise * args.grain_speed)
            out = apply_rgb_noise(out, grain_state["buffer"][None],
                                  strength=args.grain_strength)
        return out

    config = VU.VideoOutputConfig(
        codec=args.video_codec, crf=args.crf, preset=args.preset,
        pix_fmt=args.pix_fmt, max_fps=args.max_fps,
        rgb48=args.depth == 16,
        bitrate=args.video_bitrate, tune=tuple(args.tune),
        profile_level=args.profile_level, colorspace=args.colorspace)
    VU.process_video(args.input, args.output, frame_fn,
                     batch_size=args.video_batch, config=config,
                     start_time=parse_time(args.start_time),
                     end_time=parse_time(args.end_time))


def main(argv=None):
    # first-run UX: persistent compile cache (core/compile_cache.py)
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = create_parser().parse_args(argv)
    w2x = _build_runtime(args)
    if args.input.lower().endswith(VIDEO_EXTS):
        process_video(args, w2x)
    else:
        process_images(args, w2x)
    return 0


if __name__ == "__main__":
    sys.exit(main())
