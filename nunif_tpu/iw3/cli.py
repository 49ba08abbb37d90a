"""iw3 CLI — 2D image to stereo 3D.

Behavioral parity target: reference iw3/cli.py + iw3/utils.py:1935-2521
(option surface subset; video options land with the video runtime).

Usage:
  python -m nunif_tpu.iw3 -i input.png -o out/ --method forward_fill \
      --depth-model Any_V2_S --divergence 2.0 --half-sbs
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core.logger import logger
from .composition import StereoFormat
from .mapper import MAPPER_ALL
from .anaglyph import ANAGLYPH_TYPES

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}
VIDEO_EXTS = {".mp4", ".mkv", ".avi", ".webm", ".mov", ".m2ts", ".ts"}

METHODS = ["row_flow_v3", "row_flow_v2", "row_flow_v3_sym",
           "mlbw_l2", "mlbw_l4", "mlbw_l2s", "mlbw_l4s",
           "forward", "forward_fill", "forward_inpaint",
           "mlbw_l2_inpaint", "mlbw_l2_inpaint_video",
           "grid_sample", "backward", "NULL"]


def create_parser():
    p = argparse.ArgumentParser(prog="iw3", description=__doc__)
    p.add_argument("--input", "-i", required=True, help="input image/dir")
    p.add_argument("--output", "-o", required=True, help="output file/dir")
    p.add_argument("--method", default="row_flow_v3", choices=METHODS)
    p.add_argument("--divergence", "-d", type=float, default=2.0)
    p.add_argument("--convergence", "-c", type=float, default=0.5)
    p.add_argument("--depth-model", default="Any_V2_S")
    p.add_argument("--depth-checkpoint", default=None,
                   help="converted .nunif_tpu checkpoint for the depth model")
    p.add_argument("--stereo-checkpoint", default=None,
                   help="converted checkpoint for row_flow/mlbw models")
    p.add_argument("--mapper", default=None, choices=MAPPER_ALL + [None])
    p.add_argument("--foreground-scale", type=float, default=0)
    p.add_argument("--synthetic-view", default="both",
                   choices=["both", "right", "left"])
    p.add_argument("--preserve-screen-border", action="store_true")
    p.add_argument("--resolution", type=int, default=None,
                   help="depth model input resolution (multiple of 14)")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--edge-dilation", type=int, default=None)
    p.add_argument("--rotate-left", action="store_true")
    p.add_argument("--rotate-right", action="store_true")
    p.add_argument("--max-output-width", type=int, default=None)
    p.add_argument("--max-output-height", type=int, default=None)
    p.add_argument("--keep-aspect-ratio", action="store_true")
    # output formats
    p.add_argument("--half-sbs", action="store_true")
    p.add_argument("--tb", action="store_true")
    p.add_argument("--half-tb", action="store_true")
    p.add_argument("--cross-eyed", action="store_true")
    p.add_argument("--anaglyph", default=None, choices=ANAGLYPH_TYPES)
    p.add_argument("--vr180", action="store_true")
    p.add_argument("--rgbd", action="store_true")
    p.add_argument("--half-rgbd", action="store_true")
    p.add_argument("--pad", type=float, default=None)
    p.add_argument("--pad-mode", default="tblr",
                   choices=["tblr", "tb", "lr", "16:9", "top"])
    p.add_argument("--ipd-offset", type=float, default=0.0)
    p.add_argument("--resume", action="store_true",
                   help="skip existing output files")
    p.add_argument("--recursive", action="store_true")
    p.add_argument("--format", default="png", choices=["png", "jpeg", "webp"])
    # video options (reference iw3/utils.py video arg subset)
    p.add_argument("--video-codec", default="libx264")
    p.add_argument("--crf", type=int, default=20)
    p.add_argument("--preset", default="ultrafast")
    p.add_argument("--pix-fmt", default="yuv420p",
                   choices=["yuv420p", "yuv444p", "yuv420p10le", "rgb24",
                            "gbrp", "gbrp10le", "gbrp16le"])
    p.add_argument("--max-fps", type=float, default=30.0)
    p.add_argument("--video-batch", type=int, default=4)
    p.add_argument("--devices", type=int, default=1,
                   help="shard video frame batches over the first N "
                        "devices (dp mesh; the reference's --gpu list)")
    p.add_argument("--ema-normalize", action="store_true",
                   help="EMA min-max depth normalization for video")
    p.add_argument("--ema-decay", type=float, default=0.75)
    p.add_argument("--ema-buffer", type=int, default=30)
    p.add_argument("--scene-detect", action="store_true",
                   help="detect scene cuts and flush temporal depth state "
                        "at each cut (reference iw3 --scene-detect)")
    p.add_argument("--scene-detect-threshold", type=float, default=0.3)
    p.add_argument("--scene-min-frames", type=int, default=10)
    p.add_argument("--scene-detect-checkpoint", default=None,
                   help="TransNetV2 checkpoint (.nztm/.pth); histogram "
                        "fallback detector when omitted")
    p.add_argument("--autocrop", action="store_true",
                   help="detect and crop letterbox black bars before "
                        "conversion (reference iw3 --autocrop)")
    p.add_argument("--autocrop-mode", default="black",
                   choices=["black", "black_tb", "black_lr",
                            "flat", "flat_tb", "flat_lr"])
    p.add_argument("--skip-error", action="store_true",
                   help="on video errors write <out>.error.flag and "
                        "continue the batch; skip inputs whose flag exists "
                        "(reference --skip-error, video.py:1135-1142)")
    p.add_argument("--start-time", type=float, default=None,
                   help="video trim start (seconds)")
    p.add_argument("--end-time", type=float, default=None,
                   help="video trim end (seconds)")
    p.add_argument("--video-format", "-vf", default="mp4",
                   choices=["mp4", "mkv", "avi"],
                   help="container for dir-batch video outputs")
    p.add_argument("--video-bitrate", default=None,
                   help="target bitrate, e.g. 8M (overrides crf-only mode)")
    p.add_argument("--tune", nargs="+", default=[],
                   help="encoder tune option(s), e.g. film animation")
    p.add_argument("--profile-level", default=None,
                   help="h264 profile level")
    p.add_argument("--keyframe-interval", type=float, default=None,
                   help="keyframe interval in seconds (gop = fps*interval)")
    p.add_argument("--colorspace", default="auto",
                   choices=["auto", "unspecified", "copy",
                            "bt709", "bt709-pc", "bt709-tv",
                            "bt601", "bt601-pc", "bt601-tv"],
                   help="output colorspace: tag + rgb->yuv matrix/range "
                        "(auto = by output height; copy = source matrix)")
    p.add_argument("--metadata", nargs="?", const="filename", default=None,
                   choices=["filename"],
                   help="embed conversion params in the output filename")
    p.add_argument("--yes", "-y", action="store_true",
                   help="overwrite existing video outputs without skipping")
    p.add_argument("--stereo-width", type=int, default=None,
                   help="processing width for row_flow/mlbw stereo models")
    p.add_argument("--warp-steps", type=int, default=None,
                   help="forward-warp step count override")
    p.add_argument("--mask-inner-dilation", type=int, default=0,
                   help="inpaint mask inner dilation iterations")
    p.add_argument("--mask-outer-dilation", type=int, default=0,
                   help="inpaint mask outer dilation iterations")
    p.add_argument("--inpaint-max-width", type=int, default=None,
                   help="downscale frames wider than this before inpaint")
    p.add_argument("--limit-resolution", action="store_true",
                   help="cap depth resolution at the source resolution")
    p.add_argument("--batch-size", type=int, default=None,
                   help="depth batch size (alias of --video-batch; the "
                        "reference's --zoed-batch-size equivalent)")
    p.add_argument("--max-workers", type=int, default=None,
                   help="accepted for reference compatibility; the TPU "
                        "pipeline overlaps decode/compute/encode with "
                        "async dispatch instead of a worker pool")
    p.add_argument("--disable-scene-cache", action="store_true",
                   help="re-run scene detection even when cached")
    p.add_argument("--scene-cache-dir", default=None,
                   help="directory for scene-boundary caches")
    p.add_argument("--scene-detect-only", action="store_true",
                   help="run the scene-detection pass and exit")
    p.add_argument("--debug-depth", action="store_true",
                   help="output the normalized depth instead of stereo")
    p.add_argument("--convergence-mode", default="constant",
                   choices=["constant", "sod_v1"],
                   help="sod_v1: saliency-driven per-frame convergence")
    p.add_argument("--sod-checkpoint", default=None,
                   help="iw3.sod_v1 checkpoint for --convergence-mode "
                        "sod_v1 (.nztm/.pth)")
    p.add_argument("--depth-aa", action="store_true",
                   help="apply the DepthAA anti-aliasing net to depth maps")
    p.add_argument("--depth-aa-checkpoint", default=None,
                   help="iw3.depth_aa checkpoint (.nztm/.pth)")
    p.add_argument("--export-disparity", action="store_true",
                   help="export the mapper-applied disparity instead of "
                        "raw depth (implies --export)")
    p.add_argument("--export-depth-only", action="store_true",
                   help="omit the rgb image from exports")
    p.add_argument("--export", action="store_true",
                   help="export RGB + 16-bit depth + iw3_export.yml instead "
                        "of rendering (input a .yml to re-import)")
    return p


def build_config(args):
    from .pipeline import StereoConfig
    fmt = StereoFormat(
        half_sbs=args.half_sbs, tb=args.tb, half_tb=args.half_tb,
        cross_eyed=args.cross_eyed, anaglyph=args.anaglyph, vr180=args.vr180,
        rgbd=args.rgbd, half_rgbd=args.half_rgbd, pad=args.pad,
        pad_mode=args.pad_mode, ipd_offset=args.ipd_offset,
        max_output_width=args.max_output_width,
        max_output_height=args.max_output_height,
        keep_aspect_ratio=args.keep_aspect_ratio)
    return StereoConfig(
        method=args.method, divergence=args.divergence,
        convergence=args.convergence, mapper=args.mapper,
        foreground_scale=args.foreground_scale,
        synthetic_view=args.synthetic_view,
        preserve_screen_border=args.preserve_screen_border,
        rotate_left=args.rotate_left, rotate_right=args.rotate_right,
        max_output_width=args.max_output_width,
        max_output_height=args.max_output_height,
        keep_aspect_ratio=args.keep_aspect_ratio, format=fmt,
        stereo_width=getattr(args, "stereo_width", None),
        warp_steps=getattr(args, "warp_steps", None),
        mask_inner_dilation=getattr(args, "mask_inner_dilation", 0),
        mask_outer_dilation=getattr(args, "mask_outer_dilation", 0),
        inpaint_max_width=getattr(args, "inpaint_max_width", None))


def create_stereo_model(method, checkpoint=None):
    """reference iw3/stereo_model_factory.py:118-138."""
    if method in {"forward", "forward_fill", "grid_sample", "backward", "NULL"}:
        return None, None
    if method == "forward_inpaint":
        from .forward_inpaint import ForwardInpaint
        if checkpoint:
            from ..models.io import load_model
            m, p_, _ = load_model(checkpoint)
            return ForwardInpaint(m, p_), None
        return ForwardInpaint(), None
    if method in {"mlbw_l2_inpaint", "mlbw_l2_inpaint_video"}:
        from .mlbw_inpaint import MLBWInpaint, MLBWInpaintVideo
        cls = MLBWInpaintVideo if method.endswith("video") else MLBWInpaint
        if checkpoint:
            from ..models.io import load_model
            m, p_, _ = load_model(checkpoint)
            return cls(inpaint_model=m, inpaint_params=p_), None
        return cls(), None
    from ..models import create_model
    from ..models.io import load_model
    from . import models as _models  # noqa: F401 (register)
    import jax
    if checkpoint:
        model, params, _ = load_model(checkpoint)
        return model, params
    name = {
        "row_flow_v3": "sbs.row_flow_v3", "row_flow_v2": "sbs.row_flow_v2",
        "row_flow_v3_sym": "sbs.row_flow_v3",
        "mlbw_l2": "sbs.mlbw_l2", "mlbw_l4": "sbs.mlbw_l4",
        "mlbw_l2s": "sbs.mlbw_l2s", "mlbw_l4s": "sbs.mlbw_l4s",
    }[method]
    model = create_model(name)
    logger.warning("stereo model %s: no checkpoint given; random init "
                   "(structure/benchmark use only)", name)
    params = model.init_params(jax.random.PRNGKey(0), (1, 96, 96, 3))
    return model, params


def iter_inputs(input_path, recursive=False):
    exts = IMAGE_EXTS | VIDEO_EXTS
    if os.path.isdir(input_path):
        if recursive:
            for root, _, files in os.walk(input_path):
                for f in sorted(files):
                    if os.path.splitext(f)[1].lower() in exts:
                        yield os.path.join(root, f)
        else:
            for f in sorted(os.listdir(input_path)):
                if os.path.splitext(f)[1].lower() in exts:
                    yield os.path.join(input_path, f)
    else:
        yield input_path


def export_main(args, cfg, depth_model):
    """Export mode (reference iw3 --export, iw3/utils.py export path)."""
    import datetime
    import jax.numpy as jnp
    from ..utils.pil_io import load_image, save_image
    from .depth.base import BaseDepthModel
    from .export_config import ExportConfig, IMAGE_TYPE, FILENAME
    from .pipeline import preprocess_image

    rgb_dir = os.path.join(args.output, "rgb")
    depth_dir = os.path.join(args.output, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)
    n = 0
    for src in iter_inputs(args.input, args.recursive):
        x, meta = load_image(src)
        x = x[..., :3][None]
        x = preprocess_image(x, cfg)
        depth = depth_model.infer(x, tta=args.tta,
                                  edge_dilation=args.edge_dilation or 0)
        d = depth[0]
        dmin, dmax = float(jnp.min(d)), float(jnp.max(d))
        dn = (d - dmin) / max(dmax - dmin, 1e-6)
        if getattr(args, "export_disparity", False):
            # apply the resolved mapper so the export IS the disparity
            # (reference --export-disparity, iw3/utils.py:2052)
            from .mapper import get_mapper
            dn = get_mapper(cfg.resolved_mapper(
                depth_model.is_metric()))(dn)
            dmin, dmax = 0.0, 1.0
        base = os.path.splitext(os.path.basename(src))[0]
        if not getattr(args, "export_depth_only", False):
            save_image(np.asarray(x[0]),
                       os.path.join(rgb_dir, base + ".png"))
        BaseDepthModel.save_normalized_depth(
            dn, os.path.join(depth_dir, base + ".png"),
            min_depth_value=dmin, max_depth_value=dmax)
        n += 1
    export_disparity = getattr(args, "export_disparity", False)
    ExportConfig(IMAGE_TYPE, basename=os.path.basename(args.input),
                 mapper=("none" if export_disparity else
                         cfg.resolved_mapper(depth_model.is_metric())),
                 skip_mapper=export_disparity,
                 divergence=args.divergence, convergence=args.convergence,
                 updated_at=datetime.datetime.now().isoformat()).save(
        os.path.join(args.output, FILENAME))
    print(f"exported {n} image(s)", file=sys.stderr)
    return 0


def import_main(args, cfg):
    """Render from an exported rgb+depth dir (input: iw3_export.yml)."""
    import jax.numpy as jnp
    from ..utils.pil_io import load_image, save_image
    from .depth.base import BaseDepthModel
    from .export_config import ExportConfig
    from .pipeline import apply_divergence
    from .composition import postprocess_image

    base_dir = os.path.dirname(os.path.abspath(args.input))
    ecfg = ExportConfig.load(args.input)
    rgb_dir, depth_dir = ecfg.resolve_paths(base_dir)
    if ecfg.mapper and args.mapper is None:
        cfg.mapper = "none" if ecfg.skip_mapper else ecfg.mapper
    side_model, side_params = create_stereo_model(
        args.method, args.stereo_checkpoint)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(rgb_dir)):
        if os.path.splitext(f)[1].lower() not in IMAGE_EXTS:
            continue
        x, meta = load_image(os.path.join(rgb_dir, f))
        x = jnp.asarray(x[..., :3][None])
        depth, _meta = BaseDepthModel.load_depth(
            os.path.join(depth_dir, os.path.splitext(f)[0] + ".png"))
        d = jnp.asarray(depth)[None]
        dmin, dmax = float(jnp.min(d)), float(jnp.max(d))
        d = (d - dmin) / max(dmax - dmin, 1e-6)
        left, right = apply_divergence(d, x, cfg, side_model, side_params)
        out = postprocess_image(left, right, cfg.format)
        save_image(np.asarray(out[0]),
                   os.path.join(args.output,
                                os.path.splitext(f)[0] + "." + args.format))
        n += 1
    print(f"imported {n} image(s)", file=sys.stderr)
    return 0


def _make_cli_mesh(args):
    """--devices N > 1 -> dp mesh over the first N devices."""
    if getattr(args, "devices", 1) and args.devices > 1:
        import jax
        from ..parallel.mesh import make_mesh
        return make_mesh(devices=jax.devices()[:args.devices])
    return None


def main(argv=None):
    # first-run UX: persistent compile cache (core/compile_cache.py)
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = create_parser().parse_args(argv)
    from ..utils.pil_io import load_image, save_image
    from .depth import create_depth_model
    from .pipeline import process_image

    cfg = build_config(args)
    if args.input.lower().endswith((".yml", ".yaml")):
        return import_main(args, cfg)
    if args.batch_size:
        args.video_batch = args.batch_size
    depth_model = create_depth_model(args.depth_model)
    depth_model.load(resolution=args.resolution,
                     checkpoint=args.depth_checkpoint,
                     limit_resolution=args.limit_resolution)
    if args.depth_aa:
        import jax as _jax
        from .models.depth_aa import DepthAA
        if args.depth_aa_checkpoint:
            from ..models.io import load_model as _load_model
            aa_model, aa_params, _ = _load_model(args.depth_aa_checkpoint)
        else:
            aa_model = DepthAA()
            aa_params = aa_model.init_params(_jax.random.PRNGKey(0),
                                             (1, 64, 64, 1))
            logger.warning("depth-aa: no checkpoint given; random init")
        depth_model.set_depth_aa(aa_model, aa_params)
    if args.export or args.export_disparity:
        return export_main(args, cfg, depth_model)
    side_model, side_params = create_stereo_model(
        args.method, args.stereo_checkpoint)

    edge_dilation = args.edge_dilation
    if edge_dilation is None:
        edge_dilation = 2  # reference default for relative-depth models

    def run_video(src, dst):
        """One video with resume/skip-error semantics (reference
        nunif/utils/video.py:899,1135-1142)."""
        from ..video import (VideoOutputConfig, has_error_flag,
                             write_error_flag, clear_error_flag)
        from .video import process_video_full
        if args.metadata == "filename":
            base, ext = os.path.splitext(dst)
            dst = (f"{base}_{args.method}_d{args.divergence:g}"
                   f"_c{args.convergence:g}{ext}")
        if args.resume and os.path.exists(dst):
            logger.info("skip (exists): %s", dst)
            return True
        if os.path.exists(dst) and not args.yes:
            logger.warning("output exists (use --yes to overwrite or "
                           "--resume to skip silently): %s", dst)
            return False
        if args.skip_error and has_error_flag(dst):
            logger.info("skip (error flag): %s", dst)
            return False
        if args.scene_detect_only:
            from .scene_boundary_cache import detect_boundaries_cached
            b = detect_boundaries_cached(
                src, max_fps=args.max_fps,
                threshold=args.scene_detect_threshold,
                min_frames=args.scene_min_frames,
                checkpoint=args.scene_detect_checkpoint,
                cache_dir=args.scene_cache_dir)
            print(f"{src}: {len(b)} scene boundaries: {sorted(b)[:50]}",
                  file=sys.stderr)
            return True
        vc = VideoOutputConfig(codec=args.video_codec, crf=args.crf,
                               preset=args.preset, pix_fmt=args.pix_fmt,
                               max_fps=args.max_fps,
                               bitrate=args.video_bitrate,
                               tune=tuple(args.tune),
                               profile_level=args.profile_level,
                               keyframe_interval=args.keyframe_interval,
                               colorspace=args.colorspace)
        try:
            process_video_full(
                src, dst, cfg, depth_model, side_model,
                side_params, tta=args.tta, edge_dilation=edge_dilation,
                batch_size=args.video_batch, video_config=vc,
                ema_normalize=args.ema_normalize, ema_decay=args.ema_decay,
                ema_buffer=args.ema_buffer,
                scene_detect=args.scene_detect,
                scene_detect_threshold=args.scene_detect_threshold,
                scene_min_frames=args.scene_min_frames,
                scene_detect_checkpoint=args.scene_detect_checkpoint,
                scene_cache_dir=args.scene_cache_dir,
                scene_cache_disable=args.disable_scene_cache,
                autocrop=args.autocrop, autocrop_mode=args.autocrop_mode,
                start_time=args.start_time, end_time=args.end_time,
                debug_depth=args.debug_depth,
                convergence_mode=args.convergence_mode,
                sod_checkpoint=args.sod_checkpoint,
                mesh=_make_cli_mesh(args))
        except Exception as e:
            if not args.skip_error:
                raise
            logger.error("error processing %s: %s", src, e)
            write_error_flag(dst, e)
            return False
        clear_error_flag(dst)
        return True

    if os.path.splitext(args.input)[1].lower() in VIDEO_EXTS:
        run_video(args.input, args.output)
        print("processed video", file=sys.stderr)
        return 0

    is_dir_out = os.path.isdir(args.input)
    if is_dir_out:
        os.makedirs(args.output, exist_ok=True)

    n_done = 0
    for src in iter_inputs(args.input, args.recursive):
        if os.path.splitext(src)[1].lower() in VIDEO_EXTS:
            # dir batch with videos: per-file error flags + resume
            base = os.path.splitext(os.path.basename(src))[0]
            vdst = (os.path.join(args.output, base + "." + args.video_format)
                    if is_dir_out or os.path.isdir(args.output)
                    else args.output)
            if run_video(src, vdst):
                n_done += 1
            continue
        if is_dir_out:
            base = os.path.splitext(os.path.basename(src))[0]
            dst = os.path.join(args.output, base + "." + args.format)
        else:
            dst = args.output
            if os.path.isdir(dst):
                base = os.path.splitext(os.path.basename(src))[0]
                dst = os.path.join(dst, base + "." + args.format)
        if args.resume and os.path.exists(dst):
            continue
        x, meta = load_image(src)
        x = x[..., :3]  # iw3 does not process alpha (reference drops it too)
        out = process_image(x, cfg, depth_model, side_model, side_params,
                            tta=args.tta, edge_dilation=edge_dilation)
        save_image(np.asarray(out), dst)
        n_done += 1
        logger.info("iw3: %s -> %s", src, dst)
    print(f"processed {n_done} image(s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
