"""Reference CLI option coverage registry.

The reference iw3 parser (reference iw3/utils.py:1935-2240) exposes 88
options.  Every one of them must be either supported by this CLI or
explicitly documented here as not-applicable with a reason — the
option-coverage test enumerates this table.
"""

# snapshot of the reference's add_argument names (iw3/utils.py:1935-2240)
REFERENCE_IW3_FLAGS = [
    "anaglyph", "autocrop", "autocrop-mode", "backward", "batch-size",
    "bg-model", "colorspace", "compile", "convergence", "convergence-mode",
    "crf", "cross-eyed", "cuda-stream", "debug-depth", "depth-aa",
    "depth-model", "disable-amp", "disable-exif-transpose",
    "disable-scene-cache", "divergence", "edge-dilation", "ema-decay",
    "ema-normalize", "end-time", "export", "export-depth-fit",
    "export-depth-only", "export-disparity", "find-param",
    "foreground-scale", "format", "full-sbs", "gpu", "half-rgbd",
    "half-sbs", "half-tb", "inpaint-max-width", "inpaint-model", "input",
    "ipd-offset", "keep-aspect-ratio", "keyframe", "keyframe-interval",
    "limit-resolution", "low-vram", "mapper", "mapper-type",
    "mask-inner-dilation", "mask-outer-dilation", "max-fps",
    "max-output-height", "max-output-width", "max-workers", "metadata",
    "method", "output", "pad", "pad-mode", "pix-fmt", "preset",
    "preserve-screen-border", "profile-level", "recursive", "remove-bg",
    "resolution", "resume", "rgbd", "rotate-left", "rotate-right",
    "scene-cache-dir", "scene-cache-file", "scene-detect",
    "scene-detect-only", "start-time", "stereo-width", "synthetic-view",
    "tb", "tta", "tune", "update", "vf", "video-bitrate", "video-codec",
    "video-format", "vr180", "warp-steps", "yes", "zoed-batch-size",
    "zoed-height",
]

# flags intentionally not ported, with the reason
NOT_APPLICABLE = {
    "gpu": "device selection is a JAX mesh concern (--devices / "
           "jax.sharding.Mesh); there is no per-call CUDA device id on TPU",
    "cuda-stream": "CUDA-stream overlap is replaced by XLA async dispatch",
    "low-vram": "XLA schedules HBM; the single-frame low-VRAM path has no "
                "TPU equivalent (batch=1 gives the same behavior)",
    "disable-amp": "compute dtype is the bf16 policy, controlled per "
                   "renderer (Policy.compute_dtype), not a global toggle",
    "compile": "everything under jit is always compiled; there is no "
               "eager fallback to toggle",
    "bg-model": "rembg background removal depends on the external rembg "
                "package (not in the image); out of scope",
    "remove-bg": "see bg-model",
    "update": "re-downloads torch.hub models; weights load from local "
              ".pth/.nztm instead (models/pth_import.py)",
    "find-param": "interactive parameter sweep GUI helper; use the "
                  "browser GUI preview instead",
    "export-depth-fit": "fits export depth size to a model grid for "
                        "re-import into the reference trainer; the export "
                        "format here is always full-resolution 16-bit",
    "inpaint-model": "inpaint model selection is part of --method "
                     "(forward_inpaint / mlbw_l2_inpaint[_video])",
    "mapper-type": "superseded by --mapper which accepts every mapper "
                   "name (reference keeps both for GUI compat)",
    "scene-cache-file": "per-file cache override; --scene-cache-dir "
                        "covers the use case",
    "disable-exif-transpose": "image loads always honor EXIF orientation "
                              "(pil_io applies it; no CLI toggle)",
    "keyframe": "flag form of --keyframe-interval (which is supported)",
    "format": "image output format flag exists as --format on this CLI "
              "too (listed for completeness)",
    "full-sbs": "full SBS is the default output (no flag needed)",
    "backward": "--method backward covers it",
}

# reference names that map to a differently-named local flag
RENAMED = {
    "zoed-batch-size": "batch-size",
    "zoed-height": "resolution",
    "vf": "video-format",
}
