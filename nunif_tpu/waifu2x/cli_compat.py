"""Reference waifu2x CLI option coverage registry
(reference waifu2x/ui_utils.py:217-344)."""

REFERENCE_WAIFU2X_FLAGS = [
    "batch-size", "colorspace", "compile", "crf", "depth",
    "disable-amp", "disable-compile", "disable-exif-transpose", "format",
    "gpu", "grain", "grain-speed", "grain-strength", "grayscale",
    "image-lib", "input", "max-fps", "method", "model-dir", "noise-level",
    "output", "pix-fmt", "preset", "profile-level", "recursive", "resume",
    "rotate-left", "rotate-right", "start-time", "end-time", "style",
    "tile-size", "tta", "tune", "vf", "video-bitrate", "video-codec",
    "video-format", "yes",
]

NOT_APPLICABLE = {
    "gpu": "device selection is a JAX mesh concern (--devices builds a dp "
           "mesh over the first N devices); no CUDA device ids",
    "compile": "jit is always on; no eager fallback",
    "disable-compile": "see compile",
    "disable-amp": "bf16 policy is per renderer, not a global toggle",
    "disable-exif-transpose": "image loads always honor EXIF orientation",
    "image-lib": "accepted (pil); wand/ImageMagick replaced by design",
    "colorspace": "flag exists; outputs are tagged bt709 for HD by the "
                  "native writer",
}

RENAMED = {"vf": "video-format"}
