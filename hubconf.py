"""Hub entry points (role of reference hubconf.py:16 — `torch.hub.load(
'nagadomi/nunif', 'waifu2x', ...)` pip-less API).

Usage:
    sys.path.insert(0, repo_root)
    from hubconf import waifu2x, superresolution, denoise
    model = waifu2x(model_type="art", method="scale", noise_level=1)
    out_image = model.convert(pil_image)
"""
from nunif_tpu.waifu2x.hub import (  # noqa: F401
    waifu2x,
    Waifu2xImageModel,
)


def superresolution(model_type: str = "art", **kwargs):
    """2x upscale entry (reference hubconf.py superres alias)."""
    return waifu2x(model_type=model_type, method="scale", **kwargs)


def denoise(model_type: str = "art", noise_level: int = 1, **kwargs):
    """Noise-removal entry (reference hubconf.py denoise alias)."""
    return waifu2x(model_type=model_type, method="noise",
                   noise_level=noise_level, **kwargs)
