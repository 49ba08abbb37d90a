"""Depth-Anything v1/v2 depth estimator (flax) + iw3 wrapper.

Behavioral parity target: reference iw3/depth_anything_model.py —
NAME_MAP model table (:12-35), batch_preprocess multiple-of-14 resize +
ImageNet normalization (:71-113), batch_infer flip-TTA / edge dilation /
metric inversion (:120-180), DepthAnythingModel lifecycle (:183-260).

TPU-first: preprocessing sizes are bucketed (multiple of 14, aspect
capped) so XLA compiles one program per bucket; flip TTA is batched into
one forward pass; everything from resize to depth is a single jitted call.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core.logger import logger
from ...models import Model, register_model
from ...modules.resize import resize
from ..dilation import dilate_edge, edge_dilation_is_enabled
from .base import BaseDepthModel
from .dinov2 import DinoVisionTransformer, VIT_CONFIGS, INTERMEDIATE_LAYER_IDX
from .dpt import DPTHead

MIN_RESOLUTION = 224

# reference iw3/depth_anything_model.py:12-35
NAME_MAP = {
    "Any_S": "vits", "Any_B": "vitb", "Any_L": "vitl",
    "Any_V2_S": "v2_vits", "Any_V2_B": "v2_vitb", "Any_V2_L": "v2_vitl",
    "Any_V2_N_S": "hypersim_s", "Any_V2_N_B": "hypersim_b", "Any_V2_N_L": "hypersim_l",
    "Any_V2_K_S": "vkitti_s", "Any_V2_K_B": "vkitti_b", "Any_V2_K_L": "vkitti_l",
    "Any_V2_N": "hypersim_l", "Any_V2_K": "vkitti_l",
    "Distill_Any_S": "distill_any_depth_s",
    "Distill_Any_B": "distill_any_depth_b",
    "Distill_Any_L": "distill_any_depth_l",
}

_DPT_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@register_model
class DepthAnything(Model):
    """Full DA network: DINOv2 encoder + DPT head.  Input NHWC in [0,1]
    ALREADY resized to multiples of 14 and ImageNet-normalized."""
    model_name = "iw3.depth_anything"
    encoder: str = "vits"   # vits/vitb/vitl
    max_depth: float = 0.0  # 0 => relative; 20/80 => metric

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = VIT_CONFIGS[self.encoder]
        idx = INTERMEDIATE_LAYER_IDX[self.encoder]
        feats, patch_hw = DinoVisionTransformer(
            **cfg, name="pretrained")(x, out_indices=idx)
        depth = DPTHead(max_depth=self.max_depth, name="depth_head",
                        **_DPT_CONFIGS[self.encoder])(feats, patch_hw)
        return depth  # (B, H, W, 1)


def compute_preprocess_size(H, W, lower_bound=392, max_aspect_ratio=4,
                            limit_resolution=False):
    """reference batch_preprocess grid math (:71-103) — host-side, static."""
    ensure = 14
    if limit_resolution and lower_bound > min(W, H):
        lower_bound = min(W, H)
        lower_bound -= lower_bound % ensure
        lower_bound = max(lower_bound, MIN_RESOLUTION)
    scale_factor = lower_bound / (W if W < H else H)
    new_h, new_w = int(H * scale_factor), int(W * scale_factor)
    if new_h < new_w:
        new_w = min(new_w, int(max_aspect_ratio * new_h))
    else:
        new_h = min(new_h, int(max_aspect_ratio * new_w))
    new_h -= new_h % ensure
    new_w -= new_w % ensure
    return max(new_h, lower_bound), max(new_w, lower_bound)


def batch_preprocess(x, out_h, out_w):
    """Resize (antialias bilinear) + ImageNet normalize; x NHWC [0,1]."""
    if x.shape[1:3] != (out_h, out_w):
        x = resize(x, out_h, out_w, mode="bilinear", antialias=True)
    x = jnp.clip(x, 0.0, 1.0)
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


class DepthAnythingModel(BaseDepthModel):
    """iw3-facing wrapper (reference iw3/depth_anything_model.py:183-260)."""

    def __init__(self, model_type="Any_V2_S"):
        super().__init__(model_type)
        name = NAME_MAP[model_type]
        if name.startswith("hypersim"):
            self.encoder = "vit" + name[-1]
            self.max_depth = 20.0
        elif name.startswith("vkitti"):
            self.encoder = "vit" + name[-1]
            self.max_depth = 80.0
        elif name.startswith("distill_any_depth"):
            self.encoder = "vit" + name[-1]
            self.max_depth = 0.0
        else:
            self.encoder = name.replace("v2_", "")
            self.max_depth = 0.0
        self.prep_lower_bound = 392
        self._forward_cache = {}

    @classmethod
    def get_name(cls):
        return "DepthAnything"

    @classmethod
    def supported(cls, model_type):
        return model_type in NAME_MAP

    def is_metric(self):
        return self.max_depth > 0

    @property
    def metric_depth(self):
        return self.is_metric()

    def load_model(self, model_type, resolution=None, checkpoint=None, **kwargs):
        self.prep_lower_bound = resolution or 392
        if self.prep_lower_bound % 14 != 0:
            self.prep_lower_bound += 14 - self.prep_lower_bound % 14
        model = DepthAnything(encoder=self.encoder, max_depth=self.max_depth)
        if checkpoint is not None and str(checkpoint).endswith(".pth"):
            # raw torch.hub state dict (no nunif envelope): convert directly
            from ...models.pth_import import load_torch_checkpoint
            from ...models.torch_convert import convert_depth_anything
            _name, _kw, sd = load_torch_checkpoint(checkpoint)
            params = convert_depth_anything(sd, self.encoder)
            logger.info("converted depth checkpoint %s (%s)", checkpoint,
                        self.encoder)
        elif checkpoint is not None:
            from ...models.io import load_model as load_ckpt
            model, params, _ = load_ckpt(checkpoint)
        else:
            logger.warning("DepthAnything: no checkpoint given; "
                           "random init (structure/benchmark use only)")
            params = model.init_params(
                jax.random.PRNGKey(0), (1, MIN_RESOLUTION, MIN_RESOLUTION, 3))
        return model, params

    def _jitted_forward(self, h, w, flip_aug):
        key = (h, w, flip_aug)
        if key not in self._forward_cache:
            model = self.model

            @jax.jit
            def forward(params, x):
                x = batch_preprocess(x, h, w)
                x = x.astype(jnp.bfloat16)
                if flip_aug:
                    x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
                out = model.apply_fn(params, x).astype(jnp.float32)
                out = jnp.nan_to_num(out)
                if flip_aug:
                    n = out.shape[0] // 2
                    out = (out[:n] + out[n:, :, ::-1, :]) * 0.5
                return out

            self._forward_cache[key] = forward
        return self._forward_cache[key]

    def infer(self, x, tta=False, low_vram=False, enable_amp=True,
              edge_dilation=0, depth_aa=False, **kwargs):
        """x: (B,H,W,3) or (H,W,3) NHWC [0,1] -> depth at preprocess size."""
        batch = x.ndim == 4
        if not batch:
            x = x[None]
        B, H, W, _ = x.shape
        out_h, out_w = compute_preprocess_size(
            H, W, self.prep_lower_bound,
            limit_resolution=self.limit_resolution)
        out = self._jitted_forward(out_h, out_w, bool(tta))(self.params, x)

        if depth_aa or getattr(self, "_depth_aa", None) is not None:
            out = self.apply_depth_aa(out)
        if edge_dilation_is_enabled(edge_dilation):
            if not self.metric_depth:
                out = dilate_edge(out, edge_dilation)
            else:
                out = -dilate_edge(-out, edge_dilation)
        if self.metric_depth:
            out = -out  # zoedepth-compatible inversion (reference :160-162)
        if not batch:
            out = out[0]
        return out
