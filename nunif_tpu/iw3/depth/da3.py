"""Depth-Anything-V3 monocular (da3mono) depth estimator (flax) + wrapper.

Behavioral parity target: reference iw3/depth_anything_v3_model.py —
  * model table Any_V3_Mono / Any_V3_Mono_01 (:13-24)
  * sky-weighted disparity conversion with shift=0.2, all-sky zeroing,
    raw-output 0.99-quantile sky fill (:27-58)
  * flip-TTA / depth-aa / edge dilation pipeline (:61-118)
  * per-type depth scaler modes: Any_V3_Mono -> max-only normalize,
    Any_V3_Mono_01 -> min-max (:125-131)

The network (hub repo "nagadomi/Depth-Anything-3_iw3") is a from-scratch
JAX implementation of DA3-mono's published shape: DINOv2-L backbone +
dual-output DPT head (metric-ish distance via softplus + sky logits).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core.logger import logger
from ...models import Model, register_model
from ..depth_scaler import EMAMinMaxScaler
from ..dilation import dilate_edge, edge_dilation_is_enabled
from .base import BaseDepthModel
from .depth_anything import (
    batch_preprocess, compute_preprocess_size, MIN_RESOLUTION,
)
from .dinov2 import DinoVisionTransformer, VIT_CONFIGS, INTERMEDIATE_LAYER_IDX
from .dpt import DPTHead

NAME_MAP = {
    "Any_V3_Mono": "da3mono-large",
    "Any_V3_Mono_01": "da3mono-large",
}
_DPT_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
}


@register_model
class DepthAnythingV3Mono(Model):
    """x (B,H,W,3) preprocessed/normalized -> {"depth", "sky"} maps
    (B,H,W); depth is positive distance, sky in [0,1]."""
    model_name = "iw3.da3_mono"
    encoder: str = "vitl"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = VIT_CONFIGS[self.encoder]
        idx = INTERMEDIATE_LAYER_IDX[self.encoder]
        feats, patch_hw = DinoVisionTransformer(
            **cfg, name="pretrained")(x, out_indices=idx)
        out = DPTHead(out_dim=2, name="depth_head",
                      **_DPT_CONFIGS[self.encoder])(feats, patch_hw)
        depth = jax.nn.softplus(out[..., 0])
        sky = nn.sigmoid(out[..., 1])
        return {"depth": depth, "sky": sky}


def da3_disparity(depth, sky, sky_thresh=0.3, raw_output=False, shift=0.2):
    """Sky-weighted disparity conversion (reference :27-58), vectorized.

    depth, sky: (B, H, W).  Returns (B, H, W, 1) fp32.
    """
    depth = depth.astype(jnp.float32)
    sky = sky.astype(jnp.float32)
    sky_mask = sky > sky_thresh
    sky_weight = (jnp.clip(sky, sky_thresh, 1.0) - sky_thresh) / (1.0 - sky_thresh)
    non_sky = jnp.sum(~sky_mask, axis=(1, 2))
    all_sky = (non_sky < 10)[:, None, None]
    if not raw_output:
        disp = 1.0 / (depth + shift)
        disp = disp * (1.0 - sky_weight)
        disp = jnp.where(all_sky, 0.0, disp)
    else:
        # 0.99 quantile of non-sky depth per image, sky filled to it
        masked = jnp.where(sky_mask, jnp.nan, depth)
        q = jnp.nanquantile(masked.reshape(depth.shape[0], -1), 0.99, axis=1)
        q = jnp.nan_to_num(q)[:, None, None]
        disp = jnp.minimum(depth * (1.0 - sky_weight) + sky_weight * q, q)
        disp = jnp.where(all_sky, depth, disp)
    return disp[..., None]


class DepthAnythingV3MonoModel(BaseDepthModel):
    """reference iw3/depth_anything_v3_model.py:121-202."""

    def __init__(self, model_type="Any_V3_Mono", raw_output=False):
        self.model_type = model_type  # needed by create_depth_scaler
        super().__init__(model_type)
        self.encoder = "vitl"
        self.prep_lower_bound = 392
        self.raw_output = raw_output
        self.depth_aa_model = None
        self.depth_aa_params = None
        self._jit_cache = {}

    def create_depth_scaler(self):
        # Any_V3_Mono: Max=1 scaling; Any_V3_Mono_01: min-max (:125-131)
        mode = "max" if self.model_type == "Any_V3_Mono" else "minmax"
        return EMAMinMaxScaler(decay=0, buffer_size=1, mode=mode)

    @classmethod
    def get_name(cls):
        return "DepthAnythingV3Mono"

    @classmethod
    def supported(cls, model_type):
        return model_type in NAME_MAP

    def is_metric(self):
        return False

    def load_model(self, model_type, resolution=None, checkpoint=None,
                   raw_output=None, **kwargs):
        if raw_output is not None:
            self.raw_output = raw_output
        self.prep_lower_bound = resolution or 392
        if self.prep_lower_bound % 14 != 0:
            self.prep_lower_bound += 14 - self.prep_lower_bound % 14
        model = DepthAnythingV3Mono(encoder=self.encoder)
        if checkpoint is not None and (
                str(checkpoint).endswith(".pth")
                or str(checkpoint).endswith(".safetensors")):
            # raw hub checkpoint (reference MODEL_FILES:
            # da3mono-large.safetensors): convert directly
            from ...models.pth_import import load_torch_checkpoint
            from ...models.torch_convert import convert_da3mono
            _name, _kw, sd = load_torch_checkpoint(checkpoint)
            params = convert_da3mono(sd, self.encoder)
            logger.info("converted DA3 checkpoint %s", checkpoint)
        elif checkpoint is not None:
            from ...models.io import load_model as load_ckpt
            model, params, _ = load_ckpt(checkpoint)
        else:
            logger.warning("DepthAnythingV3Mono: no checkpoint given; "
                           "random init (structure/benchmark use only)")
            params = model.init_params(
                jax.random.PRNGKey(0), (1, MIN_RESOLUTION, MIN_RESOLUTION, 3))
        return model, params

    def _forward(self, h, w, flip_aug):
        key = (h, w, flip_aug)
        if key not in self._jit_cache:
            model = self.model
            raw_output = self.raw_output

            @jax.jit
            def fwd(params, x):
                x = batch_preprocess(x, h, w).astype(jnp.bfloat16)
                if flip_aug:
                    x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
                out = model.apply_fn(params, x)
                disp = da3_disparity(out["depth"], out["sky"],
                                     raw_output=raw_output)
                disp = jnp.nan_to_num(disp)
                if flip_aug:
                    n = disp.shape[0] // 2
                    disp = (disp[:n] + disp[n:, :, ::-1, :]) * 0.5
                return disp

            self._jit_cache[key] = fwd
        return self._jit_cache[key]

    def infer(self, x, tta=False, low_vram=False, enable_amp=True,
              edge_dilation=0, depth_aa=False, **kwargs):
        batch = x.ndim == 4
        if not batch:
            x = x[None]
        B, H, W, _ = x.shape
        out_h, out_w = compute_preprocess_size(
            H, W, self.prep_lower_bound,
            limit_resolution=self.limit_resolution)
        out = self._forward(out_h, out_w, bool(tta))(self.params, x)
        if depth_aa and self.depth_aa_model is not None:
            from ..models.depth_aa import depth_aa_infer
            out = depth_aa_infer(self.depth_aa_model, self.depth_aa_params,
                                 out)
        if edge_dilation_is_enabled(edge_dilation):
            if not self.raw_output:
                out = dilate_edge(out, edge_dilation)
            else:
                out = -dilate_edge(-out, edge_dilation)
        if not batch:
            out = out[0]
        return out
