"""DepthPro multi-scale monocular depth estimator (flax, NHWC) + wrapper.

Behavioral parity target: reference iw3/depth_pro_model.py —
  * model table / img_size config (DepthPro=384, DepthPro_S=256), :12-19
  * batch_preprocess square resize + 0.5/0.5 normalize, :22-46
  * canonical inverse depth -> disparity via the FOV head's focal length,
    clamping, flip-TTA, sign conventions, :49-136
  * force_disparity=True wrapper (is_metric() == False), :139-214

The network (consumed by the reference via torch.hub
"nagadomi/ml-depth-pro_iw3") is a from-scratch JAX implementation of the
published Apple DepthPro architecture: a ViT patch encoder applied to
overlapping tiles at three scales (5x5 full-res, 3x3 half, 1 quarter), a
ViT image encoder on the downsampled frame for global context, a DPT-like
multi-resolution fusion decoder producing canonical inverse depth, and a
FOV head predicting the field of view used to convert to metric scale.

TPU-first: all 35 tiles across the three scales run the patch ViT as ONE
batched forward (perfect MXU batching); tile merging is a static
scatter-average (no dynamic shapes); everything compiles to a single
program per input bucket.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core.logger import logger
from ...models import Model, register_model
from ...modules.resize import resize
from ..dilation import dilate_edge, edge_dilation_is_enabled
from .base import BaseDepthModel
from .dinov2 import DinoVisionTransformer, VIT_CONFIGS
from .midas import _FeatureFusionBlock

# reference iw3/depth_pro_model.py:12-15 (img_size = ViT tile size)
NAME_MAP = {"DepthPro": 384, "DepthPro_S": 256}


def _tile_positions(size: int, tile: int, step: int):
    """Static tile origins covering [0, size-tile] (last tile flush)."""
    if size <= tile:
        return [0]
    n = int(np.ceil((size - tile) / step)) + 1
    return [int(round(p)) for p in np.linspace(0, size - tile, n)]


def _split_tiles(x, tile: int, step: int):
    """x (B,S,S,C) -> (B*n*n, tile, tile, C), plus positions."""
    B = x.shape[0]
    pos = _tile_positions(x.shape[1], tile, step)
    tiles = [x[:, i:i + tile, j:j + tile, :] for i in pos for j in pos]
    return jnp.concatenate(tiles, axis=0), pos


def _merge_tiles(feats, pos, B: int, grid: int, out_hw: int):
    """Average-blend token grids back to the full map.

    feats: (B*n*n, grid, grid, C) in the order produced by _split_tiles.
    pos: tile origins in PIXELS; token origin = pos * grid / tile.
    """
    C = feats.shape[-1]
    out = jnp.zeros((B, out_hw, out_hw, C), feats.dtype)
    cnt = jnp.zeros((B, out_hw, out_hw, 1), feats.dtype)
    k = 0
    for i in pos:
        for j in pos:
            # token-space origins (16 px per token); static slices
            oi, oj = int(round(i / 16)), int(round(j / 16))
            out = out.at[:, oi:oi + grid, oj:oj + grid, :].add(
                feats[k * B:(k + 1) * B])
            cnt = cnt.at[:, oi:oi + grid, oj:oj + grid, :].add(1.0)
            k += 1
    return out / jnp.maximum(cnt, 1.0)


@register_model
class DepthPro(Model):
    """x: (B, S, S, 3), S = 4 * tile_size, normalized mean/std 0.5.
    Returns (canonical_inverse_depth (B,S,S,1), fov_deg (B,))."""
    model_name = "iw3.depth_pro"
    encoder: str = "vitl"
    tile_size: int = 384
    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, S, _, _ = x.shape
        p = self.tile_size
        assert S == 4 * p, (S, p)
        grid = p // 16
        cfg = dict(VIT_CONFIGS[self.encoder])
        cfg.update(patch_size=16, pos_embed_size=grid)
        depth_cfg = cfg["depth"]
        inter_idx = (depth_cfg // 4 - 1, depth_cfg - 1)

        # --- build the 35-tile batch over three scales ---
        step = int(p * 0.75)
        hi, pos_hi = _split_tiles(x, p, step)                      # 5x5
        x_mid = resize(x, S // 2, S // 2, mode="bilinear", antialias=True)
        mid, pos_mid = _split_tiles(x_mid, p, step)                # 3x3
        x_low = resize(x, p, p, mode="bilinear", antialias=True)   # 1
        n_hi, n_mid = len(pos_hi) ** 2, len(pos_mid) ** 2
        tiles = jnp.concatenate([hi, mid, x_low], axis=0)

        patch_feats, _ = DinoVisionTransformer(
            **cfg, name="patch_encoder")(tiles, out_indices=inter_idx)
        f_inter = patch_feats[0].reshape(-1, grid, grid, cfg["embed_dim"])
        f_final = patch_feats[1].reshape(-1, grid, grid, cfg["embed_dim"])

        bh = B * n_hi
        bm = bh + B * n_mid
        hi_inter = _merge_tiles(f_inter[:bh], pos_hi, B, grid, S // 16)
        hi_final = _merge_tiles(f_final[:bh], pos_hi, B, grid, S // 16)
        mid_final = _merge_tiles(f_final[bh:bm], pos_mid, B, grid, S // 32)
        low_final = f_final[bm:]                                   # S/64

        img_feats, _ = DinoVisionTransformer(
            **cfg, name="image_encoder")(x_low, out_indices=(depth_cfg - 1,))
        img_final = img_feats[0].reshape(B, grid, grid, cfg["embed_dim"])

        # --- project + fuse (coarse -> fine), DPT-style ---
        def proj(t, name):
            return nn.Conv(self.features, (1, 1), padding="VALID",
                           dtype=x.dtype, name=name)(t)

        l0 = proj(hi_inter, "proj_hi_inter")     # S/16
        l1 = proj(hi_final, "proj_hi_final")     # S/16
        l2 = proj(mid_final, "proj_mid")         # S/32
        l3 = proj(low_final, "proj_low")         # S/64
        l4 = proj(img_final, "proj_image")       # S/64 (global)

        f = _FeatureFusionBlock(self.features, name="fusion_global")(
            l3 + l4, out_hw=l2.shape[1:3])
        f = _FeatureFusionBlock(self.features, name="fusion_mid")(
            f, l2, out_hw=l1.shape[1:3])
        f = _FeatureFusionBlock(self.features, name="fusion_hi")(
            f, l1, out_hw=(S // 8, S // 8))
        f = f + resize(proj(l0, "proj_hi_inter2"), S // 8, S // 8,
                       mode="bilinear", antialias=False, align_corners=True)

        h = nn.ConvTranspose(self.features // 2, (2, 2), strides=(2, 2),
                             padding="VALID", dtype=f.dtype,
                             name="head_up")(f)                    # S/4
        h = resize(h, S, S, mode="bilinear", antialias=False,
                   align_corners=True)
        h = nn.Conv(32, (3, 3), padding="SAME", dtype=h.dtype,
                    name="head_conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), padding="VALID", dtype=h.dtype,
                    name="head_conv2")(h)
        canonical_inverse_depth = jax.nn.softplus(h.astype(jnp.float32))

        # --- FOV head on the global features ---
        g = nn.Conv(self.features // 2, (3, 3), strides=(2, 2),
                    padding="SAME", dtype=f.dtype, name="fov_conv")(l3 + l4)
        g = nn.relu(g).mean(axis=(1, 2)).astype(jnp.float32)
        g = nn.Dense(64, name="fov_fc1")(g)
        g = nn.relu(g)
        fov_deg = nn.Dense(1, name="fov_fc2")(g)[:, 0] + 60.0
        return canonical_inverse_depth, fov_deg


class DepthProModel(BaseDepthModel):
    """reference iw3/depth_pro_model.py:139-214."""

    def __init__(self, model_type="DepthPro"):
        super().__init__(model_type)
        self.force_disparity = True     # reference :143
        self.tile_size = NAME_MAP[model_type]
        self.img_size = self.tile_size * 4
        self.encoder = "vitl"
        self._jit_cache = {}

    @classmethod
    def get_name(cls):
        return "DepthPro"

    @classmethod
    def supported(cls, model_type):
        return model_type in NAME_MAP

    def is_metric(self):
        return not self.force_disparity

    def is_video_supported(self):
        return False

    def load_model(self, model_type, resolution=None, checkpoint=None,
                   **kwargs):
        model = DepthPro(encoder=self.encoder, tile_size=self.tile_size)
        if checkpoint is not None:
            from ...models.io import load_model as load_ckpt
            model, params, _ = load_ckpt(checkpoint)
        else:
            logger.warning("DepthPro: no checkpoint given; random init "
                           "(structure/benchmark use only)")
            params = model.init_params(
                jax.random.PRNGKey(0), (1, self.img_size, self.img_size, 3))
        return model, params

    def _forward(self, W, flip_aug):
        key = (W, flip_aug)
        if key not in self._jit_cache:
            model = self.model

            @jax.jit
            def fwd(params, x):
                x = x.astype(jnp.bfloat16)
                if flip_aug:
                    x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
                cid, fov_deg = model.apply_fn(params, x)
                cid = jnp.nan_to_num(cid.astype(jnp.float32))
                # reference _forward (:49-70), disparity branch
                f_px = 0.5 * W / jnp.tan(0.5 * jnp.deg2rad(fov_deg))
                inv = cid * (W / f_px)[:, None, None, None]
                inv = jnp.clip(inv, 1e-4, 1e4)
                if flip_aug:
                    n = inv.shape[0] // 2
                    inv = (inv[:n] + inv[n:, :, ::-1, :]) * 0.5
                return inv

            self._jit_cache[key] = fwd
        return self._jit_cache[key]

    def infer(self, x, tta=False, low_vram=False, enable_amp=True,
              edge_dilation=0, **kwargs):
        batch = x.ndim == 4
        if not batch:
            x = x[None]
        H, W = x.shape[1:3]
        xp = resize(x, self.img_size, self.img_size, mode="bilinear",
                    antialias=False)
        xp = (jnp.clip(xp, 0, 1) - 0.5) / 0.5
        out = self._forward(W, bool(tta))(self.params, xp)
        if H < out.shape[1] or W < out.shape[2]:
            out = resize(out, H, W, mode="bilinear", antialias=False)
        if edge_dilation_is_enabled(edge_dilation):
            out = dilate_edge(out, edge_dilation)
        # force_disparity => no sign inversion (reference :109-116)
        if not batch:
            out = out[0]
        return out
