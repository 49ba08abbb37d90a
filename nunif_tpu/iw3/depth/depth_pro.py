"""DepthPro multi-scale monocular depth estimator (flax, NHWC) + wrapper.

Behavioral parity target: reference iw3/depth_pro_model.py —
  * model table / img_size config (DepthPro=384, DepthPro_S=256), :12-19
  * batch_preprocess square resize + 0.5/0.5 normalize, :22-46
  * canonical inverse depth -> disparity via the FOV head's focal length,
    clamping, flip-TTA, sign conventions, :49-136
  * force_disparity=True wrapper (is_metric() == False), :139-214

The network (consumed by the reference via torch.hub
"nagadomi/ml-depth-pro_iw3", checkpoint ``depth_pro.pt``) follows the
published Apple DepthPro architecture exactly so the released weights
convert 1:1 (``torch_convert.convert_depth_pro``):
  * DepthProEncoder: a patch ViT (DINOv2-L/16) applied to overlapping
    tiles at three scales (5x5 full-res / 3x3 half / 1 quarter) with two
    intermediate block hooks, an image ViT for global context,
    project+upsample blocks per level and a low-res fusion conv;
  * MultiresConvDecoder: per-level 3x3 projections + deconv feature
    fusion blocks (residual pairs, 2x2 transposed conv, 1x1 out conv);
  * depth head: conv/deconv stack ending in ReLU canonical inverse depth;
  * FOVNetwork: a third ViT on the 1/4-scale input fused with the
    decoder's low-res features, predicting the field of view in degrees.

TPU-first: all 35 tiles across the three scales run the patch ViT as ONE
batched forward (perfect MXU batching); tile merging is overlap-crop
concatenation with static shapes; everything compiles to a single program
per input bucket.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core.logger import logger
from ...models import Model, register_model
from ...modules.resize import resize
from ..dilation import dilate_edge, edge_dilation_is_enabled
from .base import BaseDepthModel
from .dinov2 import DinoVisionTransformer, VIT_CONFIGS

# reference iw3/depth_pro_model.py:12-15 (img_size = ViT tile size)
NAME_MAP = {"DepthPro": 384, "DepthPro_S": 256}
# apple ml-depth-pro vit_factory: dinov2l16_384 encoder_feature_dims /
# encoder_feature_layer_ids (first two hooked)
DIMS_ENCODER = (256, 512, 1024, 1024)
HOOK_BLOCK_IDS = (5, 11)
DECODER_FEATURES = 256


def _split_tiles(x, tile: int, stride: int):
    """apple DepthProEncoder.split: row-major tile grid, tiles stacked on
    the batch axis in [tile0 b0..bN, tile1 b0..bN, ...] order."""
    size = x.shape[1]
    steps = (size - tile + stride - 1) // stride + 1 if size > tile else 1
    tiles = [x[:, j * stride:j * stride + tile, i * stride:i * stride + tile]
             for j in range(steps) for i in range(steps)]
    return jnp.concatenate(tiles, axis=0), steps


def _merge_tiles(feats, B: int, steps: int, padding: int):
    """apple DepthProEncoder.merge: overlap-CROP concatenation (interior
    edges lose ``padding`` tokens; no averaging)."""
    rows = []
    idx = 0
    for j in range(steps):
        row = []
        for i in range(steps):
            t = feats[B * idx:B * (idx + 1)]
            if j != 0:
                t = t[:, padding:]
            if j != steps - 1:
                t = t[:, :t.shape[1] - padding]
            if i != 0:
                t = t[:, :, padding:]
            if i != steps - 1:
                t = t[:, :, :t.shape[2] - padding]
            row.append(t)
            idx += 1
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


class _ProjectUpsample(nn.Module):
    """1x1 conv (no bias) + N 2x2/s2 transposed convs (no bias) —
    apple DepthProEncoder._create_project_upsample_block.  Param names
    0..N mirror the torch Sequential indexes."""
    dim_int: int
    dim_out: int
    upsample_layers: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim_int, (1, 1), use_bias=False, dtype=x.dtype,
                    name="proj")(x)
        for i in range(self.upsample_layers):
            x = nn.ConvTranspose(self.dim_out, (2, 2), strides=(2, 2),
                                 use_bias=False, transpose_kernel=True,
                                 dtype=x.dtype, name=f"up{i}")(x)
        return x


class _ResidualBlock(nn.Module):
    """relu-conv3x3-relu-conv3x3 with identity skip (apple
    FeatureFusionBlock2d._residual_block, batch_norm=False)."""
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=x.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=x.dtype,
                    name="conv2")(h)
        return x + h


class _FusionBlock(nn.Module):
    """apple FeatureFusionBlock2d: optional skip-add of resnet1(x1),
    resnet2, optional 2x deconv, 1x1 out conv."""
    features: int
    deconv: bool = True

    @nn.compact
    def __call__(self, x0, x1=None):
        x = x0
        if x1 is not None:
            x = x + _ResidualBlock(self.features, name="resnet1")(x1)
        x = _ResidualBlock(self.features, name="resnet2")(x)
        if self.deconv:
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 use_bias=False, transpose_kernel=True,
                                 dtype=x.dtype, name="deconv")(x)
        return nn.Conv(self.features, (1, 1), dtype=x.dtype,
                       name="out_conv")(x)


@register_model
class DepthPro(Model):
    """x: (B, S, S, 3), S = 4 * tile_size, normalized mean/std 0.5.
    Returns (canonical_inverse_depth (B,S,S,1), fov_deg (B,))."""
    model_name = "iw3.depth_pro"
    encoder: str = "vitl"
    tile_size: int = 384
    use_fov_head: bool = True
    pos_embed_size: int = 24  # checkpoint grid (24 = 384/16)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, S, _, _ = x.shape
        p = self.tile_size
        assert S == 4 * p, (S, p)
        grid = p // 16
        cfg = dict(VIT_CONFIGS[self.encoder])
        cfg.update(patch_size=16, pos_embed_size=self.pos_embed_size)
        depth_cfg = cfg["depth"]
        C = cfg["embed_dim"]
        hook0, hook1 = HOOK_BLOCK_IDS if depth_cfg > max(HOOK_BLOCK_IDS) \
            else (0, depth_cfg - 1)
        d0, d1, d2, d3 = DIMS_ENCODER if self.encoder == "vitl" \
            else (C // 4, C // 2, C, C)
        df = DECODER_FEATURES if self.encoder == "vitl" else C // 4

        # --- image pyramid + overlapping tiles (encoder.forward) ---
        x1 = resize(x, S // 2, S // 2, mode="bilinear", antialias=False)
        x2 = resize(x, S // 4, S // 4, mode="bilinear", antialias=False)
        hi, n_hi = _split_tiles(x, p, int(p * 0.75))     # 5x5 @ full res
        mid, n_mid = _split_tiles(x1, p, p // 2)         # 3x3 @ half res
        tiles = jnp.concatenate([hi, mid, x2], axis=0)   # (35B, p, p, 3)

        patch_vit = DinoVisionTransformer(**cfg, name="patch_encoder")
        final, lat0, lat1 = patch_vit(
            tiles, out_indices=(depth_cfg - 1,),
            raw_indices=(hook0, hook1))[0]
        final = final.reshape(-1, grid, grid, C)
        lat0 = lat0.reshape(-1, grid, grid, C)
        lat1 = lat1.reshape(-1, grid, grid, C)

        bh = B * n_hi * n_hi
        bm = bh + B * n_mid * n_mid
        # crop half the tile overlap per interior edge: hi tiles overlap
        # grid/4 tokens (stride 0.75p), mid tiles grid/2 -> paddings 3/6
        # at the real grid 24 (apple hardcodes those)
        p_hi, p_mid = grid // 8, grid // 4
        x_lat0 = _merge_tiles(lat0[:bh], B, n_hi, padding=p_hi)    # S/16
        x_lat1 = _merge_tiles(lat1[:bh], B, n_hi, padding=p_hi)    # S/16
        x0_f = _merge_tiles(final[:bh], B, n_hi, padding=p_hi)     # S/16
        x1_f = _merge_tiles(final[bh:bm], B, n_mid, padding=p_mid)  # S/32
        x2_f = final[bm:]                                       # S/64

        img_vit = DinoVisionTransformer(**cfg, name="image_encoder")
        g = img_vit(x2, out_indices=(depth_cfg - 1,))[0][0]
        g = g.reshape(B, grid, grid, C)

        # --- project+upsample per level (encoder upsample blocks) ---
        x_lat0 = _ProjectUpsample(d0, df, 3, name="upsample_latent0")(x_lat0)
        x_lat1 = _ProjectUpsample(d0, d0, 2, name="upsample_latent1")(x_lat1)
        x0_f = _ProjectUpsample(d1, d1, 1, name="upsample0")(x0_f)
        x1_f = _ProjectUpsample(d2, d2, 1, name="upsample1")(x1_f)
        x2_f = _ProjectUpsample(d3, d3, 1, name="upsample2")(x2_f)
        g = nn.ConvTranspose(d3, (2, 2), strides=(2, 2), dtype=g.dtype,
                             transpose_kernel=True, name="upsample_lowres")(g)
        g = nn.Conv(d3, (1, 1), dtype=g.dtype, name="fuse_lowres")(
            jnp.concatenate([x2_f, g], axis=-1))

        # --- MultiresConvDecoder (convs[0] is Identity: d_lat0 == df) ---
        def dconv(t, dim, name):
            return nn.Conv(df, (3, 3), padding="SAME", use_bias=False,
                           dtype=t.dtype, name=name)(t)

        f = dconv(g, d3, "conv4")
        lowres_features = f
        f = _FusionBlock(df, deconv=True, name="fusion4")(f)
        f = _FusionBlock(df, deconv=True, name="fusion3")(
            f, dconv(x1_f, d3, "conv3"))
        f = _FusionBlock(df, deconv=True, name="fusion2")(
            f, dconv(x0_f, d1, "conv2"))
        f = _FusionBlock(df, deconv=True, name="fusion1")(
            f, dconv(x_lat1, d0, "conv1"))
        f = _FusionBlock(df, deconv=False, name="fusion0")(f, x_lat0)

        # --- depth head (apple DepthPro.head Sequential 0/1/2/4) ---
        h = nn.Conv(df // 2, (3, 3), padding="SAME", dtype=f.dtype,
                    name="head_conv0")(f)
        h = nn.ConvTranspose(df // 2, (2, 2), strides=(2, 2), dtype=h.dtype,
                             transpose_kernel=True, name="head_up1")(h)
        h = nn.Conv(32, (3, 3), padding="SAME", dtype=h.dtype,
                    name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=h.dtype, name="head_conv4")(h)
        canonical_inverse_depth = nn.relu(h.astype(jnp.float32))

        if not self.use_fov_head:
            return canonical_inverse_depth, jnp.full((B,), 60.0, jnp.float32)

        # --- FOVNetwork (with fov_encoder): third ViT on the 1/4 input ---
        fov_vit = DinoVisionTransformer(**cfg, name="fov_encoder")
        ft = fov_vit(x2, out_indices=(depth_cfg - 1,))[0][0]   # (B,N,C)
        ft = nn.Dense(df // 2, dtype=ft.dtype, name="fov_proj")(ft)
        ft = ft.reshape(B, grid, grid, df // 2)
        # explicit (1,1) padding: torch Conv2d(s=2, p=1) alignment on
        # even inputs (XLA SAME pads (0,1) there)
        lr = nn.Conv(df // 2, (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)),
                     dtype=f.dtype, name="fov_downsample")(lowres_features)
        lr = nn.relu(lr)
        z = ft.astype(lr.dtype) + lr
        z = nn.Conv(df // 4, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=z.dtype, name="fov_head0")(z)
        z = nn.relu(z)
        z = nn.Conv(df // 8, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=z.dtype, name="fov_head2")(z)
        z = nn.relu(z)
        if z.shape[1] != 6:
            # apple's final 6x6 VALID conv assumes img_size 384; other
            # tile sizes (DepthPro_S) resize to the 6x6 receptive field
            z = resize(z, 6, 6, mode="bilinear", antialias=False)
        z = nn.Conv(1, (6, 6), padding="VALID", dtype=z.dtype,
                    name="fov_head4")(z)
        fov_deg = z.astype(jnp.float32).reshape(B)
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
        if checkpoint is not None and (
                str(checkpoint).endswith(".pt")
                or str(checkpoint).endswith(".pth")
                or str(checkpoint).endswith(".safetensors")):
            # raw hub checkpoint (reference MODEL_FILES: depth_pro.pt)
            from ...models.pth_import import load_torch_checkpoint
            from ...models.torch_convert import convert_depth_pro
            _name, _kw, sd = load_torch_checkpoint(checkpoint)
            params = convert_depth_pro(sd, self.encoder)
            # pos-embed grid comes from the checkpoint (24 for the released
            # depth_pro.pt; DepthPro_S interpolates it to its 16 grid)
            n_pos = params["patch_encoder"]["pos_embed"].shape[1] - 1
            model = DepthPro(encoder=self.encoder, tile_size=self.tile_size,
                             pos_embed_size=int(round(n_pos ** 0.5)))
            logger.info("converted DepthPro checkpoint %s", checkpoint)
        elif checkpoint is not None:
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
