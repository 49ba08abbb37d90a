"""Video-Depth-Anything (VDA) temporal depth estimator (flax, NHWC).

Behavioral parity target: reference iw3/video_depth_anything_model.py and
iw3/video_depth_anything_streaming_model.py (the network itself lives in
the external hub repo "nagadomi/Video-Depth-Anything_iw3"; this is a
from-scratch JAX implementation of the published VDA architecture:
DINOv2 per-frame encoder + DPT head with temporal-attention "motion
modules" over a frame window):

  * model tables / metric padding / force-disparity postprocess —
    reference iw3/video_depth_anything_model.py:15-58,61-109
  * online (windowed) infer_with_normalize / flush semantics —
    reference :193-255
  * per-frame streaming variant —
    reference iw3/video_depth_anything_streaming_model.py:44-103

TPU-first design notes:
  * temporal attention runs as batched matmuls with spatial positions on
    the batch axis and the frame axis (T<=32) on the contraction axes —
    small (T, T) score tiles, all MXU work stays in the (BHW, heads) grid.
  * window mode compiles ONE program per (T, h, w) bucket: backbone folds
    (B, T) -> (B*T) so the per-frame ViT runs as one big batch.
  * streaming mode keeps explicit fixed-shape ring-buffer caches (a
    pytree threaded through jit) instead of mutable module state; each
    step attends the newest frame against the cached window, so the
    per-frame cost is one ViT forward + O(T) temporal attention.
  * motion-module placement (levels 2/3 after the resize pyramid, then
    fusion paths 4/3 after their RefineNet blocks) follows the published
    VDA spatiotemporal head; attention blocks use sinusoidal positional
    encodings and zero-initialized output projections so a fresh module
    is an identity mapping (AnimateDiff-style temporal transformer).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...core.logger import logger
from ...models import Model, register_model
from ...modules.pad import reflection_pad2d, crop2d
from ..dilation import dilate_edge, edge_dilation_is_enabled
from .base import BaseDepthModel
from .dinov2 import DinoVisionTransformer, VIT_CONFIGS, INTERMEDIATE_LAYER_IDX
from .depth_anything import batch_preprocess, compute_preprocess_size, MIN_RESOLUTION

# reference iw3/video_depth_anything_model.py:15-48
NAME_MAP = {
    "VDA_S": "vits", "VDA_B": "vitb", "VDA_L": "vitl",
    "VDA_Metric": "vitl",
    "VDA_Metric_S": "vits", "VDA_Metric_B": "vitb", "VDA_Metric_L": "vitl",
}
STREAM_NAME_MAP = {
    "VDA_Stream_S": "vits", "VDA_Stream_B": "vitb", "VDA_Stream_L": "vitl",
    "VDA_Stream_Metric_S": "vits", "VDA_Stream_Metric_B": "vitb",
    "VDA_Stream_Metric_L": "vitl",
}
METRIC_DEPTH_TYPES = {
    "VDA_Metric", "VDA_Metric_S", "VDA_Metric_B", "VDA_Metric_L",
    "VDA_Stream_Metric_S", "VDA_Stream_Metric_B", "VDA_Stream_Metric_L",
}
METRIC_PADDING = 14          # reference :33
INFER_LEN = 32               # VDA window length
OVERLAP = 10                 # frames shared between consecutive windows

_DPT_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
}


def sinusoidal_pe(T: int, dim: int) -> np.ndarray:
    """Fixed sinusoidal positional table (T, dim)."""
    pos = np.arange(T, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64)
                 * (-math.log(10000.0) / dim))
    pe = np.zeros((T, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)[:, : pe[:, 1::2].shape[1]]
    return pe


class TemporalAttention(nn.Module):
    """MHA over the frame axis.  q: (B, Tq, C), kv: (B, Tk, C)."""
    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None):
        B, Tq, C = q_in.shape
        Tk = kv_in.shape[1]
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=q_in.dtype, name="to_q")(q_in)
        k = nn.Dense(self.dim, dtype=q_in.dtype, name="to_k")(kv_in)
        v = nn.Dense(self.dim, dtype=q_in.dtype, name="to_v")(kv_in)
        q = q.reshape(B, Tq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, self.num_heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if mask is not None:  # (Tk,) bool, True = valid
            scores = jnp.where(mask[None, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(q_in.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(q_in.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.dim)
        return nn.Dense(self.dim, dtype=q_in.dtype, name="to_out")(out)


class TemporalModule(nn.Module):
    """AnimateDiff-style temporal transformer applied to a feature map.

    Window mode: ``__call__(x)`` with x (B, T, H, W, C), bidirectional
    attention over T.  Streaming mode: ``__call__(x, cache=...)`` with
    x (B, 1, H, W, C) — the new frame attends over fixed-size ring
    buffers of the previous frames' block inputs (causal), returning
    (out, new_cache).
    """
    dim: int
    num_heads: int = 8
    max_len: int = INFER_LEN

    def _pe(self, T, dtype):
        return jnp.asarray(sinusoidal_pe(self.max_len, self.dim)[:T],
                           dtype=dtype)

    @nn.compact
    def __call__(self, x, cache=None):
        B, T, H, W, C = x.shape
        res = x
        h = nn.GroupNorm(num_groups=min(32, C), epsilon=1e-6, dtype=x.dtype,
                         name="norm")(x.reshape(B * T, H, W, C))
        h = nn.Dense(self.dim, dtype=x.dtype, name="proj_in")(h)
        # (B, T, H, W, C) -> (B*H*W, T, C): frame axis inner for attention
        h = h.reshape(B, T, H * W, self.dim).transpose(0, 2, 1, 3)
        h = h.reshape(B * H * W, T, self.dim)

        ln1 = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="attn1_norm")
        ln2 = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="attn2_norm")
        attn1 = TemporalAttention(self.dim, self.num_heads, name="attn1")
        attn2 = TemporalAttention(self.dim, self.num_heads, name="attn2")
        ff_norm = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="ff_norm")
        # GEGLU feed-forward (the published VDA motion module uses
        # diffusers-style FeedForward(activation="geglu"))
        ff1 = nn.Dense(self.dim * 8, dtype=x.dtype, name="ff_proj")
        ff2 = nn.Dense(self.dim, dtype=x.dtype, name="ff_out")

        def ff(t):
            a, g = jnp.split(ff1(ff_norm(t)), 2, axis=-1)
            return ff2(a * nn.gelu(g, approximate=False))

        if cache is None:
            pe = self._pe(T, x.dtype)[None]
            h = h + attn1(ln1(h) + pe, ln1(h) + pe)
            h = h + attn2(ln2(h) + pe, ln2(h) + pe)
            h = h + ff(h)
            new_cache = None
        else:
            # Ring buffers hold the *inputs* of each attention block for
            # the last max_len frames, LEFT-aligned: while warming up the
            # newest frame is written at index n (so PE positions match
            # window mode exactly for the first max_len frames); once full
            # the buffer shifts and the newest frame stays at the last
            # position.
            assert T == 1
            ring1, ring2, n = cache["ring1"], cache["ring2"], cache["n"]
            Tc = ring1.shape[1]
            full = n >= Tc
            idx = jnp.minimum(n, Tc - 1)
            valid = jnp.arange(Tc) <= idx
            pe = self._pe(Tc, x.dtype)[None]
            q_pe = jnp.take(pe[0], idx, axis=0)[None, None]

            def push(ring, new):
                shifted = jnp.where(full, jnp.roll(ring, -1, axis=1), ring)
                return jax.lax.dynamic_update_slice_in_dim(
                    shifted, new, idx, axis=1)

            ring1 = push(ring1, h)
            h = h + attn1(ln1(h) + q_pe, ln1(ring1) + pe, mask=valid)
            ring2 = push(ring2, h)
            h = h + attn2(ln2(h) + q_pe, ln2(ring2) + pe, mask=valid)
            h = h + ff(h)
            new_cache = {"ring1": ring1, "ring2": ring2,
                         "n": jnp.minimum(n + 1, Tc)}

        h = nn.Dense(C, dtype=x.dtype, kernel_init=nn.initializers.zeros,
                     name="proj_out")(h)
        h = h.reshape(B, H * W, T, C).transpose(0, 2, 1, 3)
        h = h.reshape(B, T, H, W, C)
        out = res + h
        if cache is None:
            return out
        return out, new_cache


def _interp(x, h, w):
    from ...modules.resize import resize
    return resize(x, h, w, mode="bilinear", antialias=False,
                  align_corners=True)


class _ResidualConvUnit(nn.Module):
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


class _FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, out_hw=None):
        if res is not None:
            x = x + _ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = _ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = _interp(x, *out_hw)
        return nn.Conv(self.features, (1, 1), padding="VALID", dtype=x.dtype,
                       name="out_conv")(x)


def _lvl3_hw(ph, pw):
    """Output size of the stride-2 resize_3 conv (k=3, s=2, p=1)."""
    return (ph - 1) // 2 + 1, (pw - 1) // 2 + 1


class DPTHeadTemporal(nn.Module):
    """DPT head with temporal motion modules (VDA spatiotemporal head).

    feats: 4 token maps (B*T, N, C).  Returns (B, T, H, W, 1).
    In streaming mode (caches given, T == 1) returns (depth, new_caches).
    """
    features: int
    out_channels: tuple
    max_depth: float = 0.0
    num_frames: int = INFER_LEN

    # ---------------------------------------------------------- stages
    # The forward splits into per-frame-independent stages (batched over
    # frames) and the 4 temporal modules (the only sequential state).
    # The streaming scan in VideoDepthAnythingStreamingModel batches the
    # stages over the whole frame chunk and scans ONLY the motions —
    # measured: the B=1 whole-model scan starves the MXU (encoder alone
    # is 0.59 ms/frame batched vs the 467 ms/frame assembled step).

    def _levels(self, feats, patch_hw):
        ph, pw = patch_hw
        BT = feats[0].shape[0]
        levels = []
        for i, tokens in enumerate(feats):
            x = tokens.reshape(BT, ph, pw, tokens.shape[-1])
            x = nn.Conv(self.out_channels[i], (1, 1), padding="VALID",
                        dtype=x.dtype, name=f"projects_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), padding="VALID",
                                     dtype=x.dtype, name="resize_0",
                                     transpose_kernel=True)(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), padding="VALID",
                                     dtype=x.dtype, name="resize_1",
                                     transpose_kernel=True)(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=x.dtype,
                            name="resize_3")(x)
            levels.append(x)
        return levels

    def _motion_module(self, i):
        dims = [self.out_channels[2], self.out_channels[3],
                self.features, self.features]
        return TemporalModule(dims[i], max_len=self.num_frames,
                              name=f"motion_modules_{i}")

    def _rn(self, levels):
        return [nn.Conv(self.features, (3, 3), padding="SAME",
                        use_bias=False, dtype=levels[i].dtype,
                        name=f"layer{i + 1}_rn")(levels[i])
                for i in range(4)]

    def _p4(self, rn3, out_hw):
        return _FeatureFusionBlock(self.features, name="refinenet4")(
            rn3, out_hw=out_hw)

    def _p3(self, p4, rn2, out_hw):
        return _FeatureFusionBlock(self.features, name="refinenet3")(
            p4, rn2, out_hw=out_hw)

    def _final(self, p3, rn1, rn0, patch_hw):
        ph, pw = patch_hw
        p2 = _FeatureFusionBlock(self.features, name="refinenet2")(
            p3, rn1, out_hw=rn0.shape[1:3])
        p1 = _FeatureFusionBlock(self.features, name="refinenet1")(p2, rn0)
        out = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                      dtype=p1.dtype, name="output_conv1")(p1)
        out = _interp(out, ph * 14, pw * 14)
        out = nn.Conv(32, (3, 3), padding="SAME", dtype=out.dtype,
                      name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), padding="VALID", dtype=out.dtype,
                      name="output_conv2_2")(out)
        if self.max_depth > 0:
            out = nn.sigmoid(out.astype(jnp.float32)) * self.max_depth
        else:
            out = nn.relu(out)
        return out

    @nn.compact
    def __call__(self, feats, patch_hw, T, caches=None, stage=None,
                 stage_args=()):
        if stage is not None:
            # staged apply for the batched-stages + scanned-motions
            # streaming path; each stage constructs a disjoint set of
            # (identically named) submodules, so parameter paths are the
            # same as the full forward's.
            if stage == "levels":
                return self._levels(feats, patch_hw)
            if stage == "motion":
                i, x, cache = stage_args
                return self._motion_module(i)(x, cache=cache)
            if stage == "mid":  # levels (post-motion 2/3) -> (rn, p4)
                levels = stage_args
                rn = self._rn(levels)
                return rn, self._p4(rn[3], rn[2].shape[1:3])
            if stage == "p3":
                p4, rn2, out_hw = stage_args
                return self._p3(p4, rn2, out_hw)
            if stage == "final":
                p3, rn1, rn0 = stage_args
                return self._final(p3, rn1, rn0, patch_hw)
            raise ValueError(f"unknown stage {stage}")

        ph, pw = patch_hw
        BT = feats[0].shape[0]
        B = BT // T
        levels = self._levels(feats, patch_hw)

        new_caches = [None] * 4

        def motion(i, x):
            nonlocal new_caches
            t = x.reshape(B, T, *x.shape[1:])
            if caches is None:
                t = self._motion_module(i)(t)
            else:
                t, new_caches[i] = self._motion_module(i)(t, cache=caches[i])
            return t.reshape(BT, *x.shape[1:])

        levels[2] = motion(0, levels[2])
        levels[3] = motion(1, levels[3])

        rn = self._rn(levels)
        p4 = self._p4(rn[3], rn[2].shape[1:3])
        p4 = motion(2, p4)
        p3 = self._p3(p4, rn[2], rn[1].shape[1:3])
        p3 = motion(3, p3)
        out = self._final(p3, rn[1], rn[0], patch_hw)
        out = out.reshape(B, T, ph * 14, pw * 14, 1)
        if caches is None:
            return out
        return out, new_caches


@register_model
class VideoDepthAnything(Model):
    """Full VDA network.  x: (B, T, H, W, 3), preprocessed/normalized,
    H, W multiples of 14.  Returns depth/disparity (B, T, H, W, 1)."""
    model_name = "iw3.video_depth_anything"
    encoder: str = "vits"
    max_depth: float = 0.0   # 0 => relative disparity; >0 => metric depth
    num_frames: int = INFER_LEN

    @nn.compact
    def __call__(self, x, train: bool = False, caches=None, stage=None,
                 head_stage=None, stage_args=()):
        cfg = VIT_CONFIGS[self.encoder]
        idx = INTERMEDIATE_LAYER_IDX[self.encoder]
        if stage == "encode":
            # batched per-frame encoder: x (N, H, W, 3) -> (feats, patch_hw)
            return DinoVisionTransformer(
                **cfg, name="pretrained")(x, out_indices=idx)
        if stage == "head":
            # staged head apply (see DPTHeadTemporal stages): x carries
            # (feats, patch_hw) for "levels" / (p3, rn1, rn0, patch_hw)
            # for "final" / the stage inputs otherwise
            head = DPTHeadTemporal(
                max_depth=self.max_depth, num_frames=self.num_frames,
                name="head", **_DPT_CONFIGS[self.encoder])
            if head_stage == "levels":
                feats, patch_hw = x
                return head(feats, patch_hw, None, stage="levels")
            if head_stage == "final":
                p3, rn1, rn0, patch_hw = x
                return head(None, patch_hw, None, stage="final",
                            stage_args=(p3, rn1, rn0))
            return head(None, None, None, stage=head_stage, stage_args=x)
        B, T, H, W, _ = x.shape
        feats, patch_hw = DinoVisionTransformer(
            **cfg, name="pretrained")(x.reshape(B * T, H, W, 3),
                                      out_indices=idx)
        head = DPTHeadTemporal(
            max_depth=self.max_depth, num_frames=self.num_frames,
            name="head", **_DPT_CONFIGS[self.encoder])
        return head(feats, patch_hw, T, caches=caches)

    def init_caches(self, B, H, W, dtype=jnp.bfloat16):
        """Fixed-shape streaming ring buffers for input size (H, W)."""
        ph, pw = H // 14, W // 14
        l3h, l3w = _lvl3_hw(ph, pw)
        cfg = _DPT_CONFIGS[self.encoder]
        specs = [
            (ph * pw, cfg["out_channels"][2]),
            (l3h * l3w, cfg["out_channels"][3]),
            (ph * pw, cfg["features"]),
            (2 * ph * 2 * pw, cfg["features"]),
        ]
        return [
            {"ring1": jnp.zeros((B * n, self.num_frames, c), dtype),
             "ring2": jnp.zeros((B * n, self.num_frames, c), dtype),
             "n": jnp.zeros((), jnp.int32)}
            for n, c in specs
        ]


# ---------------------------------------------------------------------------
# pre/post processing (reference iw3/video_depth_anything_model.py:51-109)
# ---------------------------------------------------------------------------

def vda_preprocess(x, lower_bound, metric_depth, limit_resolution=False):
    """x (B,H,W,3) [0,1] -> resized+normalized, reflection-padded if metric."""
    B, H, W, _ = x.shape
    if metric_depth:
        out_h, out_w = compute_preprocess_size(
            H, W, lower_bound - METRIC_PADDING * 2,
            limit_resolution=limit_resolution)
        x = batch_preprocess(x, out_h, out_w)
        x = reflection_pad2d(x, (METRIC_PADDING,) * 4)
    else:
        out_h, out_w = compute_preprocess_size(
            H, W, lower_bound, limit_resolution=limit_resolution)
        x = batch_preprocess(x, out_h, out_w)
    assert x.shape[1] % 14 == 0 and x.shape[2] % 14 == 0
    return x


def vda_postprocess(out, edge_dilation, metric_depth, force_disparity=True,
                    max_dist=None, depth_aa_fn=None):
    """out (B,H,W,1) raw net output -> disparity-convention fp32 depth."""
    out = jnp.nan_to_num(out.astype(jnp.float32))
    if max_dist is not None:
        out = jnp.minimum(out, max_dist)
    if metric_depth and force_disparity:
        out = 1.0 / (out + 0.1)
    if depth_aa_fn is not None:
        out = depth_aa_fn(out)
    if metric_depth:
        out = crop2d(out, (METRIC_PADDING,) * 4)
    is_disparity = (not metric_depth) or force_disparity
    if edge_dilation_is_enabled(edge_dilation):
        if is_disparity:
            out = dilate_edge(out, edge_dilation)
        else:
            out = -dilate_edge(-out, edge_dilation)
    if not is_disparity:
        out = -out  # zoedepth-compatible inversion
    return out


def align_scale_shift(new, ref, eps=1e-6):
    """Least-squares (s, t) aligning ``new`` to ``ref`` over the overlap."""
    x = new.reshape(-1).astype(jnp.float32)
    y = ref.reshape(-1).astype(jnp.float32)
    mx, my = x.mean(), y.mean()
    vx = x - mx
    s = jnp.sum(vx * (y - my)) / (jnp.sum(vx * vx) + eps)
    s = jnp.where(jnp.isfinite(s) & (s > eps), s, 1.0)
    t = my - s * mx
    t = jnp.where(jnp.isfinite(t), t, 0.0)
    return s, t


# ---------------------------------------------------------------------------
# iw3-facing wrappers
# ---------------------------------------------------------------------------

class _VDACommon(BaseDepthModel):
    def __init__(self, model_type, name_map):
        super().__init__(model_type)
        self.encoder = name_map[model_type]
        self.metric_depth = model_type in METRIC_DEPTH_TYPES
        self.force_disparity = True   # reference :119
        self.prep_lower_bound = 392
        self.depth_aa_model = None
        self.depth_aa_params = None
        self._jit_cache = {}

    def is_metric(self):
        if not self.metric_depth:
            return False
        return not self.force_disparity

    def is_image_supported(self):
        return False

    def _build(self, model_type, resolution, checkpoint, window_size):
        self.prep_lower_bound = resolution or 392
        if self.prep_lower_bound % 14 != 0:
            self.prep_lower_bound += 14 - self.prep_lower_bound % 14
        max_depth = 20.0 if self.metric_depth else 0.0
        model = VideoDepthAnything(encoder=self.encoder, max_depth=max_depth,
                                   num_frames=window_size)
        if checkpoint is not None:
            from ...models.io import load_model as load_ckpt
            model, params, _ = load_ckpt(checkpoint)
        else:
            logger.warning("VideoDepthAnything: no checkpoint given; "
                           "random init (structure/benchmark use only)")
            params = model.init_params(
                jax.random.PRNGKey(0),
                (1, 2, MIN_RESOLUTION, MIN_RESOLUTION, 3))
        return model, params

    def _depth_aa_fn(self, enabled):
        if not enabled or self.depth_aa_model is None:
            return None
        from ..models.depth_aa import depth_aa_infer

        def fn(x):
            return depth_aa_infer(self.depth_aa_model, self.depth_aa_params, x)
        return fn

    def _preprocess(self, x):
        return vda_preprocess(x, self.prep_lower_bound, self.metric_depth,
                              limit_resolution=self.limit_resolution)


class VideoDepthAnythingModel(_VDACommon):
    """Windowed ("online") VDA.  Output lags input by up to one window;
    consumers must use infer_with_normalize / flush_with_normalize
    (reference iw3/video_depth_anything_model.py:193-255)."""

    def __init__(self, model_type="VDA_S", window_size=INFER_LEN,
                 overlap=OVERLAP):
        super().__init__(model_type, NAME_MAP)
        self.window_size = window_size
        self.overlap = min(overlap, max(window_size - 1, 1))
        self._pending = []        # preprocessed frames (H,W,3)
        self._ctx_in = []         # last `overlap` inputs of prev window
        self._ctx_out = []        # aligned raw outputs for those inputs

    @classmethod
    def get_name(cls):
        return "VideoDepthAnything"

    @classmethod
    def supported(cls, model_type):
        return model_type in NAME_MAP

    def load_model(self, model_type, resolution=None, checkpoint=None,
                   **kwargs):
        return self._build(model_type, resolution, checkpoint,
                           self.window_size)

    def reset_state(self):
        self._pending = []
        self._ctx_in = []
        self._ctx_out = []

    def _window_forward(self, frames):
        """frames: list of (H,W,3) preprocessed. Returns (T,H,W,1) raw."""
        T = len(frames)
        h, w = frames[0].shape[0], frames[0].shape[1]
        key = ("win", T, h, w)
        if key not in self._jit_cache:
            model = self.model

            @jax.jit
            def fwd(params, x):
                out = model.apply_fn(params, x.astype(jnp.bfloat16)[None])
                return out[0].astype(jnp.float32)

            self._jit_cache[key] = fwd
        x = jnp.stack(frames)
        return self._jit_cache[key](self.params, x)

    def _run_window(self):
        """Run one full window; returns raw outputs for the NEW frames."""
        n_ctx = len(self._ctx_in)
        frames = self._ctx_in + self._pending
        n_new = len(self._pending)
        pad = self.window_size - len(frames)
        if pad > 0:  # flush path: repeat last frame to keep static shapes
            frames = frames + [frames[-1]] * pad
        out = self._window_forward(frames)
        if n_ctx:
            ref = jnp.stack(self._ctx_out)
            s, t = align_scale_shift(out[:n_ctx], ref)
            out = out * s + t
        new_out = out[n_ctx:n_ctx + n_new]
        # keep overlap context for the next window
        keep = min(self.overlap, len(self._ctx_in) + n_new)
        all_in = (self._ctx_in + self._pending)[-keep:]
        all_out = list(self._ctx_out) + list(new_out)
        self._ctx_in = all_in
        self._ctx_out = all_out[-keep:]
        self._pending = []
        return new_out

    def _emit(self, raw_frames, edge_dilation, depth_aa):
        """Postprocess + EMA-normalize a stack of raw output frames."""
        if len(raw_frames) == 0:
            return []
        out = vda_postprocess(
            jnp.stack(list(raw_frames)) if not isinstance(raw_frames, jnp.ndarray)
            else raw_frames,
            edge_dilation=edge_dilation, metric_depth=self.metric_depth,
            force_disparity=self.force_disparity,
            depth_aa_fn=self._depth_aa_fn(depth_aa))
        # batched scaler update: one device->host sync per emitted window
        return self.scaler.update_batch(out)

    def infer_with_normalize(self, x, pts=None, reset_pts=(),
                             edge_dilation=0, depth_aa=False, **kwargs):
        """x: (B,H,W,3) [0,1].  Returns list of normalized depth frames
        (possibly empty; output lags by the window buffering)."""
        assert x.ndim == 4
        B = x.shape[0]
        pts = list(range(B)) if pts is None else pts
        reset_pts = set(reset_pts)
        x = self._preprocess(x)
        outputs = []
        for i in range(B):
            self._pending.append(x[i])
            new_count = self.window_size - len(self._ctx_in)
            if len(self._pending) >= new_count:
                outputs += self._emit(self._run_window(), edge_dilation,
                                      depth_aa)
            if pts[i] in reset_pts:
                outputs += self.flush_with_normalize(
                    edge_dilation=edge_dilation, depth_aa=depth_aa)
                self.reset()
        return outputs

    def flush_with_normalize(self, edge_dilation=0, depth_aa=False, **kwargs):
        outputs = []
        if self._pending:
            outputs += self._emit(self._run_window(), edge_dilation, depth_aa)
        outputs += self.flush_minmax_normalize()
        self.reset_state()
        return outputs

    def infer(self, x, edge_dilation=0, depth_aa=False, **kwargs):
        """Whole-batch clip inference (reference :165-191 'NOTE: DONT USE
        THIS' path — used for still images / tests)."""
        batch = x.ndim == 4
        if not batch:
            x = x[None]
        self.reset_state()
        xp = self._preprocess(x)
        out = self._window_forward(list(xp))
        self.reset_state()
        out = vda_postprocess(out, edge_dilation=edge_dilation,
                              metric_depth=self.metric_depth,
                              force_disparity=self.force_disparity,
                              depth_aa_fn=self._depth_aa_fn(depth_aa))
        if not batch:
            out = out[0]
        return out


class VideoDepthAnythingStreamingModel(_VDACommon):
    """Per-frame streaming VDA: no output lag; temporal context carried in
    fixed-shape ring-buffer caches (reference
    iw3/video_depth_anything_streaming_model.py:44-103)."""

    # infer() threads Python-side ring-buffer caches between frames, so it
    # must NEVER be traced inside a caller's jit (Iw3FrameProcessor checks
    # this flag and routes to the unfused per-batch path)
    stateful_inference = True

    def __init__(self, model_type="VDA_Stream_S", window_size=INFER_LEN):
        super().__init__(model_type, STREAM_NAME_MAP)
        self.window_size = window_size
        self._caches = None
        self._cache_hw = None

    @classmethod
    def get_name(cls):
        return "VideoDepthAnythingStreaming"

    @classmethod
    def supported(cls, model_type):
        return model_type in STREAM_NAME_MAP

    def load_model(self, model_type, resolution=None, checkpoint=None,
                   **kwargs):
        return self._build(model_type, resolution, checkpoint,
                           self.window_size)

    def reset_state(self):
        self._caches = None
        self._cache_hw = None

    def _step_fn(self, h, w):
        key = ("step", h, w)
        if key not in self._jit_cache:
            model = self.model

            @jax.jit
            def step(params, frame, caches):
                out, new_caches = model.apply(
                    {"params": params},
                    frame.astype(jnp.bfloat16)[None, None], caches=caches)
                return out[0, 0].astype(jnp.float32), new_caches

            self._jit_cache[key] = step
        return self._jit_cache[key]

    def _scan_fn(self, h, w, t):
        """One jitted program running T streaming steps with the
        per-frame-independent work BATCHED.

        The temporal recurrence is inherently sequential, but only the 4
        motion modules carry state — the DINOv2 encoder and every head
        conv are per-frame independent.  Scanning the whole model at B=1
        starves the MXU (measured 7.4 ms/frame scanned vs 0.59 ms/frame
        for the batched encoder); here the encoder + level convs, the
        rn/refinenet convs, and the output head each run ONCE over all T
        frames, and lax.scan covers only the tiny per-frame temporal
        attention (ring-buffer caches in the carry).  Semantics are
        identical to the per-frame step: motion i's cache at frame k
        contains exactly the frames < k inputs."""
        key = ("scan", h, w, t)
        if key not in self._jit_cache:
            model = self.model

            def motion_scan(params, i, seq, cache):
                # seq (T, hh, ww, c): frame-ordered inputs of module i
                def body(c, fr):
                    out, nc = model.apply(
                        {"params": params}, (i, fr[None, None], c),
                        stage="head", head_stage="motion")
                    return nc, out[0, 0]
                cache, out = jax.lax.scan(body, cache, seq)
                return out, cache

            @jax.jit
            def run(params, frames, caches):      # frames (T, H, W, 3)
                P = {"params": params}
                # the ring buffers define the working dtype (bf16 in
                # production; tests pass fp32 caches)
                xb = frames.astype(caches[0]["ring1"].dtype)
                feats, patch_hw = model.apply(P, xb, stage="encode")
                levels = model.apply(P, (feats, patch_hw),
                                     stage="head", head_stage="levels")
                lv2, c0 = motion_scan(params, 0, levels[2], caches[0])
                lv3, c1 = motion_scan(params, 1, levels[3], caches[1])
                rn, p4 = model.apply(
                    P, [levels[0], levels[1], lv2, lv3],
                    stage="head", head_stage="mid")
                p4m, c2 = motion_scan(params, 2, p4, caches[2])
                p3 = model.apply(P, (p4m, rn[2], rn[1].shape[1:3]),
                                 stage="head", head_stage="p3")
                p3m, c3 = motion_scan(params, 3, p3, caches[3])
                out = model.apply(P, (p3m, rn[1], rn[0], patch_hw),
                                  stage="head", head_stage="final")
                return out.astype(jnp.float32), [c0, c1, c2, c3]

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def infer_video_depth_one(self, frame):
        """frame: (H,W,3) preprocessed.  Returns raw (H,W,1)."""
        h, w = frame.shape[0], frame.shape[1]
        if self._caches is None or self._cache_hw != (h, w):
            self._caches = self.model.init_caches(1, h, w)
            self._cache_hw = (h, w)
        out, self._caches = self._step_fn(h, w)(self.params, frame,
                                                self._caches)
        return out

    def infer(self, x, edge_dilation=0, depth_aa=False, **kwargs):
        """x: (B,H,W,3) or (H,W,3) [0,1].  Returns fp32 depth, no lag."""
        batch = x.ndim == 4
        if not batch:
            x = x[None]
        xp = self._preprocess(x)
        h, w = int(xp.shape[1]), int(xp.shape[2])
        if self._caches is None or self._cache_hw != (h, w):
            self._caches = self.model.init_caches(1, h, w)
            self._cache_hw = (h, w)
        out, self._caches = self._scan_fn(h, w, int(xp.shape[0]))(
            self.params, xp, self._caches)
        out = vda_postprocess(out, edge_dilation=edge_dilation,
                              metric_depth=self.metric_depth,
                              force_disparity=self.force_disparity,
                              depth_aa_fn=self._depth_aa_fn(depth_aa))
        if not batch:
            out = out[0]
        return out
