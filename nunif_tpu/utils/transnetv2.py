"""TransNetV2 shot-boundary detector (flax, NDHWC).

Architecture parity target: reference nunif/utils/transnetv2.py:7-310
(vendored from soCzech/TransNetV2, MIT): stacked dilated (2+1)D conv
blocks with avg pooling, frame-similarity and color-histogram lookup
features, two classification heads.  Input: (B, T, 27, 48, 3) uint8-scale
frames (values 0-255 as float).

BatchNorm (eval) folds into the preceding convs at weight conversion;
this implementation uses conv+bias directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models import Model, register_model


def _conv3d(x, features, kernel, dilation, name_mod, use_bias=True):
    return nn.Conv(features, kernel, kernel_dilation=dilation,
                   padding=[(d * (k - 1) // 2, d * (k - 1) // 2)
                            for k, d in zip(kernel, dilation)],
                   use_bias=use_bias, dtype=x.dtype, name=name_mod)(x)


class Conv3DConfigurable(nn.Module):
    """(2+1)D separable conv (reference :182-218)."""
    filters: int
    dilation_rate: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C)
        x = nn.Conv(2 * self.filters, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                    use_bias=False, dtype=x.dtype, name="conv1")(x)
        d = self.dilation_rate
        x = nn.Conv(self.filters, (3, 1, 1), kernel_dilation=(d, 1, 1),
                    padding=((d, d), (0, 0), (0, 0)), use_bias=True,
                    dtype=x.dtype, name="conv2")(x)
        return x


class DilatedDCNNV2(nn.Module):
    """4 dilation rates concatenated (reference :143-180)."""
    filters: int
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        outs = [Conv3DConfigurable(self.filters, d, name=f"conv_d{d}")(x)
                for d in (1, 2, 4, 8)]
        x = jnp.concatenate(outs, axis=-1)
        if self.activation:
            x = nn.relu(x)
        return x


class StackedDDCNNV2(nn.Module):
    """reference :96-140 (avg pool, residual shortcut)."""
    n_blocks: int
    filters: int

    @nn.compact
    def __call__(self, x):
        shortcut = None
        for i in range(1, self.n_blocks + 1):
            x = DilatedDCNNV2(self.filters,
                              activation=(i != self.n_blocks),
                              name=f"DDCNN_{i - 1}")(x)
            if shortcut is None:
                shortcut = x
        x = nn.relu(x)
        x = x + shortcut
        # avg pool (1, 2, 2); torch AvgPool3d floors odd sizes (27 -> 13)
        B, T, H, W, C = x.shape
        x = x[:, :, :H // 2 * 2, :W // 2 * 2]
        x = x.reshape(B, T, H // 2, 2, W // 2, 2, C).mean(axis=(3, 5))
        return x


@register_model
class TransNetV2(Model):
    """reference :7-94.  __call__ -> (one_hot (B,T,1), many_hot (B,T,1))
    logits."""
    model_name = "aux.transnetv2"
    F: int = 16
    L: int = 3
    S: int = 2
    D: int = 1024
    lookup_window: int = 101

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # inputs: (B, T, 27, 48, 3), values 0..255
        x = inputs
        block_features = []
        for i in range(self.L):
            filters = self.F * (2 ** i)
            x = StackedDDCNNV2(self.S, filters, name=f"SDDCNN_{i}")(x)
            block_features.append(x)

        B, T = x.shape[0], x.shape[1]
        flat = x.reshape(B, T, -1)

        sim = self._frame_similarity(block_features)
        hist = self._color_histograms(inputs)
        # reference :70-74 prepends frame_sim, then color_hist in front of it
        x = jnp.concatenate([hist, sim, flat], axis=2)

        x = nn.Dense(self.D, dtype=x.dtype, name="fc1")(x)
        x = nn.relu(x)
        one_hot = nn.Dense(1, dtype=x.dtype, name="cls_layer1")(x)
        many_hot = nn.Dense(1, dtype=x.dtype, name="cls_layer2")(x)
        return one_hot, many_hot

    def _lookup(self, similarities):
        """Gather the (T, lookup_window) band around the diagonal."""
        B, T, _ = similarities.shape
        lw = self.lookup_window
        half = (lw - 1) // 2
        padded = jnp.pad(similarities, ((0, 0), (0, 0), (half, half)))
        t_idx = jnp.arange(T).reshape(1, T, 1)
        l_idx = jnp.arange(lw).reshape(1, 1, lw) + t_idx
        return jnp.take_along_axis(
            padded, jnp.broadcast_to(l_idx, (B, T, lw)), axis=2)

    def _frame_similarity(self, block_features):
        """reference FrameSimilarity (:220-259)."""
        pooled = [jnp.mean(f, axis=(2, 3)) for f in block_features]  # (B,T,C)
        x = jnp.concatenate(pooled, axis=-1)
        x = nn.Dense(128, use_bias=True, dtype=x.dtype,
                     name="frame_sim_projection")(x)
        x = x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-12)
        sims = jnp.einsum("btc,bsc->bts", x, x)
        band = self._lookup(sims)
        return nn.relu(nn.Dense(128, dtype=x.dtype,
                                name="frame_sim_fc")(band))

    def _color_histograms(self, frames):
        """reference ColorHistograms (:262-310): 512-bin RGB histograms +
        banded similarity."""
        B, T, H, W, _ = frames.shape
        f = jnp.clip(frames, 0, 255).astype(jnp.int32)
        r, g, b = f[..., 0] >> 5, f[..., 1] >> 5, f[..., 2] >> 5
        bins = ((r << 6) + (g << 3) + b).reshape(B * T, H * W)
        hist = jax.vmap(lambda v: jnp.zeros(512, jnp.float32).at[v].add(1.0))(bins)
        hist = hist.reshape(B, T, 512)
        hist = hist / (jnp.linalg.norm(hist, axis=-1, keepdims=True) + 1e-12)
        sims = jnp.einsum("btc,bsc->bts", hist, hist)
        band = self._lookup(sims)
        return nn.relu(nn.Dense(128, dtype=frames.dtype if
                                jnp.issubdtype(frames.dtype, jnp.floating)
                                else jnp.float32, name="color_hist_fc")(band))
