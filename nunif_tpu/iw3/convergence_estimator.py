"""Convergence estimator — saliency-guided per-frame convergence.

Behavioral parity target: reference iw3/convergence_estimator.py:11-120 —
SOD saliency over (rgb, depth), depth quantiles of the salient region map
the user's convergence in [0,1] onto a depth position, EMA-smoothed for
video with scene-cut resets.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.logger import logger


def depth_position_from_ratio(saliency_map, depth, pos):
    """reference :33-59.  saliency (B,H,W,1), depth (B,H,W,1), pos float.
    Returns (B,) convergence values in [0,1]."""
    B = depth.shape[0]
    d = depth.reshape(B, -1)
    m = (saliency_map.reshape(B, -1) > 0.5).astype(jnp.float32)
    cnt = jnp.sum(m, axis=1)
    # masked quantiles via sorting with +inf padding for masked-out entries
    big = jnp.where(m > 0, d, jnp.inf)
    s = jnp.sort(big, axis=1)
    n = jnp.maximum(cnt - 1, 0)
    q01_idx = jnp.round(n * 0.1).astype(jnp.int32)
    q09_idx = jnp.round(n * 0.9).astype(jnp.int32)
    q01 = jnp.take_along_axis(s, q01_idx[:, None], axis=1)[:, 0]
    q09 = jnp.take_along_axis(s, q09_idx[:, None], axis=1)[:, 0]
    q_range = q09 - q01
    center = (q01 + q09) / 2
    q_pos = jnp.where(q_range < 1e-6, q01,
                      center + (pos - 0.5) * q_range * 3.0)
    q_pos = jnp.where(cnt > 0, q_pos, 0.5)
    return jnp.clip(q_pos, 0.0, 1.0)


class ConvergenceEstimator:
    """reference :11-120 (EMA-smoothed, scene-cut reset)."""

    def __init__(self, convergence: float, sod_model=None, sod_params=None,
                 enable_ema: bool = False, decay: float = 0.9):
        if sod_model is None:
            from .models.sod_v1 import SODV1
            sod_model = SODV1()
            sod_params = sod_model.init_params(
                jax.random.PRNGKey(0), (1, 192, 192, 4))
            logger.warning("ConvergenceEstimator: SOD random init "
                           "(no checkpoint); smoke use only")
        self.model = sod_model
        self.params = sod_params
        self.convergence = convergence
        self.enable_ema = enable_ema
        self.decay = decay
        self.convergence_ema = None

    def reset(self, enable_ema=None, decay=None):
        if enable_ema is not None:
            self.enable_ema = enable_ema
        if decay is not None:
            self.decay = decay
        self.convergence_ema = None

    def __call__(self, rgb, depth, reset_pts=None):
        """rgb (B,H,W,3), depth (B,H,W,1) normalized.  Returns (B,)."""
        x = jnp.concatenate([rgb, depth], axis=-1)
        saliency = self.model.apply_fn(self.params, x)
        z_pos = depth_position_from_ratio(saliency, depth, self.convergence)
        if not self.enable_ema:
            return z_pos
        reset_pts = reset_pts or [False] * depth.shape[0]
        out = []
        z_host = np.asarray(z_pos)
        for i in range(len(z_host)):
            p = float(z_host[i])
            if self.convergence_ema is None:
                self.convergence_ema = p
            else:
                self.convergence_ema = (self.decay * self.convergence_ema
                                        + (1 - self.decay) * p)
            out.append(self.convergence_ema)
            if reset_pts[i]:
                self.convergence_ema = None
        return jnp.asarray(out, jnp.float32)
