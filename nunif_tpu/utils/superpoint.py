"""SuperPoint keypoint detector + descriptor and transform estimation.

Behavioral parity target: reference nunif/utils/superpoint.py:16-380
(VGG backbone, 65-way detector softmax, NMS, descriptor sampling,
cosine matching, Adam-based robust shift/scale/rotation estimation,
affine backward warp).

TPU-first redesign: keypoint extraction uses STATIC top-k with a validity
mask instead of the reference's dynamic ``torch.where`` — every stage is
one jitted program with fixed shapes.  ``find_transform`` runs its Adam
iterations inside a ``lax.fori_loop``.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from ..models import Model, register_model
from ..modules.grid_sample import grid_sample


DEFAULT_CONF = {
    "nms_radius": 4,
    "max_num_keypoints": 1024,
    "detection_threshold": 0.005,
    "remove_borders": 4,
    "descriptor_dim": 256,
    "channels": (64, 64, 128, 128, 256),
}


class VGGBlock(nn.Module):
    """conv -> relu -> BN(eval) (reference superpoint.py:55-71; the BN
    runs AFTER the activation there, so it cannot fold into the conv —
    it is kept as an explicit affine whose scale/bias come from the
    converted running stats; identity at random init)."""
    out_channels: int
    kernel_size: int = 3
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        x = nn.Conv(self.out_channels, (k, k), padding="SAME",
                    dtype=x.dtype, name="conv")(x)
        if self.relu:
            x = nn.relu(x)
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.out_channels,))
        bias = self.param("bn_bias", nn.initializers.zeros,
                          (self.out_channels,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def batched_nms(scores, nms_radius: int):
    """reference superpoint.py:30-45 (scores: (B, H, W)).

    The max pool runs SEPARABLY (9x9 max == 9x1 then 1x9) directly on the
    3-D (B, H, W) layout: the naive 4-D NHWC form with C=1 puts ONE value
    per 128-lane register (profiled as the SuperPoint hot spot at stlizer
    shapes), while (B, H, W) keeps W in lanes — 81 taps -> 18 at full lane
    occupancy, identical results (max is associative/separable).
    """
    r = nms_radius
    k = 2 * r + 1
    neg = jnp.finfo(scores.dtype).min

    def mp(x):
        y = jax.lax.reduce_window(
            x, neg, jax.lax.max, window_dimensions=(1, k, 1),
            window_strides=(1, 1, 1),
            padding=((0, 0), (r, r), (0, 0)))
        return jax.lax.reduce_window(
            y, neg, jax.lax.max, window_dimensions=(1, 1, k),
            window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (r, r)))

    zeros = jnp.zeros_like(scores)
    max_mask = scores == mp(scores)
    for _ in range(2):
        supp_mask = mp(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max = supp_scores == mp(supp_scores)
        max_mask = max_mask | (new_max & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


@register_model
class SuperPoint(Model):
    """Returns fixed-size keypoint sets.

    __call__(image NHWC [0,1]) ->
      dict(keypoints (B,K,2) xy, scores (B,K), valid (B,K) bool,
           descriptors (B,K,D) L2-normalized)
    """
    model_name = "aux.superpoint"
    nms_radius: int = 4
    max_num_keypoints: int = 1024
    detection_threshold: float = 0.005
    remove_borders: int = 4
    descriptor_dim: int = 256
    channels: tuple = (64, 64, 128, 128, 256)

    dense_output: bool = False

    @nn.compact
    def __call__(self, image, train: bool = False):
        if image.shape[-1] == 3:
            w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * w, axis=-1, keepdims=True)
        stride = 2 ** (len(self.channels) - 2)

        x = image
        chans = list(self.channels[:-1])
        for i, c in enumerate(chans):
            x = VGGBlock(c, 3, name=f"backbone_{i}_0")(x)
            x = VGGBlock(c, 3, name=f"backbone_{i}_1")(x)
            if i < len(chans) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feat = x

        c_last = self.channels[-1]
        desc = VGGBlock(c_last, 3, name="descriptor_0")(feat)
        desc = VGGBlock(self.descriptor_dim, 1, relu=False,
                        name="descriptor_1")(desc)
        desc = desc / (jnp.linalg.norm(desc.astype(jnp.float32), axis=-1,
                                       keepdims=True) + 1e-12)

        det = VGGBlock(c_last, 3, name="detector_0")(feat)
        det = VGGBlock(stride ** 2 + 1, 1, relu=False, name="detector_1")(det)
        scores = jax.nn.softmax(det.astype(jnp.float32), axis=-1)[..., :-1]
        b, h, w_, _ = scores.shape
        scores = scores.reshape(b, h, w_, stride, stride)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(
            b, h * stride, w_ * stride)
        scores = batched_nms(scores, self.nms_radius)

        pad = self.remove_borders
        if pad:
            mask = jnp.zeros_like(scores).at[:, pad:-pad, pad:-pad].set(1.0)
            scores = jnp.where(mask > 0, scores, -1.0)

        if self.dense_output:
            return {"scores_dense": scores, "descriptors_dense": desc}

        # static top-k keypoints
        H, W = scores.shape[1:]
        flat = scores.reshape(b, H * W)
        k = min(self.max_num_keypoints, H * W)
        top_scores, idx = jax.lax.top_k(flat, k)
        yy = (idx // W).astype(jnp.float32)
        xx = (idx % W).astype(jnp.float32)
        keypoints = jnp.stack([xx, yy], axis=-1)  # (B, K, 2) xy
        valid = top_scores > self.detection_threshold

        # sample descriptors at keypoints (reference :16-28,
        # align_corners=False bilinear)
        kp_norm = (keypoints + 0.5) / (jnp.asarray(
            [W, H], jnp.float32))
        grid = (kp_norm * 2 - 1).reshape(b, 1, k, 2)
        d = grid_sample(desc.astype(jnp.float32), grid, mode="bilinear",
                        padding_mode="zeros", align_corners=False)
        d = d.reshape(b, k, self.descriptor_dim)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)

        return {"keypoints": keypoints, "scores": top_scores,
                "valid": valid, "descriptors": d}


def find_match_index(kp1, kp2, threshold: float = 0.5):
    """Cosine matching with validity masks (reference :207-224).

    kp1/kp2: single-image dicts (K,2)/(K,)/(K,D).  Returns
    (index1 (K,), index2 (K,), match_valid (K,), scores (K,)).
    """
    d1 = kp1["descriptors"]
    d2 = kp2["descriptors"]
    sim = d1 @ d2.T
    sim = jnp.where(kp2["valid"][None, :], sim, -1.0)
    match_index = jnp.argmax(sim, axis=-1)
    max_sim = jnp.take_along_axis(sim, match_index[:, None], axis=1)[:, 0]
    valid = (max_sim > threshold) & kp1["valid"]
    index1 = jnp.arange(d1.shape[0])
    return index1, match_index, valid, max_sim


@functools.partial(jax.jit, static_argnames=("iteration", "disable_scale",
                                             "disable_shift", "disable_rotate"))
def find_transform(xy1, xy2, center, mask, iteration: int = 50,
                   lr_translation: float = 0.1, lr_scale_rotation: float = 0.1,
                   sigma: float = 2.0,
                   disable_shift=False, disable_scale=False,
                   disable_rotate=False):
    """Robust per-batch shift/scale/angle via Adam (reference :233-328).

    xy1/xy2: (B,K,2); center (B,1,2); mask (B,K) bool.
    Returns (shift (B,2) px, scale (B,), angle_deg (B,)).
    """
    B, K, _ = xy1.shape
    mask2 = mask[..., None]
    xy1 = (xy1 - center) * mask2
    xy2 = (xy2 - center) * mask2
    norm_scale = jnp.clip(jnp.max(jnp.abs(jnp.nan_to_num(xy1)), axis=(1, 2),
                                  keepdims=True), 1e-6)
    xy1 = xy1 / norm_scale
    xy2 = xy2 / norm_scale

    params = {"t": jnp.zeros((B, 1, 2)), "s": jnp.ones((B, 1, 1)),
              "r": jnp.zeros((B, 1, 1))}
    sched = optax.cosine_decay_schedule(1.0, iteration, alpha=1e-3)
    tx_t = optax.adam(lambda i: lr_translation * sched(i), b1=0.5, b2=0.9)
    tx_sr = optax.adam(lambda i: lr_scale_rotation * sched(i), b1=0.5, b2=0.9)
    opt = optax.multi_transform(
        {"t": tx_t, "sr": tx_sr},
        {"t": "t", "s": "sr", "r": "sr"})
    opt_state = opt.init(params)

    def loss_fn(p, use_outlier):
        rcos = jnp.cos(p["r"])
        rsin = jnp.sin(p["r"])
        xy = jnp.concatenate([xy1[..., :1] * rcos - xy1[..., 1:] * rsin,
                              xy1[..., :1] * rsin + xy1[..., 1:] * rcos],
                             axis=2)
        xy = xy * p["s"] + p["t"]
        err = jnp.abs(xy - xy2)
        m = mask2.astype(jnp.float32) * jnp.ones_like(err)
        # sigma outlier rejection on the detached error
        err_d = jax.lax.stop_gradient(err)
        cnt = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0)
        mean = jnp.sum(err_d * m, axis=(1, 2), keepdims=True) / cnt
        std = jnp.sqrt(jnp.sum((err_d - mean) ** 2 * m, axis=(1, 2),
                               keepdims=True) / cnt)
        inlier = ((err_d - mean) / (std + 1e-12)) < sigma
        w = jnp.where(use_outlier, m * inlier, m)
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)

    def body(i, carry):
        p, s = carry
        grads = jax.grad(loss_fn)(p, i > 0)
        if disable_shift:
            grads["t"] = jnp.zeros_like(grads["t"])
        if disable_scale:
            grads["s"] = jnp.zeros_like(grads["s"])
        if disable_rotate:
            grads["r"] = jnp.zeros_like(grads["r"])
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    params, _ = jax.lax.fori_loop(0, iteration, body, (params, opt_state))
    shift = (params["t"] * norm_scale).reshape(B, 2)
    scale = params["s"].reshape(B)
    angle = params["r"].reshape(B)
    angle = jnp.degrees(jnp.arctan2(jnp.sin(angle), jnp.cos(angle)))
    return shift, scale, angle


# largest displacement bound served by the two-pass Pallas warp; covers
# the stabilizer design margin (padding=0.05 -> ~96 px at 1080p) with
# headroom.  Beyond it apply_transform falls back to the exact gather.
TWO_PASS_MAX_SHIFT = 128


def apply_transform(x, shift, scale, angle_deg, center,
                    padding_mode: str = "border", max_shift: int = 48):
    """Backward affine warp (reference :331-378).  x: (B,H,W,C); shift
    (B,2) px; scale (B,); angle_deg (B,); center (B,2).

    TPU path: an XLA 2-D gather at 1080p measured 183 ms/frame (the
    whole stlizer stage's budget is ~5 ms); stabilization transforms are
    small, so the warp runs as the EXACT Catmull-Smith two-pass shear
    decomposition — two bounded 1-D bilinear warps (the Pallas
    offset-enumeration kernel, modules/grid_sample.warp_x_bounded) plus
    two layout transposes:
        pass1  h[i, j] = x[i, q(i, j)],   q(i, j) = A(j-cx)
                 + (B/D)(i - C(j-cx) - F) + E        (horizontal)
        pass2  out[i, j] = h[sy(i, j), j]            (vertical)
    with sx = A(j-cx) + B(i-cy) + E, sy = C(j-cx) + D(i-cy) + F the
    backward map; exact whenever D != 0 and displacements stay within
    ``max_shift`` px.  The Pallas kernel's cost is linear in ``max_shift``,
    so callers pass a bound derived from the actual trajectory; when the
    required bound exceeds ``TWO_PASS_MAX_SHIFT`` (extreme shakes, beyond
    the stabilizer's design margin) the call routes through the exact XLA
    gather instead of clamping displacements.
    """
    B, H, W, _ = x.shape
    if (jax.default_backend() == "tpu" and padding_mode == "border"
            and x.shape[-1] <= 8 and max_shift <= TWO_PASS_MAX_SHIFT):
        return _apply_transform_two_pass(x, shift, scale, angle_deg,
                                         center, max_shift)
    axis_scale = jnp.asarray([W - 1, H - 1], jnp.float32).reshape(1, 1, 1, 2)
    center = center.reshape(B, 1, 1, 2)
    shift = -shift.reshape(B, 1, 1, 2)
    inv_scale = (1.0 / scale).reshape(B, 1, 1, 1)
    angle = -jnp.radians(angle_deg).reshape(B, 1, 1, 1)

    py, px = jnp.meshgrid(jnp.linspace(0, H - 1, H), jnp.linspace(0, W - 1, W),
                          indexing="ij")
    px = jnp.broadcast_to(px[None, ..., None], (B, H, W, 1)) - center[..., 0:1]
    py = jnp.broadcast_to(py[None, ..., None], (B, H, W, 1)) - center[..., 1:2]
    asin = jnp.sin(angle)
    acos = jnp.cos(angle)
    mesh_x = px * acos - py * asin
    mesh_y = px * asin + py * acos
    grid = jnp.concatenate([mesh_x, mesh_y], axis=3) * inv_scale
    grid = grid + (shift + center)
    grid = grid / (axis_scale * 0.5) - 1.0
    # the reference samples this corner-anchored grid with
    # align_corners=False, which shifts everything by a constant
    # sub-pixel amount; align_corners=True makes the zero transform an
    # exact identity (deviation documented)
    return grid_sample(x, grid, mode="bilinear", padding_mode=padding_mode,
                       align_corners=True)


def _apply_transform_two_pass(x, shift, scale, angle_deg, center,
                              max_shift: int):
    """Exact two-pass shear decomposition of the backward affine warp
    (see apply_transform).  Displacements are clamped to ±max_shift —
    identical to the gather within that envelope."""
    from ..modules.grid_sample import warp_x_bounded

    B, H, W, _ = x.shape
    k = (1.0 / scale).astype(jnp.float32)                      # (B,)
    ang = -jnp.radians(angle_deg).astype(jnp.float32)
    asin, acos = jnp.sin(ang), jnp.cos(ang)
    A, Bc = acos * k, -asin * k
    Cc, D = asin * k, acos * k
    cx, cy = center[:, 0], center[:, 1]
    E = cx - shift[:, 0]
    F = cy - shift[:, 1]

    def bc(v):                                                  # (B,1,1)
        return v.reshape(B, 1, 1)

    jj = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
    ii = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)

    # pass 1 (horizontal): q(i, j) = A(j-cx) + (B/D)(i - C(j-cx) - F) + E
    jcx = jj - bc(cx)
    q = (bc(A) * jcx + bc(Bc / D) * (ii - bc(Cc) * jcx - bc(F)) + bc(E))
    d1 = jnp.clip(q - jj, -max_shift, max_shift)
    h = warp_x_bounded(x, d1, max_shift)

    # pass 2 (vertical): sy(i, j) = C(j-cx) + D(i-cy) + F, via transpose
    jj_t = jax.lax.broadcasted_iota(jnp.float32, (B, W, H), 2)  # = i
    ii_t = jax.lax.broadcasted_iota(jnp.float32, (B, W, H), 1)  # = j
    sy_t = (bc(Cc) * (ii_t - bc(cx)) + bc(D) * (jj_t - bc(cy)) + bc(F))
    d2 = jnp.clip(sy_t - jj_t, -max_shift, max_shift)
    out_t = warp_x_bounded(h.transpose(0, 2, 1, 3), d2, max_shift)
    return out_t.transpose(0, 2, 1, 3)
