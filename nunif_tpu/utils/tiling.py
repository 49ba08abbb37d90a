"""Tiled inference with seam blending — TPU-native engine.

Behavioral parity target: reference nunif/utils/seam_blending.py:48-174 and
nunif/utils/render.py:8-22.  The reference loops tiles in Python, calling the
model per minibatch and updating a running weighted average on the GPU.  Here
the WHOLE render — tile extraction, batched model application, weighted
scatter-add blend, normalization — is one jitted XLA program:

  * static shapes: the compiled program depends only on
    (h_blocks, w_blocks, tile_size, batch_size, channels) — NOT the exact
    image size — so arbitrary image sizes reuse a small set of compiled
    programs (grid-bucketing replaces the reference's dynamic Python loop).
  * the running weighted mean of the reference (seam_blending.py:155-174)
    equals sum(w*x)/sum(w); we compute that directly with an fp32
    accumulation buffer (fidelity note from SURVEY.md §7 hard-part 7).
  * tile batches stream through ``lax.map`` so activation memory stays
    bounded at batch_size tiles while XLA pipelines HBM traffic.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class TileConfig:
    scale: int
    offset: int
    tile_h: int          # rectangular tiles: full-width tiles minimize the
    tile_w: int          # overlap waste of the square reference grid
    blend_size: int
    h_blocks: int
    w_blocks: int
    input_tile_step_h: int
    input_tile_step_w: int
    output_tile_step_h: int
    output_tile_step_w: int
    pad: tuple  # (left, right, top, bottom) on the input
    y_h: int
    y_w: int
    y_buffer_h: int
    y_buffer_w: int

    @property
    def n_tiles(self) -> int:
        return self.h_blocks * self.w_blocks

    @property
    def tile_size(self):  # back-compat for square configs
        assert self.tile_h == self.tile_w
        return self.tile_h

    @property
    def out_tile_h(self) -> int:
        return self.tile_h * self.scale - self.offset * 2

    @property
    def out_tile_w(self) -> int:
        return self.tile_w * self.scale - self.offset * 2

    @property
    def output_tile_size(self) -> int:
        assert self.tile_h == self.tile_w
        return self.out_tile_h


def _as_hw(tile_size):
    if isinstance(tile_size, (tuple, list)):
        return int(tile_size[0]), int(tile_size[1])
    return int(tile_size), int(tile_size)


def make_tile_config(height: int, width: int, scale: int, offset: int,
                     tile_size, blend_size: int) -> TileConfig:
    """Mirror of the reference grid math (seam_blending.py:108-143).

    ``tile_size`` may be an int (square, the reference behavior) or an
    (tile_h, tile_w) tuple — full-width rectangular tiles cut the overlap
    waste of a square grid (e.g. 1080p with 640 squares computes 1.58x the
    frame's pixels; (592, 1936) tiles compute 1.11x).
    """
    tile_h, tile_w = _as_hw(tile_size)
    input_offset = math.ceil(offset / scale)
    input_blend_size = math.ceil(blend_size / scale)
    step_h = tile_h - (input_offset * 2 + input_blend_size)
    step_w = tile_w - (input_offset * 2 + input_blend_size)
    assert step_h > 0 and step_w > 0, "tile_size too small for offset/blend"

    h_blocks = w_blocks = input_h = input_w = 0
    while input_h < height + input_offset * 2:
        input_h = h_blocks * step_h + tile_h
        h_blocks += 1
    while input_w < width + input_offset * 2:
        input_w = w_blocks * step_w + tile_w
        w_blocks += 1

    return TileConfig(
        scale=scale, offset=offset, tile_h=tile_h, tile_w=tile_w,
        blend_size=blend_size,
        h_blocks=h_blocks, w_blocks=w_blocks,
        input_tile_step_h=step_h, input_tile_step_w=step_w,
        output_tile_step_h=step_h * scale,
        output_tile_step_w=step_w * scale,
        pad=(input_offset, input_w - (width + input_offset),
             input_offset, input_h - (height + input_offset)),
        y_h=height * scale, y_w=width * scale,
        y_buffer_h=input_h * scale, y_buffer_w=input_w * scale,
    )


def make_blend_filter(scale: int, offset: int, tile_size,
                      blend_size: int) -> np.ndarray:
    """Per-tile blend weight map (reference: seam_blending.py:145-153).

    Inner region weight 1.0, ramping down linearly over ``blend_size``
    border pixels.  Returns (out_tile_h, out_tile_w) fp32.
    """
    tile_h, tile_w = _as_hw(tile_size)
    out_h = tile_h * scale - offset * 2
    out_w = tile_w * scale - offset * 2
    # separable ramp: weight = min over the two axes of the 1-D border ramp
    def ramp(n):
        r = np.ones((n,), dtype=np.float32)
        for i in range(blend_size):
            value = 1.0 - (1.0 / (blend_size + 1)) * (i + 1)
            d = blend_size - 1 - i
            r[d] = value
            r[n - 1 - d] = value
        return r
    return np.minimum(ramp(out_h)[:, None], ramp(out_w)[None, :])


@functools.lru_cache(maxsize=64)
def _build_render_program(apply_hash, h_blocks, w_blocks, tile_hw, batch_size,
                          channels, out_channels, scale, offset, blend_size,
                          tile_step_hw, compute_dtype_name, ps_factor=1,
                          mesh=None, n_frames=1):
    """Construct + jit the render program for one grid bucket.

    apply_hash is only part of the cache key; the actual callable is passed
    through _APPLY_FNS (jit closures cannot be cached by value).

    ps_factor > 1: the model emits PRE-pixel-shuffle head output
    (out_th/s, out_tw/s, C*s^2); the blend runs in that layout and the
    render returns the un-shuffled canvas — the caller shuffles ONCE after
    quantization.  The fp32 3-channel-minor shuffle per tile is the most
    layout-hostile op in the whole program (~27ms/tile at 4K on v5e).

    Output-shape contract: the general path returns the full blend canvas
    (y_buffer_h, y_buffer_w, C) [or its /s pre-shuffle layout]; the
    n_tiles == 1 fast path returns the tile output (out_th, out_tw, C)
    [likewise /s] directly — always >= the (y_h, y_w) valid extent, which
    callers crop to.  Callers must not rely on the buffer shape itself.
    """
    apply_fn = _APPLY_FNS[apply_hash]
    compute_dtype = jnp.dtype(compute_dtype_name)

    if mesh is not None:
        # dp over the tile/frame minibatch (reference: the multi-GPU
        # inference wrapper scatters each minibatch across devices,
        # nunif/models/data_parallel.py:8-38) — here a sharding constraint
        # on the model-batch axis and XLA SPMD partitions the net
        from jax.sharding import NamedSharding, PartitionSpec as _P

        def _shard(t):
            return jax.lax.with_sharding_constraint(
                t, NamedSharding(mesh, _P(*(("dp",) + (None,) * (t.ndim - 1)))))
    else:
        def _shard(t):
            return t
    tile_h, tile_w = tile_hw
    step_h, step_w = tile_step_hw
    out_th = tile_h * scale - offset * 2
    out_tw = tile_w * scale - offset * 2
    n_tiles = h_blocks * w_blocks
    n_padded = ((n_tiles + batch_size - 1) // batch_size) * batch_size
    n_chunks = n_padded // batch_size

    # static tile origin tables
    hw = np.stack(np.meshgrid(np.arange(h_blocks), np.arange(w_blocks),
                              indexing="ij"), axis=-1).reshape(-1, 2)
    in_origins = (hw * np.array([step_h, step_w])).astype(np.int32)
    out_origins = (hw * np.array([step_h * scale, step_w * scale])).astype(np.int32)
    valid = np.ones((n_tiles,), np.float32)
    if n_padded > n_tiles:
        fill = n_padded - n_tiles
        in_origins = np.concatenate([in_origins, np.zeros((fill, 2), np.int32)])
        out_origins = np.concatenate([out_origins, np.zeros((fill, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros((fill,), np.float32)])

    blend = make_blend_filter(scale, offset, (tile_h, tile_w),
                              blend_size)[..., None]

    y_buffer_h = ((h_blocks - 1) * step_h + tile_h) * scale
    y_buffer_w = ((w_blocks - 1) * step_w + tile_w) * scale

    s = ps_factor
    if s > 1:
        assert offset % scale == 0 and out_th % s == 0 and out_tw % s == 0
        # blend weights regrouped into head-channel order: channel
        # c*s^2 + dy*s + dx carries blend[y*s+dy, x*s+dx]
        b2 = blend[..., 0].reshape(out_th // s, s, out_tw // s, s)
        b2 = b2.transpose(0, 2, 1, 3).reshape(out_th // s, out_tw // s,
                                              s * s)
        blend_ps = np.tile(b2, (1, 1, out_channels)).reshape(
            out_th // s, out_tw // s, out_channels * s * s)
        # per-subpixel weight canvas (channel-independent): (.., s*s)
        blend_w = b2

    if n_tiles == 1:
        # single-tile fast path (the 1080p video hot path): the tile IS the
        # padded frame and the blend weights cancel exactly in
        # out*w/max(w,eps) (w >= 1/(blend_size+1) everywhere), so the whole
        # canvas scatter/normalize machinery is a no-op — skip it.
        # n_frames > 1: the frame batch IS the model batch (and the dp
        # shard axis when a mesh is given).
        def render_single(params, x_padded):
            if n_frames > 1:
                out = apply_fn(params, _shard(x_padded.astype(compute_dtype)))
                out = out.astype(jnp.float32)
                if s > 1:
                    out = out.reshape(n_frames, out_th // s, out_tw // s,
                                      out_channels * s * s)
                return jnp.clip(out, 0.0, 1.0)
            out = apply_fn(params,
                           _shard(x_padded[None].astype(compute_dtype)))[0]
            out = out.astype(jnp.float32)
            if s > 1:
                out = out.reshape(out_th // s, out_tw // s,
                                  out_channels * s * s)
            return jnp.clip(out, 0.0, 1.0)

        return jax.jit(render_single)

    def render(params, x_padded):
        # x_padded: (H_in, W_in, C) fp32 — or (n_frames, H_in, W_in, C) —
        # already replicate-padded to the grid
        in_o = jnp.asarray(in_origins)
        out_o = jnp.asarray(out_origins)
        valid_w = jnp.asarray(valid)
        blend_f = jnp.asarray(blend)

        def extract(xp, origin):
            return jax.lax.dynamic_slice(
                xp, (origin[0], origin[1], 0),
                (tile_h, tile_w, channels))

        if n_frames > 1:
            tiles = jax.vmap(lambda xp: jax.vmap(
                lambda o: extract(xp, o))(in_o))(x_padded)
            tiles = tiles.reshape(n_frames * n_padded,
                                  tile_h, tile_w, channels)
        else:
            tiles = jax.vmap(lambda o: extract(x_padded, o))(in_o)
        tiles = tiles.astype(compute_dtype)
        tiles = tiles.reshape(-1, batch_size, tile_h, tile_w, channels)

        def run_chunk(tb):
            return apply_fn(params, _shard(tb)).astype(jnp.float32)

        outs = jax.lax.map(run_chunk, tiles)

        if s > 1:
            # pre-shuffle blend: canvas in the model head's (H/s, W/s,
            # C*s^2) layout; sub-pixel reorder deferred to the caller
            th_ps, tw_ps = out_th // s, out_tw // s
            cps = out_channels * s * s
            outs = outs.reshape(-1, n_padded, th_ps, tw_ps, cps)
            blend_f_ps = jnp.asarray(blend_ps)
            blend_f_w = jnp.asarray(blend_w)
            out_o_ps = out_o // s

            def blend_ps_frame(outs_f):
                pixels0 = jnp.zeros((y_buffer_h // s, y_buffer_w // s, cps),
                                    jnp.float32)
                weights0 = jnp.zeros(
                    (y_buffer_h // s, y_buffer_w // s, s * s), jnp.float32)

                def body_ps(carry, inp):
                    pixels, weights = carry
                    out, oo, v = inp
                    cur_p = jax.lax.dynamic_slice(
                        pixels, (oo[0], oo[1], 0), (th_ps, tw_ps, cps))
                    cur_w = jax.lax.dynamic_slice(
                        weights, (oo[0], oo[1], 0), (th_ps, tw_ps, s * s))
                    pixels = jax.lax.dynamic_update_slice(
                        pixels, cur_p + out * (blend_f_ps * v),
                        (oo[0], oo[1], 0))
                    weights = jax.lax.dynamic_update_slice(
                        weights, cur_w + blend_f_w * v, (oo[0], oo[1], 0))
                    return (pixels, weights), None

                (pixels, weights), _ = jax.lax.scan(
                    body_ps, (pixels0, weights0), (outs_f, out_o_ps, valid_w))
                wfull = jnp.repeat(weights[:, :, None, :], out_channels,
                                   axis=2).reshape(pixels.shape)
                y = pixels / jnp.maximum(wfull, 1e-6)
                return jnp.clip(y, 0.0, 1.0)  # (H/s, W/s, C*s^2)

            if n_frames > 1:
                return jax.vmap(blend_ps_frame)(outs)
            return blend_ps_frame(outs[0])

        outs = outs.reshape(-1, n_padded, out_th, out_tw, out_channels)

        def blend_frame(outs_f):
            pixels0 = jnp.zeros((y_buffer_h, y_buffer_w, out_channels),
                                jnp.float32)
            weights0 = jnp.zeros((y_buffer_h, y_buffer_w, 1), jnp.float32)

            def body(carry, inp):
                pixels, weights = carry
                out, oo, v = inp
                w = blend_f * v
                cur_p = jax.lax.dynamic_slice(
                    pixels, (oo[0], oo[1], 0), (out_th, out_tw, out_channels))
                cur_w = jax.lax.dynamic_slice(
                    weights, (oo[0], oo[1], 0), (out_th, out_tw, 1))
                pixels = jax.lax.dynamic_update_slice(
                    pixels, cur_p + out * w, (oo[0], oo[1], 0))
                weights = jax.lax.dynamic_update_slice(
                    weights, cur_w + w, (oo[0], oo[1], 0))
                return (pixels, weights), None

            (pixels, weights), _ = jax.lax.scan(
                body, (pixels0, weights0), (outs_f, out_o, valid_w))
            y = pixels / jnp.maximum(weights, 1e-6)
            return jnp.clip(y, 0.0, 1.0)

        if n_frames > 1:
            return jax.vmap(blend_frame)(outs)
        return blend_frame(outs[0])

    return jax.jit(render)


# registry of apply functions keyed by a stable hash (see _build_render_program)
_APPLY_FNS: dict = {}


def _register_apply_fn(key, fn):
    _APPLY_FNS[key] = fn


class TiledRenderer:
    """Render arbitrarily-sized images through an I2I model by tiles.

    One instance per (model, params).  Compiled programs are cached per
    (h_blocks, w_blocks, tile, batch) bucket.
    """

    def __init__(self, model, params, policy: Policy = DEFAULT_POLICY,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a "dp" axis — the tile
        (and frame) minibatch shards across it, the TPU equivalent of the
        reference's multi-GPU inference wrapper
        (nunif/models/data_parallel.py:8-38).  Params are replicated."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate_params
            params = replicate_params(mesh, params)
        self.params = params
        self.policy = policy
        self._apply_key = (model.model_name, id(model), jnp.dtype(policy.compute_dtype).name)

        def apply_fn(p, xb):
            return model.apply({"params": p}, xb, train=False)

        _register_apply_fn(self._apply_key, apply_fn)

    def render(self, x, tile_size=None, batch_size=None):
        """x: (H, W, C) float32 in [0,1]. Returns (H*scale, W*scale, C_out).

        ``tile_size``: int (square) or (tile_h, tile_w) tuple.
        """
        model = self.model
        if isinstance(tile_size, (tuple, list)):
            tile_hw = (model.find_valid_tile_size(tile_size[0]),
                       model.find_valid_tile_size(tile_size[1]))
        else:
            t = model.find_valid_tile_size(tile_size)
            tile_hw = (t, t)
        batch_size = batch_size or model.i2i_default_batch_size
        h, w, c = x.shape
        cfg = make_tile_config(h, w, model.i2i_scale, model.i2i_offset,
                               tile_hw, model.i2i_blend_size)
        left, right, top, bottom = cfg.pad
        x_padded = jnp.pad(jnp.asarray(x, jnp.float32),
                           ((top, bottom), (left, right), (0, 0)), mode="edge")
        out_channels = getattr(model, "out_channels", c)
        program = _build_render_program(
            self._apply_key, cfg.h_blocks, cfg.w_blocks, tile_hw,
            int(batch_size), c, out_channels, cfg.scale, cfg.offset,
            cfg.blend_size, (cfg.input_tile_step_h, cfg.input_tile_step_w),
            jnp.dtype(self.policy.compute_dtype).name, mesh=self.mesh)
        y_full = program(self.params, x_padded)
        return y_full[:cfg.y_h, :cfg.y_w, :]

    def frame_program(self, h: int, w: int, c: int = 3,
                      tile_size=None, batch_size=None,
                      in_dtype="uint8", out_dtype="uint8",
                      frame_batch: int = 1):
        """Fully-fused fixed-geometry render: pad -> tiles -> model -> blend
        -> crop -> quantize, ONE jitted program, uint8 in/out by default.

        This is the video hot path: a (h, w, c) uint8 frame crosses
        host->HBM as 1 byte/px and the result leaves as 1 byte/px — the
        float conversion both ways runs on device.  Returns
        ``program(params, frame) -> (h*scale, w*scale, C_out)``.

        ``frame_batch`` > 1: the program takes (frame_batch, h, w, c) and
        returns (frame_batch, h*scale, w*scale, C_out) — more tiles in
        flight per dispatch (video pipelining), and the frame axis is the
        dp shard axis when the renderer has a mesh.
        """
        model = self.model
        if isinstance(tile_size, (tuple, list)):
            tile_hw = (model.find_valid_tile_size(tile_size[0]),
                       model.find_valid_tile_size(tile_size[1]))
        else:
            t = model.find_valid_tile_size(tile_size)
            tile_hw = (t, t)
        batch_size = int(batch_size or model.i2i_default_batch_size)
        cfg = make_tile_config(h, w, model.i2i_scale, model.i2i_offset,
                               tile_hw, model.i2i_blend_size)
        left, right, top, bottom = cfg.pad
        out_channels = getattr(model, "out_channels", c)

        # pre-shuffle fast path: blend in the model head layout, shuffle
        # once after quantization (see _build_render_program ps_factor).
        # i2i_ps_factor lets a model emit a COARSER head layout than its
        # scale (turbo_2x: scale 2 but a (H/2, W/2, C*16) head — nothing
        # full-resolution exists before the uint8 shuffle); tile geometry
        # must align to the factor, else fall back to in-model shuffling.
        ps = 1
        field_names = {f.name for f in dataclasses.fields(type(model))}
        if ("pre_shuffle_output" in field_names and model.i2i_scale > 1
                and model.i2i_offset % model.i2i_scale == 0):
            cand = int(getattr(model, "i2i_ps_factor", model.i2i_scale))
            out_th_ = tile_hw[0] * cfg.scale - 2 * cfg.offset
            out_tw_ = tile_hw[1] * cfg.scale - 2 * cfg.offset
            if (out_th_ % cand == 0 and out_tw_ % cand == 0
                    and (cfg.input_tile_step_h * cfg.scale) % cand == 0
                    and (cfg.input_tile_step_w * cfg.scale) % cand == 0):
                ps = cand
            ps_model = dataclasses.replace(model, pre_shuffle_output=True)
            apply_key = self._apply_key + ("ps",)

            def ps_apply(p, xb):
                return ps_model.apply({"params": p}, xb, train=False)

            _register_apply_fn(apply_key, ps_apply)
        else:
            apply_key = self._apply_key

        fb = int(frame_batch)
        inner = _build_render_program(
            apply_key, cfg.h_blocks, cfg.w_blocks, tile_hw,
            batch_size, c, out_channels, cfg.scale, cfg.offset,
            cfg.blend_size, (cfg.input_tile_step_h, cfg.input_tile_step_w),
            jnp.dtype(self.policy.compute_dtype).name, ps_factor=ps,
            mesh=self.mesh, n_frames=fb)
        in_dt = jnp.dtype(in_dtype)
        out_dt = jnp.dtype(out_dtype)

        def quantize(y):
            if out_dt == jnp.uint8:
                return jnp.round(y * 255.0).astype(jnp.uint8)
            if out_dt == jnp.uint16:
                return jnp.round(y * 65535.0).astype(jnp.uint16)
            return y

        pad_sp = ((top, bottom), (left, right), (0, 0))
        if fb > 1:
            pad_sp = ((0, 0),) + pad_sp

        @jax.jit
        def program(params, frame):
            x = frame
            if in_dt == jnp.uint8:
                x = x.astype(jnp.float32) * (1.0 / 255.0)
            elif in_dt == jnp.uint16:
                x = x.astype(jnp.float32) * (1.0 / 65535.0)
            x = jnp.pad(x, pad_sp, mode="edge")
            if ps > 1:
                y = quantize(inner(params, x))  # (.., H/s, W/s, C*s^2) int
                hs, ws_ = y.shape[-3], y.shape[-2]
                if fb > 1:
                    y = y.reshape(fb, hs, ws_, out_channels, ps, ps)
                    y = y.transpose(0, 1, 4, 2, 5, 3)
                    y = y.reshape(fb, hs * ps, ws_ * ps, out_channels)
                    return y[:, :cfg.y_h, :cfg.y_w, :]
                y = y.reshape(hs, ws_, out_channels, ps, ps)
                y = y.transpose(0, 3, 1, 4, 2)
                y = y.reshape(hs * ps, ws_ * ps, out_channels)
                return y[:cfg.y_h, :cfg.y_w, :]
            y = inner(params, x)[..., :cfg.y_h, :cfg.y_w, :]
            return quantize(y)

        return program


def simple_render(x, model, params, policy: Policy = DEFAULT_POLICY):
    """Whole-image render (reference: nunif/utils/render.py:22-44).

    Replicate-pads by ceil(offset/scale) so the output matches H*scale.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if model.i2i_offset > 0:
        p = math.ceil(model.i2i_offset / model.i2i_scale)
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    y = model.apply({"params": params}, x.astype(policy.compute_dtype), train=False)
    y = y.astype(jnp.float32)
    if squeeze:
        y = y[0]
    return y
