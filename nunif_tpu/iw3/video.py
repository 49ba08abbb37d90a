"""iw3 video pipeline: batched depth -> EMA normalize -> stereo -> encode.

Behavioral parity target: reference iw3/utils.py process_video_full
(:974-1170) with the batched frame callback (:709-833).  The EMA min-max
scaler's lookahead buffer makes output lag input by ``ema_buffer`` frames;
the engine's variable-length-result contract (None / fewer frames / flush)
carries that, replacing the reference's TicketLock + thread pool.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..video import VideoOutputConfig, process_video as _process_video
from .pipeline import StereoConfig, preprocess_image, apply_divergence
from .composition import postprocess_image


class Iw3FrameProcessor:
    """Stateful batch callback for nunif_tpu.video.process_video."""

    def __init__(self, cfg: StereoConfig, depth_model, side_model=None,
                 side_params=None, tta=False, edge_dilation=0,
                 scene_boundaries=None, crop=None, mesh=None,
                 debug_depth=False, convergence_estimator=None):
        self.cfg = cfg
        self.depth_model = depth_model
        self.side_model = side_model
        self.side_params = side_params
        self.tta = tta
        self.edge_dilation = edge_dilation
        # scene_boundaries: frame indexes where a new shot begins — the EMA
        # scaler state is flushed at each cut (reference iw3/utils.py
        # :1015-1040 + base_depth_model.py:182-196)
        self.scene_boundaries = (set(int(b) for b in scene_boundaries)
                                 if scene_boundaries else None)
        # crop: (slice_tb, slice_lr) from AutoCrop analysis (reference
        # iw3/utils.py:1042-1059)
        self.crop = crop
        # dp mesh: the frame batch shards over devices (TPU equivalent of
        # the reference's multi-GPU DeviceSwitchInference round-robin,
        # nunif/utils/video.py:1645,1695)
        self.mesh = mesh
        self.debug_depth = debug_depth
        # saliency-driven per-frame convergence (reference
        # --convergence-mode sod_v1, iw3/convergence_estimator.py)
        self.convergence_estimator = convergence_estimator
        self._sal_prep_jit = None
        self._frame_idx = 0
        self._rgb_queue = []
        self._compose_jit = None
        self._compose_norm_jit = None
        self._prep_jit = None
        self._infer_jit = None
        self._full_jit = None

    def _batch_reset_flags(self, batch_len: int):
        """reset_flags[i]=True flushes EMA state AFTER frame i, i.e. when
        frame i+1 starts a new scene."""
        if self.scene_boundaries is None:
            self._frame_idx += batch_len
            return None
        start = self._frame_idx
        self._frame_idx += batch_len
        flags = [(start + i + 1) in self.scene_boundaries
                 for i in range(batch_len)]
        return flags if any(flags) else [False] * batch_len

    def _compose_impl(self, depth, im, convergence=None):
        if self.debug_depth:
            # normalized depth visualization (reference --debug-depth)
            from ..modules.resize import resize
            d = jnp.clip(resize(depth, im.shape[1], im.shape[2],
                                mode="bilinear", antialias=False), 0, 1)
            return jnp.broadcast_to(d, d.shape[:3] + (3,))
        # plain grid-sample warps need depth at frame resolution (the NN /
        # forward warps resize internally) — mirrors pipeline.process_image
        if self.cfg.method in {"grid_sample", "backward", "NULL"} and \
                depth.shape[1:3] != im.shape[1:3]:
            from ..modules.resize import resize
            depth = jnp.clip(resize(depth, im.shape[1], im.shape[2],
                                    mode="bilinear", antialias=False), 0, 1)
        left, right = apply_divergence(
            depth, im, self.cfg, self.side_model, self.side_params,
            metric_depth=self.depth_model.is_metric(),
            convergence=convergence)
        return postprocess_image(left, right, self.cfg.format)

    def _compose(self, depths, rgbs):
        """One jitted program for warp + composition (the eager per-op path
        would serialize dispatch; compiled variants are cached per shape)."""
        if self._compose_jit is None:
            import jax
            self._compose_jit = jax.jit(self._compose_impl)
        return self._compose_jit(jnp.stack(depths), jnp.stack(rgbs))

    def __call__(self, batch_u8: np.ndarray):
        if self.crop is not None:
            batch_u8 = batch_u8[:, self.crop[0], self.crop[1]]
        reset_flags = self._batch_reset_flags(len(batch_u8))
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch_u8 = shard_batch(self.mesh, jnp.asarray(batch_u8))
        # ship uint8 across host->HBM (1 byte/px); convert + preprocess in
        # one jitted program on device
        if self._prep_jit is None:
            import jax
            self._prep_jit = jax.jit(
                lambda u8: preprocess_image(
                    u8.astype(jnp.float32) * (1.0 / 255.0), self.cfg))
        stateful = getattr(self.depth_model, "stateful_inference", False)
        if (not hasattr(self.depth_model, "infer_with_normalize")
                and not stateful
                and self.depth_model.get_ema_buffer_size() == 1
                and self.depth_model.scaler.decay == 0
                and self.convergence_estimator is None):
            # fully-fused path (EMA off => stateless per-frame minmax):
            # prep -> depth -> normalize -> warp -> compose is ONE device
            # program with no host sync — dispatch latency through the
            # host<->device link is paid once per batch instead of three
            # times plus a blocking (B,2) stats readback.
            if self._full_jit is None:
                import jax
                norm = self.depth_model.scaler.normalize

                def full_fn(u8):
                    x = preprocess_image(
                        u8.astype(jnp.float32) * (1.0 / 255.0), self.cfg)
                    depth = self.depth_model.infer(
                        x, tta=self.tta, edge_dilation=self.edge_dilation)
                    mn = jnp.min(depth, axis=(1, 2, 3), keepdims=True)
                    mx = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
                    return self._compose_impl(norm(depth, mn, mx), x)
                self._full_jit = jax.jit(full_fn)
            return self._full_jit(jnp.asarray(batch_u8))
        if (not hasattr(self.depth_model, "infer_with_normalize")
                and not stateful
                and self.depth_model.get_ema_buffer_size() == 1):
            # fast path: TWO device programs and ONE host sync per batch —
            # (uint8 -> preprocess -> depth -> per-frame stats) as one
            # program, the (B,2) stats readback feeding the host EMA
            # scalars, then (normalize -> warp -> compose) as the second
            # program.  Dispatch round trips dominate at small batches.
            if self._infer_jit is None:
                import jax

                def fn(u8):
                    x = preprocess_image(
                        u8.astype(jnp.float32) * (1.0 / 255.0), self.cfg)
                    depth = self.depth_model.infer(
                        x, tta=self.tta, edge_dilation=self.edge_dilation)
                    stats = jnp.stack(
                        [jnp.min(depth, axis=(1, 2, 3)),
                         jnp.max(depth, axis=(1, 2, 3))], axis=-1)
                    return x, depth, stats
                self._infer_jit = jax.jit(fn)
            x, depth, stats = self._infer_jit(jnp.asarray(batch_u8))
            scaler = self.depth_model.scaler
            consts = scaler.update_values(np.asarray(stats),
                                          reset_flags=reset_flags)
            mins = jnp.asarray(consts[:, 0], jnp.float32)
            maxs = jnp.asarray(consts[:, 1], jnp.float32)
            convergence = None
            if self.convergence_estimator is not None:
                if self._sal_prep_jit is None:
                    import jax
                    from ..modules.resize import resize as _resize
                    norm = self.depth_model.scaler.normalize
                    size = 192

                    def sal_prep(d, im, mn, mx):
                        dn = norm(d, mn[:, None, None, None],
                                  mx[:, None, None, None])
                        return (_resize(im, size, size, mode="bilinear",
                                        antialias=False),
                                _resize(dn, size, size, mode="bilinear",
                                        antialias=False))
                    self._sal_prep_jit = jax.jit(sal_prep)
                rgb_s, dep_s = self._sal_prep_jit(depth, x, mins, maxs)
                convergence = self.convergence_estimator(
                    rgb_s, dep_s, reset_pts=reset_flags)
            return self._compose_normalized(depth, x, mins, maxs,
                                            convergence)
        x = self._prep_jit(jnp.asarray(batch_u8))
        self._rgb_queue.extend(list(x))
        if hasattr(self.depth_model, "infer_with_normalize"):
            # windowed temporal models (VDA): output lags by the window
            normalized = self.depth_model.infer_with_normalize(
                x, edge_dilation=self.edge_dilation)
        else:
            depth = self.depth_model.infer(x, tta=self.tta,
                                           edge_dilation=self.edge_dilation)
            normalized = self.depth_model.minmax_normalize(
                depth, reset_ema=reset_flags)
        if not normalized:
            return None
        rgbs = self._rgb_queue[:len(normalized)]
        del self._rgb_queue[:len(normalized)]
        return self._compose(normalized, rgbs)

    def _compose_normalized(self, depth, im, mins, maxs, convergence=None):
        if self._compose_norm_jit is None:
            import jax
            norm = self.depth_model.scaler.normalize

            def fn(depth, im, mins, maxs, convergence):
                d = norm(depth, mins[:, None, None, None],
                         maxs[:, None, None, None])
                return self._compose_impl(d, im, convergence)
            self._compose_norm_jit = jax.jit(fn, static_argnames=())
            self._compose_norm_nc_jit = jax.jit(
                lambda depth, im, mins, maxs: fn(depth, im, mins, maxs, None))
        if convergence is None:
            return self._compose_norm_nc_jit(depth, im, mins, maxs)
        return self._compose_norm_jit(depth, im, mins, maxs, convergence)

    def flush(self):
        if hasattr(self.depth_model, "flush_with_normalize"):
            normalized = self.depth_model.flush_with_normalize(
                edge_dilation=self.edge_dilation)
        else:
            normalized = self.depth_model.flush_minmax_normalize()
        if not normalized:
            self._rgb_queue.clear()
            return None
        rgbs = self._rgb_queue[:len(normalized)]
        self._rgb_queue.clear()
        return self._compose(normalized, rgbs)


def process_video_full(input_path: str, output_path: str, cfg: StereoConfig,
                       depth_model, side_model=None, side_params=None,
                       tta=False, edge_dilation=0, batch_size=4,
                       video_config: VideoOutputConfig | None = None,
                       ema_normalize=False, ema_decay=0.75, ema_buffer=30,
                       scene_detect=False, scene_detect_threshold=0.3,
                       scene_min_frames=10, scene_detect_checkpoint=None,
                       scene_cache_dir=None, scene_cache_disable=False,
                       autocrop=False, autocrop_mode="black",
                       start_time=None, end_time=None,
                       stop_event=None, suspend_event=None, mesh=None,
                       debug_depth=False, convergence_mode="constant",
                       sod_checkpoint=None):
    """reference iw3/utils.py:974-1170 (video path, software encoders).

    scene_detect: TransNetV2/histogram pre-pass with on-disk cache; the EMA
    scaler (and any temporal depth state) is flushed at every cut
    (reference iw3/utils.py:1015-1040).
    autocrop: letterbox analysis pre-pass; frames are cropped before
    conversion (reference iw3/utils.py:1042-1059).
    """
    if ema_normalize:
        depth_model.enable_ema(decay=ema_decay, buffer_size=ema_buffer)
    else:
        depth_model.disable_ema()
    video_config = video_config or VideoOutputConfig()
    scene_boundaries = None
    if scene_detect:
        if scene_cache_disable:
            from ..utils.shot_boundary import detect_boundaries
            scene_boundaries = detect_boundaries(
                input_path, threshold=scene_detect_threshold,
                min_frames=scene_min_frames,
                checkpoint=scene_detect_checkpoint)
        else:
            from .scene_boundary_cache import detect_boundaries_cached
            scene_boundaries = detect_boundaries_cached(
                input_path, max_fps=video_config.max_fps,
                threshold=scene_detect_threshold,
                min_frames=scene_min_frames,
                checkpoint=scene_detect_checkpoint,
                cache_dir=scene_cache_dir)
    crop = None
    if autocrop:
        from ..utils.autocrop import autocrop_analyze_video
        slice_tb, slice_lr = autocrop_analyze_video(input_path,
                                                    mode=autocrop_mode)
        if slice_tb != slice(None) or slice_lr != slice(None):
            crop = (slice_tb, slice_lr)
    estimator = None
    if convergence_mode == "sod_v1":
        from .convergence_estimator import ConvergenceEstimator
        sod_model = sod_params = None
        if sod_checkpoint:
            from ..models.io import load_model as _load_model
            sod_model, sod_params, _ = _load_model(sod_checkpoint)
        estimator = ConvergenceEstimator(
            cfg.convergence, sod_model=sod_model, sod_params=sod_params,
            enable_ema=True)
    proc = Iw3FrameProcessor(cfg, depth_model, side_model, side_params,
                             tta=tta, edge_dilation=edge_dilation,
                             scene_boundaries=scene_boundaries, crop=crop,
                             mesh=mesh, debug_depth=debug_depth,
                             convergence_estimator=estimator)
    _process_video(input_path, output_path, proc, batch_size=batch_size,
                   config=video_config, flush_callback=proc.flush,
                   start_time=start_time, end_time=end_time,
                   stop_event=stop_event, suspend_event=suspend_event)
    depth_model.reset()
