"""stlizer multipass pipeline.

Behavioral parity target: reference stlizer/multipass_pipeline.py:
  pass1 keypoints + frame-to-frame matching  (:158-223)
  pass2 per-frame shift/angle estimation      (:246-270)
  pass3 trajectory smoothing                  (:272-360)
  pass4 stabilizing warp + border policy      (:374-430)
plus calc_scene_weight (:86-104) and the md5 transform cache.
"""
from __future__ import annotations

import math

import numpy as np

from ..core.logger import logger
from ..modules.resize import resize as _resize_img
from .cache import load_cache, save_cache

DEFAULT_RESOLUTION = 320
ANGLE_MAX_HARD = 90.0
KEYPOINT_COSINE_THRESHOLD = 0.65


def calc_scene_weight(mean_match_scores):
    """reference :86-104 — low match score => likely scene change."""
    score = np.asarray(mean_match_scores, np.float32)
    weight = np.clip((score - 0.5) / (0.75 - 0.5), 0, 1)
    weight = np.where(weight < 0.65, weight ** 2, weight)
    if len(weight):
        weight[0] = 0.0
        weight[-1] = 0.0
    return weight


def gaussian_kernel1d(kernel_size: int) -> np.ndarray:
    # torchvision get_gaussian_kernel1d semantics
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    x = np.arange(kernel_size) - (kernel_size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def savgol_kernel1d(kernel_size: int) -> np.ndarray:
    from scipy.signal import savgol_coeffs
    return savgol_coeffs(kernel_size, polyorder=2)


def smooth1d(x: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    pad = (len(kernel) - 1) // 2
    xp = np.pad(x, (pad, pad), mode="edge")
    return np.convolve(xp, kernel[::-1], mode="valid")


def conv1d_smoothing(tx, ty, ta, method, smoothing_seconds, fps):
    """reference :272-290 — returns the per-frame FIX deltas."""
    ks = int(smoothing_seconds * float(fps))
    if ks % 2 == 0:
        ks += 1
    ks = max(ks, 3)
    kernel = (gaussian_kernel1d(ks) if method == "gaussian"
              else savgol_kernel1d(ks))
    return (smooth1d(tx, kernel) - tx, smooth1d(ty, kernel) - ty,
            smooth1d(ta, kernel) - ta)


def grad_opt_smoothing(tx, ty, ta, scene_weight, resolution,
                       iteration=400, penalty_weight=1e-3):
    """reference grad_opt (:292-333) — 1st/2nd/3rd-difference smoothness vs
    path-fidelity penalty; optimized with Adam (jit, fori_loop) instead of
    the reference's LBFGS."""
    import jax
    import jax.numpy as jnp
    import optax
    rw = resolution / DEFAULT_RESOLUTION
    txp = jnp.asarray(np.pad(tx, (0, 3), mode="edge") * rw, jnp.float32)
    typ = jnp.asarray(np.pad(ty, (0, 3), mode="edge") * rw, jnp.float32)
    tap = jnp.asarray(np.pad(ta, (0, 3), mode="edge"), jnp.float32)
    sw = jnp.asarray(np.pad(scene_weight, (0, 3)), jnp.float32)
    targets = (txp, typ, tap)

    def loss_fn(ps):
        total = 0.0
        for x, t in zip(ps, targets):
            f1 = x[1:] - x[:-1]
            f2 = f1[1:] - f1[:-1]
            f3 = f2[1:] - f2[:-1]
            g = (jnp.mean(f1 ** 2 * sw[:f1.shape[0]])
                 + jnp.mean(f2 ** 2 * sw[:f2.shape[0]])
                 + jnp.mean(f3 ** 2 * sw[:f3.shape[0]]))
            total = total + g / 9.0 + jnp.mean((x - t) ** 2) * penalty_weight
        return total

    opt = optax.adam(0.05)

    @jax.jit
    def run(ps):
        state = opt.init(ps)

        def body(i, carry):
            ps, st = carry
            grads = jax.grad(loss_fn)(ps)
            updates, st = opt.update(grads, st, ps)
            return optax.apply_updates(ps, updates), st

        ps, _ = jax.lax.fori_loop(0, iteration, body, (ps, state))
        return ps

    px, py, pa = run(targets)
    return (np.asarray(px)[:-3] / rw - tx, np.asarray(py)[:-3] / rw - ty,
            np.asarray(pa)[:-3] - ta)


def smooth_trajectory(shift_x, shift_y, angle, scene_weight, method,
                      smoothing_seconds, fps, resolution):
    """reference pass3 (:337-360)."""
    sx = np.asarray(shift_x) * scene_weight
    sy = np.asarray(shift_y) * scene_weight
    an = np.clip(np.asarray(angle), -ANGLE_MAX_HARD, ANGLE_MAX_HARD) * scene_weight
    tx, ty, ta = sx.cumsum(), sy.cumsum(), an.cumsum()
    if method in {"gaussian", "savgol"}:
        return conv1d_smoothing(tx, ty, ta, method, smoothing_seconds, fps)
    if method == "grad_opt":
        return grad_opt_smoothing(tx, ty, ta, scene_weight, resolution,
                                  penalty_weight=2e-3 / smoothing_seconds)
    raise ValueError(method)


# ---------------------------------------------------------------------------

def _analysis_pass(input_path, resolution, batch_size, max_fps,
                   superpoint_params=None, iteration=50):
    """pass1 + pass2: per-frame (shift, angle) + match scores."""
    import jax
    import jax.numpy as jnp
    from ..video import VideoReader, FixedFPSRetimer, guess_fps
    from ..utils.superpoint import (
        SuperPoint, find_match_index, find_transform)

    model = SuperPoint(max_num_keypoints=512)
    if superpoint_params is None:
        logger.warning("stlizer: SuperPoint random init (no checkpoint); "
                       "keypoints are meaningless, smoke use only")
        superpoint_params = model.init_params(
            jax.random.PRNGKey(0), (1, 64, 64, 1))

    reader = VideoReader(input_path)
    fps = guess_fps(reader, max_fps)
    retimer = FixedFPSRetimer(fps)

    # static sizes for jit: resize to `resolution` on the short side, /8
    scale = resolution / min(reader.width, reader.height)
    rh = int(reader.height * scale) // 8 * 8
    rw = int(reader.width * scale) // 8 * 8
    resize_scale = 1.0 / scale
    center = (rw / 2, rh / 2)

    @jax.jit
    def detect(batch_u8):
        x = batch_u8.astype(jnp.float32) / 255.0
        x = _resize_img(x, rh, rw, mode="bilinear", antialias=True)
        return model.apply_fn(superpoint_params, x)

    prev_kp = None
    match_scores = []
    pairs1, pairs2, masks = [], [], []

    def flush(frames):
        nonlocal prev_kp
        import numpy as _np
        kp = detect(jnp.asarray(_np.stack(frames)))
        kp = jax.device_get(kp)
        for i in range(len(frames)):
            cur = {k: kp[k][i] for k in kp}
            if prev_kp is not None:
                i1, i2, valid, sims = find_match_index(
                    {k: jnp.asarray(v) for k, v in prev_kp.items()},
                    {k: jnp.asarray(v) for k, v in cur.items()},
                    threshold=KEYPOINT_COSINE_THRESHOLD)
                i1, i2, valid, sims = jax.device_get((i1, i2, valid, sims))
                match_scores.append(float(np.mean(sims)))
                pairs1.append(prev_kp["keypoints"][i1])
                pairs2.append(cur["keypoints"][np.asarray(i2)])
                masks.append(valid)
            prev_kp = cur

    batch = []
    n_frames = 0
    for frame, pts in reader:
        for f in retimer(frame, pts):
            batch.append(f)
            n_frames += 1
            if len(batch) >= batch_size:
                flush(batch)
                batch = []
    for f in retimer.flush():
        batch.append(f)
        n_frames += 1
    if batch:
        flush(batch)
    reader.close()

    if not pairs1:
        return (np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0),
                float(fps), resize_scale, center, n_frames)

    # pass2: batched robust transform estimation
    xy1 = jnp.asarray(np.stack(pairs1))
    xy2 = jnp.asarray(np.stack(pairs2))
    msk = jnp.asarray(np.stack(masks))
    B = xy1.shape[0]
    ctr = jnp.broadcast_to(jnp.asarray(center, jnp.float32).reshape(1, 1, 2),
                           (B, 1, 2))
    shift, scale_est, ang = find_transform(
        xy1, xy2, ctr, msk, iteration=iteration, sigma=2.0,
        disable_scale=True)
    shift = np.asarray(shift)
    ang = np.asarray(ang)
    # frame 0 has no predecessor: identity
    shift_x = np.concatenate([[0.0], shift[:, 0]])
    shift_y = np.concatenate([[0.0], shift[:, 1]])
    angle = np.concatenate([[0.0], ang])
    scores = np.concatenate([[0.0], np.asarray(match_scores)])
    return (shift_x, shift_y, angle, scores, float(fps), resize_scale,
            center, n_frames)


def stabilize_video(input_path, output_path, *, resolution=DEFAULT_RESOLUTION,
                    smoothing=2.0, filter_name="gaussian", border="black",
                    padding=0.05, batch_size=8, max_fps=30.0,
                    cache_dir=None, use_cache=True, iteration=50,
                    debug=False, superpoint_params=None,
                    video_config=None, outpaint_model=None,
                    progress_callback=None):
    """Full 4-pass stabilization (reference stlizer/main.py:123)."""
    import jax.numpy as jnp
    from ..video import process_video, VideoOutputConfig
    from ..utils.superpoint import apply_transform

    if cache_dir is None and use_cache:
        # reference caches pass1-2 by default (--disable-cache opts out)
        import os as _os
        root = _os.environ.get("NUNIF_TPU_HOME",
                               _os.path.join(_os.path.expanduser("~"),
                                             ".cache", "nunif_tpu"))
        cache_dir = _os.path.join(root, "stlizer_cache")
        _os.makedirs(cache_dir, exist_ok=True)
    if not use_cache:
        cache_dir = None
    cached = load_cache(input_path, cache_dir) if cache_dir else None
    if cached is not None:
        logger.info("stlizer: using cached analysis")
        shift_x, shift_y = cached["shift_x"], cached["shift_y"]
        angle, scene_weight = cached["angle"], cached["scene_weight"]
        fps, resize_scale = float(cached["fps"]), float(cached["resize_scale"])
        center = tuple(cached["center"])
    else:
        (shift_x, shift_y, angle, scores, fps, resize_scale, center,
         _n) = _analysis_pass(input_path, resolution, batch_size, max_fps,
                              superpoint_params=superpoint_params,
                              iteration=iteration)
        scene_weight = calc_scene_weight(scores)
        if cache_dir:
            save_cache(input_path, cache_dir, shift_x=shift_x,
                       shift_y=shift_y, angle=angle,
                       scene_weight=scene_weight, fps=fps,
                       resize_scale=resize_scale, center=center)

    if len(shift_x) == 0:
        raise RuntimeError("no frames analyzed")

    fx, fy, fa = smooth_trajectory(shift_x, shift_y, angle, scene_weight,
                                   filter_name, smoothing, fps, resolution)

    cx = center[0] * resize_scale
    cy = center[1] * resize_scale
    index = [0]

    if border == "outpaint":
        from .light_outpaint_v1 import LightOutpaintV1, outpaint_infer
        if outpaint_model is None:
            import jax
            import jax.numpy as _jnp
            model = LightOutpaintV1()
            params = model.init(jax.random.PRNGKey(0),
                                _jnp.zeros((1, 64, 64, 3)),
                                mask=_jnp.zeros((1, 64, 64, 1)),
                                train=False)["params"]
            logger.warning("stlizer outpaint: random init (no checkpoint); "
                           "structure/smoke use only")
            outpaint_model = (model, params)

    def callback(batch_u8):
        import numpy as _np
        B = batch_u8.shape[0]
        i = index[0]
        index[0] += B
        x = jnp.asarray(batch_u8.astype(_np.float32) / 255.0)
        H, W = x.shape[1:3]
        pad_px = 0
        c0, c1 = cx, cy
        if border in {"expand"}:
            pad_px = int(max(H, W) * padding)
            x = jnp.pad(x, ((0, 0), (pad_px, pad_px), (pad_px, pad_px),
                            (0, 0)))
            c0, c1 = cx + pad_px, cy + pad_px
        shifts = jnp.asarray(np.stack([
            [fx[min(i + j, len(fx) - 1)] * resize_scale,
             fy[min(i + j, len(fy) - 1)] * resize_scale]
            for j in range(B)]), jnp.float32)
        angles = jnp.asarray(np.asarray(
            [fa[min(i + j, len(fa) - 1)] for j in range(B)]), jnp.float32)
        centers = jnp.broadcast_to(
            jnp.asarray([c0, c1], jnp.float32).reshape(1, 2), (B, 2))
        pm = "border" if border == "replicate" else "zeros"
        # bound the fast path's offset enumeration by the trajectory's
        # actual extremes (known host-side), bucketed to multiples of 8
        # to bound recompiles; the Pallas warp cost is linear in the bound.
        # No clamp: if the required bound exceeds TWO_PASS_MAX_SHIFT
        # (extreme shakes beyond the pad margin), apply_transform routes
        # the batch through the exact gather instead of clamping
        # displacements to a silently-wrong warp.
        diag = 0.5 * float(np.hypot(H, W))
        mx = (max(float(np.max(np.abs(fx))), float(np.max(np.abs(fy))))
              * resize_scale
              + abs(np.sin(np.radians(float(np.max(np.abs(fa)))))) * diag)
        ms = int(max(8, -(-int(mx + 1) // 8) * 8))
        y = apply_transform(x, shifts, jnp.ones((B,)), angles, centers,
                            padding_mode=pm, max_shift=ms)
        if border == "crop":
            crop_px = int(max(H, W) * padding)
            y = y[:, crop_px:H - crop_px, crop_px:W - crop_px]
        elif border == "outpaint":
            from .light_outpaint_v1 import outpaint_infer
            ones = jnp.ones_like(x[..., :1])
            valid = apply_transform(ones, shifts, jnp.ones((B,)), angles,
                                    centers, padding_mode="zeros")
            mask = (valid < 0.999).astype(x.dtype)
            y = outpaint_infer(outpaint_model[0], outpaint_model[1],
                               jnp.clip(y, 0.0, 1.0) * (1 - mask), mask)
        if debug:
            # reference --debug: original | stabilized side-by-side
            from ..modules.resize import resize as _resize
            src_view = x
            if src_view.shape[1:3] != y.shape[1:3]:
                src_view = _resize(src_view, y.shape[1], y.shape[2],
                                   mode="bilinear", antialias=False)
            y = jnp.concatenate([src_view, y], axis=2)
        return jnp.clip(y, 0.0, 1.0)

    process_video(input_path, output_path, callback, batch_size=batch_size,
                  config=video_config or VideoOutputConfig(max_fps=max_fps),
                  progress_callback=progress_callback)
    return {"frames": len(shift_x), "fps": fps}
