"""Shot-boundary (scene-change) detection.

Behavioral parity target: reference nunif/utils/shot_boundary_detection.py
(TransNetV2-based streaming detector with 27x48 inputs, overlapping
100-frame windows).  Without a converted TransNetV2 checkpoint the
fallback is a classical color-histogram difference detector — fully
deterministic and dependency-free (this is an addition over the
reference, which requires the download).
"""
from __future__ import annotations

import numpy as np

from ..core.logger import logger

TN_H, TN_W = 27, 48
WINDOW = 100
PAD = 25  # evaluate the middle 50 of each 100-frame window


def _resize_small(frame_u8: np.ndarray) -> np.ndarray:
    """Cheap box-ish resize to 27x48 on host."""
    h, w = frame_u8.shape[:2]
    ys = (np.arange(TN_H) * h // TN_H).clip(0, h - 1)
    xs = (np.arange(TN_W) * w // TN_W).clip(0, w - 1)
    return frame_u8[ys][:, xs]


def _hist_diff_scores(small_frames: np.ndarray) -> np.ndarray:
    """Classical detector: 1 - cosine similarity of 512-bin RGB histograms
    between consecutive frames."""
    f = small_frames.astype(np.int32)
    bins = ((f[..., 0] >> 5) << 6) + ((f[..., 1] >> 5) << 3) + (f[..., 2] >> 5)
    T = bins.shape[0]
    hists = np.zeros((T, 512), np.float32)
    flat = bins.reshape(T, -1)
    for t in range(T):
        np.add.at(hists[t], flat[t], 1.0)
    hists /= np.linalg.norm(hists, axis=1, keepdims=True) + 1e-12
    sim = np.sum(hists[1:] * hists[:-1], axis=1)
    return np.concatenate([[0.0], 1.0 - sim])


def _transnet_scores(small_frames: np.ndarray, model, params) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    T = len(small_frames)
    scores = np.zeros(T, np.float32)
    counts = np.zeros(T, np.float32)
    step = WINDOW - 2 * PAD

    @jax.jit
    def run(window):
        one_hot, _ = model.apply_fn(params, window[None].astype(jnp.float32))
        return jax.nn.sigmoid(one_hot[0, :, 0])

    for start in range(0, max(T - PAD, 1), step):
        end = min(start + WINDOW, T)
        win = small_frames[start:end]
        if len(win) < WINDOW:
            win = np.concatenate(
                [win, np.repeat(win[-1:], WINDOW - len(win), axis=0)])
        s = np.asarray(run(jnp.asarray(win)))
        lo = PAD if start > 0 else 0
        hi = min(WINDOW, end - start)
        scores[start + lo:start + hi] += s[lo:hi]
        counts[start + lo:start + hi] += 1
        if end >= T:
            break
    return scores / np.maximum(counts, 1)


def detect_boundaries(video_path: str, threshold: float = 0.4,
                      min_frames: int = 10, checkpoint: str = None,
                      max_fps: float = 1e9):
    """Returns sorted frame indexes where new shots begin.

    reference shot_boundary_detection.detect_boundary — TransNetV2 when a
    checkpoint is given, histogram-difference fallback otherwise.
    """
    from ..video import VideoReader
    reader = VideoReader(video_path)
    small = []
    for frame, _pts in reader:
        small.append(_resize_small(frame))
    reader.close()
    if not small:
        return []
    small = np.stack(small)

    if checkpoint:
        from ..models.io import load_model
        from . import transnetv2  # noqa: F401 — register
        model, params, _ = load_model(checkpoint)
        scores = _transnet_scores(small, model, params)
    else:
        logger.debug("shot_boundary: histogram fallback (no checkpoint)")
        scores = _hist_diff_scores(small)

    boundaries = []
    last = -min_frames
    for t in range(1, len(scores)):
        if scores[t] >= threshold and t - last >= min_frames:
            boundaries.append(t)
            last = t
    return boundaries
