"""EMA min-max depth normalization with lookahead buffer.

Behavioral parity target: reference iw3/depth_scaler.py (MinMaxBuffer,
EMAMinMaxScaler: SimpleMinMax = decay 0/buffer 1, IncrementalEMA =
decay .75/buffer 1, WindowEMA = decay .9/buffer 30).

The per-frame reductions (amin/amax) run on device; the tiny ring-buffer
state machine is host-side Python, exactly as stateful as the reference —
it sits between jitted depth inference and jitted warping, so there is
nothing to jit here.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def minmax_normalize(frame, min_value, max_value):
    scale = max_value - min_value
    normalized = jnp.clip((frame - min_value) / jnp.maximum(scale, 1e-38), 0.0, 1.0)
    return jnp.where(scale > 0, normalized, jnp.clip(frame, 0.0, 1.0))


def max_normalize(frame, min_value, max_value):
    normalized = jnp.clip(frame / jnp.maximum(max_value, 1e-38), 0.0, 1.0)
    return jnp.where(max_value > 0, normalized, jnp.clip(frame, 0.0, 1.0))


class MinMaxBuffer:
    """Interleaved (min,max) ring buffer (reference iw3/depth_scaler.py:33-60)."""

    def __init__(self, size: int):
        assert size > 0
        self.count = 0
        self.size = size * 2
        self.data = np.zeros(self.size, dtype=np.float64)

    def add(self, min_value, max_value):
        if self.count == 0:
            self.data[0::2] = float(min_value)
            self.data[1::2] = float(max_value)
            self.count = 2
        else:
            self.data[self.count % self.size] = float(min_value)
            self.count += 1
            self.data[self.count % self.size] = float(max_value)
            self.count += 1

    def is_filled(self) -> bool:
        return self.count >= self.size

    def get_minmax(self):
        return float(self.data.min()), float(self.data.max())


class EMAMinMaxScaler:
    """reference iw3/depth_scaler.py:63-138."""

    def __init__(self, decay=0.0, buffer_size=1, mode="minmax"):
        assert mode in {"minmax", "max"}
        self.mode = mode
        self.normalize = {"minmax": minmax_normalize, "max": max_normalize}[mode]
        self.frame_queue = []
        assert buffer_size > 0
        self.reset(decay=decay, buffer_size=buffer_size)

    def reset(self, decay=None, buffer_size=None, **kwargs):
        if decay is not None:
            self.decay = float(decay)
        if buffer_size is not None:
            self.buffer_size = int(buffer_size)
        self.min_value = None
        self.max_value = None
        self.frame_queue = []
        self.minmax_buffer = None

    def get_minmax(self):
        assert self.minmax_buffer is not None and self.minmax_buffer.is_filled()
        return self.minmax_buffer.get_minmax()

    def __call__(self, frame, return_minmax=False):
        return self.update(frame, return_minmax=return_minmax)

    def update(self, frame, return_minmax=False):
        if self.minmax_buffer is None:
            self.minmax_buffer = MinMaxBuffer(self.buffer_size)
        self.frame_queue.append(frame)
        self.minmax_buffer.add(jnp.min(frame), jnp.max(frame))
        if not self.minmax_buffer.is_filled():
            return (None, None, None) if return_minmax else None

        min_value, max_value = self.get_minmax()
        if self.min_value is None:
            self.min_value = min_value
            self.max_value = max_value
        else:
            self.min_value = self.decay * self.min_value + (1 - self.decay) * min_value
            self.max_value = self.decay * self.max_value + (1 - self.decay) * max_value

        frame = self.frame_queue.pop(0)
        frame = self.normalize(frame, self.min_value, self.max_value)
        if return_minmax:
            return frame, self.min_value, self.max_value
        return frame

    _stats_jit = None

    @classmethod
    def stats(cls, frames):
        """(B,H,W,1) -> (B,2) per-frame [min,max] as ONE jitted program."""
        if cls._stats_jit is None:
            import jax
            cls._stats_jit = jax.jit(lambda f: jnp.stack(
                [jnp.min(f, axis=(1, 2, 3)), jnp.max(f, axis=(1, 2, 3))],
                axis=-1))
        return cls._stats_jit(frames)

    def update_values(self, mm, reset_flags=None):
        """Advance the EMA state machine on host scalars only.

        mm: (B,2) numpy [min,max] rows.  Requires buffer_size == 1 (no
        lookahead lag — every frame is immediately ready).  Returns (B,2)
        numpy normalization constants.  This keeps the big depth tensors on
        device: callers normalize with the returned constants in their own
        jitted program.

        reset_flags[i] (scene cuts): the EMA state is cleared AFTER frame i
        so the next frame starts a fresh scene — same contract as
        update_batch (reference iw3/base_depth_model.py:182-196).
        """
        assert self.buffer_size == 1, "fast path needs buffer_size == 1"
        out = np.empty_like(mm, dtype=np.float64)
        for i in range(mm.shape[0]):
            mn, mx = float(mm[i, 0]), float(mm[i, 1])
            if self.min_value is None:
                self.min_value = mn
                self.max_value = mx
            else:
                self.min_value = self.decay * self.min_value + (1 - self.decay) * mn
                self.max_value = self.decay * self.max_value + (1 - self.decay) * mx
            out[i, 0] = self.min_value
            out[i, 1] = self.max_value
            if reset_flags is not None and reset_flags[i]:
                self.min_value = None
                self.max_value = None
        return out

    def update_batch(self, frames, reset_flags=None, return_minmax=False):
        """Batched update: (B,H,W,1) frames, ONE device->host sync for the
        whole batch (the per-frame ``update`` syncs min/max each call, which
        serializes the TPU pipeline).  Returns the same list the per-frame
        loop would produce, with ready frames normalized in one vmapped op.
        """
        B = frames.shape[0]
        reset_flags = reset_flags or [False] * B
        mm = np.asarray(jnp.stack(
            [jnp.min(frames, axis=(1, 2, 3)),
             jnp.max(frames, axis=(1, 2, 3))], axis=-1))  # single readback
        ready, consts = [], []

        def pop_ready(frame, mn, mx):
            ready.append(frame)
            consts.append((mn, mx))

        for i in range(B):
            if self.minmax_buffer is None:
                self.minmax_buffer = MinMaxBuffer(self.buffer_size)
            self.frame_queue.append(frames[i])
            self.minmax_buffer.add(mm[i, 0], mm[i, 1])
            if self.minmax_buffer.is_filled():
                min_value, max_value = self.get_minmax()
                if self.min_value is None:
                    self.min_value = min_value
                    self.max_value = max_value
                else:
                    self.min_value = (self.decay * self.min_value
                                      + (1 - self.decay) * min_value)
                    self.max_value = (self.decay * self.max_value
                                      + (1 - self.decay) * max_value)
                pop_ready(self.frame_queue.pop(0),
                          self.min_value, self.max_value)
            if reset_flags[i]:
                if self.frame_queue:
                    if self.min_value is None:
                        mn, mx = self.minmax_buffer.get_minmax()
                    else:
                        mn, mx = self.min_value, self.max_value
                    for f in self.frame_queue:
                        pop_ready(f, mn, mx)
                self.reset()

        if not ready:
            return []
        stacked = jnp.stack(ready)
        mins = jnp.asarray([c[0] for c in consts],
                           jnp.float32).reshape(-1, 1, 1, 1)
        maxs = jnp.asarray([c[1] for c in consts],
                           jnp.float32).reshape(-1, 1, 1, 1)
        normalized = self.normalize(stacked, mins, maxs)
        if return_minmax:
            return [(normalized[i], consts[i][0], consts[i][1])
                    for i in range(len(ready))]
        return list(normalized)

    def flush(self, return_minmax=False):
        if not self.frame_queue:
            self.reset()
            return []
        if self.min_value is None:
            min_value, max_value = self.minmax_buffer.get_minmax()
        else:
            min_value, max_value = self.min_value, self.max_value
        if return_minmax:
            frames = [(self.normalize(f, min_value, max_value), min_value, max_value)
                      for f in self.frame_queue]
        else:
            frames = [self.normalize(f, min_value, max_value)
                      for f in self.frame_queue]
        self.reset()
        return frames
