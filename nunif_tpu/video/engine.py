"""Video processing engine: decode -> batched device callback -> encode.

Behavioral parity target: reference nunif/utils/video.py —
``process_video`` (:956-1151), ``FixedFPSFilter`` retiming (:419),
``FrameCallbackPool`` batched dispatch with ordered collection (:1622-1757),
atomic output via <out>.tmp + replace (:895-913).

TPU re-design: JAX dispatch is asynchronous, so a thread pool of device
workers is unnecessary — the pipeline is
    decode thread (native C++) -> batch -> callback() returns device array
    (enqueued, non-blocking)     -> writer thread blocks on readiness
which overlaps decode, TPU compute and encode with two host threads and a
bounded queue (the reference needed ThreadPoolExecutor + TicketLock to get
the same overlap out of synchronous CUDA calls).
"""
from __future__ import annotations

import dataclasses
import math
import os
import queue
import threading
from fractions import Fraction
from typing import Callable, Optional

import numpy as np

from ..core.logger import logger
from . import backend


KNOWN_CODECS = ["libx264", "libx265", "libvpx-vp9", "mpeg4", "utvideo"]


def pix_fmt_requires_16bit(pix_fmt: str) -> bool:
    """reference nunif/utils/video.py:272 — formats deeper than 8 bits
    get a 16-bit RGB staging surface so precision survives the rgb->yuv
    conversion."""
    return pix_fmt in {
        "yuv420p10le", "p010le",
        "yuv422p10le", "yuv444p10le",
        "yuv420p12le", "yuv422p12le", "yuv444p12le",
        "yuv444p16le",
        "gbrp16le", "gbrp12le", "gbrp10le", "rgb48le",
    }


@dataclasses.dataclass
class VideoOutputConfig:
    """reference nunif/utils/video.py:484 (subset: software encoders)."""
    fps: Optional[Fraction] = None     # None = source fps
    codec: str = "libx264"
    pix_fmt: str = "yuv420p"
    preset: str = "ultrafast"
    crf: int = 20
    max_fps: float = 30.0              # reference default processing cap
    rgb48: bool = False
    audio_copy: bool = True
    output_width: Optional[int] = None
    output_height: Optional[int] = None
    # tone-map BT.2020 PQ/HLG input to BT.709 SDR on device
    # (reference nunif/utils/video.py:309,1025-1041)
    hdr_tonemap: bool = True
    # optional encoder knobs (reference --video-bitrate/--tune/
    # --profile-level/--keyframe-interval)
    bitrate: Optional[str] = None       # e.g. "8M"
    tune: tuple = ()                    # x264/x265 tune values
    profile_level: Optional[str] = None
    keyframe_interval: Optional[float] = None  # seconds
    # output colorspace negotiation (reference nunif/utils/video.py:643
    # guess_target_colorspace): auto | copy | bt709[-tv|-pc] | bt601[-tv|-pc]
    colorspace: str = "auto"
    # source stream colorspace (AVCOL_SPC_*), filled by process_video for
    # colorspace == "copy"
    source_colorspace: Optional[int] = None

    def __post_init__(self):
        if pix_fmt_requires_16bit(self.pix_fmt):
            self.rgb48 = True

    def _colorspace_opts(self) -> list:
        cs = (self.colorspace or "auto").lower()
        if cs in ("auto", "unspecified", ""):
            return []  # native writer tags by output height
        if cs == "copy":
            if self.source_colorspace == 1:        # AVCOL_SPC_BT709
                cs = "bt709"
            elif self.source_colorspace in (5, 6):  # BT470BG / SMPTE170M
                cs = "bt601"
            else:
                return []
        parts = cs.split("-")
        opts = [f"colorspace={parts[0]}"]
        if len(parts) > 1:
            opts.append(f"range={'pc' if parts[1] == 'pc' else 'tv'}")
        return opts

    def encoder_opts(self, fps: Fraction) -> str:
        """k=v,... string for the native writer's generic option hook."""
        opts = self._colorspace_opts()
        if self.bitrate:
            b = str(self.bitrate).strip().upper()
            mult = 1
            if b.endswith("M"):
                mult, b = 1_000_000, b[:-1]
            elif b.endswith("K"):
                mult, b = 1_000, b[:-1]
            opts.append(f"b={int(float(b) * mult)}")
        if self.tune:
            opts.append(f"tune={self.tune[0]}")
        if self.profile_level:
            opts.append(f"level={self.profile_level}")
        if self.keyframe_interval:
            opts.append(f"gop={max(1, int(float(fps) * self.keyframe_interval))}")
        return ",".join(opts)


class FixedFPSRetimer:
    """Duplicate/drop frames onto a fixed output tick grid.

    Equivalent of the reference's libavfilter "fps=" graph
    (nunif/utils/video.py:419-447) — each output tick takes the latest
    source frame with pts <= tick time.
    """

    def __init__(self, out_fps: Fraction):
        self.out_fps = Fraction(out_fps)
        self.tick = 0
        self.last_frame = None
        self.last_pts = None

    def __call__(self, frame, pts):
        """Returns list of frames to emit for this input frame."""
        out = []
        if self.last_frame is None:
            self.last_frame = frame
            self.last_pts = pts if pts >= 0 else 0.0
            return out
        t = pts if pts >= 0 else self.last_pts + 1.0 / float(self.out_fps)
        if t <= self.last_pts:
            # VFR pts sanitization: non-monotonic/duplicate timestamps are
            # clamped forward by one output tick (the libavfilter fps=
            # graph the reference uses drops such frames similarly)
            t = self.last_pts + 1.0 / float(self.out_fps)
        while self.tick / self.out_fps < t:
            out.append(self.last_frame)
            self.tick += 1
        self.last_frame = frame
        self.last_pts = t
        return out

    def flush(self):
        if self.last_frame is None:
            return []
        out = [self.last_frame]
        self.last_frame = None
        self.tick += 1
        return out


def guess_fps(reader, max_fps: float) -> Fraction:
    src = Fraction(reader.fps).limit_denominator(1001) if reader.fps > 0 else Fraction(30)
    if float(src) > max_fps:
        return Fraction(max_fps).limit_denominator(1001)
    return src


_SENTINEL = object()


def error_flag_path(output_path: str) -> str:
    """<out>.error.flag sidecar (reference nunif/utils/video.py:899)."""
    return output_path + ".error.flag"


def write_error_flag(output_path: str, error: Exception):
    try:
        with open(error_flag_path(output_path), "w", encoding="utf-8") as f:
            f.write(f"{type(error).__name__}: {error}\n")
    except OSError:
        pass


def has_error_flag(output_path: str) -> bool:
    return os.path.exists(error_flag_path(output_path))


def clear_error_flag(output_path: str):
    try:
        os.unlink(error_flag_path(output_path))
    except OSError:
        pass


def process_video(input_path: str, output_path: str,
                  batch_callback: Callable,
                  batch_size: int = 4,
                  config: Optional[VideoOutputConfig] = None,
                  stop_event: Optional[threading.Event] = None,
                  suspend_event: Optional[threading.Event] = None,
                  progress_callback: Optional[Callable] = None,
                  flush_callback: Optional[Callable] = None,
                  start_time: Optional[float] = None,
                  end_time: Optional[float] = None):
    """Run ``batch_callback(np.ndarray BHWC uint8) -> array-like BHWC uint8``
    over all (retimed) frames of input_path, encoding into output_path.

    The callback may return a JAX array — readiness is only forced in the
    writer thread (np.asarray), keeping dispatch asynchronous.  A callback
    holding lookahead state (e.g. EMA depth normalization) may return None
    (or fewer frames than submitted); ``flush_callback()`` is called once at
    end-of-stream to drain it.  Atomic output: writes to <output>.tmp then
    renames (reference video.py:895-913).

    suspend_event: cooperative pause — processing blocks while the event is
    CLEARED and resumes when set (reference video.py:1101-1104).
    start_time/end_time (seconds): keyframe seek + exact pts trim
    (reference --start-time/--end-time).
    """
    config = config or VideoOutputConfig()
    reader = backend.VideoReader(input_path, rgb48=config.rgb48)
    config.source_colorspace = reader.colorspace
    if config.hdr_tonemap and reader.is_hdr:
        # HDR input: re-open at 16-bit for tone-map precision, then wrap the
        # callback with the jitted device tone map producing SDR frames in
        # the callback's expected dtype (reference input_reformatter,
        # nunif/utils/video.py:1025-1041).
        from . import hdr as _hdr
        if not config.rgb48 and not reader.rgb48:
            reader.close()
            reader = backend.VideoReader(input_path, rgb48=True)
        trc = reader.color_trc if reader.color_trc in (
            _hdr.TRC_PQ, _hdr.TRC_HLG) else _hdr.TRC_PQ
        peak = _hdr.choose_peak_nits(reader)
        user_callback = batch_callback
        logger.info("HDR input (trc=%d, peak=%.0f nits): tone mapping to SDR",
                    trc, peak)

        def batch_callback(batch):  # noqa: F811
            sdr = _hdr.hdr2sdr_frames(batch, trc=trc, peak_nits=peak,
                                      out_uint16=config.rgb48)
            return user_callback(sdr)
    out_fps = config.fps or guess_fps(reader, config.max_fps)

    tmp_path = output_path + ".tmp" + os.path.splitext(output_path)[1]
    # the writer is opened lazily from the FIRST result's shape — the
    # callback may change frame geometry (SBS doubles width, upscalers
    # multiply both), which the reference gets from config_callback
    # (video.py:1005); here it is observed instead of declared
    writer = None

    results: "queue.Queue" = queue.Queue(maxsize=8)
    write_error = []

    def writer_loop():
        nonlocal writer
        try:
            while True:
                item = results.get()
                if item is _SENTINEL:
                    break
                arr = np.asarray(item)  # blocks until device result ready
                if arr.dtype != writer_dtype:
                    arr = _to_uint(arr, writer_dtype)
                if writer is None:
                    h, w = arr.shape[1:3]
                    writer = backend.VideoWriter(
                        tmp_path,
                        config.output_width or w, config.output_height or h,
                        fps_num=out_fps.numerator,
                        fps_den=out_fps.denominator,
                        codec=config.codec, pix_fmt=config.pix_fmt,
                        preset=config.preset, crf=config.crf,
                        rgb48=config.rgb48,
                        audio_source=input_path if config.audio_copy else None,
                        extra_opts=config.encoder_opts(out_fps))
                for frame in arr:
                    writer.write(frame)
        except Exception as e:  # pragma: no cover
            write_error.append(e)

    writer_dtype = np.uint16 if config.rgb48 else np.uint8
    wt = threading.Thread(target=writer_loop, daemon=True)
    wt.start()

    retimer = FixedFPSRetimer(out_fps)
    batch = []
    n_in = 0

    def put_result(res):
        if res is not None:
            results.put(res)

    def submit(frames):
        nonlocal batch
        for f in frames:
            batch.append(f)
            if len(batch) >= batch_size:
                put_result(batch_callback(np.stack(batch)))
                batch = []

    if start_time:
        reader.seek(start_time)
    try:
        for frame, pts in reader:
            if stop_event is not None and stop_event.is_set():
                break
            if suspend_event is not None:
                suspend_event.wait()
            if write_error:
                raise write_error[0]
            if start_time and 0 <= pts < start_time:
                continue  # keyframe-seek overshoot: trim to exact pts
            if end_time is not None and pts > end_time >= 0:
                break
            # retimer ticks are zero-based: rebase pts onto the trim window
            submit(retimer(frame, pts - start_time if start_time and pts >= 0
                           else pts))
            n_in += 1
            if progress_callback:
                progress_callback(n_in, reader.nb_frames)
        submit(retimer.flush())
        if batch:
            put_result(batch_callback(np.stack(batch)))
        if flush_callback is not None:
            put_result(flush_callback())
        results.put(_SENTINEL)
        wt.join()
        if write_error:
            raise write_error[0]
        if writer is None:
            raise RuntimeError("no frames produced")
        writer.close()
        os.replace(tmp_path, output_path)
    except Exception:
        try:
            if writer is not None:
                writer.close()
        except Exception:
            pass
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    finally:
        reader.close()
    logger.info("process_video: %s -> %s (%d frames in)", input_path,
                output_path, n_in)


def _to_uint(arr, dtype):
    if np.issubdtype(arr.dtype, np.floating):
        maxv = 65535.0 if dtype == np.uint16 else 255.0
        return (np.clip(arr, 0.0, 1.0) * maxv + 0.5).astype(dtype)
    return arr.astype(dtype)


def generate_video(output_path: str, frame_generator,
                   width: int, height: int, fps=30,
                   config: Optional[VideoOutputConfig] = None):
    """Encode frames from a generator (reference video.py:1154)."""
    config = config or VideoOutputConfig()
    fps = Fraction(fps)
    writer = backend.VideoWriter(
        output_path, width, height, fps_num=fps.numerator,
        fps_den=fps.denominator, codec=config.codec, pix_fmt=config.pix_fmt,
        preset=config.preset, crf=config.crf, rgb48=config.rgb48,
        extra_opts=config.encoder_opts(fps))
    writer_dtype = np.uint16 if config.rgb48 else np.uint8
    n = 0
    with writer:
        for frame in frame_generator:
            frame = np.asarray(frame)
            if frame.dtype != writer_dtype:
                frame = _to_uint(frame, writer_dtype)
            writer.write(frame)
            n += 1
    return n
