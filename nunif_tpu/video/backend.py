"""ctypes binding to the native video I/O service (native/video_io.cpp).

Role parity target: PyAV usage in reference nunif/utils/video.py — demux /
decode / encode / mux, plus audio stream copy.  Auto-builds the shared
library with g++ on first import if missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..core.logger import logger

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnunif_video.so")
_lib = None
_lib_lock = threading.Lock()


class VideoBackendUnavailable(RuntimeError):
    pass


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            build = os.path.join(_NATIVE_DIR, "build.sh")
            if os.path.exists(build):
                logger.info("building native video library...")
                try:
                    subprocess.run(["sh", build], check=True,
                                   capture_output=True)
                except subprocess.CalledProcessError as e:
                    raise VideoBackendUnavailable(
                        f"native build failed: {e.stderr.decode()[-500:]}")
            else:
                raise VideoBackendUnavailable("native/build.sh not found")
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vio_reader_open.restype = ctypes.c_void_p
        lib.vio_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.c_char_p, ctypes.c_int]
        lib.vio_reader_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int)]
        lib.vio_reader_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.POINTER(ctypes.c_double)]
        lib.vio_reader_color_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int)]
        lib.vio_reader_seek.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.vio_extract_subtitles.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.vio_reader_close.argtypes = [ctypes.c_void_p]
        lib.vio_writer_open.restype = ctypes.c_void_p
        lib.vio_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int]
        lib.vio_writer_write.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_uint8)]
        lib.vio_writer_close.argtypes = [ctypes.c_void_p]
        lib.vio_encoder_available.argtypes = [ctypes.c_char_p]
        lib.vio_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    try:
        _load()
        return True
    except VideoBackendUnavailable:
        return False


def encoder_available(name: str) -> bool:
    return bool(_load().vio_encoder_available(name.encode()))


def extract_subtitles(path: str, out_vtt_path: str) -> int:
    """Extract the best text subtitle stream to a WebVTT file.

    Returns the cue count (0 = no subtitle stream).  Reference
    equivalence: iw3/player/media_library.py extract_subtitle.
    """
    lib = _load()
    err = ctypes.create_string_buffer(512)
    n = lib.vio_extract_subtitles(path.encode(), out_vtt_path.encode(),
                                  err, 512)
    if n < 0:
        raise IOError(f"extract_subtitles({path}): {err.value.decode()}")
    return n


class VideoReader:
    """Iterate (frame HWC uint8/uint16, pts_seconds)."""

    def __init__(self, path: str, rgb48: bool = False,
                 apply_rotation: bool = True):
        lib = _load()
        err = ctypes.create_string_buffer(512)
        self._h = lib.vio_reader_open(path.encode(), int(rgb48), err, 512)
        if not self._h:
            raise IOError(f"vio_reader_open({path}): {err.value.decode()}")
        self._lib = lib
        self.rgb48 = rgb48
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        dur = ctypes.c_double()
        nf = ctypes.c_longlong()
        rot = ctypes.c_int()
        lib.vio_reader_info(self._h, w, h, fps, dur, nf, rot)
        self.width, self.height = w.value, h.value
        self.fps = fps.value
        self.duration = dur.value
        self.nb_frames = nf.value
        self.rotation = rot.value
        self._dtype = np.uint16 if rgb48 else np.uint8
        trc = ctypes.c_int()
        pri = ctypes.c_int()
        spc = ctypes.c_int()
        rng = ctypes.c_int()
        mmax = ctypes.c_double()
        mmin = ctypes.c_double()
        cll = ctypes.c_int()
        lib.vio_reader_color_info(self._h, trc, pri, spc, rng, mmax, mmin, cll)
        # AVColorTransferCharacteristic: 16=SMPTE2084(PQ), 18=ARIB-STD-B67(HLG)
        # AVColorPrimaries: 9=BT.2020
        self.color_trc = trc.value
        self.color_primaries = pri.value
        self.colorspace = spc.value
        self.color_range = rng.value
        self.master_max_luminance = mmax.value   # nits, 0 = absent
        self.master_min_luminance = mmin.value
        self.max_cll = cll.value
        # display-matrix rotation (degrees CCW); apply on decode like
        # ffmpeg autorotate so callers see upright frames
        self._src_w, self._src_h = self.width, self.height
        self._rot_k = 0
        if apply_rotation and self.rotation:
            self._rot_k = (round(self.rotation / 90)) % 4
            if self._rot_k in (1, 3):
                self.width, self.height = self.height, self.width

    @property
    def is_hdr(self) -> bool:
        """PQ/HLG transfer or BT.2020 primaries = needs SDR tone map
        (reference nunif/utils/video.py:1025-1041 input reformatter)."""
        return self.color_trc in (16, 18) or self.color_primaries == 9

    def __iter__(self):
        return self

    def __next__(self):
        buf = np.empty((self._src_h, self._src_w, 3), self._dtype)
        pts = ctypes.c_double()
        ret = self._lib.vio_reader_next(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), pts)
        if ret == 0:
            raise StopIteration
        if ret < 0:
            raise IOError(f"decode error {ret}")
        if self._rot_k:
            buf = np.ascontiguousarray(np.rot90(buf, k=self._rot_k))
        return buf, pts.value

    def seek(self, seconds: float):
        """Keyframe-backward seek; iteration resumes from the nearest
        keyframe at or before ``seconds`` (callers drop frames with
        pts < seconds for exactness)."""
        ret = self._lib.vio_reader_seek(self._h, float(seconds))
        if ret < 0:
            raise IOError(f"seek error {ret}")

    def close(self):
        if self._h:
            self._lib.vio_reader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
        return False


class VideoWriter:
    """Write HWC uint8 (or uint16 when rgb48) frames."""

    def __init__(self, path: str, width: int, height: int,
                 fps_num: int, fps_den: int = 1, codec: str = "libx264",
                 pix_fmt: str = "yuv420p", preset: str = "medium",
                 crf: int = 20, rgb48: bool = False,
                 audio_source: str | None = None,
                 extra_opts: str = ""):
        lib = _load()
        err = ctypes.create_string_buffer(512)
        self._h = lib.vio_writer_open(
            path.encode(), width, height, fps_num, fps_den, codec.encode(),
            pix_fmt.encode(), preset.encode(), crf, int(rgb48),
            (audio_source or "").encode(), (extra_opts or "").encode(),
            err, 512)
        if not self._h:
            raise IOError(f"vio_writer_open({path}): {err.value.decode()}")
        self._lib = lib
        self.width, self.height = width, height

    def write(self, frame: np.ndarray):
        assert frame.shape == (self.height, self.width, 3), frame.shape
        frame = np.ascontiguousarray(frame)
        ret = self._lib.vio_writer_write(
            self._h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ret < 0:
            raise IOError(f"encode error {ret}")

    def close(self):
        if self._h:
            ret = self._lib.vio_writer_close(self._h)
            self._h = None
            if ret < 0:
                raise IOError(f"mux close error {ret}")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
        return False
