"""iw3 desktop capture-source plugin: frames over a local socket.

The reference's desktop mode dispatches among in-process screen grabbers
(``screenshot_factory``: PIL / mss / windows_capture / wc_cuda,
reference iw3/desktop/utils.py:252-261).  A TPU server has no screen, so
the TPU-native extension point inverts the arrow: any host-side grabber
process — running where the screen is — connects over TCP or a Unix
domain socket and PUSHES frames; the iw3 desktop pipeline consumes the
newest frame exactly like a capture thread would (drop-late policy: a
slow consumer sees the latest frame, never a backlog).

Wire protocol ``IW3CAP01`` (all integers little-endian uint32):

    handshake (grabber -> server, once):
        8 bytes magic  b"IW3CAP01"
        u32 width, u32 height, u32 channels (must be 3), u32 format
            format 0 = raw RGB24 rows (width*height*3 bytes/frame)
            format 1 = JPEG
    frames (repeated):
        u32 payload_length, payload bytes

The server replies nothing; closing the connection ends the stream and a
new grabber may connect (last-writer-wins).  A reference grabber is
``FileGrabber`` below (plays a video file / image list through the same
socket — the test double and the documented example for writing a real
screen grabber with mss/PIL on the host).
"""
from __future__ import annotations

import io
import os
import socket
import struct
import threading

import numpy as np

from ..core.logger import logger

MAGIC = b"IW3CAP01"
FMT_RAW = 0
FMT_JPEG = 1


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("capture stream closed")
        buf += chunk
    return buf


class SocketFrameSource:
    """Frame source fed by an external grabber over a socket.

    ``address``: ``("127.0.0.1", port)`` for TCP or a filesystem path
    string for a Unix domain socket.  ``next_frame()`` blocks until the
    first frame arrives, then always returns the NEWEST frame received
    (frames arriving faster than the pipeline consumes are dropped,
    matching a real capture loop's behavior).
    """

    def __init__(self, address, timeout: float = 30.0):
        self.address = address
        self.timeout = timeout
        self._lock = threading.Condition()
        self._frame = None
        self._seq = 0
        self._closed = False
        if isinstance(address, str):
            try:
                os.unlink(address)
            except OSError:
                pass
            self._server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._server.bind(address)
        else:
            self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._server.bind(tuple(address))
        self._server.listen(1)
        self.bound_address = self._server.getsockname()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- serving
    def _serve(self):
        while not self._closed:
            try:
                conn, peer = self._server.accept()
            except OSError:
                return
            logger.info("capture grabber connected: %s", peer)
            try:
                self._stream_from(conn)
            except (ConnectionError, OSError) as e:
                logger.info("capture grabber disconnected: %s", e)
            finally:
                conn.close()

    def _stream_from(self, conn: socket.socket):
        magic = _recv_exact(conn, 8)
        if magic != MAGIC:
            raise ConnectionError(f"bad capture magic {magic!r}")
        w, h, c, fmt = struct.unpack("<IIII", _recv_exact(conn, 16))
        if c != 3 or fmt not in (FMT_RAW, FMT_JPEG):
            raise ConnectionError(f"unsupported capture header {(w, h, c, fmt)}")
        raw_len = w * h * 3
        while True:
            (n,) = struct.unpack("<I", _recv_exact(conn, 4))
            payload = _recv_exact(conn, n)
            if fmt == FMT_RAW:
                if n != raw_len:
                    raise ConnectionError(f"raw frame length {n} != {raw_len}")
                frame = np.frombuffer(payload, np.uint8).reshape(h, w, 3)
            else:
                from PIL import Image
                frame = np.asarray(
                    Image.open(io.BytesIO(payload)).convert("RGB"))
            with self._lock:
                self._frame = frame
                self._seq += 1
                self._lock.notify_all()

    # ----------------------------------------------------------- consuming
    def next_frame(self) -> np.ndarray:
        """Newest frame (blocks until the first one arrives)."""
        with self._lock:
            if self._frame is None and not self._lock.wait_for(
                    lambda: self._frame is not None or self._closed,
                    timeout=self.timeout):
                raise TimeoutError("no capture frames received")
            if self._frame is None:
                raise ConnectionError("capture source closed")
            return self._frame

    def wait_new_frame(self, last_seq: int):
        """Block until a frame newer than ``last_seq``; returns (frame, seq)."""
        with self._lock:
            self._lock.wait_for(
                lambda: self._seq > last_seq or self._closed,
                timeout=self.timeout)
            return self._frame, self._seq

    def close(self):
        self._closed = True
        with self._lock:
            self._lock.notify_all()
        try:
            self._server.close()
        finally:
            if isinstance(self.address, str):
                try:
                    os.unlink(self.address)
                except OSError:
                    pass


class FileGrabber:
    """Reference grabber: pushes a video file / image list / numpy frames
    through the capture socket — the test double for a host-side screen
    grabber, and the template for writing one (replace ``frames()`` with
    mss/PIL screenshots on the host machine)."""

    def __init__(self, address, fmt: int = FMT_RAW):
        self.address = address
        self.fmt = fmt

    def _connect(self) -> socket.socket:
        if isinstance(self.address, str):
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        else:
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.connect(self.address if isinstance(self.address, str)
                  else tuple(self.address))
        return s

    def push(self, frames) -> int:
        """Send an iterable of HxWx3 uint8 frames; returns count sent."""
        it = iter(frames)
        try:
            first = next(it)
        except StopIteration:
            return 0
        h, w, c = first.shape
        conn = self._connect()
        try:
            conn.sendall(MAGIC + struct.pack("<IIII", w, h, c, self.fmt))
            n = 0
            for frame in [first, *it]:
                assert frame.shape == (h, w, c) and frame.dtype == np.uint8
                if self.fmt == FMT_RAW:
                    payload = frame.tobytes()
                else:
                    from PIL import Image
                    buf = io.BytesIO()
                    Image.fromarray(frame).save(buf, format="JPEG",
                                                quality=95)
                    payload = buf.getvalue()
                conn.sendall(struct.pack("<I", len(payload)) + payload)
                n += 1
            return n
        finally:
            conn.close()

    def push_video(self, path: str, max_frames: int = None) -> int:
        from ..video import VideoReader

        def frames():
            reader = VideoReader(path)
            try:
                for i, (frame, _pts) in enumerate(reader):
                    if max_frames is not None and i >= max_frames:
                        return
                    yield frame
            finally:
                reader.close()
        return self.push(frames())


def parse_capture_address(spec: str):
    """``"unix:/path"`` -> path str; ``"listen:PORT"`` / ``"HOST:PORT"`` ->
    (host, port) tuple."""
    if spec.startswith("unix:"):
        return spec[len("unix:"):]
    if spec.startswith("listen:"):
        return ("127.0.0.1", int(spec[len("listen:"):]))
    host, _, port = spec.rpartition(":")
    return (host or "127.0.0.1", int(port))
