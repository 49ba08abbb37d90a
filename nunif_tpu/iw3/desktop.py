"""iw3 desktop — realtime 2D->3D MJPEG streaming server.

Behavioral parity target: reference iw3/desktop/ (SURVEY.md §2.4):
capture -> depth -> stereo warp (batch=1) -> JPEG -> multipart
``multipart/x-mixed-replace`` HTTP stream, with an FPS estimator.

On a TPU server there is no screen to capture (the reference's
PIL/mss/windows_capture/wc_cuda backends are host-OS-bound — N/A here);
the frame source is a video file played in a loop or a synthetic test
pattern.  The streaming protocol and pipeline match the reference.

Usage:
  python -m nunif_tpu.iw3.desktop --input some.mp4 --port 1303
"""
from __future__ import annotations

import argparse
import io
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..core.logger import logger

BOUNDARY = "iw3desktopframe"

INDEX_HTML = """<!doctype html>
<html><head><title>iw3 desktop (nunif_tpu)</title></head>
<body style="margin:0;background:#000">
<img src="/stream" style="width:100%"></body></html>"""


class FrameSource:
    """Looping video file or synthetic pattern (capture stand-in)."""

    def __init__(self, path=None, width=960, height=540):
        self.path = path
        self.width = width
        self.height = height
        self._reader = None
        self._t = 0

    def next_frame(self) -> np.ndarray:
        if self.path:
            from ..video import VideoReader
            while True:
                if self._reader is None:
                    self._reader = VideoReader(self.path)
                try:
                    frame, _ = next(iter(self._reader))
                    return frame
                except StopIteration:
                    self._reader.close()
                    self._reader = None
        # synthetic moving gradient pattern
        self._t += 1
        yy, xx = np.mgrid[0:self.height, 0:self.width]
        r = ((xx + self._t * 4) % 256).astype(np.uint8)
        g = ((yy + self._t * 2) % 256).astype(np.uint8)
        b = np.full_like(r, 96)
        return np.stack([r, g, b], axis=-1)


class StreamingState:
    """Latest-frame buffer with a condition variable
    (reference iw3/desktop/streaming_server.py:25-106)."""

    def __init__(self):
        self._lock = threading.Condition()
        self._data = None
        self._seq = 0
        self.fps_estimate = 0.0

    def set_frame_data(self, jpeg: bytes):
        with self._lock:
            self._data = jpeg
            self._seq += 1
            self._lock.notify_all()

    def wait_frame(self, last_seq, timeout=5.0):
        with self._lock:
            if self._seq == last_seq:
                self._lock.wait(timeout)
            return self._data, self._seq


def make_handler(state: StreamingState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug("desktop: " + fmt, *args)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                body = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path != "/stream":
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header(
                "Content-Type",
                f"multipart/x-mixed-replace; boundary={BOUNDARY}")
            self.end_headers()
            seq = -1
            try:
                while True:
                    data, seq = state.wait_frame(seq)
                    if data is None:
                        continue
                    self.wfile.write(
                        f"--{BOUNDARY}\r\nContent-Type: image/jpeg\r\n"
                        f"Content-Length: {len(data)}\r\n\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")
            except (BrokenPipeError, ConnectionResetError):
                pass

    return Handler


def run_pipeline(state: StreamingState, source: FrameSource, args,
                 stop_event: threading.Event):
    import jax.numpy as jnp
    from PIL import Image
    from .depth import create_depth_model
    from .pipeline import StereoConfig, apply_divergence
    from .composition import StereoFormat, postprocess_image
    from .cli import create_stereo_model

    depth_model = create_depth_model(args.depth_model)
    depth_model.load(resolution=args.resolution,
                     checkpoint=args.depth_checkpoint)
    depth_model.enable_ema(decay=0.75, buffer_size=1)  # flicker reduction
    side_model, side_params = create_stereo_model(
        args.method, args.stereo_checkpoint)
    cfg = StereoConfig(method=args.method, divergence=args.divergence,
                       convergence=args.convergence,
                       format=StereoFormat(half_sbs=not args.full_sbs))

    t0 = time.time()
    n = 0
    frame_interval = 1.0 / args.stream_fps
    while not stop_event.is_set():
        t_frame = time.time()
        frame = source.next_frame()
        x = jnp.asarray(frame[None].astype(np.float32) / 255.0)
        depth = depth_model.infer(x, edge_dilation=2)
        normalized = depth_model.minmax_normalize(depth)
        if not normalized:
            continue
        d = jnp.stack(normalized)
        left, right = apply_divergence(d, x, cfg, side_model, side_params,
                                       metric_depth=depth_model.is_metric())
        sbs = postprocess_image(left, right, cfg.format)
        arr = (np.clip(np.asarray(sbs[0]), 0, 1) * 255 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=args.quality)
        state.set_frame_data(buf.getvalue())
        n += 1
        if n % 30 == 0:
            state.fps_estimate = n / (time.time() - t0)
            print(f"Estimated FPS = {state.fps_estimate:.2f}",
                  file=sys.stderr)
        dt = time.time() - t_frame
        if dt < frame_interval:
            time.sleep(frame_interval - dt)


def main(argv=None):
    # first-run UX: persistent compile cache (core/compile_cache.py)
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="iw3.desktop", description=__doc__)
    p.add_argument("--input", default=None,
                   help="video file looped as the frame source "
                        "(default: synthetic test pattern)")
    p.add_argument("--capture", default=None, metavar="ADDR",
                   help="accept frames from a host-side grabber over a "
                        "socket instead of --input: 'listen:PORT', "
                        "'HOST:PORT' or 'unix:/path' (protocol IW3CAP01, "
                        "see iw3/capture_source.py; TPU-native counterpart "
                        "of the reference --screenshot backends)")
    p.add_argument("--bind", default="127.0.0.1")
    p.add_argument("--port", type=int, default=1303)
    p.add_argument("--depth-model", default="NULL")
    p.add_argument("--depth-checkpoint", default=None)
    p.add_argument("--stereo-checkpoint", default=None)
    p.add_argument("--method", default="forward_fill")
    p.add_argument("--divergence", type=float, default=2.0)
    p.add_argument("--convergence", type=float, default=0.5)
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--full-sbs", action="store_true")
    p.add_argument("--stream-fps", type=float, default=15.0)
    p.add_argument("--quality", type=int, default=90)
    p.add_argument("--max-frames", type=int, default=None,
                   help="stop after N frames (testing)")
    args = p.parse_args(argv)

    state = StreamingState()
    if args.capture:
        from .capture_source import SocketFrameSource, parse_capture_address
        source = SocketFrameSource(parse_capture_address(args.capture))
        print(f"iw3 desktop: capture socket listening on "
              f"{source.bound_address}", file=sys.stderr)
    else:
        source = FrameSource(args.input)
    stop = threading.Event()
    worker = threading.Thread(target=run_pipeline,
                              args=(state, source, args, stop), daemon=True)
    worker.start()
    server = ThreadingHTTPServer((args.bind, args.port), make_handler(state))
    print(f"iw3 desktop: http://{args.bind}:{args.port}/", file=sys.stderr)
    try:
        if args.max_frames:
            # testing mode: serve in the background so /stream stays
            # reachable, run until N frames produced, then exit
            st = threading.Thread(target=server.serve_forever, daemon=True)
            st.start()
            while state._seq < args.max_frames and worker.is_alive():
                time.sleep(0.1)
            server.shutdown()
        else:
            server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
