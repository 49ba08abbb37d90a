"""iw3 player — local media server for converted 3D videos.

Behavioral parity target: reference iw3/player/ (FastAPI/hypercorn media
server + WebXR frontend): media library listing, HTTP range-request video
serving (seekable playback), stereo-format detection from filename tags,
and a browser player page.  The WebXR renderer is replaced by a plain
side-by-side HTML5 player (VR headset runtimes are not reachable from a
TPU server); the serving API matches.

Usage: python -m nunif_tpu.iw3.player --root /videos --port 1304
"""
from __future__ import annotations

import argparse
import html
import json
import os
import re
import sys
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..core.logger import logger

VIDEO_EXTS = {".mp4", ".mkv", ".webm", ".mov"}

# reference iw3/player/stereo_detector.py — filename tag conventions
_SBS_TAGS = re.compile(r"(_LRF?|[._-]sbs|full[._-]?sbs)", re.IGNORECASE)
_HALF_SBS_TAGS = re.compile(r"(_LRH|half[._-]?sbs)", re.IGNORECASE)
_TB_TAGS = re.compile(r"(_TBF?|[._-]tb|top[._-]?bottom)", re.IGNORECASE)
_RGBD_TAGS = re.compile(r"(_RGBD|[._-]rgbd)", re.IGNORECASE)


def detect_stereo_format(filename: str) -> str:
    """reference iw3/player stereo_detector."""
    if _HALF_SBS_TAGS.search(filename):
        return "half-sbs"
    if _SBS_TAGS.search(filename):
        return "sbs"
    if _TB_TAGS.search(filename):
        return "tb"
    if _RGBD_TAGS.search(filename):
        return "rgbd"
    return "mono"


def list_media(root: str):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in VIDEO_EXTS:
                rel = os.path.relpath(os.path.join(dirpath, f), root)
                out.append({"path": rel,
                            "stereo_format": detect_stereo_format(f)})
    return out


PLAYER_HTML = """<!doctype html>
<html><head><title>iw3 player</title></head>
<body style="background:#111;color:#eee;font-family:sans-serif">
<h2>iw3 player</h2>
<div id="list"></div>
<video id="v" controls style="width:100%%;max-height:80vh"></video>
<script>
fetch('/api/library').then(r=>r.json()).then(items=>{
  const d=document.getElementById('list');
  items.forEach(it=>{
    const a=document.createElement('a');
    a.textContent=it.path+' ['+it.stereo_format+']';
    a.href='#'; a.style.display='block'; a.style.color='#9cf';
    a.onclick=()=>{document.getElementById('v').src=
      '/media/'+encodeURIComponent(it.path); return false;};
    d.appendChild(a);
  });
});
</script></body></html>"""


def make_handler(root: str):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            logger.debug("player: " + fmt, *args)

        def _send(self, code, body, ctype="text/html; charset=utf-8",
                  headers=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urllib.parse.unquote(self.path)
            if path in ("/", "/index.html"):
                self._send(200, PLAYER_HTML.encode())
            elif path == "/api/library":
                self._send(200, json.dumps(list_media(root)).encode(),
                           "application/json")
            elif path.startswith("/media/"):
                self._serve_media(path[len("/media/"):])
            else:
                self._send(404, b"not found")

        def _serve_media(self, rel):
            full = os.path.realpath(os.path.join(root, rel))
            if not full.startswith(os.path.realpath(root) + os.sep) or \
                    not os.path.isfile(full):
                self._send(404, b"not found")
                return
            size = os.path.getsize(full)
            rng = self.headers.get("Range")
            start, end = 0, size - 1
            code = 200
            if rng:
                m = re.match(r"bytes=(\d*)-(\d*)", rng)
                if m:
                    if m.group(1):
                        start = int(m.group(1))
                    if m.group(2):
                        end = int(m.group(2))
                    end = min(end, size - 1)
                    code = 206
            length = end - start + 1
            self.send_response(code)
            self.send_header("Content-Type", "video/mp4")
            self.send_header("Accept-Ranges", "bytes")
            self.send_header("Content-Length", str(length))
            if code == 206:
                self.send_header("Content-Range",
                                 f"bytes {start}-{end}/{size}")
            self.end_headers()
            with open(full, "rb") as f:
                f.seek(start)
                remaining = length
                while remaining > 0:
                    chunk = f.read(min(1 << 20, remaining))
                    if not chunk:
                        break
                    try:
                        self.wfile.write(chunk)
                    except (BrokenPipeError, ConnectionResetError):
                        return
                    remaining -= len(chunk)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(prog="iw3.player", description=__doc__)
    p.add_argument("--root", required=True, help="media directory")
    p.add_argument("--bind", default="127.0.0.1")
    p.add_argument("--port", type=int, default=1304)
    args = p.parse_args(argv)
    server = ThreadingHTTPServer((args.bind, args.port),
                                 make_handler(args.root))
    print(f"iw3 player: http://{args.bind}:{args.port}/", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
