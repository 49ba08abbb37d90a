"""iw3 serving: desktop MJPEG stream state, player library + range serving,
export/import config."""
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image


class TestExportConfig:
    def test_roundtrip(self, tmp_path):
        from nunif_tpu.iw3.export_config import ExportConfig, IMAGE_TYPE
        from fractions import Fraction
        cfg = ExportConfig(IMAGE_TYPE, basename="x", fps=Fraction(30000, 1001),
                           mapper="mul_1", divergence=2.5, convergence=0.5)
        p = str(tmp_path / "iw3_export.yml")
        cfg.save(p)
        loaded = ExportConfig.load(p)
        assert loaded.type == IMAGE_TYPE
        assert loaded.mapper == "mul_1"
        assert loaded.fps == Fraction(30000, 1001)
        assert loaded.divergence == 2.5


class TestStereoDetector:
    def test_tags(self):
        from nunif_tpu.iw3.player import detect_stereo_format
        assert detect_stereo_format("movie_LRF.mp4") == "sbs"
        assert detect_stereo_format("movie_half_sbs.mp4") == "half-sbs"
        assert detect_stereo_format("movie_TB.mp4") == "tb"
        assert detect_stereo_format("movie_RGBD.mp4") == "rgbd"
        assert detect_stereo_format("plain.mp4") == "mono"


class TestPlayerServer:
    @pytest.fixture()
    def server(self, tmp_path):
        from http.server import ThreadingHTTPServer
        from nunif_tpu.iw3.player import make_handler
        (tmp_path / "a_LRF.mp4").write_bytes(b"0123456789abcdef")
        srv = ThreadingHTTPServer(("127.0.0.1", 0),
                                  make_handler(str(tmp_path)))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def test_library(self, server):
        with urllib.request.urlopen(server + "/api/library") as r:
            items = json.loads(r.read())
        assert items == [{"path": "a_LRF.mp4", "type": "video",
                          "stereo_format": "sbs"}]

    def test_range_request(self, server):
        req = urllib.request.Request(server + "/media/a_LRF.mp4",
                                     headers={"Range": "bytes=4-7"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 206
            assert r.read() == b"4567"
            assert r.headers["Content-Range"] == "bytes 4-7/16"


    def test_webxr_viewer_page(self, server):
        """GET / serves the WebXR stereo viewer (player_app.py) with the
        reference player's feature surface (iw3/player/public/js)."""
        with urllib.request.urlopen(server + "/") as r:
            page = r.read().decode("utf-8")
        for marker in ("immersive-vr", "XRWebGLLayer", "requestSession",
                       "uv_window", "half-sbs", "rgbd", "curvature",
                       "localStorage", "subtitles", "/api/library",
                       "draw_eye", "projectionMatrix"):
            assert marker in page, marker
        # per-eye UV windows for every stereo layout are present
        assert "[0.5, 0, 0.5, 1]" in page  # sbs right eye
        assert "[0, 0.5, 1, 0.5]" in page  # tb right eye
        with urllib.request.urlopen(server + "/flat") as r:
            assert b"<video" in r.read()

    def test_image_media_content_type(self, server, tmp_path):
        import io
        from PIL import Image
        import numpy as np
        im = Image.fromarray(np.zeros((4, 6, 3), np.uint8))
        im.save(str(tmp_path / "pic_LRF.png"))
        with urllib.request.urlopen(server + "/media/pic_LRF.png") as r:
            assert r.headers["Content-Type"] == "image/png"
            Image.open(io.BytesIO(r.read())).verify()

    def test_traversal_blocked(self, server):
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(server + "/media/../etc/passwd")
        assert e.value.code == 404


class TestDesktopStream:
    def test_pipeline_produces_frames(self):
        """Run the desktop pipeline for a few frames with NULL depth."""
        import argparse
        from nunif_tpu.iw3.desktop import (
            StreamingState, FrameSource, run_pipeline)
        args = argparse.Namespace(
            input=None, depth_model="NULL", depth_checkpoint=None,
            stereo_checkpoint=None, method="forward_fill", divergence=2.0,
            convergence=0.5, resolution=98, full_sbs=False,
            stream_fps=1000.0, quality=85)
        state = StreamingState()
        source = FrameSource(None, width=128, height=72)
        stop = threading.Event()
        t = threading.Thread(target=run_pipeline,
                             args=(state, source, args, stop), daemon=True)
        t.start()
        import time
        deadline = time.time() + 120
        while state._seq < 2 and time.time() < deadline:
            time.sleep(0.2)
        stop.set()
        assert state._seq >= 2
        data, _ = state.wait_frame(-1)
        from PIL import Image
        im = Image.open(io.BytesIO(data))
        assert im.size[0] == 128  # half-sbs keeps source width


class TestPlayerMediaLibrary:
    def _make_root(self, tmp_path):
        import zipfile
        root = tmp_path / "media"
        root.mkdir()
        # video
        from nunif_tpu.video import generate_video, VideoOutputConfig
        generate_video(str(root / "clip_LRH.mp4"),
                       (np.zeros((48, 64, 3), np.uint8) for _ in range(4)),
                       64, 48, fps=8,
                       config=VideoOutputConfig(audio_copy=False))
        # loose image
        from nunif_tpu.utils.pil_io import save_image
        save_image(np.zeros((8, 8, 3), np.uint8), str(root / "img_sbs.png"))
        # zip gallery
        with zipfile.ZipFile(root / "gallery.zip", "w") as zf:
            zf.writestr("a.png", (root / "img_sbs.png").read_bytes())
            zf.writestr("sub/b.png", (root / "img_sbs.png").read_bytes())
            zf.writestr("notes.txt", b"ignored")
        return str(root)

    def test_list_media_with_zip(self, tmp_path):
        from nunif_tpu.iw3.player import list_media
        items = list_media(self._make_root(tmp_path))
        by_type = {i["type"]: i for i in items}
        assert by_type["video"]["stereo_format"] == "half-sbs"
        assert by_type["zip"]["entries"] == ["a.png", "sub/b.png"]
        assert "image" in by_type

    def test_split_zip_path(self):
        from nunif_tpu.iw3.player import split_zip_path
        assert split_zip_path("a/b.zip/c/d.png") == ("a/b.zip", "c/d.png")
        assert split_zip_path("a/b.mp4") == ("a/b.mp4", None)

    def test_player_serves_zip_entry_and_ranges(self, tmp_path):
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer
        from nunif_tpu.iw3.player import make_handler

        root = self._make_root(tmp_path)
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(root))
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            lib = json.loads(urllib.request.urlopen(
                base + "/api/library").read())
            assert any(i["type"] == "zip" for i in lib)
            # zip entry serving
            img = urllib.request.urlopen(
                base + "/media/gallery.zip/a.png")
            assert img.headers["Content-Type"] == "image/png"
            assert img.read()[:8] == b"\x89PNG\r\n\x1a\n"
            # range request on the video
            req = urllib.request.Request(
                base + "/media/clip_LRH.mp4",
                headers={"Range": "bytes=0-99"})
            r = urllib.request.urlopen(req)
            assert r.status == 206
            assert len(r.read()) == 100
            # no-subtitle video -> 404 (graceful)
            try:
                urllib.request.urlopen(base + "/subtitles/clip_LRH.mp4")
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            srv.shutdown()

    def test_extract_subtitles_no_stream(self, tmp_path):
        from nunif_tpu.video import generate_video, VideoOutputConfig
        from nunif_tpu.video.backend import extract_subtitles
        src = str(tmp_path / "nosub.mp4")
        generate_video(src, (np.zeros((48, 64, 3), np.uint8)
                             for _ in range(4)), 64, 48, fps=8,
                       config=VideoOutputConfig(audio_copy=False))
        assert extract_subtitles(src, src + ".vtt") == 0


class TestCaptureSource:
    """Socket capture plugin (IW3CAP01): the TPU-native extension point
    replacing the reference's in-process screenshot backends
    (/root/reference/iw3/desktop/utils.py:252-261)."""

    def test_raw_tcp_roundtrip(self):
        from nunif_tpu.iw3.capture_source import (
            SocketFrameSource, FileGrabber, FMT_RAW)
        src = SocketFrameSource(("127.0.0.1", 0), timeout=20.0)
        try:
            rng = np.random.default_rng(0)
            frames = [rng.integers(0, 255, (36, 64, 3), dtype=np.uint8)
                      for _ in range(3)]
            grab = FileGrabber(src.bound_address, fmt=FMT_RAW)
            t = threading.Thread(target=grab.push, args=(frames,),
                                 daemon=True)
            t.start()
            f = src.next_frame()
            assert f.shape == (36, 64, 3) and f.dtype == np.uint8
            t.join(10)
            # drop-late: after the grabber finishes, newest frame wins
            f2, seq = src.wait_new_frame(0)
            assert seq >= 1
            deadline = time.time() + 10
            while seq < 3 and time.time() < deadline:
                f2, seq = src.wait_new_frame(seq)
            np.testing.assert_array_equal(src.next_frame(), frames[-1])
        finally:
            src.close()

    def test_jpeg_unix_roundtrip(self, tmp_path):
        from nunif_tpu.iw3.capture_source import (
            SocketFrameSource, FileGrabber, FMT_JPEG)
        addr = str(tmp_path / "cap.sock")
        src = SocketFrameSource(addr, timeout=20.0)
        try:
            frame = np.full((24, 32, 3), 128, np.uint8)
            grab = FileGrabber(addr, fmt=FMT_JPEG)
            t = threading.Thread(target=grab.push, args=([frame],),
                                 daemon=True)
            t.start()
            f = src.next_frame()
            t.join(10)
            assert f.shape == (24, 32, 3)
            assert np.abs(f.astype(int) - 128).max() <= 3  # JPEG tolerance
        finally:
            src.close()

    def test_bad_magic_rejected_then_recovers(self):
        import socket as socket_mod
        from nunif_tpu.iw3.capture_source import (
            SocketFrameSource, FileGrabber, FMT_RAW)
        src = SocketFrameSource(("127.0.0.1", 0), timeout=20.0)
        try:
            s = socket_mod.socket()
            s.connect(src.bound_address)
            s.sendall(b"NOTMAGIC" + b"\0" * 16)
            s.close()
            # a well-behaved grabber can still connect afterwards
            frame = np.zeros((8, 8, 3), np.uint8)
            ok = []

            def push():
                deadline = time.time() + 10
                while time.time() < deadline:
                    try:
                        FileGrabber(src.bound_address, fmt=FMT_RAW).push(
                            [frame])
                        ok.append(True)
                        return
                    except OSError:
                        time.sleep(0.2)

            t = threading.Thread(target=push, daemon=True)
            t.start()
            f = src.next_frame()
            t.join(10)
            assert ok and f.shape == (8, 8, 3)
        finally:
            src.close()

    def test_desktop_pipeline_from_capture(self):
        """End-to-end: desktop pipeline consumes socket-pushed frames."""
        import argparse
        from nunif_tpu.iw3.desktop import StreamingState, run_pipeline
        from nunif_tpu.iw3.capture_source import (
            SocketFrameSource, FileGrabber, FMT_RAW)
        src = SocketFrameSource(("127.0.0.1", 0), timeout=30.0)
        args = argparse.Namespace(
            input=None, depth_model="NULL", depth_checkpoint=None,
            stereo_checkpoint=None, method="forward_fill", divergence=2.0,
            convergence=0.5, resolution=98, full_sbs=False,
            stream_fps=1000.0, quality=85)
        state = StreamingState()
        stop = threading.Event()
        try:
            rng = np.random.default_rng(1)

            def feeder():
                grab = FileGrabber(src.bound_address, fmt=FMT_RAW)
                grab.push(rng.integers(0, 255, (64, 72, 128, 3),
                                       dtype=np.uint8))

            ft = threading.Thread(target=feeder, daemon=True)
            ft.start()
            t = threading.Thread(target=run_pipeline,
                                 args=(state, src, args, stop), daemon=True)
            t.start()
            deadline = time.time() + 120
            while state._seq < 2 and time.time() < deadline:
                time.sleep(0.2)
            stop.set()
            assert state._seq >= 2
            data, _ = state.wait_frame(-1)
            im = Image.open(io.BytesIO(data))
            assert im.size[0] == 128  # half-sbs keeps source width
        finally:
            stop.set()
            src.close()
