"""iw3 serving: desktop MJPEG stream state, player library + range serving,
export/import config."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest


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
        assert items == [{"path": "a_LRF.mp4", "stereo_format": "sbs"}]

    def test_range_request(self, server):
        req = urllib.request.Request(server + "/media/a_LRF.mp4",
                                     headers={"Range": "bytes=4-7"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 206
            assert r.read() == b"4567"
            assert r.headers["Content-Range"] == "bytes 4-7/16"

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
