"""GUI framework tests (reference nunif/gui/: tqdm bridge, persistence,
locale yml i18n, app GUI)."""
import io
import json
import os
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest


class TestProgressBridge:
    def test_publish_subscribe(self):
        from nunif_tpu.gui import ProgressBridge
        b = ProgressBridge()
        q = b.subscribe()
        b.update("j1", 1, 4, "work")
        ev = q.get(timeout=2)
        assert ev.job_id == "j1" and ev.step == 1 and ev.total == 4
        assert abs(ev.fraction - 0.25) < 1e-9
        b.finish("j1")
        ev2 = q.get(timeout=2)
        assert ev2.done and ev2.error is None
        assert b.latest("j1").done
        b.unsubscribe(q)

    def test_callback_and_error(self):
        from nunif_tpu.gui import ProgressBridge
        b = ProgressBridge()
        seen = []
        b.subscribe_callback(seen.append)
        b.update("j2", 0, 0)
        b.finish("j2", error="boom")
        assert seen[-1].error == "boom" and seen[-1].done

    def test_tqdm_shim(self):
        from nunif_tpu.gui import ProgressBridge
        b = ProgressBridge()
        events = []
        b.subscribe_callback(events.append)
        T = b.tqdm_class("job")
        out = list(T(range(5), desc="iter"))
        assert out == list(range(5))
        assert events[-1].done
        steps = [e.step for e in events if not e.done]
        assert steps == [0, 1, 2, 3, 4, 5]


class TestSettingsStore:
    def test_roundtrip_defaults(self, tmp_path):
        from nunif_tpu.gui import SettingsStore
        s = SettingsStore("app", config_dir=str(tmp_path),
                          defaults={"a": 1, "b": "x"})
        assert s.get("a") == 1
        s.set("a", 5)
        s.update({"c": [1, 2]})
        # fresh instance reads back from disk
        s2 = SettingsStore("app", config_dir=str(tmp_path),
                           defaults={"a": 1, "b": "x"})
        assert s2.get("a") == 5 and s2.get("b") == "x" and s2.get("c") == [1, 2]
        assert s2.as_dict()["a"] == 5
        s2.reset()
        assert SettingsStore("app", config_dir=str(tmp_path)).get("a") is None

    def test_corrupt_file_ignored(self, tmp_path):
        from nunif_tpu.gui import SettingsStore
        (tmp_path / "bad.json").write_text("{not json")
        s = SettingsStore("bad", config_dir=str(tmp_path), defaults={"k": 7})
        assert s.get("k") == 7


class TestLocale:
    def test_builtin_ja(self):
        from nunif_tpu.gui import load_locale
        tr = load_locale("ja_JP.UTF-8")
        assert tr.lang == "ja"
        assert tr("Start") == "開始"
        assert tr("UNKNOWN KEY") == "UNKNOWN KEY"  # fallback to key

    def test_fallback_to_en(self):
        from nunif_tpu.gui import load_locale
        tr = load_locale("fr_FR")
        assert tr.lang == "en"
        assert tr("Start") == "Start"

    def test_app_overlay(self, tmp_path):
        from nunif_tpu.gui import load_locale
        (tmp_path / "ja.yml").write_text("Start: カスタム開始\n",
                                         encoding="utf-8")
        tr = load_locale("ja", locale_dir=str(tmp_path))
        assert tr("Start") == "カスタム開始"
        assert tr("Cancel") == "キャンセル"  # builtin survives merge

    def test_available_languages(self):
        from nunif_tpu.gui.locale import available_languages
        langs = available_languages()
        assert "en" in langs and "ja" in langs


@pytest.fixture(scope="module")
def gui_server(tmp_path_factory):
    """In-process GUI server with a random-init waifu2x slot installed."""
    os.environ["NUNIF_TPU_GUI_DIR"] = str(
        tmp_path_factory.mktemp("gui_settings"))
    import jax
    from http.server import ThreadingHTTPServer
    from nunif_tpu.gui.server import GuiService, make_handler
    from nunif_tpu.models import create_model
    import nunif_tpu.waifu2x  # noqa: F401

    service = GuiService(lang="en")

    class FakeW2x:
        """Waifu2xImageModel stand-in with a random-init upconv_7."""
        def __init__(self):
            from nunif_tpu.waifu2x.runtime import Waifu2x
            self.w2x = Waifu2x("/nonexistent")
            model = create_model("waifu2x.upconv_7")
            params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
            for method in ("scale", "noise_scale"):
                self.w2x.set_slot(method, 1, model, params)
                self.w2x.set_slot(method, 0, model, params)

    service._w2x = FakeW2x()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _multipart(fields: dict, file_bytes: bytes):
    boundary = "XBOUNDARYX"
    parts = []
    for k, v in fields.items():
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"file\"; filename=\"in.png\"\r\n"
                 f"Content-Type: image/png\r\n\r\n".encode()
                 + file_bytes + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    return body, f"multipart/form-data; boundary={boundary}"


class TestGuiServer:
    def _png(self, w=40, h=32):
        from PIL import Image
        rng = np.random.default_rng(0)
        im = Image.fromarray(
            (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return buf.getvalue()

    def test_index_page(self, gui_server):
        html = urllib.request.urlopen(gui_server + "/").read().decode()
        assert "waifu2x" in html and "iw3" in html and "Start" in html

    def test_settings_api(self, gui_server):
        data = json.loads(urllib.request.urlopen(
            gui_server + "/api/settings?app=iw3").read())
        assert "divergence" in data
        body, ctype = _multipart({"app": "iw3", "divergence": "2.5"}, b"")
        # settings POST is urlencoded-or-multipart; use urlencoded here
        req = urllib.request.Request(
            gui_server + "/api/settings",
            data=b"app=iw3&divergence=2.5",
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        assert json.loads(urllib.request.urlopen(req).read())["ok"]
        data = json.loads(urllib.request.urlopen(
            gui_server + "/api/settings?app=iw3").read())
        assert data["divergence"] == "2.5"

    @pytest.mark.slow
    def test_waifu2x_job_end_to_end(self, gui_server):
        from PIL import Image
        body, ctype = _multipart(
            {"method": "noise_scale", "noise_level": "1"}, self._png())
        req = urllib.request.Request(gui_server + "/api/waifu2x", data=body,
                                     headers={"Content-Type": ctype})
        job_id = json.loads(urllib.request.urlopen(req).read())["job_id"]
        # poll the result endpoint until done
        import time
        for _ in range(600):
            r = urllib.request.urlopen(gui_server + "/api/result/" + job_id)
            if r.status == 200:
                out = Image.open(io.BytesIO(r.read()))
                assert out.size == (80, 64)  # 2x
                return
            time.sleep(0.2)
        raise AssertionError("job did not finish")

    def test_bad_job(self, gui_server):
        req = urllib.request.Request(
            gui_server + "/api/waifu2x", data=b"nope",
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

    def test_result_unknown_job(self, gui_server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(gui_server + "/api/result/zzz")
        assert ei.value.code == 404


class TestGuiIw3:
    def test_iw3_job_end_to_end(self, gui_server):
        """iw3 image job through the HTTP API (random-init depth model)."""
        from PIL import Image
        rng = np.random.default_rng(1)
        im = Image.fromarray(
            (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        body, ctype = _multipart(
            {"method": "grid_sample", "divergence": "2.0",
             "convergence": "0.5", "stereo_format": "half_sbs",
             "depth_model": "NULL"}, buf.getvalue())
        req = urllib.request.Request(gui_server + "/api/iw3", data=body,
                                     headers={"Content-Type": ctype})
        job_id = json.loads(urllib.request.urlopen(req).read())["job_id"]
        import time
        for _ in range(600):
            r = urllib.request.urlopen(gui_server + "/api/result/" + job_id)
            if r.status == 200:
                out = Image.open(io.BytesIO(r.read()))
                # half-sbs: two half-width views side by side = input size
                assert out.size == (64, 48)
                return
            time.sleep(0.2)
        raise AssertionError("iw3 job did not finish")


def test_stereo_format_from_name():
    from nunif_tpu.iw3.composition import StereoFormat
    import pytest as _pytest
    assert StereoFormat.from_name("sbs") == StereoFormat()
    assert StereoFormat.from_name("half_sbs").half_sbs
    assert StereoFormat.from_name("tb").tb
    assert StereoFormat.from_name("anaglyph").anaglyph == "dubois"
    assert StereoFormat.from_name("anaglyph:color").anaglyph == "color"
    assert StereoFormat.from_name("vr180").vr180
    with _pytest.raises(ValueError):
        StereoFormat.from_name("bogus")


class TestGuiVideoJobs:
    @pytest.mark.slow
    def test_stlizer_job(self, gui_server, tmp_path):
        """Server-side-path stabilization job via the GUI API."""
        from nunif_tpu.video import generate_video, VideoOutputConfig

        def gen():
            rng = np.random.default_rng(0)
            base = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
            for i in range(10):
                yield np.roll(base, i % 3, axis=1)

        src = str(tmp_path / "shaky.mp4")
        dst = str(tmp_path / "stable.mp4")
        generate_video(src, gen(), 64, 48, fps=8,
                       config=VideoOutputConfig(audio_copy=False))
        req = urllib.request.Request(
            gui_server + "/api/stlizer",
            data=urllib.parse.urlencode(
                {"input_path": src, "output_path": dst,
                 "smoothing": "1.0", "border": "black"}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        job_id = json.loads(urllib.request.urlopen(req).read())["job_id"]
        import time
        for _ in range(900):
            r = urllib.request.urlopen(gui_server + "/api/result/" + job_id)
            if r.status == 200:
                body = json.loads(r.read())
                assert body["output_path"] == dst
                assert os.path.exists(dst)
                return
            time.sleep(0.2)
        raise AssertionError("stlizer job did not finish")

    def test_video_job_bad_path(self, gui_server):
        req = urllib.request.Request(
            gui_server + "/api/iw3_video",
            data=b"input_path=/nonexistent.mp4&output_path=/tmp/x.mp4",
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        job_id = json.loads(urllib.request.urlopen(req).read())["job_id"]
        import time
        for _ in range(100):
            try:
                r = urllib.request.urlopen(
                    gui_server + "/api/result/" + job_id)
                if r.status == 202:
                    time.sleep(0.1)
                    continue
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert b"not found" in e.read()
                return
        raise AssertionError("expected job failure")
