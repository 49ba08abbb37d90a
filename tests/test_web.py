"""waifu2x web server: API round trip, cache, size caps, load test."""
import io
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import argparse
    from http.server import ThreadingHTTPServer
    from nunif_tpu.waifu2x.web import Waifu2xWebService, make_handler
    args = argparse.Namespace(
        model_file=None, arch="waifu2x.upconv_7", tile_size=64, batch_size=4,
        cache_dir=str(tmp_path_factory.mktemp("cache")), cache_size_mb=8)
    service = Waifu2xWebService(args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def _post_image(url, im_bytes, **fields):
    boundary = "x123"
    parts = []
    for k, v in fields.items():
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"file\"; filename=\"a.png\"\r\n"
                 f"Content-Type: image/png\r\n\r\n".encode())
    parts.append(im_bytes)
    parts.append(f"\r\n--{boundary}--\r\n".encode())
    body = b"".join(parts)
    req = urllib.request.Request(
        url + "/api", data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    return urllib.request.urlopen(req, timeout=120)


def _png_bytes(w=32, h=24):
    rng = np.random.default_rng(0)
    im = Image.fromarray((rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_index_and_health(server):
    url, _ = server
    with urllib.request.urlopen(url + "/") as r:
        assert b"waifu2x" in r.read()
    with urllib.request.urlopen(url + "/health") as r:
        assert b"ok" in r.read()


def test_api_upscale(server):
    url, _ = server
    data = _png_bytes(32, 24)
    with _post_image(url, data, style="art", noise="-1", scale="2",
                     format="png") as r:
        assert r.status == 200
        out = Image.open(io.BytesIO(r.read()))
        assert out.size == (64, 48)


def test_api_cache_hit(server):
    url, service = server
    data = _png_bytes(16, 16)
    with _post_image(url, data, scale="2", format="png") as r:
        first = r.read()
    with _post_image(url, data, scale="2", format="png") as r:
        second = r.read()
    assert first == second


def test_api_no_image(server):
    url, _ = server
    import urllib.error
    req = urllib.request.Request(
        url + "/api", data=b"style=art",
        headers={"Content-Type": "application/x-www-form-urlencoded"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_concurrent_requests(server):
    """mini load test (reference waifu2x/web/web_load_test.py)."""
    url, _ = server
    datas = [_png_bytes(16 + 8 * i, 16) for i in range(3)]
    results = []

    def hit(d):
        with _post_image(url, d, scale="2", format="png") as r:
            results.append(r.status)

    threads = [threading.Thread(target=hit, args=(d,)) for d in datas]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200, 200, 200]


def test_webgen_static_pages(tmp_path):
    """webgen renders one page per locale (reference waifu2x/web/webgen)."""
    from nunif_tpu.waifu2x.webgen import generate_pages, load_locales
    paths = generate_pages(str(tmp_path))
    locales = load_locales()
    assert len(paths) == len(locales) >= 5
    en = (tmp_path / "index.html").read_text()
    ja = (tmp_path / "index.ja.html").read_text()
    assert 'lang="en"' in en and "Convert" in en
    assert 'lang="ja"' in ja and "変換" in ja
    # missing keys fall back to English (language_links only in en.yml)
    assert "index.zh_CN.html" in ja


def test_webgen_pick_language():
    from nunif_tpu.waifu2x.webgen import pick_language
    avail = ["en", "ja", "zh_CN", "es", "ru"]
    assert pick_language("ja,en;q=0.8", avail) == "ja"
    assert pick_language("zh-CN,zh;q=0.9", avail) == "zh_CN"
    assert pick_language("fr-FR,fr;q=0.9,es;q=0.5", avail) == "es"
    assert pick_language("de", avail) == "en"
    assert pick_language("", avail) == "en"
    assert pick_language("es-MX", avail) == "es"


def test_index_language_negotiation(server):
    url, service = server
    assert "ja" in service.pages
    req = urllib.request.Request(url + "/",
                                 headers={"Accept-Language": "ja"})
    with urllib.request.urlopen(req) as r:
        assert "変換" in r.read().decode("utf-8")
    with urllib.request.urlopen(url + "/index.ru.html") as r:
        assert "Преобразовать" in r.read().decode("utf-8")
    with urllib.request.urlopen(url + "/index.html") as r:
        assert "Convert" in r.read().decode("utf-8")


# ---------------------------------------------------------------------------
# unlimited_waifu2x (browser tile-orchestration app; waifu2x/unlimited.py)

def _post_tile(url, tile, **params):
    q = "&".join(f"{k}={v}" for k, v in params.items())
    req = urllib.request.Request(
        url + "/api/tile?" + q, data=np.ascontiguousarray(tile).tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    return urllib.request.urlopen(req, timeout=120)


def test_unlimited_page(server):
    url, _ = server
    with urllib.request.urlopen(url + "/unlimited") as r:
        page = r.read().decode("utf-8")
    # the client app's core features (reference script.js parity surface)
    for marker in ("calc_parameters", "SeamBlending", "make_blend_filter",
                   "pad_replicate", "localStorage", "dragover", "paste",
                   "/api/tile", "cancel"):
        assert marker in page, marker


def test_unlimited_tile_api(server):
    url, service = server
    rng = np.random.default_rng(5)
    tile = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    with _post_tile(url, tile, w=64, h=64, tta=0) as r:
        scale = int(r.headers["X-Tile-Scale"])
        offset = int(r.headers["X-Tile-Offset"])
        out = np.frombuffer(r.read(), np.float32)
    assert scale == 2 and offset == 14  # upconv_7 i2i contract
    side = 64 * scale - 2 * offset
    assert out.size == side * side * 3
    # bad body size is a 400, not a crash
    try:
        _post_tile(url, tile[:8], w=64, h=64, tta=0)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_unlimited_tile_info_and_validation(server):
    """The tile API validates scale/noise against the loaded model and
    advertises it at /api/tile/info (one fixed model per process)."""
    import json
    url, service = server
    with urllib.request.urlopen(url + "/api/tile/info") as r:
        info = json.loads(r.read())
    assert info["scale"] == 2 and info["offset"] == 14
    assert info["noise"] == -1 and "upconv_7" in info["name"]
    tile = np.zeros((64, 64, 3), np.float32)
    # matching scale/noise are accepted
    with _post_tile(url, tile, w=64, h=64, tta=0, scale=2, noise=-1) as r:
        assert r.status == 200
    # mismatched scale / noise are a 400, never a silent wrong conversion
    for bad in ({"scale": 4}, {"noise": 3}):
        try:
            _post_tile(url, tile, w=64, h=64, tta=0, **bad)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_unlimited_tile_tta(server):
    url, _ = server
    rng = np.random.default_rng(6)
    tile = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    with _post_tile(url, tile, w=64, h=64, tta=1) as r:
        out = np.frombuffer(r.read(), np.float32)
    with _post_tile(url, tile, w=64, h=64, tta=0) as r:
        plain = np.frombuffer(r.read(), np.float32)
    assert out.shape == plain.shape
    assert np.isfinite(out).all()
    # TTA differs from the plain pass but stays in the value envelope
    assert not np.allclose(out, plain, atol=1e-6)


def test_unlimited_client_blend_parity(server):
    """numpy simulation of the browser app's exact pipeline (grid math,
    replicate pad, per-tile /api/tile calls, cumulative float32 seam
    blending, crop) == TiledRenderer one-program render."""
    url, service = server
    from nunif_tpu.utils.tiling import make_tile_config, make_blend_filter

    model = service.renderer.model
    scale, offset = model.i2i_scale, model.i2i_offset
    blend = model.i2i_blend_size
    tile_size = 64
    rng = np.random.default_rng(7)
    h, w = 40, 56
    x = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    cfg = make_tile_config(h, w, scale, offset, tile_size, blend)
    left, right, top, bottom = cfg.pad
    padded = np.pad(x, ((top, bottom), (left, right), (0, 0)), mode="edge")
    filt = make_blend_filter(scale, offset, tile_size, blend)[..., None]

    pixels = np.zeros((cfg.y_buffer_h, cfg.y_buffer_w, 3), np.float32)
    weights = np.zeros_like(pixels)
    for ti in range(cfg.h_blocks):
        for tj in range(cfg.w_blocks):
            i0 = ti * cfg.input_tile_step_h
            j0 = tj * cfg.input_tile_step_w
            tile = padded[i0:i0 + tile_size, j0:j0 + tile_size]
            with _post_tile(url, tile, w=tile_size, h=tile_size, tta=0) as r:
                out = np.frombuffer(r.read(), np.float32).reshape(
                    tile_size * scale - 2 * offset,
                    tile_size * scale - 2 * offset, 3)
            oh, ow = out.shape[:2]
            y0 = ti * cfg.output_tile_step_h
            x0 = tj * cfg.output_tile_step_w
            old_w = weights[y0:y0 + oh, x0:x0 + ow]
            next_w = old_w + filt
            keep = np.where(next_w > 0, old_w / np.maximum(next_w, 1e-12), 0)
            pixels[y0:y0 + oh, x0:x0 + ow] = (
                pixels[y0:y0 + oh, x0:x0 + ow] * keep + out * (1 - keep))
            weights[y0:y0 + oh, x0:x0 + ow] = next_w
    got = pixels[:cfg.y_h, :cfg.y_w]

    want = np.asarray(service.renderer.render(x, tile_size=tile_size,
                                              batch_size=4))
    np.testing.assert_allclose(got, want, atol=2e-3)
