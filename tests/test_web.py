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
