"""Video runtime: encode/decode round trip through the native service,
fps retiming, process_video pipeline, audio copy survival."""
import os

import numpy as np
import pytest

from nunif_tpu.video import backend


pytestmark = pytest.mark.skipif(not backend.available(),
                                reason="native video backend unavailable")


def _make_video(path, n_frames=24, w=64, h=48, fps=12, codec="libx264"):
    from nunif_tpu.video import generate_video, VideoOutputConfig

    def gen():
        for i in range(n_frames):
            f = np.zeros((h, w, 3), np.uint8)
            f[:, :, 0] = int(255 * i / max(n_frames - 1, 1))
            f[:, : (i * w) // n_frames, 1] = 200
            yield f

    generate_video(path, gen(), w, h, fps=fps,
                   config=VideoOutputConfig(codec=codec, crf=18))
    return path


class TestBackend:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.mp4")
        _make_video(p, n_frames=24, fps=12)
        r = backend.VideoReader(p)
        assert (r.width, r.height) == (64, 48)
        assert abs(r.fps - 12) < 0.01
        frames = [(f.copy(), pts) for f, pts in r]
        r.close()
        assert len(frames) == 24
        # red ramp decodes approximately
        red0 = frames[0][0][:, :, 0].mean()
        red_last = frames[-1][0][:, :, 0].mean()
        assert red_last > red0 + 150
        # monotonic pts
        pts = [p for _, p in frames]
        assert all(b > a for a, b in zip(pts, pts[1:]))

    def test_reader_missing_file(self):
        with pytest.raises(IOError):
            backend.VideoReader("/nonexistent/file.mp4")

    def test_encoder_probe(self):
        assert backend.encoder_available("libx264")
        assert not backend.encoder_available("bogus_codec")


class TestRetimer:
    def test_downsample_fps(self):
        from nunif_tpu.video import FixedFPSRetimer
        from fractions import Fraction
        rt = FixedFPSRetimer(Fraction(10))
        out = []
        for i in range(30):  # 30 fps source, 1s
            out.extend(rt(i, i / 30.0))
        out.extend(rt.flush())
        assert len(out) == 11  # ~1s at 10fps (+flush)

    def test_upsample_fps(self):
        from nunif_tpu.video import FixedFPSRetimer
        from fractions import Fraction
        rt = FixedFPSRetimer(Fraction(20))
        out = []
        for i in range(10):  # 10 fps source
            out.extend(rt(i, i / 10.0))
        out.extend(rt.flush())
        assert 18 <= len(out) <= 21
        # duplicates present
        assert len(out) > len(set(out))


class TestProcessVideo:
    def test_identity_pipeline(self, tmp_path):
        from nunif_tpu.video import process_video, VideoOutputConfig
        src = _make_video(str(tmp_path / "in.mp4"))
        dst = str(tmp_path / "out.mp4")
        seen = []

        def cb(batch):
            seen.append(batch.shape)
            return batch

        process_video(src, dst, cb, batch_size=5,
                      config=VideoOutputConfig(max_fps=128, audio_copy=False))
        assert os.path.exists(dst)
        assert not os.path.exists(dst + ".tmp.mp4")
        r = backend.VideoReader(dst)
        n = sum(1 for _ in r)
        r.close()
        assert n == 24
        assert all(s[1:] == (48, 64, 3) for s in seen)

    def test_device_callback(self, tmp_path):
        """Callback returning a JAX array (async dispatch path)."""
        import jax.numpy as jnp
        from nunif_tpu.video import process_video, VideoOutputConfig
        src = _make_video(str(tmp_path / "in.mp4"))
        dst = str(tmp_path / "out.mkv")

        def cb(batch):
            x = jnp.asarray(batch).astype(jnp.float32) / 255.0
            return jnp.clip(1.0 - x, 0, 1)  # invert, float output

        process_video(src, dst, cb, batch_size=4,
                      config=VideoOutputConfig(audio_copy=False, max_fps=128))
        r = backend.VideoReader(dst)
        f0, _ = next(iter(r))
        r.close()
        assert f0[:, :, 0].mean() > 200  # inverted ramp start

    def test_fps_cap(self, tmp_path):
        from nunif_tpu.video import process_video, VideoOutputConfig
        src = _make_video(str(tmp_path / "in.mp4"), n_frames=48, fps=24)
        dst = str(tmp_path / "out.mp4")
        process_video(src, dst, lambda b: b, batch_size=8,
                      config=VideoOutputConfig(max_fps=12, audio_copy=False))
        r = backend.VideoReader(dst)
        assert abs(r.fps - 12) < 0.1
        n = sum(1 for _ in r)
        r.close()
        assert 22 <= n <= 26  # 2s at 12fps

    def test_error_cleans_tmp(self, tmp_path):
        from nunif_tpu.video import process_video, VideoOutputConfig
        src = _make_video(str(tmp_path / "in.mp4"))
        dst = str(tmp_path / "out.mp4")

        def bad(batch):
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            process_video(src, dst, bad, batch_size=4,
                          config=VideoOutputConfig(audio_copy=False))
        assert not os.path.exists(dst)
        assert not any(f.startswith("out.mp4.tmp") for f in os.listdir(tmp_path))


class TestHDR:
    """HDR->SDR tone map (reference hdr2sdr, nunif/utils/video.py:309)."""

    def test_pq_eotf_anchors(self):
        from nunif_tpu.video.hdr import pq_eotf
        import jax.numpy as jnp
        # PQ anchors: 0 -> 0 nits, 1.0 -> 10000 nits, ~0.58 -> ~203 nits
        assert float(pq_eotf(jnp.array(0.0))) < 1e-3
        assert abs(float(pq_eotf(jnp.array(1.0))) - 10000.0) < 1.0
        v = float(pq_eotf(jnp.array(0.5806888810416109)))
        assert abs(v - 203.0) < 2.0

    def test_hdr2sdr_white_and_black(self):
        import numpy as np
        from nunif_tpu.video.hdr import hdr2sdr_frames, TRC_PQ
        # PQ-encoded SDR reference white (203 nits) should map near SDR white
        white = np.full((1, 8, 8, 3), int(0.5807 * 65535), np.uint16)
        y = np.asarray(hdr2sdr_frames(white, trc=TRC_PQ, peak_nits=1000.0))
        assert y.dtype == np.uint8
        assert y.mean() > 190
        black = np.zeros((1, 8, 8, 3), np.uint16)
        y0 = np.asarray(hdr2sdr_frames(black, trc=TRC_PQ, peak_nits=1000.0))
        assert y0.max() <= 2
        # monotone in luminance: brighter HDR input -> brighter SDR output
        ramp = (np.linspace(0, 1, 64) * 65535).astype(np.uint16)
        frames = np.tile(ramp[None, :, None, None], (1, 1, 4, 3))
        yr = np.asarray(hdr2sdr_frames(frames, trc=TRC_PQ, peak_nits=1000.0))
        lum = yr.astype(np.float32).mean(axis=(2, 3))[0]
        assert (np.diff(lum) >= 0).all()

    def test_hlg_path(self):
        import numpy as np
        from nunif_tpu.video.hdr import hdr2sdr_frames, TRC_HLG
        x = (np.random.default_rng(0).uniform(size=(2, 8, 8, 3))
             * 255).astype(np.uint8)
        y = np.asarray(hdr2sdr_frames(x, trc=TRC_HLG, peak_nits=1000.0))
        assert y.shape == x.shape and y.dtype == np.uint8

    def test_reader_color_info_sdr(self, tmp_path):
        src = _make_video(str(tmp_path / "in.mp4"))
        r = backend.VideoReader(src)
        assert not r.is_hdr
        assert r.master_max_luminance == 0.0
        assert r.max_cll == 0
        r.close()

    def test_choose_peak_nits(self):
        from nunif_tpu.video.hdr import choose_peak_nits

        class R:
            master_max_luminance = 4000.0
            max_cll = 0
        assert choose_peak_nits(R()) == 4000.0
        R.master_max_luminance = 0.0
        R.max_cll = 800
        assert choose_peak_nits(R()) == 800.0
        R.max_cll = 0
        assert choose_peak_nits(R()) == 1000.0


class TestRobustness:
    def test_seek_and_trim(self, tmp_path):
        """--start-time/--end-time: keyframe seek + exact pts trim."""
        from nunif_tpu.video import (generate_video, process_video,
                                     VideoOutputConfig, VideoReader)
        src = str(tmp_path / "seek_in.mp4")
        n, fps = 32, 8

        def gen():
            for i in range(n):
                f = np.full((48, 64, 3), i * 7 % 255, np.uint8)
                yield f

        generate_video(src, gen(), 64, 48, fps=fps,
                       config=VideoOutputConfig(audio_copy=False))

        # raw reader seek lands at/before the target keyframe
        r = VideoReader(src)
        r.seek(2.0)
        _, pts = next(iter(r))
        assert pts <= 2.0 + 1e-3
        r.close()

        dst = str(tmp_path / "seek_out.mp4")
        process_video(src, dst, lambda b: b, batch_size=4,
                      config=VideoOutputConfig(audio_copy=False,
                                               max_fps=fps),
                      start_time=1.0, end_time=3.0)
        r = VideoReader(dst)
        count = sum(1 for _ in r)
        r.close()
        # 2 seconds @ 8fps, +-1 frame boundary tolerance
        assert 14 <= count <= 18, count

    def test_suspend_event(self, tmp_path):
        import threading
        import time as _time
        from nunif_tpu.video import (generate_video, process_video,
                                     VideoOutputConfig, VideoReader)
        src = str(tmp_path / "sus_in.mp4")
        generate_video(src, (np.full((48, 64, 3), i, np.uint8)
                             for i in range(16)), 64, 48, fps=8,
                       config=VideoOutputConfig(audio_copy=False))
        suspend = threading.Event()
        suspend.clear()  # start suspended
        done = []

        def run():
            process_video(src, str(tmp_path / "sus_out.mp4"),
                          lambda b: b, batch_size=4,
                          config=VideoOutputConfig(audio_copy=False,
                                                   max_fps=8),
                          suspend_event=suspend)
            done.append(True)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        _time.sleep(0.5)
        assert not done  # blocked while suspended
        suspend.set()
        t.join(timeout=30)
        assert done

    def test_error_flag_helpers(self, tmp_path):
        from nunif_tpu.video import (error_flag_path, write_error_flag,
                                     has_error_flag, clear_error_flag)
        out = str(tmp_path / "x.mp4")
        assert not has_error_flag(out)
        write_error_flag(out, RuntimeError("boom"))
        assert has_error_flag(out)
        with open(error_flag_path(out)) as f:
            assert "boom" in f.read()
        clear_error_flag(out)
        assert not has_error_flag(out)

    def test_rotation_applied(self, tmp_path):
        """Probed display-matrix rotation swaps dims and rotates frames."""
        from nunif_tpu.video import generate_video, VideoOutputConfig
        from nunif_tpu.video.backend import VideoReader
        src = str(tmp_path / "rot_in.mp4")
        frames = []
        for i in range(4):
            f = np.zeros((48, 64, 3), np.uint8)
            f[:8, :, 0] = 255  # red stripe at the top
            frames.append(f)
        generate_video(src, iter(frames), 64, 48, fps=8,
                       config=VideoOutputConfig(audio_copy=False))
        r = VideoReader(src)
        # no display matrix in our own encodes: simulate the probe result
        r.rotation = 90
        r._rot_k = 1
        r.width, r.height = r.height, r.width
        frame, _ = next(iter(r))
        assert frame.shape == (64, 48, 3)
        # np.rot90 CCW moves the top stripe to the left column band
        assert frame[:, :8, 0].mean() > 200
        r.close()


def test_retimer_vfr_pts_sanitization():
    """Non-monotonic VFR pts must not stall or burst the retimer."""
    from fractions import Fraction
    from nunif_tpu.video import FixedFPSRetimer
    r = FixedFPSRetimer(Fraction(10))
    out = []
    # pts goes backwards at frame 3 and repeats at frame 4
    for i, pts in enumerate([0.0, 0.1, 0.2, 0.05, 0.05, 0.4, 0.5]):
        out.extend(r(f"f{i}", pts))
    out.extend(r.flush())
    # monotonic output, no giant duplicate bursts
    assert 5 <= len(out) <= 8, out


class TestColorspace:
    def test_colorspace_tagging_and_matrix(self, tmp_path):
        # bt601 request on an HD-sized output must override the
        # height-based default tag (reference guess_target_colorspace)
        from nunif_tpu.video import generate_video, VideoOutputConfig

        def gen():
            for _ in range(6):
                f = np.full((720, 1282, 3), 128, np.uint8)
                yield f

        p = str(tmp_path / "cs.mp4")
        generate_video(p, gen(), 1282, 720, fps=12,
                       config=VideoOutputConfig(
                           codec="libx264", crf=18, colorspace="bt601-tv"))
        r = backend.VideoReader(p)
        assert r.colorspace in (5, 6)  # BT470BG / SMPTE170M
        r.close()

        p2 = str(tmp_path / "cs709.mp4")
        generate_video(p2, gen(), 1282, 720, fps=12,
                       config=VideoOutputConfig(
                           codec="libx264", crf=18, colorspace="bt709"))
        r = backend.VideoReader(p2)
        assert r.colorspace == 1  # BT709
        r.close()

    def test_pc_range_roundtrip(self, tmp_path):
        # full-range output must keep blacks at 0 and whites at 255
        from nunif_tpu.video import generate_video, VideoOutputConfig

        def gen():
            f = np.zeros((48, 64, 3), np.uint8)
            f[:, 32:] = 255
            for _ in range(6):
                yield f

        p = str(tmp_path / "pc.mp4")
        generate_video(p, gen(), 64, 48, fps=12,
                       config=VideoOutputConfig(
                           codec="libx264", crf=10, colorspace="bt601-pc"))
        r = backend.VideoReader(p)
        assert r.color_range == 2  # AVCOL_RANGE_JPEG
        f, _ = next(iter(r))
        r.close()
        assert f[:, :24].mean() < 12 and f[:, 40:].mean() > 243

    def test_10bit_pix_fmt_roundtrip(self, tmp_path):
        # yuv420p10le implies a 16-bit RGB staging surface (rgb48)
        from nunif_tpu.video import generate_video, VideoOutputConfig

        cfg = VideoOutputConfig(codec="libx264", crf=16,
                                pix_fmt="yuv420p10le")
        assert cfg.rgb48  # __post_init__ promoted the staging depth

        def gen():
            for i in range(6):
                f = np.full((48, 64, 3), 1000 * i + 3000, np.uint16)
                yield f

        p = str(tmp_path / "p10.mp4")
        generate_video(p, gen(), 64, 48, fps=12, config=cfg)
        r = backend.VideoReader(p, rgb48=True)
        frames = [(f.copy(), pts) for f, pts in r]
        r.close()
        assert len(frames) == 6
        assert frames[0][0].dtype == np.uint16
        ramp = [f.mean() for f, _ in frames]
        assert ramp[-1] > ramp[0] + 3000

    def test_copy_resolves_source_matrix(self, tmp_path):
        # process_video with colorspace="copy" tags the output with the
        # source's matrix even when the height-default differs
        from nunif_tpu.video import (process_video, generate_video,
                                     VideoOutputConfig)

        def gen():
            for _ in range(6):
                yield np.full((720, 1282, 3), 90, np.uint8)

        src = str(tmp_path / "src709.mp4")
        generate_video(src, gen(), 1282, 720, fps=12,
                       config=VideoOutputConfig(codec="libx264",
                                                colorspace="bt709"))
        dst = str(tmp_path / "dst.mp4")
        process_video(src, dst, lambda b: b,
                      config=VideoOutputConfig(codec="libx264",
                                               colorspace="copy"))
        r = backend.VideoReader(dst)
        assert r.colorspace == 1
        r.close()
