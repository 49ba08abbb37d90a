// nunif_tpu native video I/O service.
//
// Role parity target: the reference drives FFmpeg through PyAV frame-by-frame
// in Python (reference: nunif/utils/video.py:956-1151 process_video,
// :419 FixedFPSFilter, :643-894 colorspace negotiation).  Here the demux /
// decode / scale / encode / mux loop is native C++ linked directly against
// libavformat/libavcodec/libswscale, exposed to Python via a C ABI (ctypes).
//
// Differences by design:
//   * fps retiming (the reference's libavfilter "fps=" graph) is implemented
//     directly: frames are duplicated/dropped onto a fixed output tick grid
//     (no libavfilter in this environment).
//   * frames cross the ABI as packed RGB24 (or RGB48LE) buffers sized by the
//     caller — the Python side stacks them into pinned host batches for TPU.
//   * audio: packets are stream-copied from the source container and
//     interleaved with encoded video by pts.
//
// Build: native/build.sh -> libnunif_video.so
extern "C" {
#include <libavformat/avformat.h>
#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/display.h>
#include <libavutil/mastering_display_metadata.h>
#include <libswscale/swscale.h>
}

#include <cstring>
#include <string>
#include <algorithm>

#define VIO_API extern "C" __attribute__((visibility("default")))

static void set_err(char *err, int errlen, const std::string &msg) {
    if (err && errlen > 0) {
        std::snprintf(err, errlen, "%s", msg.c_str());
    }
}

static std::string averr(int code) {
    char buf[256];
    av_strerror(code, buf, sizeof(buf));
    return std::string(buf);
}

// ---------------------------------------------------------------- reader

struct VioReader {
    AVFormatContext *fmt = nullptr;
    AVCodecContext *dec = nullptr;
    SwsContext *sws = nullptr;
    AVFrame *frame = nullptr;
    AVFrame *rgb = nullptr;
    AVPacket *pkt = nullptr;
    int stream_index = -1;
    int width = 0, height = 0;
    int out_bpp = 3;          // bytes per pixel of output (3 = rgb24)
    bool use_rgb48 = false;
    bool eof_sent = false;
    bool pkt_pending = false; // packet not yet accepted by the decoder
    double duration = 0.0;
    double guessed_fps = 0.0;
    int64_t nb_frames = 0;
    int rotation = 0;
    // colorimetry (HDR metadata — role of reference nunif/utils/pyav_extra.py:6-25,
    // which read FFmpeg mastering-display / content-light side data via ctypes)
    int color_trc = AVCOL_TRC_UNSPECIFIED;
    int color_primaries = AVCOL_PRI_UNSPECIFIED;
    int colorspace = AVCOL_SPC_UNSPECIFIED;
    int color_range = AVCOL_RANGE_UNSPECIFIED;
    double master_max_luminance = 0.0;   // nits; 0 = absent
    double master_min_luminance = 0.0;
    int max_cll = 0;                     // content light level max, nits
};

VIO_API VioReader *vio_reader_open(const char *path, int rgb48,
                                   char *err, int errlen) {
    auto *r = new VioReader();
    int ret = avformat_open_input(&r->fmt, path, nullptr, nullptr);
    if (ret < 0) {
        set_err(err, errlen, "open_input: " + averr(ret));
        delete r;
        return nullptr;
    }
    if ((ret = avformat_find_stream_info(r->fmt, nullptr)) < 0) {
        set_err(err, errlen, "find_stream_info: " + averr(ret));
        avformat_close_input(&r->fmt);
        delete r;
        return nullptr;
    }
    const AVCodec *codec = nullptr;
    r->stream_index = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                          &codec, 0);
    if (r->stream_index < 0 || !codec) {
        set_err(err, errlen, "no video stream");
        avformat_close_input(&r->fmt);
        delete r;
        return nullptr;
    }
    AVStream *st = r->fmt->streams[r->stream_index];
    r->dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(r->dec, st->codecpar);
    r->dec->thread_count = 0;  // auto
    r->dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if ((ret = avcodec_open2(r->dec, codec, nullptr)) < 0) {
        set_err(err, errlen, "avcodec_open2: " + averr(ret));
        avcodec_free_context(&r->dec);
        avformat_close_input(&r->fmt);
        delete r;
        return nullptr;
    }
    r->width = r->dec->width;
    r->height = r->dec->height;
    r->use_rgb48 = rgb48 != 0;
    r->out_bpp = r->use_rgb48 ? 6 : 3;
    r->frame = av_frame_alloc();
    r->rgb = av_frame_alloc();
    r->pkt = av_packet_alloc();
    AVRational fr = av_guess_frame_rate(r->fmt, st, nullptr);
    r->guessed_fps = fr.den ? (double)fr.num / fr.den : 0.0;
    r->duration = (r->fmt->duration != AV_NOPTS_VALUE)
        ? r->fmt->duration / (double)AV_TIME_BASE : 0.0;
    r->nb_frames = st->nb_frames;
    if (!r->nb_frames && r->guessed_fps > 0 && r->duration > 0) {
        r->nb_frames = (int64_t)(r->duration * r->guessed_fps + 0.5);
    }
    // rotation side data (lavf 59 stream-level API)
    const uint8_t *dm = av_stream_get_side_data(st, AV_PKT_DATA_DISPLAYMATRIX,
                                                nullptr);
    if (dm) {
        r->rotation = (int)av_display_rotation_get((const int32_t *)dm);
    }
    // colorimetry from codec parameters (falls back to decoder context)
    r->color_trc = st->codecpar->color_trc != AVCOL_TRC_UNSPECIFIED
        ? st->codecpar->color_trc : r->dec->color_trc;
    r->color_primaries = st->codecpar->color_primaries != AVCOL_PRI_UNSPECIFIED
        ? st->codecpar->color_primaries : r->dec->color_primaries;
    r->colorspace = st->codecpar->color_space != AVCOL_SPC_UNSPECIFIED
        ? st->codecpar->color_space : r->dec->colorspace;
    r->color_range = st->codecpar->color_range;
    const uint8_t *md = av_stream_get_side_data(
        st, AV_PKT_DATA_MASTERING_DISPLAY_METADATA, nullptr);
    if (md) {
        const auto *m = (const AVMasteringDisplayMetadata *)md;
        if (m->has_luminance) {
            r->master_max_luminance = av_q2d(m->max_luminance);
            r->master_min_luminance = av_q2d(m->min_luminance);
        }
    }
    const uint8_t *cl = av_stream_get_side_data(
        st, AV_PKT_DATA_CONTENT_LIGHT_LEVEL, nullptr);
    if (cl) {
        r->max_cll = (int)((const AVContentLightMetadata *)cl)->MaxCLL;
    }
    return r;
}

VIO_API int vio_reader_color_info(VioReader *r, int *trc, int *primaries,
                                  int *space, int *range,
                                  double *master_max_lum,
                                  double *master_min_lum, int *max_cll) {
    if (!r) return -1;
    if (trc) *trc = r->color_trc;
    if (primaries) *primaries = r->color_primaries;
    if (space) *space = r->colorspace;
    if (range) *range = r->color_range;
    if (master_max_lum) *master_max_lum = r->master_max_luminance;
    if (master_min_lum) *master_min_lum = r->master_min_luminance;
    if (max_cll) *max_cll = r->max_cll;
    return 0;
}

VIO_API int vio_reader_info(VioReader *r, int *w, int *h, double *fps,
                            double *duration, long long *nb_frames,
                            int *rotation) {
    if (!r) return -1;
    if (w) *w = r->width;
    if (h) *h = r->height;
    if (fps) *fps = r->guessed_fps;
    if (duration) *duration = r->duration;
    if (nb_frames) *nb_frames = r->nb_frames;
    if (rotation) *rotation = r->rotation;
    return 0;
}

static int reader_convert(VioReader *r, uint8_t *buf, double *pts_sec) {
    AVFrame *f = r->frame;
    AVPixelFormat out_fmt = r->use_rgb48 ? AV_PIX_FMT_RGB48LE : AV_PIX_FMT_RGB24;
    r->sws = sws_getCachedContext(
        r->sws, f->width, f->height, (AVPixelFormat)f->format,
        r->width, r->height, out_fmt, SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!r->sws) return -1;
    // colorspace negotiation: tell swscale the source matrix/range.
    // BT.2020 (HDR) uses its own YCbCr matrix; the resulting RGB stays
    // PQ/HLG-encoded BT.2020 and is tone-mapped to SDR on device
    // (nunif_tpu/video/hdr.py; reference hdr2sdr nunif/utils/video.py:309).
    int cs_sel;
    switch (f->colorspace) {
    case AVCOL_SPC_BT709: cs_sel = SWS_CS_ITU709; break;
    case AVCOL_SPC_BT2020_NCL:
    case AVCOL_SPC_BT2020_CL: cs_sel = SWS_CS_BT2020; break;
    case AVCOL_SPC_UNSPECIFIED:
        cs_sel = f->height > 576 ? SWS_CS_ITU709 : SWS_CS_ITU601; break;
    default: cs_sel = SWS_CS_ITU601; break;
    }
    const int *coeffs = sws_getCoefficients(cs_sel);
    int src_range = (f->color_range == AVCOL_RANGE_JPEG) ? 1 : 0;
    sws_setColorspaceDetails(r->sws, coeffs, src_range,
                             sws_getCoefficients(SWS_CS_DEFAULT), 1,
                             0, 1 << 16, 1 << 16);
    uint8_t *dst_data[4] = {buf, nullptr, nullptr, nullptr};
    int dst_linesize[4] = {r->width * r->out_bpp, 0, 0, 0};
    sws_scale(r->sws, f->data, f->linesize, 0, f->height, dst_data, dst_linesize);
    if (pts_sec) {
        AVStream *st = r->fmt->streams[r->stream_index];
        int64_t pts = f->best_effort_timestamp != AV_NOPTS_VALUE
            ? f->best_effort_timestamp : f->pts;
        *pts_sec = (pts == AV_NOPTS_VALUE) ? -1.0
            : pts * av_q2d(st->time_base);
    }
    av_frame_unref(f);
    return 1;
}

// returns 1 = frame written to buf, 0 = eof, <0 = error
VIO_API int vio_reader_next(VioReader *r, uint8_t *buf, double *pts_sec) {
    while (true) {
        int ret = avcodec_receive_frame(r->dec, r->frame);
        if (ret == 0) return reader_convert(r, buf, pts_sec);
        if (ret == AVERROR_EOF) return 0;
        if (ret != AVERROR(EAGAIN)) return ret;
        // need more input
        while (true) {
            if (!r->pkt_pending) {
                ret = av_read_frame(r->fmt, r->pkt);
                if (ret == AVERROR_EOF) {
                    if (!r->eof_sent) {
                        avcodec_send_packet(r->dec, nullptr);
                        r->eof_sent = true;
                    }
                    break;
                }
                if (ret < 0) return ret;
                if (r->pkt->stream_index != r->stream_index) {
                    av_packet_unref(r->pkt);
                    continue;
                }
                r->pkt_pending = true;
            }
            ret = avcodec_send_packet(r->dec, r->pkt);
            if (ret == AVERROR(EAGAIN)) {
                // decoder input full: KEEP the packet pending and drain
                // frames first (dropping it here loses a frame)
                break;
            }
            r->pkt_pending = false;
            av_packet_unref(r->pkt);
            if (ret < 0) {
                // tolerate decode errors (reference safe_decode,
                // nunif/utils/video.py:941)
                continue;
            }
            break;
        }
    }
}

static void vtt_ts(FILE *f, double t) {
    if (t < 0) t = 0;
    int h = (int)(t / 3600), m = ((int)(t / 60)) % 60, s = ((int)t) % 60;
    int ms = (int)((t - (int)t) * 1000);
    fprintf(f, "%02d:%02d:%02d.%03d", h, m, s, ms);
}

// extract the best text subtitle stream as WebVTT (reference
// iw3/player/media_library.py extract_subtitle).  returns cue count,
// 0 = no subtitle stream, <0 = error
VIO_API int vio_extract_subtitles(const char *path, const char *out_path,
                                  char *err, int errlen) {
    AVFormatContext *fmt = nullptr;
    int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
    if (ret < 0) {
        set_err(err, errlen, "open_input: " + averr(ret));
        return -1;
    }
    avformat_find_stream_info(fmt, nullptr);
    const AVCodec *codec = nullptr;
    int si = av_find_best_stream(fmt, AVMEDIA_TYPE_SUBTITLE, -1, -1,
                                 &codec, 0);
    if (si < 0 || !codec) {
        avformat_close_input(&fmt);
        return 0;
    }
    AVCodecContext *dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(dec, fmt->streams[si]->codecpar);
    if (avcodec_open2(dec, codec, nullptr) < 0) {
        avcodec_free_context(&dec);
        avformat_close_input(&fmt);
        return 0;  // bitmap subs (pgs/dvd) etc: treat as none
    }
    FILE *f = fopen(out_path, "w");
    if (!f) {
        set_err(err, errlen, "cannot write vtt");
        avcodec_free_context(&dec);
        avformat_close_input(&fmt);
        return -1;
    }
    fprintf(f, "WEBVTT\n\n");
    AVPacket *pkt = av_packet_alloc();
    AVRational tb = fmt->streams[si]->time_base;
    int count = 0;
    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index == si) {
            AVSubtitle sub;
            int got = 0;
            if (avcodec_decode_subtitle2(dec, &sub, &got, pkt) >= 0 && got) {
                double start = (pkt->pts != AV_NOPTS_VALUE
                                ? pkt->pts * av_q2d(tb) : 0.0)
                    + sub.start_display_time / 1000.0;
                double dur = pkt->duration > 0
                    ? pkt->duration * av_q2d(tb)
                    : (sub.end_display_time - sub.start_display_time) / 1000.0;
                if (dur <= 0) dur = 3.0;
                std::string text;
                for (unsigned i = 0; i < sub.num_rects; i++) {
                    AVSubtitleRect *r = sub.rects[i];
                    if (r->type == SUBTITLE_TEXT && r->text) {
                        if (!text.empty()) text += "\n";
                        text += r->text;
                    } else if (r->type == SUBTITLE_ASS && r->ass) {
                        // ass event line: ReadOrder,Layer,Style,Name,
                        // MarginL,MarginR,MarginV,Effect,Text
                        const char *p = r->ass;
                        int commas = 0;
                        while (*p && commas < 8) {
                            if (*p == ',') commas++;
                            p++;
                        }
                        if (*p) {
                            std::string t(p);
                            size_t pos;
                            while ((pos = t.find("\\N")) != std::string::npos)
                                t.replace(pos, 2, "\n");
                            if (!text.empty()) text += "\n";
                            text += t;
                        }
                    }
                }
                if (!text.empty()) {
                    vtt_ts(f, start);
                    fprintf(f, " --> ");
                    vtt_ts(f, start + dur);
                    fprintf(f, "\n%s\n\n", text.c_str());
                    count++;
                }
                avsubtitle_free(&sub);
            }
        }
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    fclose(f);
    avcodec_free_context(&dec);
    avformat_close_input(&fmt);
    return count;
}

// seek to ~seconds (keyframe-backward); caller discards frames with
// pts < target.  returns 0 on success, <0 on error
VIO_API int vio_reader_seek(VioReader *r, double seconds) {
    int64_t ts = (int64_t)(seconds * AV_TIME_BASE);
    int ret = av_seek_frame(r->fmt, -1, ts, AVSEEK_FLAG_BACKWARD);
    if (ret < 0) return ret;
    avcodec_flush_buffers(r->dec);
    r->eof_sent = false;
    if (r->pkt_pending) {
        av_packet_unref(r->pkt);
        r->pkt_pending = false;
    }
    return 0;
}

VIO_API void vio_reader_close(VioReader *r) {
    if (!r) return;
    if (r->sws) sws_freeContext(r->sws);
    av_frame_free(&r->frame);
    av_frame_free(&r->rgb);
    av_packet_free(&r->pkt);
    avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
}

// ---------------------------------------------------------------- writer

struct VioWriter {
    AVFormatContext *fmt = nullptr;
    AVCodecContext *enc = nullptr;
    AVStream *vstream = nullptr;
    SwsContext *sws = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *pkt = nullptr;
    int width = 0, height = 0;
    int in_bpp = 3;
    int sws_cs = 0;            // SWS_CS_* matrix for rgb->yuv (0 = by height)
    int out_range_full = 0;    // 1 = pc/full range output
    int64_t next_pts = 0;
    // audio copy
    AVFormatContext *afmt = nullptr;
    AVStream *astream_in = nullptr;
    AVStream *astream_out = nullptr;
    AVPacket *apkt = nullptr;
    bool audio_eof = true;
    bool header_written = false;
};

static int writer_flush_audio(VioWriter *w, double upto_sec);

VIO_API VioWriter *vio_writer_open(const char *path, int width, int height,
                                   int fps_num, int fps_den,
                                   const char *codec_name, const char *pix_fmt,
                                   const char *preset, int crf, int rgb48,
                                   const char *audio_source,
                                   const char *extra_opts,
                                   char *err, int errlen) {
    auto *w = new VioWriter();
    w->width = width;
    w->height = height;
    w->in_bpp = rgb48 ? 6 : 3;
    int ret = avformat_alloc_output_context2(&w->fmt, nullptr, nullptr, path);
    if (ret < 0 || !w->fmt) {
        set_err(err, errlen, "alloc_output: " + averr(ret));
        delete w;
        return nullptr;
    }
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) {
        set_err(err, errlen, std::string("encoder not found: ") + codec_name);
        avformat_free_context(w->fmt);
        delete w;
        return nullptr;
    }
    w->enc = avcodec_alloc_context3(codec);
    w->enc->width = width;
    w->enc->height = height;
    w->enc->time_base = AVRational{fps_den, fps_num};
    w->enc->framerate = AVRational{fps_num, fps_den};
    AVPixelFormat pf = av_get_pix_fmt(pix_fmt && pix_fmt[0] ? pix_fmt : "yuv420p");
    w->enc->pix_fmt = pf == AV_PIX_FMT_NONE ? AV_PIX_FMT_YUV420P : pf;
    if (height > 576) {
        w->enc->colorspace = AVCOL_SPC_BT709;
        w->enc->color_primaries = AVCOL_PRI_BT709;
        w->enc->color_trc = AVCOL_TRC_BT709;
    } else {
        w->enc->colorspace = AVCOL_SPC_SMPTE170M;
    }
    w->sws_cs = height > 576 ? SWS_CS_ITU709 : SWS_CS_ITU601;
    if (w->fmt->oformat->flags & AVFMT_GLOBALHEADER) {
        w->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    }
    if (preset && preset[0]) {
        av_opt_set(w->enc->priv_data, "preset", preset, 0);
    }
    if (crf >= 0) {
        av_opt_set_int(w->enc->priv_data, "crf", crf, 0);
    }
    // generic "k=v,k=v" encoder options: gop (keyframe interval in
    // frames), b (bitrate in bps), tune/profile/level/x264-params/...
    if (extra_opts && extra_opts[0]) {
        std::string opts(extra_opts);
        size_t pos = 0;
        while (pos < opts.size()) {
            size_t comma = opts.find(',', pos);
            std::string kv = opts.substr(pos, comma == std::string::npos
                                         ? std::string::npos : comma - pos);
            pos = comma == std::string::npos ? opts.size() : comma + 1;
            size_t eq = kv.find('=');
            if (eq == std::string::npos) continue;
            std::string k = kv.substr(0, eq), v = kv.substr(eq + 1);
            if (k == "gop") {
                w->enc->gop_size = atoi(v.c_str());
            } else if (k == "b") {
                w->enc->bit_rate = atoll(v.c_str());
            } else if (k == "colorspace") {
                // negotiated target matrix: tag the stream AND use the
                // matching rgb->yuv coefficients (reference
                // nunif/utils/video.py:643-894 guess_target_colorspace)
                if (v == "bt709") {
                    w->enc->colorspace = AVCOL_SPC_BT709;
                    w->enc->color_primaries = AVCOL_PRI_BT709;
                    w->enc->color_trc = AVCOL_TRC_BT709;
                    w->sws_cs = SWS_CS_ITU709;
                } else if (v == "bt601") {
                    w->enc->colorspace = AVCOL_SPC_SMPTE170M;
                    w->enc->color_primaries = AVCOL_PRI_SMPTE170M;
                    w->enc->color_trc = AVCOL_TRC_SMPTE170M;
                    w->sws_cs = SWS_CS_ITU601;
                }
            } else if (k == "range") {
                w->out_range_full = (v == "pc" || v == "full") ? 1 : 0;
                w->enc->color_range = w->out_range_full
                    ? AVCOL_RANGE_JPEG : AVCOL_RANGE_MPEG;
            } else if (av_opt_set(w->enc->priv_data, k.c_str(), v.c_str(),
                                  0) < 0) {
                av_opt_set(w->enc, k.c_str(), v.c_str(), 0);
            }
        }
    }
    if ((ret = avcodec_open2(w->enc, codec, nullptr)) < 0) {
        set_err(err, errlen, "encoder open: " + averr(ret));
        avcodec_free_context(&w->enc);
        avformat_free_context(w->fmt);
        delete w;
        return nullptr;
    }
    w->vstream = avformat_new_stream(w->fmt, nullptr);
    avcodec_parameters_from_context(w->vstream->codecpar, w->enc);
    w->vstream->time_base = w->enc->time_base;

    // audio stream copy (reference keeps source audio, video.py:1005-1023)
    if (audio_source && audio_source[0]) {
        if (avformat_open_input(&w->afmt, audio_source, nullptr, nullptr) == 0 &&
            avformat_find_stream_info(w->afmt, nullptr) >= 0) {
            int ai = av_find_best_stream(w->afmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                         nullptr, 0);
            if (ai >= 0) {
                w->astream_in = w->afmt->streams[ai];
                w->astream_out = avformat_new_stream(w->fmt, nullptr);
                avcodec_parameters_copy(w->astream_out->codecpar,
                                        w->astream_in->codecpar);
                w->astream_out->codecpar->codec_tag = 0;
                w->astream_out->time_base = w->astream_in->time_base;
                w->apkt = av_packet_alloc();
                w->audio_eof = false;
            } else {
                avformat_close_input(&w->afmt);
            }
        } else if (w->afmt) {
            avformat_close_input(&w->afmt);
        }
    }

    if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) {
        if ((ret = avio_open(&w->fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
            set_err(err, errlen, "avio_open: " + averr(ret));
            avcodec_free_context(&w->enc);
            avformat_free_context(w->fmt);
            delete w;
            return nullptr;
        }
    }
    if ((ret = avformat_write_header(w->fmt, nullptr)) < 0) {
        set_err(err, errlen, "write_header: " + averr(ret));
        avcodec_free_context(&w->enc);
        avformat_free_context(w->fmt);
        delete w;
        return nullptr;
    }
    w->header_written = true;
    w->frame = av_frame_alloc();
    w->frame->format = w->enc->pix_fmt;
    w->frame->width = width;
    w->frame->height = height;
    av_frame_get_buffer(w->frame, 0);
    w->pkt = av_packet_alloc();
    return w;
}

static int writer_send(VioWriter *w, AVFrame *frame) {
    int ret = avcodec_send_frame(w->enc, frame);
    if (ret < 0) return ret;
    while (true) {
        ret = avcodec_receive_packet(w->enc, w->pkt);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
        if (ret < 0) return ret;
        // one frame tick: without it the mp4 muxer's edit list ends at the
        // LAST sample's dts and the demuxer discards that sample on decode
        if (w->pkt->duration == 0) w->pkt->duration = 1;
        av_packet_rescale_ts(w->pkt, w->enc->time_base, w->vstream->time_base);
        w->pkt->stream_index = w->vstream->index;
        ret = av_interleaved_write_frame(w->fmt, w->pkt);
        if (ret < 0) return ret;
    }
}

static int writer_flush_audio(VioWriter *w, double upto_sec) {
    if (!w->astream_in || w->audio_eof) return 0;
    while (true) {
        int ret = av_read_frame(w->afmt, w->apkt);
        if (ret == AVERROR_EOF) {
            w->audio_eof = true;
            return 0;
        }
        if (ret < 0) return ret;
        if (w->apkt->stream_index != w->astream_in->index) {
            av_packet_unref(w->apkt);
            continue;
        }
        double pts = w->apkt->pts == AV_NOPTS_VALUE ? 0.0
            : w->apkt->pts * av_q2d(w->astream_in->time_base);
        av_packet_rescale_ts(w->apkt, w->astream_in->time_base,
                             w->astream_out->time_base);
        w->apkt->stream_index = w->astream_out->index;
        w->apkt->pos = -1;
        ret = av_interleaved_write_frame(w->fmt, w->apkt);
        if (ret < 0) return ret;
        if (upto_sec >= 0 && pts > upto_sec) return 0;
    }
}

VIO_API int vio_writer_write(VioWriter *w, const uint8_t *rgb) {
    AVPixelFormat in_fmt = (w->in_bpp == 6) ? AV_PIX_FMT_RGB48LE : AV_PIX_FMT_RGB24;
    w->sws = sws_getCachedContext(
        w->sws, w->width, w->height, in_fmt,
        w->width, w->height, w->enc->pix_fmt, SWS_BILINEAR,
        nullptr, nullptr, nullptr);
    // rgb -> yuv with the negotiated target matrix/range
    sws_setColorspaceDetails(
        w->sws, sws_getCoefficients(SWS_CS_DEFAULT), 1,
        sws_getCoefficients(w->sws_cs ? w->sws_cs
                            : (w->height > 576 ? SWS_CS_ITU709
                                               : SWS_CS_ITU601)),
        w->out_range_full, 0, 1 << 16, 1 << 16);
    const uint8_t *src_data[4] = {rgb, nullptr, nullptr, nullptr};
    int src_linesize[4] = {w->width * w->in_bpp, 0, 0, 0};
    av_frame_make_writable(w->frame);
    sws_scale(w->sws, src_data, src_linesize, 0, w->height,
              w->frame->data, w->frame->linesize);
    w->frame->pts = w->next_pts++;
    int ret = writer_send(w, w->frame);
    if (ret < 0) return ret;
    double sec = w->frame->pts * av_q2d(w->enc->time_base);
    return writer_flush_audio(w, sec);
}

VIO_API int vio_writer_close(VioWriter *w) {
    if (!w) return -1;
    int ret = 0;
    if (w->header_written) {
        writer_send(w, nullptr);       // flush encoder
        writer_flush_audio(w, -1.0);   // drain remaining audio
        ret = av_write_trailer(w->fmt);
    }
    if (w->sws) sws_freeContext(w->sws);
    av_frame_free(&w->frame);
    av_packet_free(&w->pkt);
    av_packet_free(&w->apkt);
    avcodec_free_context(&w->enc);
    if (w->afmt) avformat_close_input(&w->afmt);
    if (w->fmt) {
        if (!(w->fmt->oformat->flags & AVFMT_NOFILE) && w->fmt->pb) {
            avio_closep(&w->fmt->pb);
        }
        avformat_free_context(w->fmt);
    }
    delete w;
    return ret;
}

VIO_API const char *vio_version() {
    static char buf[128];
    std::snprintf(buf, sizeof(buf), "nunif_video 1.0 (lavf %d.%d lavc %d.%d)",
                  LIBAVFORMAT_VERSION_MAJOR, LIBAVFORMAT_VERSION_MINOR,
                  LIBAVCODEC_VERSION_MAJOR, LIBAVCODEC_VERSION_MINOR);
    return buf;
}

VIO_API int vio_encoder_available(const char *name) {
    return avcodec_find_encoder_by_name(name) != nullptr;
}
