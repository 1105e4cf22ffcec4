// H.265 encode/decode via the system libavcodec (FFmpeg 5.x API) — the
// native counterpart of lib/video/h265/{encoder,decoder}.c, which link
// libav* the same way. Exposes a minimal C API for ctypes: one RGB24 frame
// in -> encoded packet(s) out (low-latency x265), and packets in -> RGB24
// frames out (per-client server decode context, session/h265/server.c).
//
// Build: g++ -O3 -shared -fPIC -o libavshim.so avshim.cpp \
//            -lavcodec -lavutil -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <climits>
#include <cstdint>
#include <cstring>
#include <string>

namespace {

struct Enc {
  AVCodecContext* ctx;
  AVFrame* frame;
  AVPacket* pkt;
  SwsContext* sws;
  int64_t pts;
  bool pending;  // e->pkt holds a drained packet that did not fit the caller's buffer
};

struct Dec {
  AVCodecContext* ctx;
  AVFrame* frame;
  AVPacket* pkt;
  SwsContext* sws;
  int w, h;
  uint8_t* rgb[4];      // av_image_alloc'd, aligned+padded for sws SIMD
  int rgb_stride[4];
};

}  // namespace

extern "C" {

// Open a SPECIFIC HEVC encoder implementation by name ("" => default
// chain). The ordered hardware->software probe (hevc_vaapi -> hevc_nvenc ->
// hevc_qsv -> hevc_videotoolbox -> libx265) lives in runtime/codecs.py,
// mirroring the reference's by-name encoder probe + lazy open
// (lib/video/h265/encoder.c:67-84,116-118): each candidate is proven by an
// actual avcodec_open2, so a present-but-unusable hw encoder (no device)
// falls through gracefully.
void* ac_h265_enc_open_named(const char* name, int w, int h, int fps,
                             int crf, int keyint) {
  const AVCodec* codec = nullptr;
  if (name && name[0]) {
    codec = avcodec_find_encoder_by_name(name);
    if (!codec) return nullptr;
  } else {
    codec = avcodec_find_encoder_by_name("libx265");
    if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_HEVC);
  }
  if (!codec) return nullptr;
  Enc* e = new Enc{};
  e->ctx = avcodec_alloc_context3(codec);
  if (!e->ctx) {
    delete e;
    return nullptr;
  }
  e->ctx->width = w;
  e->ctx->height = h;
  e->ctx->time_base = AVRational{1, fps > 0 ? fps : 30};
  e->ctx->framerate = AVRational{fps > 0 ? fps : 30, 1};
  e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
  e->ctx->gop_size = keyint;
  e->ctx->max_b_frames = 0;  // zero-latency: no reordering
  char params[160];
  snprintf(params, sizeof(params),
           "crf=%d:keyint=%d:repeat-headers=1:log-level=none", crf, keyint);
  av_opt_set(e->ctx->priv_data, "preset", "ultrafast", 0);
  av_opt_set(e->ctx->priv_data, "tune", "zerolatency", 0);
  av_opt_set(e->ctx->priv_data, "x265-params", params, 0);
  av_log_set_level(AV_LOG_QUIET);
  if (avcodec_open2(e->ctx, codec, nullptr) < 0) {
    avcodec_free_context(&e->ctx);
    delete e;
    return nullptr;
  }
  e->frame = av_frame_alloc();
  if (e->frame) {
    e->frame->format = AV_PIX_FMT_YUV420P;
    e->frame->width = w;
    e->frame->height = h;
  }
  e->pkt = av_packet_alloc();
  e->sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                          SWS_POINT, nullptr, nullptr, nullptr);
  // the probe chain's graceful-fallback contract: a handle is returned
  // ONLY fully armed — a null frame buffer / packet / SwsContext here
  // would segfault the first ac_h265_enc_frame instead of letting the
  // prober fall through to the next encoder
  if (!e->frame || !e->pkt || !e->sws ||
      av_frame_get_buffer(e->frame, 0) < 0) {
    avcodec_free_context(&e->ctx);
    av_frame_free(&e->frame);
    av_packet_free(&e->pkt);
    sws_freeContext(e->sws);
    delete e;
    return nullptr;
  }
  e->pts = 0;
  return e;
}

void* ac_h265_enc_open(int w, int h, int fps, int crf, int keyint) {
  return ac_h265_enc_open_named("", w, h, fps, crf, keyint);
}

// Drain encoded packets into out as u32le length-prefixed records.
// Returns bytes written (>= 0) when the encoder is drained. If a packet
// does not fit the remaining buffer it is KEPT (never silently dropped —
// a lost mid-GOP packet would corrupt the stream until the next keyframe)
// and the return value is -(bytes_written + 2): the caller's first
// (-rv - 2) bytes are valid records, and ac_h265_enc_drain must be called
// (with a larger buffer) to fetch the rest. -1 is a genuine error.
static long enc_emit(Enc* e, uint8_t* out, long cap) {
  long at = 0;
  while (true) {
    if (!e->pending) {
      int rc = avcodec_receive_packet(e->ctx, e->pkt);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
      if (rc < 0) return -1;
      e->pending = true;
    }
    if (at + 4 + e->pkt->size > cap) return -(at + 2);
    uint32_t n = (uint32_t)e->pkt->size;
    memcpy(out + at, &n, 4);
    memcpy(out + at + 4, e->pkt->data, e->pkt->size);
    at += 4 + e->pkt->size;
    av_packet_unref(e->pkt);
    e->pending = false;
  }
  return at;
}

// Feed one RGB24 frame; drained packets are concatenated into out as
// u32le length-prefixed records. Returns total bytes written, -1 on error,
// or -(written + 2) if a packet did not fit (see enc_emit).
long ac_h265_enc_frame(void* h, const uint8_t* rgb, uint8_t* out, long cap) {
  Enc* e = (Enc*)h;
  const uint8_t* src[1] = {rgb};
  int stride[1] = {e->ctx->width * 3};
  av_frame_make_writable(e->frame);
  sws_scale(e->sws, src, stride, 0, e->ctx->height, e->frame->data,
            e->frame->linesize);
  e->frame->pts = e->pts++;
  if (avcodec_send_frame(e->ctx, e->frame) < 0) return -1;
  return enc_emit(e, out, cap);
}

// Continue draining after an overflow return from ac_h265_enc_frame.
long ac_h265_enc_drain(void* h, uint8_t* out, long cap) {
  return enc_emit((Enc*)h, out, cap);
}

void ac_h265_enc_close(void* h) {
  Enc* e = (Enc*)h;
  if (!e) return;
  avcodec_free_context(&e->ctx);
  av_frame_free(&e->frame);
  av_packet_free(&e->pkt);
  sws_freeContext(e->sws);
  delete e;
}

void* ac_h265_dec_open(int w, int h) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_HEVC);
  if (!codec) return nullptr;
  Dec* d = new Dec{};
  d->ctx = avcodec_alloc_context3(codec);
  if (avcodec_open2(d->ctx, codec, nullptr) < 0) {
    avcodec_free_context(&d->ctx);
    delete d;
    return nullptr;
  }
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();
  d->sws = nullptr;
  d->w = w;
  d->h = h;
  if (av_image_alloc(d->rgb, d->rgb_stride, w, h, AV_PIX_FMT_RGB24, 32) < 0) {
    avcodec_free_context(&d->ctx);
    delete d;
    return nullptr;
  }
  return d;
}

// Feed one encoded packet; decoded frames are written back-to-back as
// RGB24 (w*h*3 each, scaled to the declared dims). Returns frame count, -1.
long ac_h265_dec_packet(void* h, const uint8_t* data, long len, uint8_t* out,
                        long cap) {
  Dec* d = (Dec*)h;
  av_packet_unref(d->pkt);
  // len is attacker-influenced (per-client server decode path): a value
  // past INT_MAX would truncate in av_new_packet while the memcpy below
  // still copied the full long — a heap overflow, not just a bad packet
  if (len < 0 || len > INT_MAX) return -1;
  if (av_new_packet(d->pkt, (int)len) < 0) return -1;
  memcpy(d->pkt->data, data, len);
  if (avcodec_send_packet(d->ctx, d->pkt) < 0) return -1;
  long frames = 0;
  long frame_bytes = (long)d->w * d->h * 3;
  while (true) {
    int rc = avcodec_receive_frame(d->ctx, d->frame);
    if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
    if (rc < 0) return -1;
    if ((frames + 1) * frame_bytes > cap) break;
    // Cached context: the bitstream (attacker-controlled on the server's
    // per-client decode path) may change resolution or pixel format
    // mid-stream without the header-declared dims changing; feeding such a
    // frame into a stale SwsContext reads out of bounds. getCachedContext
    // rebuilds whenever the source geometry/format differs.
    d->sws = sws_getCachedContext(d->sws, d->frame->width, d->frame->height,
                                  (AVPixelFormat)d->frame->format, d->w, d->h,
                                  AV_PIX_FMT_RGB24, SWS_POINT, nullptr,
                                  nullptr, nullptr);
    if (!d->sws) return -1;
    sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, d->frame->height,
              d->rgb, d->rgb_stride);
    uint8_t* dst = out + frames * frame_bytes;
    for (int y = 0; y < d->h; ++y)
      memcpy(dst + (long)y * d->w * 3, d->rgb[0] + (long)y * d->rgb_stride[0],
             (size_t)d->w * 3);
    frames++;
  }
  return frames;
}

void ac_h265_dec_close(void* h) {
  Dec* d = (Dec*)h;
  if (!d) return;
  avcodec_free_context(&d->ctx);
  av_frame_free(&d->frame);
  av_packet_free(&d->pkt);
  if (d->sws) sws_freeContext(d->sws);
  av_freep(&d->rgb[0]);
  delete d;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Media file demux+decode (lib/media/ffmpeg_decoder.c analog): any container
// libavformat knows -> RGB24 frames, with native fps reported for pacing.

extern "C" {
#include <libavformat/avformat.h>
}

namespace {

struct Media {
  AVFormatContext* fmt;
  AVCodecContext* dec;
  AVFrame* frame;
  AVPacket* pkt;
  SwsContext* sws;
  int stream;
  int w, h;
  double fps;
  uint8_t* rgb[4];
  int rgb_stride[4];
};

}  // namespace

extern "C" {

void* ac_media_open(const char* path) {
  av_log_set_level(AV_LOG_QUIET);
  Media* m = new Media{};
  if (avformat_open_input(&m->fmt, path, nullptr, nullptr) < 0) {
    delete m;
    return nullptr;
  }
  if (avformat_find_stream_info(m->fmt, nullptr) < 0) goto fail;
  m->stream = av_find_best_stream(m->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (m->stream < 0) goto fail;
  {
    AVStream* st = m->fmt->streams[m->stream];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) goto fail;
    m->dec = avcodec_alloc_context3(codec);
    if (!m->dec) goto fail;
    avcodec_parameters_to_context(m->dec, st->codecpar);
    if (avcodec_open2(m->dec, codec, nullptr) < 0) goto fail;
    m->w = m->dec->width;
    m->h = m->dec->height;
    AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
    m->fps = r.den ? (double)r.num / r.den : 30.0;
    m->frame = av_frame_alloc();
    m->pkt = av_packet_alloc();
    m->sws = nullptr;
    if (av_image_alloc(m->rgb, m->rgb_stride, m->w, m->h, AV_PIX_FMT_RGB24,
                       32) < 0)
      goto fail;
  }
  return m;
fail:
  if (m->dec) avcodec_free_context(&m->dec);
  if (m->frame) av_frame_free(&m->frame);  // alloc'd before av_image_alloc
  if (m->pkt) av_packet_free(&m->pkt);     // can still send us here
  avformat_close_input(&m->fmt);
  delete m;
  return nullptr;
}

int ac_media_width(void* h) { return ((Media*)h)->w; }
int ac_media_height(void* h) { return ((Media*)h)->h; }
double ac_media_fps(void* h) { return ((Media*)h)->fps; }

// -> 1 frame written (w*h*3 RGB24), 0 end-of-stream, -1 error
int ac_media_read_frame(void* h, uint8_t* out) {
  Media* m = (Media*)h;
  while (true) {
    int rc = avcodec_receive_frame(m->dec, m->frame);
    if (rc == 0) {
      // cached: container streams can switch dims/format mid-file too
      m->sws = sws_getCachedContext(m->sws, m->frame->width, m->frame->height,
                                    (AVPixelFormat)m->frame->format, m->w,
                                    m->h, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                                    nullptr, nullptr, nullptr);
      if (!m->sws) return -1;
      sws_scale(m->sws, m->frame->data, m->frame->linesize, 0,
                m->frame->height, m->rgb, m->rgb_stride);
      for (int y = 0; y < m->h; ++y)
        memcpy(out + (long)y * m->w * 3, m->rgb[0] + (long)y * m->rgb_stride[0],
               (size_t)m->w * 3);
      return 1;
    }
    if (rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) return -1;
    if (rc == AVERROR_EOF) return 0;
    // need more input
    while (true) {
      int prc = av_read_frame(m->fmt, m->pkt);
      if (prc < 0) {
        avcodec_send_packet(m->dec, nullptr);  // flush
        break;
      }
      if (m->pkt->stream_index == m->stream) {
        avcodec_send_packet(m->dec, m->pkt);
        av_packet_unref(m->pkt);
        break;
      }
      av_packet_unref(m->pkt);
    }
  }
}

int ac_media_rewind(void* h) {
  Media* m = (Media*)h;
  if (av_seek_frame(m->fmt, m->stream, 0, AVSEEK_FLAG_BACKWARD) < 0) return -1;
  avcodec_flush_buffers(m->dec);
  return 0;
}

void ac_media_close(void* h) {
  Media* m = (Media*)h;
  if (!m) return;
  if (m->dec) avcodec_free_context(&m->dec);
  if (m->fmt) avformat_close_input(&m->fmt);
  if (m->frame) av_frame_free(&m->frame);
  if (m->pkt) av_packet_free(&m->pkt);
  if (m->sws) sws_freeContext(m->sws);
  av_freep(&m->rgb[0]);
  delete m;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Container recorder (lib/media/ffmpeg_encoder.c analog): encoder + muxer in
// one handle so --render-file can write real containers (.mp4/.mkv/...)
// without the ffmpeg CLI. GLOBAL_HEADER extradata flows into codecpar the
// way the mp4/mkv muxers require.

namespace {

struct Rec {
  AVFormatContext* fmt;
  AVCodecContext* enc;
  AVStream* st;
  AVFrame* frame;
  AVPacket* pkt;
  SwsContext* sws;
  int64_t pts;
  // optional audio track (AAC), fed as float mono samples
  AVCodecContext* aenc;
  AVStream* ast;
  AVFrame* aframe;
  float* abuf;
  int abuf_len;   // samples buffered toward one AAC frame
  int aframe_size;
  int64_t apts;
};

}  // namespace

extern "C" {

void* ac_rec_open(const char* path, int w, int h, int fps, int crf,
                  int audio_rate) {
  av_log_set_level(AV_LOG_QUIET);
  Rec* r = new Rec{};
  if (avformat_alloc_output_context2(&r->fmt, nullptr, nullptr, path) < 0 ||
      !r->fmt) {
    delete r;
    return nullptr;
  }
  const AVCodec* codec = avcodec_find_encoder_by_name("libx265");
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_HEVC);
  if (!codec) goto fail;
  r->enc = avcodec_alloc_context3(codec);
  if (!r->enc) goto fail;
  r->enc->width = w;
  r->enc->height = h;
  r->enc->time_base = AVRational{1, fps > 0 ? fps : 30};
  r->enc->framerate = AVRational{fps > 0 ? fps : 30, 1};
  r->enc->pix_fmt = AV_PIX_FMT_YUV420P;
  r->enc->max_b_frames = 0;
  {
    char params[160];
    snprintf(params, sizeof(params), "crf=%d:log-level=none", crf);
    av_opt_set(r->enc->priv_data, "preset", "ultrafast", 0);
    av_opt_set(r->enc->priv_data, "x265-params", params, 0);
  }
  if (r->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    r->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(r->enc, codec, nullptr) < 0) goto fail;
  r->st = avformat_new_stream(r->fmt, codec);
  if (!r->st) goto fail;
  avcodec_parameters_from_context(r->st->codecpar, r->enc);
  r->st->time_base = r->enc->time_base;
  if (!(r->fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&r->fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    goto fail;
  if (audio_rate > 0) {
    const AVCodec* ac = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (ac) {
      r->aenc = avcodec_alloc_context3(ac);
      r->aenc->sample_rate = audio_rate;
      av_channel_layout_default(&r->aenc->ch_layout, 1);
      r->aenc->sample_fmt = AV_SAMPLE_FMT_FLTP;  // mono planar == packed
      r->aenc->bit_rate = 96000;
      r->aenc->time_base = AVRational{1, audio_rate};
      if (r->fmt->oformat->flags & AVFMT_GLOBALHEADER)
        r->aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
      if (avcodec_open2(r->aenc, ac, nullptr) == 0 &&
          (r->ast = avformat_new_stream(r->fmt, ac)) != nullptr &&
          (r->aframe = av_frame_alloc()) != nullptr) {
        avcodec_parameters_from_context(r->ast->codecpar, r->aenc);
        r->ast->time_base = r->aenc->time_base;
        r->aframe_size = r->aenc->frame_size > 0 ? r->aenc->frame_size : 1024;
        r->aframe->format = AV_SAMPLE_FMT_FLTP;
        r->aframe->nb_samples = r->aframe_size;
        av_channel_layout_default(&r->aframe->ch_layout, 1);
        r->abuf = (float*)av_malloc(sizeof(float) * r->aframe_size);
        if (av_frame_get_buffer(r->aframe, 0) < 0 || !r->abuf) goto fail;
        r->abuf_len = 0;
        r->apts = 0;
      } else {
        // audio is best-effort: a missing/unopenable AAC encoder or failed
        // stream alloc downgrades to video-only, it must not fail the open
        avcodec_free_context(&r->aenc);
        r->ast = nullptr;
      }
    }
  }
  if (avformat_write_header(r->fmt, nullptr) < 0) goto fail;
  r->frame = av_frame_alloc();
  if (!r->frame) goto fail;
  r->frame->format = AV_PIX_FMT_YUV420P;
  r->frame->width = w;
  r->frame->height = h;
  r->pkt = av_packet_alloc();
  r->sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                          SWS_POINT, nullptr, nullptr, nullptr);
  if (av_frame_get_buffer(r->frame, 0) < 0 || !r->pkt || !r->sws) goto fail;
  r->pts = 0;
  return r;
fail:
  // free EVERYTHING that may exist by any goto above — notably the opened
  // avio handle and the audio objects, which a failed write_header (e.g. a
  // container that rejects HEVC) previously leaked along with its open fd
  if (r->enc) avcodec_free_context(&r->enc);
  if (r->aenc) avcodec_free_context(&r->aenc);
  if (r->aframe) av_frame_free(&r->aframe);
  if (r->abuf) av_freep(&r->abuf);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->sws) sws_freeContext(r->sws);
  if (r->fmt) {
    if (r->fmt->pb && !(r->fmt->oformat->flags & AVFMT_NOFILE))
      avio_closep(&r->fmt->pb);
    avformat_free_context(r->fmt);
  }
  delete r;
  return nullptr;
}

static int rec_drain_ctx(Rec* r, AVCodecContext* ctx, AVStream* st) {
  while (true) {
    int rc = avcodec_receive_packet(ctx, r->pkt);
    if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
    if (rc < 0) return -1;
    av_packet_rescale_ts(r->pkt, ctx->time_base, st->time_base);
    r->pkt->stream_index = st->index;
    if (av_interleaved_write_frame(r->fmt, r->pkt) < 0) return -1;
  }
}

static int rec_drain(Rec* r) { return rec_drain_ctx(r, r->enc, r->st); }

// feed mono float samples; buffers into encoder-sized AAC frames
int ac_rec_audio(void* h, const float* samples, long n) {
  Rec* r = (Rec*)h;
  if (!r->aenc) return -1;
  long at = 0;
  while (at < n) {
    long take = r->aframe_size - r->abuf_len;
    if (take > n - at) take = n - at;
    memcpy(r->abuf + r->abuf_len, samples + at, sizeof(float) * take);
    r->abuf_len += (int)take;
    at += take;
    if (r->abuf_len == r->aframe_size) {
      av_frame_make_writable(r->aframe);
      memcpy(r->aframe->data[0], r->abuf, sizeof(float) * r->aframe_size);
      r->aframe->pts = r->apts;
      r->apts += r->aframe_size;
      if (avcodec_send_frame(r->aenc, r->aframe) < 0) return -1;
      if (rec_drain_ctx(r, r->aenc, r->ast) < 0) return -1;
      r->abuf_len = 0;
    }
  }
  return 0;
}

int ac_rec_frame(void* h, const uint8_t* rgb) {
  Rec* r = (Rec*)h;
  const uint8_t* src[1] = {rgb};
  int stride[1] = {r->enc->width * 3};
  av_frame_make_writable(r->frame);
  sws_scale(r->sws, src, stride, 0, r->enc->height, r->frame->data,
            r->frame->linesize);
  r->frame->pts = r->pts++;
  if (avcodec_send_frame(r->enc, r->frame) < 0) return -1;
  return rec_drain(r);
}

int ac_rec_close(void* h) {
  Rec* r = (Rec*)h;
  if (!r) return -1;
  avcodec_send_frame(r->enc, nullptr);  // flush video
  int rc = rec_drain(r);
  if (r->aenc) {
    if (r->abuf_len > 0) {
      // encode the buffered remainder as a short final frame — dropping it
      // truncates up to ~21 ms of audio at the end of every recording
      av_frame_make_writable(r->aframe);
      r->aframe->nb_samples = r->abuf_len;
      memcpy(r->aframe->data[0], r->abuf, sizeof(float) * r->abuf_len);
      r->aframe->pts = r->apts;
      r->apts += r->abuf_len;
      if (avcodec_send_frame(r->aenc, r->aframe) == 0)
        rec_drain_ctx(r, r->aenc, r->ast);
      r->abuf_len = 0;
    }
    avcodec_send_frame(r->aenc, nullptr);  // flush audio
    rec_drain_ctx(r, r->aenc, r->ast);
    avcodec_free_context(&r->aenc);
    av_frame_free(&r->aframe);
    av_freep(&r->abuf);
  }
  av_write_trailer(r->fmt);
  if (!(r->fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&r->fmt->pb);
  avcodec_free_context(&r->enc);
  avformat_free_context(r->fmt);
  av_frame_free(&r->frame);
  av_packet_free(&r->pkt);
  sws_freeContext(r->sws);
  delete r;
  return rc;
}

}  // extern "C"
