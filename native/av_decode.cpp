// libav-backed media decode for the L0 preprocessing layer and the
// vggsound mp4-direct streaming path.
//
// The reference shells out to ffmpeg/OpenCV/moviepy for H.264/AAC decode
// (cremad/video_preprocessing.py:36-76, vggsound/mp4_to_wav.py:26-44,
// ave/mp4_to_wav.py:8-39).  This image ships the FFmpeg 5.x *libraries*
// (libavformat/libavcodec/libavutil/libswscale/libswresample) but not the
// CLI, so the equivalent here is an in-process decoder: any codec the
// system libavcodec supports (H.264, HEVC, VP9, AAC, MP3, Opus, ...)
// decodes without an ffmpeg binary.  native/mp4_demux.cpp remains the
// zero-dependency fallback for MJPEG/PCM containers.
//
// Built as its own shared object (libavdecode.so) so libfastdata.so keeps
// zero libav linkage — hosts without the FFmpeg libraries lose only this
// module.  ctypes bindings: multimodal_clinical_tpu/utils/avdecode.py.
//
// Also contains a test-fixture *encoder* (avd_encode_mp4): tests synthesize
// real H.264+AAC mp4s (libx264 + native aac encoder) and round-trip them,
// so the decode path is verified against real codecs, not stubs.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/audio_fifo.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

// keep codec chatter (x264 stats, aac quality lines) off stderr; real
// failures surface through avd_error_msg
static const int g_quiet = (av_log_set_level(AV_LOG_ERROR), 0);

static thread_local char g_err[512];

static void set_err(const char* where, int averr) {
  char buf[256];
  av_strerror(averr, buf, sizeof(buf));
  snprintf(g_err, sizeof(g_err), "%s: %s", where, buf);
}

static void set_errs(const char* msg) {
  snprintf(g_err, sizeof(g_err), "%s", msg);
}

extern "C" {

const char* avd_error_msg(void) { return g_err; }

int avd_available(void) { return 1; }

int avd_has_decoder(const char* name) {
  return avcodec_find_decoder_by_name(name) != nullptr;
}

int avd_has_encoder(const char* name) {
  return avcodec_find_encoder_by_name(name) != nullptr;
}

// Definitive per-file decodability: resolves the decoder the same way the
// decode paths do (av_find_best_stream by codec id), so builds where the
// only decoder is an external-lib wrapper (e.g. libvpx-vp9 with the native
// vp9 decoder disabled) answer correctly where a name lookup would not.
// media_type: 0 = video, 1 = audio.  Header-only cost (no codec open).
int avd_can_decode_stream(const char* path, int media_type) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return 0;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return 0;
  }
  const AVCodec* dec = nullptr;
  int stream = av_find_best_stream(
      fmt, media_type == 0 ? AVMEDIA_TYPE_VIDEO : AVMEDIA_TYPE_AUDIO, -1, -1,
      &dec, 0);
  avformat_close_input(&fmt);
  return stream >= 0 && dec != nullptr;
}

// ---------------------------------------------------------------------------
// Probe (header-only open; no frame decode)
// ---------------------------------------------------------------------------

int avd_probe(const char* path, char* vname, int vcap, char* aname, int acap,
              int* w, int* h, double* duration, double* fps, int* sr,
              int* channels) {
  AVFormatContext* fmt = nullptr;
  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err("avformat_open_input", rc);
    return -1;
  }
  rc = avformat_find_stream_info(fmt, nullptr);
  if (rc < 0) {
    set_err("avformat_find_stream_info", rc);
    avformat_close_input(&fmt);
    return -1;
  }
  if (vname && vcap > 0) vname[0] = 0;
  if (aname && acap > 0) aname[0] = 0;
  if (w) *w = 0;
  if (h) *h = 0;
  if (sr) *sr = 0;
  if (channels) *channels = 0;
  if (fps) *fps = 0.0;
  if (duration)
    *duration = fmt->duration > 0 ? fmt->duration / (double)AV_TIME_BASE : 0.0;
  int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  int as = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (vs >= 0) {
    AVCodecParameters* p = fmt->streams[vs]->codecpar;
    const char* n = avcodec_get_name(p->codec_id);
    if (vname) snprintf(vname, vcap, "%s", n);
    if (w) *w = p->width;
    if (h) *h = p->height;
    AVRational r = fmt->streams[vs]->avg_frame_rate;
    if (fps && r.den > 0) *fps = av_q2d(r);
  }
  if (as >= 0) {
    AVCodecParameters* p = fmt->streams[as]->codecpar;
    const char* n = avcodec_get_name(p->codec_id);
    if (aname) snprintf(aname, acap, "%s", n);
    if (sr) *sr = p->sample_rate;
    if (channels) *channels = p->ch_layout.nb_channels;
  }
  avformat_close_input(&fmt);
  return (vs >= 0 || as >= 0) ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Streaming video decode -> RGB24 frames (optionally swscale-resized)
// ---------------------------------------------------------------------------

struct AvdVideo {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream = -1;
  int out_w = 0, out_h = 0;
  int sws_src_w = 0, sws_src_h = 0;
  AVPixelFormat sws_src_fmt = AV_PIX_FMT_NONE;
  bool flushing = false;
};

void avd_close(void* hv) {
  AvdVideo* v = (AvdVideo*)hv;
  if (!v) return;
  if (v->sws) sws_freeContext(v->sws);
  if (v->frame) av_frame_free(&v->frame);
  if (v->pkt) av_packet_free(&v->pkt);
  if (v->ctx) avcodec_free_context(&v->ctx);
  if (v->fmt) avformat_close_input(&v->fmt);
  delete v;
}

void* avd_open_video(const char* path, int out_w, int out_h) {
  AvdVideo* v = new AvdVideo();
  int rc = avformat_open_input(&v->fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err("avformat_open_input", rc);
    avd_close(v);
    return nullptr;
  }
  rc = avformat_find_stream_info(v->fmt, nullptr);
  if (rc < 0) {
    set_err("avformat_find_stream_info", rc);
    avd_close(v);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  v->stream = av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (v->stream < 0 || !dec) {
    set_errs("no decodable video stream");
    avd_close(v);
    return nullptr;
  }
  v->ctx = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(v->ctx, v->fmt->streams[v->stream]->codecpar);
  rc = avcodec_open2(v->ctx, dec, nullptr);
  if (rc < 0) {
    set_err("avcodec_open2", rc);
    avd_close(v);
    return nullptr;
  }
  v->out_w = out_w > 0 ? out_w : v->ctx->width;
  v->out_h = out_h > 0 ? out_h : v->ctx->height;
  if (v->out_w <= 0 || v->out_h <= 0) {
    set_errs("video stream has no dimensions");
    avd_close(v);
    return nullptr;
  }
  v->pkt = av_packet_alloc();
  v->frame = av_frame_alloc();
  return v;
}

void avd_video_dims(void* hv, int* w, int* h) {
  AvdVideo* v = (AvdVideo*)hv;
  if (w) *w = v ? v->out_w : 0;
  if (h) *h = v ? v->out_h : 0;
}

double avd_video_duration(void* hv) {
  AvdVideo* v = (AvdVideo*)hv;
  if (!v) return 0.0;
  AVStream* s = v->fmt->streams[v->stream];
  if (s->duration > 0) return s->duration * av_q2d(s->time_base);
  if (v->fmt->duration > 0) return v->fmt->duration / (double)AV_TIME_BASE;
  return 0.0;
}

// 1 = frame written (out: out_h*out_w*3 RGB24, *pts seconds), 0 = EOF, <0 err.
int avd_next_frame(void* hv, unsigned char* out, double* pts) {
  AvdVideo* v = (AvdVideo*)hv;
  if (!v) return -1;
  for (;;) {
    int rc = avcodec_receive_frame(v->ctx, v->frame);
    if (rc == 0) {
      AVFrame* f = v->frame;
      if (v->sws == nullptr || v->sws_src_w != f->width ||
          v->sws_src_h != f->height ||
          v->sws_src_fmt != (AVPixelFormat)f->format) {
        if (v->sws) sws_freeContext(v->sws);
        v->sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format,
                                v->out_w, v->out_h, AV_PIX_FMT_RGB24,
                                SWS_BILINEAR, nullptr, nullptr, nullptr);
        v->sws_src_w = f->width;
        v->sws_src_h = f->height;
        v->sws_src_fmt = (AVPixelFormat)f->format;
        if (!v->sws) {
          set_errs("sws_getContext failed");
          return -1;
        }
      }
      uint8_t* dst[4] = {out, nullptr, nullptr, nullptr};
      int dst_stride[4] = {v->out_w * 3, 0, 0, 0};
      sws_scale(v->sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
      if (pts) {
        int64_t t = f->best_effort_timestamp;
        if (t == AV_NOPTS_VALUE) t = f->pts;
        AVRational tb = v->fmt->streams[v->stream]->time_base;
        *pts = (t == AV_NOPTS_VALUE) ? 0.0 : t * av_q2d(tb);
      }
      av_frame_unref(v->frame);
      return 1;
    }
    if (rc == AVERROR_EOF) return 0;
    if (rc != AVERROR(EAGAIN)) {
      set_err("avcodec_receive_frame", rc);
      return -1;
    }
    if (v->flushing) return 0;
    // feed packets until the decoder has a frame (skipping other streams)
    for (;;) {
      rc = av_read_frame(v->fmt, v->pkt);
      if (rc == AVERROR_EOF) {
        avcodec_send_packet(v->ctx, nullptr);
        v->flushing = true;
        break;
      }
      if (rc < 0) {
        set_err("av_read_frame", rc);
        return -1;
      }
      if (v->pkt->stream_index != v->stream) {
        av_packet_unref(v->pkt);
        continue;
      }
      rc = avcodec_send_packet(v->ctx, v->pkt);
      av_packet_unref(v->pkt);
      if (rc < 0 && rc != AVERROR(EAGAIN)) {
        // corrupt packet: keep draining what the decoder already has
        if (rc == AVERROR_INVALIDDATA) continue;
        set_err("avcodec_send_packet", rc);
        return -1;
      }
      break;
    }
  }
}

// ---------------------------------------------------------------------------
// Full-stream audio decode -> mono float32 (optionally swresample-resampled)
// ---------------------------------------------------------------------------

void avd_free(void* p) { free(p); }

// Decodes the best audio stream of `path` to mono float32 at `target_sr`
// (0 = keep native rate).  Returns the sample count (>=0) with *out_ptr a
// malloc'd buffer the caller frees via avd_free, or <0 on error.
long long avd_decode_audio(const char* path, int target_sr, float** out_ptr,
                           int* sr_out) {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  std::vector<float> samples;
  long long result = -1;
  int out_rate = 0;

  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err("avformat_open_input", rc);
    return -1;
  }
  rc = avformat_find_stream_info(fmt, nullptr);
  if (rc < 0) {
    set_err("avformat_find_stream_info", rc);
    goto done;
  }
  {
    const AVCodec* dec = nullptr;
    int stream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (stream < 0 || !dec) {
      set_errs("no decodable audio stream");
      goto done;
    }
    ctx = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(ctx, fmt->streams[stream]->codecpar);
    rc = avcodec_open2(ctx, dec, nullptr);
    if (rc < 0) {
      set_err("avcodec_open2", rc);
      goto done;
    }
    out_rate = target_sr > 0 ? target_sr : ctx->sample_rate;
    if (out_rate <= 0) {
      set_errs("audio stream has no sample rate");
      goto done;
    }
    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    bool eof_sent = false;
    for (;;) {
      rc = avcodec_receive_frame(ctx, frame);
      if (rc == AVERROR_EOF) break;
      if (rc == AVERROR(EAGAIN)) {
        rc = av_read_frame(fmt, pkt);
        if (rc == AVERROR_EOF) {
          if (!eof_sent) {
            avcodec_send_packet(ctx, nullptr);
            eof_sent = true;
          }
          continue;
        }
        if (rc < 0) {
          set_err("av_read_frame", rc);
          goto done;
        }
        if (pkt->stream_index != stream) {
          av_packet_unref(pkt);
          continue;
        }
        rc = avcodec_send_packet(ctx, pkt);
        av_packet_unref(pkt);
        if (rc < 0 && rc != AVERROR(EAGAIN) && rc != AVERROR_INVALIDDATA) {
          set_err("avcodec_send_packet", rc);
          goto done;
        }
        continue;
      }
      if (rc < 0) {
        set_err("avcodec_receive_frame", rc);
        goto done;
      }
      // lazily build swr once the first frame pins the input format
      if (!swr) {
        AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
        AVChannelLayout in_layout;
        if (frame->ch_layout.nb_channels > 0) {
          av_channel_layout_copy(&in_layout, &frame->ch_layout);
        } else {
          av_channel_layout_default(&in_layout, 1);
        }
        rc = swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, out_rate,
                                 &in_layout, (AVSampleFormat)frame->format,
                                 frame->sample_rate, 0, nullptr);
        av_channel_layout_uninit(&in_layout);
        if (rc < 0 || swr_init(swr) < 0) {
          set_errs("swr init failed");
          goto done;
        }
      }
      int max_out = swr_get_out_samples(swr, frame->nb_samples);
      if (max_out < frame->nb_samples) max_out = frame->nb_samples + 256;
      size_t base = samples.size();
      samples.resize(base + max_out);
      uint8_t* outp[1] = {(uint8_t*)(samples.data() + base)};
      int got = swr_convert(swr, outp, max_out,
                            (const uint8_t**)frame->extended_data,
                            frame->nb_samples);
      if (got < 0) {
        set_errs("swr_convert failed");
        goto done;
      }
      samples.resize(base + got);
      av_frame_unref(frame);
    }
    // drain the resampler (rate conversion buffers a tail)
    if (swr) {
      for (;;) {
        size_t base = samples.size();
        samples.resize(base + 4096);
        uint8_t* outp[1] = {(uint8_t*)(samples.data() + base)};
        int got = swr_convert(swr, outp, 4096, nullptr, 0);
        samples.resize(base + (got > 0 ? got : 0));
        if (got <= 0) break;
      }
    }
    float* buf = (float*)malloc(samples.size() * sizeof(float) + 1);
    if (!buf) {
      set_errs("malloc failed");
      goto done;
    }
    memcpy(buf, samples.data(), samples.size() * sizeof(float));
    *out_ptr = buf;
    if (sr_out) *sr_out = out_rate;
    result = (long long)samples.size();
  }

done:
  if (swr) swr_free(&swr);
  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (ctx) avcodec_free_context(&ctx);
  if (fmt) avformat_close_input(&fmt);
  return result;
}

// ---------------------------------------------------------------------------
// Test-fixture encoder: RGB frames + mono float audio -> real mp4
// (libx264 H.264 + native AAC by default).  Test-only surface: lets the
// suite round-trip the decode path against real codecs with known content.
// ---------------------------------------------------------------------------

static int write_frames(AVFormatContext* ofmt, AVCodecContext* enc,
                        AVStream* st, AVFrame* frame, AVPacket* pkt,
                        int64_t default_dur = 0) {
  int rc = avcodec_send_frame(enc, frame);
  if (rc < 0) {
    set_err("avcodec_send_frame", rc);
    return rc;
  }
  for (;;) {
    rc = avcodec_receive_packet(enc, pkt);
    if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return 0;
    if (rc < 0) {
      set_err("avcodec_receive_packet", rc);
      return rc;
    }
    // libx264 leaves pkt->duration 0; without it the mp4 muxer's edit
    // list ends at the last pts and demuxers DISCARD the final frame
    if (pkt->duration == 0) pkt->duration = default_dur;
    av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
    pkt->stream_index = st->index;
    rc = av_interleaved_write_frame(ofmt, pkt);
    if (rc < 0) {
      set_err("av_interleaved_write_frame", rc);
      return rc;
    }
  }
}

int avd_encode_mp4(const char* path, int w, int h, int n_frames, int fps,
                   const unsigned char* rgb, const float* audio,
                   long long n_samples, int sr, const char* vcodec_name,
                   const char* acodec_name) {
  AVFormatContext* ofmt = nullptr;
  AVCodecContext* venc = nullptr;
  AVCodecContext* aenc = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* vframe = nullptr;
  AVFrame* aframe = nullptr;
  AVPacket* pkt = nullptr;
  AVStream *vst = nullptr, *ast = nullptr;
  int result = -1;
  bool header_written = false;

  int rc = avformat_alloc_output_context2(&ofmt, nullptr, "mp4", path);
  if (rc < 0 || !ofmt) {
    set_err("avformat_alloc_output_context2", rc);
    return -1;
  }
  pkt = av_packet_alloc();

  if (n_frames > 0 && rgb) {
    const AVCodec* vc = avcodec_find_encoder_by_name(
        vcodec_name && vcodec_name[0] ? vcodec_name : "libx264");
    if (!vc) {
      set_errs("video encoder unavailable");
      goto done;
    }
    venc = avcodec_alloc_context3(vc);
    venc->width = w;
    venc->height = h;
    venc->pix_fmt = AV_PIX_FMT_YUV420P;
    venc->time_base = {1, fps};
    venc->framerate = {fps, 1};
    venc->gop_size = fps * 2;
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
      venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    av_opt_set(venc->priv_data, "preset", "ultrafast", 0);
    av_opt_set(venc->priv_data, "crf", "18", 0);
    rc = avcodec_open2(venc, vc, nullptr);
    if (rc < 0) {
      set_err("avcodec_open2(video)", rc);
      goto done;
    }
    vst = avformat_new_stream(ofmt, nullptr);
    vst->time_base = venc->time_base;
    avcodec_parameters_from_context(vst->codecpar, venc);
    sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
    vframe = av_frame_alloc();
    vframe->format = AV_PIX_FMT_YUV420P;
    vframe->width = w;
    vframe->height = h;
    av_frame_get_buffer(vframe, 0);
  }

  if (n_samples > 0 && audio) {
    const AVCodec* ac = avcodec_find_encoder_by_name(
        acodec_name && acodec_name[0] ? acodec_name : "aac");
    if (!ac) {
      set_errs("audio encoder unavailable");
      goto done;
    }
    aenc = avcodec_alloc_context3(ac);
    aenc->sample_rate = sr;
    av_channel_layout_default(&aenc->ch_layout, 1);
    aenc->sample_fmt =
        ac->sample_fmts ? ac->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
    aenc->time_base = {1, sr};
    aenc->bit_rate = 96000;
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
      aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    rc = avcodec_open2(aenc, ac, nullptr);
    if (rc < 0) {
      set_err("avcodec_open2(audio)", rc);
      goto done;
    }
    ast = avformat_new_stream(ofmt, nullptr);
    ast->time_base = {1, sr};
    avcodec_parameters_from_context(ast->codecpar, aenc);
  }

  rc = avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE);
  if (rc < 0) {
    set_err("avio_open", rc);
    goto done;
  }
  rc = avformat_write_header(ofmt, nullptr);
  if (rc < 0) {
    set_err("avformat_write_header", rc);
    goto done;
  }
  header_written = true;

  if (venc) {
    for (int i = 0; i < n_frames; i++) {
      av_frame_make_writable(vframe);
      const uint8_t* src[1] = {rgb + (size_t)i * w * h * 3};
      int src_stride[1] = {w * 3};
      sws_scale(sws, src, src_stride, 0, h, vframe->data, vframe->linesize);
      vframe->pts = i;
      if (write_frames(ofmt, venc, vst, vframe, pkt, 1) < 0) goto done;
    }
    if (write_frames(ofmt, venc, vst, nullptr, pkt, 1) < 0) goto done;  // flush
  }

  if (aenc) {
    int fsz = aenc->frame_size > 0 ? aenc->frame_size : 1024;
    bool planar_flt = aenc->sample_fmt == AV_SAMPLE_FMT_FLTP ||
                      aenc->sample_fmt == AV_SAMPLE_FMT_FLT;
    if (!planar_flt) {
      set_errs("audio encoder wants a non-float format (unsupported here)");
      goto done;
    }
    aframe = av_frame_alloc();
    aframe->format = aenc->sample_fmt;
    av_channel_layout_default(&aframe->ch_layout, 1);
    aframe->sample_rate = sr;
    long long pos = 0;
    while (pos < n_samples) {
      int n = (int)((n_samples - pos) < fsz ? (n_samples - pos) : fsz);
      aframe->nb_samples = n;
      av_frame_get_buffer(aframe, 0);
      av_frame_make_writable(aframe);
      memcpy(aframe->data[0], audio + pos, n * sizeof(float));
      aframe->pts = pos;
      if (write_frames(ofmt, aenc, ast, aframe, pkt) < 0) goto done;
      av_frame_unref(aframe);
      aframe->format = aenc->sample_fmt;
      av_channel_layout_default(&aframe->ch_layout, 1);
      aframe->sample_rate = sr;
      pos += n;
    }
    if (write_frames(ofmt, aenc, ast, nullptr, pkt) < 0) goto done;  // flush
  }

  rc = av_write_trailer(ofmt);
  if (rc < 0) {
    set_err("av_write_trailer", rc);
    goto done;
  }
  header_written = false;
  result = 0;

done:
  if (header_written) av_write_trailer(ofmt);
  if (sws) sws_freeContext(sws);
  if (vframe) av_frame_free(&vframe);
  if (aframe) av_frame_free(&aframe);
  if (pkt) av_packet_free(&pkt);
  if (venc) avcodec_free_context(&venc);
  if (aenc) avcodec_free_context(&aenc);
  if (ofmt) {
    if (ofmt->pb) avio_closep(&ofmt->pb);
    avformat_free_context(ofmt);
  }
  return result;
}

}  // extern "C"
