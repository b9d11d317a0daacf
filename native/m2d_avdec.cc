// M4A/AAC (and general libav) audio decode shim for music2dance_tpu.
//
// The reference's librosa.load covers M4A by delegating to audioread's
// ffmpeg/gstreamer backend (SURVEY.md §3.1). This shim is that strategy
// made explicit: a thin C++ layer over the system libavformat/libavcodec
// (ffmpeg 5.x) that decodes the best audio stream of any container the
// system libav understands into interleaved float32 at the stream's
// native rate/channel count. Mixdown and resampling stay in Python so the
// semantics match the package's other decoders (mean over channels,
// kaiser polyphase resample in audio/resample.py).
//
// Exposed C ABI (loaded via ctypes from music2dance_tpu/data/m4a.py):
//   m2d_avdec_decode(path, &out, &channels, &sample_rate, errbuf, errlen)
//       -> n_frames >= 0, or < 0 with errbuf filled. *out is malloc'd
//          interleaved f32 [n_frames * channels]; free with
//          m2d_avdec_free.
//   m2d_avdec_free(ptr)
//   m2d_avdec_encode_m4a(path, interleaved_f32, n_frames, channels,
//                        sample_rate, errbuf, errlen)
//       -> 0 on success. TEST-ONLY helper (AAC-LC in an .m4a/.mp4 box)
//          so the suite can build fixtures without shipping binaries.

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/samplefmt.h>
#include <libswresample/swresample.h>
}

namespace {

void set_err(char *errbuf, int errlen, const char *msg, int averr = 0) {
  if (!errbuf || errlen <= 0) return;
  if (averr < 0) {
    char av[128];
    av_strerror(averr, av, sizeof av);
    snprintf(errbuf, errlen, "%s: %s", msg, av);
  } else {
    snprintf(errbuf, errlen, "%s", msg);
  }
}

// Convert one decoded frame to interleaved f32, appending to `out`.
// The SwrContext is created from the first frame's actual format and
// later frames must match it (mid-stream format changes would silently
// corrupt the frame math downstream — same policy as data/mp3.py).
struct FrameSink {
  SwrContext *swr = nullptr;
  AVChannelLayout layout = {};
  int sample_rate = 0;
  AVSampleFormat fmt = AV_SAMPLE_FMT_NONE;
  std::vector<float> out;

  ~FrameSink() {
    if (swr) swr_free(&swr);
    av_channel_layout_uninit(&layout);
  }

  int push(const AVFrame *f, char *errbuf, int errlen) {
    if (!swr) {
      if (av_channel_layout_copy(&layout, &f->ch_layout) < 0) return -1;
      sample_rate = f->sample_rate;
      fmt = (AVSampleFormat)f->format;
      int rc = swr_alloc_set_opts2(&swr, &layout, AV_SAMPLE_FMT_FLT,
                                   sample_rate, &layout, fmt, sample_rate, 0,
                                   nullptr);
      if (rc < 0 || !swr || (rc = swr_init(swr)) < 0) {
        set_err(errbuf, errlen, "swr init failed", rc);
        return -1;
      }
    } else if (f->sample_rate != sample_rate || f->format != fmt ||
               av_channel_layout_compare(&f->ch_layout, &layout) != 0) {
      set_err(errbuf, errlen, "stream format changed mid-file");
      return -1;
    }
    int ch = layout.nb_channels;
    size_t old = out.size();
    out.resize(old + (size_t)f->nb_samples * ch);
    uint8_t *dst = (uint8_t *)(out.data() + old);
    // Same in/out rate: pure sample-format conversion, no swr buffering.
    int got = swr_convert(swr, &dst, f->nb_samples,
                          (const uint8_t **)f->extended_data, f->nb_samples);
    if (got < 0) {
      set_err(errbuf, errlen, "swr_convert failed", got);
      return -1;
    }
    out.resize(old + (size_t)got * ch);
    return 0;
  }
};

}  // namespace

extern "C" {

long long m2d_avdec_decode(const char *path, float **out_samples,
                           int *out_channels, int *out_sample_rate,
                           char *errbuf, int errlen) {
  *out_samples = nullptr;
  *out_channels = 0;
  *out_sample_rate = 0;

  AVFormatContext *ic = nullptr;
  AVCodecContext *dec_ctx = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  FrameSink sink;
  long long result = -1;
  int rc, stream_index;
  const AVCodec *dec = nullptr;

  av_log_set_level(AV_LOG_ERROR);
  if ((rc = avformat_open_input(&ic, path, nullptr, nullptr)) < 0) {
    set_err(errbuf, errlen, "cannot open input", rc);
    goto done;
  }
  if ((rc = avformat_find_stream_info(ic, nullptr)) < 0) {
    set_err(errbuf, errlen, "cannot read stream info", rc);
    goto done;
  }
  stream_index = av_find_best_stream(ic, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (stream_index < 0 || !dec) {
    set_err(errbuf, errlen, "no decodable audio stream",
            stream_index < 0 ? stream_index : 0);
    goto done;
  }
  dec_ctx = avcodec_alloc_context3(dec);
  if (!dec_ctx ||
      (rc = avcodec_parameters_to_context(
           dec_ctx, ic->streams[stream_index]->codecpar)) < 0 ||
      (rc = avcodec_open2(dec_ctx, dec, nullptr)) < 0) {
    set_err(errbuf, errlen, "cannot open decoder", rc);
    goto done;
  }
  pkt = av_packet_alloc();
  frame = av_frame_alloc();
  if (!pkt || !frame) {
    set_err(errbuf, errlen, "out of memory");
    goto done;
  }

  for (bool eof = false; !eof;) {
    rc = av_read_frame(ic, pkt);
    if (rc == AVERROR_EOF) {
      eof = true;  // flush the decoder with a null packet below
    } else if (rc < 0) {
      set_err(errbuf, errlen, "read error", rc);
      goto done;
    } else if (pkt->stream_index != stream_index) {
      av_packet_unref(pkt);
      continue;
    }
    rc = avcodec_send_packet(dec_ctx, eof ? nullptr : pkt);
    if (!eof) av_packet_unref(pkt);
    if (rc < 0 && rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
      set_err(errbuf, errlen, "decode error", rc);
      goto done;
    }
    while ((rc = avcodec_receive_frame(dec_ctx, frame)) >= 0) {
      int prc = sink.push(frame, errbuf, errlen);
      av_frame_unref(frame);
      if (prc < 0) goto done;
    }
    if (rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
      set_err(errbuf, errlen, "decode error", rc);
      goto done;
    }
  }

  if (!sink.swr || sink.out.empty()) {
    set_err(errbuf, errlen, "no audio frames decoded");
    goto done;
  }
  {
    int ch = sink.layout.nb_channels;
    long long n = (long long)(sink.out.size() / ch);
    float *buf = (float *)malloc(sink.out.size() * sizeof(float));
    if (!buf) {
      set_err(errbuf, errlen, "out of memory");
      goto done;
    }
    memcpy(buf, sink.out.data(), sink.out.size() * sizeof(float));
    *out_samples = buf;
    *out_channels = ch;
    *out_sample_rate = sink.sample_rate;
    result = n;
  }

done:
  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (dec_ctx) avcodec_free_context(&dec_ctx);
  if (ic) avformat_close_input(&ic);
  return result;
}

void m2d_avdec_free(float *p) { free(p); }

// ---------------------------------------------------------------------------
// Test-only: encode interleaved f32 -> AAC-LC in an MP4/M4A box. Exists so
// the test suite can build controlled fixtures (tests/test_m4a.py) without
// shipping binary blobs; the framework itself never encodes.
// ---------------------------------------------------------------------------

int m2d_avdec_encode_m4a(const char *path, const float *samples, long long n,
                         int channels, int sample_rate, char *errbuf,
                         int errlen) {
  AVFormatContext *oc = nullptr;
  AVCodecContext *enc_ctx = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  AVStream *st = nullptr;
  const AVCodec *enc;
  int rc, result = -1;
  long long pos = 0;
  bool header_written = false, flushed = false;

  av_log_set_level(AV_LOG_ERROR);
  if ((rc = avformat_alloc_output_context2(&oc, nullptr, "mp4", path)) < 0) {
    set_err(errbuf, errlen, "cannot create mp4 muxer", rc);
    goto done;
  }
  enc = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!enc) {
    set_err(errbuf, errlen, "no AAC encoder in this libavcodec");
    goto done;
  }
  enc_ctx = avcodec_alloc_context3(enc);
  if (!enc_ctx) {
    set_err(errbuf, errlen, "out of memory");
    goto done;
  }
  enc_ctx->sample_rate = sample_rate;
  enc_ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  enc_ctx->bit_rate = 96000 * channels;
  enc_ctx->time_base = AVRational{1, sample_rate};
  av_channel_layout_default(&enc_ctx->ch_layout, channels);
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    enc_ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if ((rc = avcodec_open2(enc_ctx, enc, nullptr)) < 0) {
    set_err(errbuf, errlen, "cannot open AAC encoder", rc);
    goto done;
  }
  st = avformat_new_stream(oc, nullptr);
  if (!st ||
      (rc = avcodec_parameters_from_context(st->codecpar, enc_ctx)) < 0) {
    set_err(errbuf, errlen, "cannot create stream", rc);
    goto done;
  }
  st->time_base = enc_ctx->time_base;
  if ((rc = avio_open(&oc->pb, path, AVIO_FLAG_WRITE)) < 0) {
    set_err(errbuf, errlen, "cannot open output file", rc);
    goto done;
  }
  if ((rc = avformat_write_header(oc, nullptr)) < 0) {
    set_err(errbuf, errlen, "cannot write header", rc);
    goto done;
  }
  header_written = true;

  pkt = av_packet_alloc();
  frame = av_frame_alloc();
  if (!pkt || !frame) {
    set_err(errbuf, errlen, "out of memory");
    goto done;
  }

  while (!flushed) {
    AVFrame *send = nullptr;
    if (pos < n) {
      // AAC wants fixed-size frames; the final short chunk is zero-padded
      // (the mp4 edit list records the true length).
      int fs = enc_ctx->frame_size > 0 ? enc_ctx->frame_size : 1024;
      frame->nb_samples = fs;
      frame->format = AV_SAMPLE_FMT_FLTP;
      frame->sample_rate = sample_rate;
      if ((rc = av_channel_layout_copy(&frame->ch_layout,
                                       &enc_ctx->ch_layout)) < 0 ||
          (rc = av_frame_get_buffer(frame, 0)) < 0) {
        set_err(errbuf, errlen, "cannot alloc frame", rc);
        goto done;
      }
      int take = (int)std::min<long long>(fs, n - pos);
      for (int c = 0; c < channels; ++c) {
        float *plane = (float *)frame->data[c];
        for (int i = 0; i < take; ++i)
          plane[i] = samples[(pos + i) * channels + c];
        memset(plane + take, 0, (size_t)(fs - take) * sizeof(float));
      }
      frame->pts = pos;
      pos += take;
      send = frame;
    } else {
      flushed = true;  // null frame drains the encoder
    }
    if ((rc = avcodec_send_frame(enc_ctx, send)) < 0) {
      set_err(errbuf, errlen, "encode error", rc);
      goto done;
    }
    if (send) av_frame_unref(frame);
    while ((rc = avcodec_receive_packet(enc_ctx, pkt)) >= 0) {
      av_packet_rescale_ts(pkt, enc_ctx->time_base, st->time_base);
      pkt->stream_index = st->index;
      rc = av_interleaved_write_frame(oc, pkt);
      av_packet_unref(pkt);
      if (rc < 0) {
        set_err(errbuf, errlen, "write error", rc);
        goto done;
      }
    }
    if (rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
      set_err(errbuf, errlen, "encode error", rc);
      goto done;
    }
  }
  result = 0;

done:
  if (header_written) {
    rc = av_write_trailer(oc);
    if (rc < 0 && result == 0) {
      set_err(errbuf, errlen, "cannot finalize file", rc);
      result = -1;
    }
  }
  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (enc_ctx) avcodec_free_context(&enc_ctx);
  if (oc) {
    if (oc->pb) avio_closep(&oc->pb);
    avformat_free_context(oc);
  }
  return result;
}

}  // extern "C"
