// ffdec — minimal MPEG-audio → float PCM decode via libavcodec.
//
// Test-only SECOND ORACLE: ffmpeg's mp3float decoder is an independent
// implementation family from mpg123, so conformance can be measured
// against two unrelated decoders instead of one (tests/test_compliance.py).
// Built lazily by tests/codec_refs.py when libavcodec headers/libs exist.

#include <libavcodec/avcodec.h>
#include <libavutil/frame.h>
#include <libavutil/mem.h>
#include <stdint.h>
#include <string.h>

static void copy_frame(const AVCodecContext* ctx, const AVFrame* frame,
                       float* out, int64_t max_frames, int64_t* written,
                       int* ch_out) {
  int ch = ctx->ch_layout.nb_channels;
  if (ch <= 0 || ch > 2) return;
  *ch_out = ch;
  for (int i = 0; i < frame->nb_samples; i++) {
    if (*written >= max_frames) return;
    for (int c = 0; c < ch; c++) {
      float v = 0.0f;
      if (frame->format == AV_SAMPLE_FMT_FLTP)
        v = ((const float*)frame->extended_data[c])[i];
      else if (frame->format == AV_SAMPLE_FMT_FLT)
        v = ((const float*)frame->extended_data[0])[i * ch + c];
      else if (frame->format == AV_SAMPLE_FMT_S16P)
        v = ((const int16_t*)frame->extended_data[c])[i] / 32768.0f;
      else if (frame->format == AV_SAMPLE_FMT_S16)
        v = ((const int16_t*)frame->extended_data[0])[i * ch + c] / 32768.0f;
      out[*written * ch + c] = v;
    }
    (*written)++;
  }
}

// Decode an MPEG audio blob (Layer I/II/III). Returns decoded frame
// count (>= 0) or a negative error; out is interleaved [frames, ch].
int64_t ffdec_decode(const uint8_t* data, int64_t len, float* out,
                     int64_t max_frames, int* channels_out, int* rate_out) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_MP3);
  if (!codec) return -1;
  AVCodecParserContext* parser = av_parser_init(codec->id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!parser || !ctx) return -2;
  if (avcodec_open2(ctx, codec, NULL) < 0) return -3;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  int ch = 0;
  const uint8_t* p = data;
  int64_t remaining = len;
  while (remaining > 0) {
    int used = av_parser_parse2(parser, ctx, &pkt->data, &pkt->size, p,
                                (int)remaining, AV_NOPTS_VALUE,
                                AV_NOPTS_VALUE, 0);
    if (used < 0) break;
    p += used;
    remaining -= used;
    if (pkt->size && avcodec_send_packet(ctx, pkt) == 0) {
      while (avcodec_receive_frame(ctx, frame) == 0)
        copy_frame(ctx, frame, out, max_frames, &written, &ch);
    }
  }
  avcodec_send_packet(ctx, NULL);  // flush
  while (avcodec_receive_frame(ctx, frame) == 0)
    copy_frame(ctx, frame, out, max_frames, &written, &ch);
  *channels_out = ch;
  *rate_out = ctx->sample_rate;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  av_parser_close(parser);
  return written;
}

// Decode WAV-layout block ADPCM — independent oracle for
// ops.unpack.unpack_ima_adpcm / unpack_ms_adpcm (tests/ima_ref.py,
// tests/ms_ref.py).  Feeds one packet per block (these decoders require
// block_align-sized packets); out is interleaved [frames, ch] in [-1, 1)
// int16 scale.
static int64_t adpcm_decode_common(enum AVCodecID id, const uint8_t* data,
                                   int64_t len, int block_align,
                                   int channels, int rate, float* out,
                                   int64_t max_frames, int* channels_out) {
  const AVCodec* codec = avcodec_find_decoder(id);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  ctx->block_align = block_align;
  ctx->sample_rate = rate;
  ctx->bits_per_coded_sample = 4;
  av_channel_layout_default(&ctx->ch_layout, channels);
  if (avcodec_open2(ctx, codec, NULL) < 0) return -3;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  int ch = 0;
  for (int64_t pos = 0; pos < len; pos += block_align) {
    int n = (int)((len - pos < block_align) ? (len - pos) : block_align);
    uint8_t* buf = av_malloc(n + AV_INPUT_BUFFER_PADDING_SIZE);
    memcpy(buf, data + pos, n);
    memset(buf + n, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    av_packet_from_data(pkt, buf, n);
    if (avcodec_send_packet(ctx, pkt) == 0) {
      while (avcodec_receive_frame(ctx, frame) == 0)
        copy_frame(ctx, frame, out, max_frames, &written, &ch);
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(ctx, NULL);
  while (avcodec_receive_frame(ctx, frame) == 0)
    copy_frame(ctx, frame, out, max_frames, &written, &ch);
  *channels_out = ch;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  return written;
}

int64_t ffdec_decode_adpcm(const uint8_t* data, int64_t len, int block_align,
                           int channels, int rate, float* out,
                           int64_t max_frames, int* channels_out) {
  return adpcm_decode_common(AV_CODEC_ID_ADPCM_IMA_WAV, data, len,
                             block_align, channels, rate, out, max_frames,
                             channels_out);
}

int64_t ffdec_decode_adpcm_ms(const uint8_t* data, int64_t len,
                              int block_align, int channels, int rate,
                              float* out, int64_t max_frames,
                              int* channels_out) {
  return adpcm_decode_common(AV_CODEC_ID_ADPCM_MS, data, len, block_align,
                             channels, rate, out, max_frames, channels_out);
}

int64_t ffdec_decode_adpcm_ima_qt(const uint8_t* data, int64_t len,
                                  int block_align, int channels, int rate,
                                  float* out, int64_t max_frames,
                                  int* channels_out) {
  return adpcm_decode_common(AV_CODEC_ID_ADPCM_IMA_QT, data, len,
                             block_align, channels, rate, out, max_frames,
                             channels_out);
}

// Decode a FLAC stream (fLaC header + frames) via libavcodec — the
// independent oracle for tests/flac_ref.py / tests/flac_writer.py.
// Returns decoded frame count; out is interleaved RAW int32 samples
// exactly as libavcodec emits them (fmt_out reports the AVSampleFormat
// so the caller can undo any container left-shift), bits_out reports
// ctx->bits_per_raw_sample.
int64_t ffdec_decode_flac(const uint8_t* data, int64_t len, int32_t* out,
                          int64_t max_frames, int* channels_out,
                          int* rate_out, int* bits_out, int* fmt_out) {
  const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_FLAC);
  if (!codec) return -1;
  AVCodecParserContext* parser = av_parser_init(codec->id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!parser || !ctx) return -2;
  // the parser strips metadata blocks, so hand STREAMINFO to the
  // decoder as extradata and feed from the first frame
  if (len > 8 && memcmp(data, "fLaC", 4) == 0) {
    int64_t pos = 4;
    while (pos + 4 <= len) {
      int last = data[pos] >> 7, btype = data[pos] & 0x7F;
      int64_t size = ((int64_t)data[pos + 1] << 16)
                   | ((int64_t)data[pos + 2] << 8) | data[pos + 3];
      if (btype == 0 && size >= 34) {
        ctx->extradata =
            av_mallocz(size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(ctx->extradata, data + pos + 4, size);
        ctx->extradata_size = (int)size;
      }
      pos += 4 + size;
      if (last) break;
    }
    data += pos;
    len -= pos;
  }
  if (avcodec_open2(ctx, codec, NULL) < 0) return -3;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  int ch = 0;
  const uint8_t* p = data;
  int64_t remaining = len;
  for (;;) {
    // once input is exhausted, zero-length calls drain the parser's
    // internal buffer; stop when a drain call emits nothing
    int at_eof = remaining <= 0;
    int used = av_parser_parse2(parser, ctx, &pkt->data, &pkt->size, p,
                                at_eof ? 0 : (int)remaining,
                                AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
    if (used < 0) break;
    p += used;
    remaining -= used;
    if (pkt->size == 0 && at_eof) break;
    if (pkt->size && avcodec_send_packet(ctx, pkt) == 0) {
      while (avcodec_receive_frame(ctx, frame) == 0) {
        int c = ctx->ch_layout.nb_channels;
        if (c <= 0 || c > 8) continue;
        ch = c;
        *fmt_out = frame->format;
        for (int i = 0; i < frame->nb_samples && written < max_frames; i++) {
          for (int k = 0; k < c; k++) {
            int32_t v = 0;
            if (frame->format == AV_SAMPLE_FMT_S32P)
              v = ((const int32_t*)frame->extended_data[k])[i];
            else if (frame->format == AV_SAMPLE_FMT_S32)
              v = ((const int32_t*)frame->extended_data[0])[i * c + k];
            else if (frame->format == AV_SAMPLE_FMT_S16P)
              v = ((const int16_t*)frame->extended_data[k])[i];
            else if (frame->format == AV_SAMPLE_FMT_S16)
              v = ((const int16_t*)frame->extended_data[0])[i * c + k];
            out[written * c + k] = v;
          }
          written++;
        }
      }
    }
  }
  avcodec_send_packet(ctx, NULL);
  while (avcodec_receive_frame(ctx, frame) == 0) {
    int c = ctx->ch_layout.nb_channels;
    if (c <= 0 || c > 8) continue;
    ch = c;
    *fmt_out = frame->format;
    for (int i = 0; i < frame->nb_samples && written < max_frames; i++) {
      for (int k = 0; k < c; k++) {
        int32_t v = 0;
        if (frame->format == AV_SAMPLE_FMT_S32P)
          v = ((const int32_t*)frame->extended_data[k])[i];
        else if (frame->format == AV_SAMPLE_FMT_S32)
          v = ((const int32_t*)frame->extended_data[0])[i * c + k];
        else if (frame->format == AV_SAMPLE_FMT_S16P)
          v = ((const int16_t*)frame->extended_data[k])[i];
        else if (frame->format == AV_SAMPLE_FMT_S16)
          v = ((const int16_t*)frame->extended_data[0])[i * c + k];
        out[written * c + k] = v;
      }
      written++;
    }
  }
  *channels_out = ch;
  *rate_out = ctx->sample_rate;
  *bits_out = ctx->bits_per_raw_sample;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  av_parser_close(parser);
  return written;
}

// Encode interleaved int32 PCM as FLAC via libavcodec and report the
// total compressed byte size (frames + STREAMINFO + 8-byte header) —
// the compression-ratio oracle for the framework's own encoder.
// `level` maps to libavcodec's compression_level (5 = flac's default).
int64_t ffdec_encode_flac_size(const int32_t* pcm, int64_t nframes,
                               int channels, int rate, int bits,
                               int level) {
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_FLAC);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  ctx->sample_rate = rate;
  av_channel_layout_default(&ctx->ch_layout, channels);
  ctx->sample_fmt = bits <= 16 ? AV_SAMPLE_FMT_S16 : AV_SAMPLE_FMT_S32;
  ctx->bits_per_raw_sample = bits;
  ctx->compression_level = level;
  if (avcodec_open2(ctx, codec, NULL) < 0) {
    avcodec_free_context(&ctx);
    return -3;
  }
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  if (!pkt || !frame) return -4;
  int64_t total = 8 + ctx->extradata_size;  // fLaC + block hdr + STREAMINFO
  int64_t pos = 0;
  int bs = ctx->frame_size > 0 ? ctx->frame_size : 4096;
  while (pos < nframes) {
    int n = (int)(nframes - pos < bs ? nframes - pos : bs);
    frame->nb_samples = n;
    frame->format = ctx->sample_fmt;
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    if (av_frame_get_buffer(frame, 0) < 0) break;
    for (int i = 0; i < n; i++)
      for (int k = 0; k < channels; k++) {
        int32_t v = pcm[(pos + i) * channels + k];
        if (ctx->sample_fmt == AV_SAMPLE_FMT_S16)
          ((int16_t*)frame->extended_data[0])[i * channels + k] = (int16_t)v;
        else
          // libavcodec reads s32 shifted to the container's top bits
          ((int32_t*)frame->extended_data[0])[i * channels + k] =
              v << (32 - bits);
      }
    if (avcodec_send_frame(ctx, frame) < 0) break;
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      total += pkt->size;
      av_packet_unref(pkt);
    }
    av_frame_unref(frame);
    pos += n;
  }
  avcodec_send_frame(ctx, NULL);
  while (avcodec_receive_packet(ctx, pkt) == 0) {
    total += pkt->size;
    av_packet_unref(pkt);
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  return total;
}
