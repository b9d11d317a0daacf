// Native WAV decoder for the data pipeline.
//
// The reference leans on librosa/audioread (C under the wheels) for audio
// decode; this is the framework's own native equivalent: a dependency-free
// RIFF/WAVE parser with PCM8/PCM16/PCM24/PCM32/float32 support and mono
// mixdown, exposed over a C ABI and loaded from python via ctypes
// (music2dance_tpu/data/wav.py). Host-side decode runs in grain worker
// processes and overlaps device compute (SURVEY.md §5 data pipeline row).
//
// Build: make -C native   ->  native/build/libm2dwav.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  bool ok;
  explicit Reader(const char* path) : f(fopen(path, "rb")), ok(f != nullptr) {}
  ~Reader() {
    if (f) fclose(f);
  }
  bool read(void* dst, size_t n) {
    if (!ok) return false;
    ok = fread(dst, 1, n, f) == n;
    return ok;
  }
  bool skip(long n) {
    if (!ok) return false;
    ok = fseek(f, n, SEEK_CUR) == 0;
    return ok;
  }
  uint32_t u32() {
    uint8_t b[4] = {0, 0, 0, 0};
    read(b, 4);
    return (uint32_t)b[0] | ((uint32_t)b[1] << 8) | ((uint32_t)b[2] << 16) |
           ((uint32_t)b[3] << 24);
  }
  uint16_t u16() {
    uint8_t b[2] = {0, 0};
    read(b, 2);
    return (uint16_t)b[0] | ((uint16_t)b[1] << 8);
  }
};

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = -1;
  uint32_t data_bytes = 0;
};

bool parse_header(Reader& r, WavInfo* info) {
  char tag[4];
  if (!r.read(tag, 4) || memcmp(tag, "RIFF", 4) != 0) return false;
  r.u32();  // riff size
  if (!r.read(tag, 4) || memcmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (r.ok) {
    if (!r.read(tag, 4)) break;
    uint32_t size = r.u32();
    if (!r.ok) break;
    if (memcmp(tag, "fmt ", 4) == 0) {
      info->format = r.u16();
      info->channels = r.u16();
      info->sample_rate = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      info->bits = r.u16();
      uint32_t consumed = 16;
      if (info->format == 0xFFFE && size >= consumed + 2) {
        // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        // bytes (little-endian) of the SubFormat GUID in the extension
        // (cbSize u16, valid-bits u16, channel-mask u32, GUID[16]).
        uint16_t cb = r.u16();
        consumed += 2;
        if (cb >= 22 && size >= consumed + 8) {
          r.u16();  // valid bits per sample
          r.u32();  // channel mask
          info->format = r.u16();
          consumed += 8;
        }
        // an extensible header without a readable SubFormat stays 0xFFFE
        // and is rejected as unsupported by the caller
      }
      if (size > consumed) r.skip((long)(size - consumed));
      if (size & 1) r.skip(1);  // chunks are word-aligned
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      info->data_offset = ftell(r.f);
      info->data_bytes = size;
      return have_fmt;
    } else {
      r.skip((long)size + (size & 1));  // chunks are word-aligned
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Query/decode a WAV file.
//  buffer == nullptr: return frame count (mono samples after mixdown) and
//                     fill *sr_out; no decode.
//  buffer != nullptr: decode up to `capacity` mono float32 samples into
//                     buffer; returns the number written.
// Returns -1 on parse/open error, -2 on unsupported encoding.
long m2d_wav_decode(const char* path, float* buffer, long capacity,
                    int* sr_out) {
  Reader r(path);
  if (!r.ok) return -1;
  WavInfo info;
  if (!parse_header(r, &info)) return -1;
  if (info.channels == 0 || info.sample_rate == 0) return -1;
  const bool is_pcm = info.format == 1;
  const bool is_float = info.format == 3;
  if (!is_pcm && !is_float) return -2;
  if (is_pcm && info.bits != 8 && info.bits != 16 && info.bits != 24 &&
      info.bits != 32)
    return -2;
  if (is_float && info.bits != 32) return -2;

  const long bytes_per_sample = info.bits / 8;
  const long frame_bytes = bytes_per_sample * info.channels;
  const long n_frames = (long)info.data_bytes / frame_bytes;
  if (sr_out) *sr_out = (int)info.sample_rate;
  if (buffer == nullptr) return n_frames;

  const long want = n_frames < capacity ? n_frames : capacity;
  std::vector<uint8_t> raw((size_t)want * frame_bytes);
  if (fseek(r.f, info.data_offset, SEEK_SET) != 0) return -1;
  if (fread(raw.data(), 1, raw.size(), r.f) != raw.size()) return -1;

  const float inv_ch = 1.0f / (float)info.channels;
  for (long i = 0; i < want; ++i) {
    float acc = 0.0f;
    const uint8_t* fr = raw.data() + (size_t)i * frame_bytes;
    for (int c = 0; c < info.channels; ++c) {
      const uint8_t* s = fr + (size_t)c * bytes_per_sample;
      float v = 0.0f;
      if (is_float) {
        float tmp;
        memcpy(&tmp, s, 4);
        v = tmp;
      } else if (info.bits == 8) {
        // 8-bit WAV is unsigned with a 128 bias (RIFF spec)
        v = ((float)s[0] - 128.0f) / 128.0f;
      } else if (info.bits == 16) {
        int16_t tmp;
        memcpy(&tmp, s, 2);
        v = (float)tmp / 32768.0f;
      } else if (info.bits == 24) {
        int32_t tmp = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                                (uint32_t)s[2] << 24) >> 8;
        v = (float)tmp / 8388608.0f;
      } else {  // 32-bit PCM
        int32_t tmp;
        memcpy(&tmp, s, 4);
        v = (float)tmp / 2147483648.0f;
      }
      acc += v;
    }
    buffer[i] = acc * inv_ch;
  }
  return want;
}

// Encode mono float32 samples as PCM16 WAV (test fixtures, round trips).
// Returns 0 on success, -1 on error.
int m2d_wav_encode(const char* path, const float* samples, long n,
                   int sample_rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = (uint32_t)(n * 2);
  const uint32_t riff_size = 36 + data_bytes;
  uint8_t hdr[44];
  memcpy(hdr, "RIFF", 4);
  memcpy(hdr + 4, &riff_size, 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmt_size = 16;
  memcpy(hdr + 16, &fmt_size, 4);
  uint16_t fmt = 1, ch = 1, bits = 16, block = 2;
  uint32_t sr = (uint32_t)sample_rate, brate = sr * 2;
  memcpy(hdr + 20, &fmt, 2);
  memcpy(hdr + 22, &ch, 2);
  memcpy(hdr + 24, &sr, 4);
  memcpy(hdr + 28, &brate, 4);
  memcpy(hdr + 32, &block, 2);
  memcpy(hdr + 34, &bits, 2);
  memcpy(hdr + 36, "data", 4);
  memcpy(hdr + 40, &data_bytes, 4);
  if (fwrite(hdr, 1, 44, f) != 44) {
    fclose(f);
    return -1;
  }
  std::vector<int16_t> pcm((size_t)n);
  for (long i = 0; i < n; ++i) {
    float v = samples[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    pcm[(size_t)i] = (int16_t)(v * 32767.0f);
  }
  size_t wrote = fwrite(pcm.data(), 2, (size_t)n, f);
  fclose(f);
  return wrote == (size_t)n ? 0 : -1;
}

}  // extern "C"
