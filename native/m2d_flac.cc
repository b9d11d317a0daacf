// Native FLAC decoder for the data pipeline.
//
// The reference's librosa.load decodes FLAC through soundfile/libsndfile
// (SURVEY.md §3.1); this is the framework's dependency-free native
// equivalent: a from-scratch FLAC bitstream decoder (STREAMINFO, frame
// headers, constant/verbatim/fixed/LPC subframes, Rice-coded residual
// partitions, left/side / right/side / mid/side stereo decorrelation,
// wasted-bits) exposed over the same two-call C ABI as m2d_wav.cc and
// loaded via ctypes (music2dance_tpu/data/flac.py). The pure-Python
// decoder in that module is the readable spec and correctness oracle;
// tests/test_flac.py cross-checks the two on every subframe type.
//
// Build: make -C native   ->  native/build/libm2dflac.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Bits {
  const uint8_t* d;
  size_t nbytes;
  size_t pos = 0;  // bit position
  bool ok = true;

  Bits(const uint8_t* data, size_t n, size_t bit_pos)
      : d(data), nbytes(n), pos(bit_pos) {}

  uint64_t read(int n) {
    if (!ok || n == 0) return 0;
    size_t end = pos + (size_t)n;
    if (end > nbytes * 8) {
      ok = false;
      return 0;
    }
    uint64_t v = 0;
    size_t p = pos;
    // byte-at-a-time big-endian assembly (n <= 57 guaranteed by callers)
    size_t b0 = p >> 3, b1 = (end + 7) >> 3;
    for (size_t i = b0; i < b1; ++i) v = (v << 8) | d[i];
    v >>= (b1 << 3) - end;
    v &= (n == 64) ? ~0ULL : ((1ULL << n) - 1);
    pos = end;
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v >> (n - 1))) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  long unary() {
    long q = 0;
    while (ok) {
      if ((pos >> 3) >= nbytes) {
        ok = false;
        return 0;
      }
      unsigned rem = (unsigned)((d[pos >> 3] << (pos & 7)) & 0xFF);
      if (rem == 0) {
        size_t step = 8 - (pos & 7);
        q += (long)step;
        pos += step;
      } else {
        int lz = 0;
        while (!(rem & 0x80)) {
          rem <<= 1;
          ++lz;
        }
        q += lz;
        pos += (size_t)lz + 1;
        return q;
      }
    }
    return 0;
  }

  void align() { pos = (pos + 7) & ~(size_t)7; }
};

struct StreamInfo {
  uint32_t sr = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total = 0;
};

const int kBlocksizeCode[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                                256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSrCode[12] = {0,     88200, 176400, 192000, 8000,  16000,
                         22050, 24000, 32000,  44100,  48000, 96000};
const int kBpsCode[8] = {0, 8, 12, 0, 16, 20, 24, 32};
const int kFixedCoef[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

bool read_utf8_number(Bits& b, uint64_t* out) {
  uint64_t first = b.read(8);
  if (!b.ok) return false;
  if (first < 0x80) {
    *out = first;
    return true;
  }
  int n_extra = 0;
  uint64_t mask = 0x40;
  while (first & mask) {
    ++n_extra;
    mask >>= 1;
  }
  if (n_extra == 0 || n_extra > 6) return false;
  uint64_t val = first & (mask - 1);
  for (int i = 0; i < n_extra; ++i) {
    uint64_t cont = b.read(8);
    if (!b.ok || (cont & 0xC0) != 0x80) return false;
    val = (val << 6) | (cont & 0x3F);
  }
  *out = val;
  return true;
}

bool decode_residual(Bits& b, long block_size, int order,
                     std::vector<int64_t>* out) {
  int method = (int)b.read(2);
  if (!b.ok || method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  unsigned escape = (1u << plen) - 1;
  int po = (int)b.read(4);
  long n_part = 1L << po;
  if (block_size % n_part) return false;
  long part = block_size >> po;
  out->clear();
  out->reserve((size_t)(block_size - order));
  for (long p = 0; p < n_part; ++p) {
    long n = (p == 0) ? part - order : part;
    if (n < 0) return false;
    unsigned k = (unsigned)b.read(plen);
    if (k == escape) {
      int raw = (int)b.read(5);
      for (long i = 0; i < n; ++i)
        out->push_back(raw == 0 ? 0 : b.read_signed(raw));
    } else {
      for (long i = 0; i < n; ++i) {
        uint64_t q = (uint64_t)b.unary();
        uint64_t v = (q << k) | b.read((int)k);
        out->push_back((int64_t)(v >> 1) ^ -(int64_t)(v & 1));  // zigzag
      }
    }
    if (!b.ok) return false;
  }
  return true;
}

bool decode_subframe(Bits& b, long block_size, int bps,
                     std::vector<int64_t>* x) {
  if (b.read(1) != 0 || !b.ok) return false;
  int stype = (int)b.read(6);
  int wasted = 0;
  if (b.read(1)) wasted = (int)b.unary() + 1;
  bps -= wasted;
  if (bps <= 0) return false;

  x->assign((size_t)block_size, 0);
  if (stype == 0) {  // constant
    int64_t v = b.read_signed(bps);
    for (long i = 0; i < block_size; ++i) (*x)[(size_t)i] = v;
  } else if (stype == 1) {  // verbatim
    for (long i = 0; i < block_size; ++i)
      (*x)[(size_t)i] = b.read_signed(bps);
  } else if (stype >= 8 && stype <= 12) {  // fixed, order 0-4
    int order = stype - 8;
    for (int i = 0; i < order; ++i) (*x)[(size_t)i] = b.read_signed(bps);
    std::vector<int64_t> res;
    if (!decode_residual(b, block_size, order, &res)) return false;
    for (size_t i = 0; i < res.size(); ++i) {
      int64_t acc = 0;
      size_t base = (size_t)order + i;
      for (int j = 0; j < order; ++j)
        acc += (int64_t)kFixedCoef[order][j] * (*x)[base - 1 - (size_t)j];
      (*x)[base] = res[i] + acc;
    }
  } else if (stype >= 32) {  // LPC, order 1-32
    int order = (stype & 31) + 1;
    for (int i = 0; i < order; ++i) (*x)[(size_t)i] = b.read_signed(bps);
    int prec = (int)b.read(4) + 1;
    if (prec == 16) return false;  // escape value
    int shift = (int)b.read_signed(5);
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int i = 0; i < order; ++i) coefs[i] = b.read_signed(prec);
    std::vector<int64_t> res;
    if (!decode_residual(b, block_size, order, &res)) return false;
    for (size_t i = 0; i < res.size(); ++i) {
      int64_t acc = 0;
      size_t base = (size_t)order + i;
      for (int j = 0; j < order; ++j)
        acc += coefs[j] * (*x)[base - 1 - (size_t)j];
      (*x)[base] = res[i] + (acc >> shift);
    }
  } else {
    return false;  // reserved type
  }
  if (wasted)
    for (auto& v : *x) v <<= wasted;
  return b.ok;
}

// Decodes one frame; appends interleaved-mean mono float64 accumulation is
// done by the caller — here we return the per-channel integer samples.
bool decode_frame(Bits& b, const StreamInfo& info,
                  std::vector<std::vector<int64_t>>* chans, uint32_t* sr_out) {
  if (b.read(14) != 0x3FFE || !b.ok) return false;
  b.read(1);  // reserved
  b.read(1);  // blocking strategy
  int bs_code = (int)b.read(4);
  int sr_code = (int)b.read(4);
  int chan_code = (int)b.read(4);
  int bps_code = (int)b.read(3);
  b.read(1);  // reserved
  uint64_t num;
  if (!read_utf8_number(b, &num)) return false;

  long block_size;
  if (bs_code == 0) return false;
  else if (bs_code == 6) block_size = (long)b.read(8) + 1;
  else if (bs_code == 7) block_size = (long)b.read(16) + 1;
  else block_size = kBlocksizeCode[bs_code];

  uint32_t sr;
  if (sr_code == 0) sr = info.sr;
  else if (sr_code == 12) sr = (uint32_t)b.read(8) * 1000;
  else if (sr_code == 13) sr = (uint32_t)b.read(16);
  else if (sr_code == 14) sr = (uint32_t)b.read(16) * 10;
  else if (sr_code == 15) return false;
  else sr = (uint32_t)kSrCode[sr_code];
  *sr_out = sr;

  int bps = bps_code == 0 ? info.bps : kBpsCode[bps_code];
  if (bps == 0) return false;
  b.read(8);  // header CRC-8 (not verified)

  chans->clear();
  if (chan_code <= 7) {
    int n_ch = chan_code + 1;
    chans->resize((size_t)n_ch);
    for (int c = 0; c < n_ch; ++c)
      if (!decode_subframe(b, block_size, bps, &(*chans)[(size_t)c]))
        return false;
  } else if (chan_code == 8) {  // left/side
    chans->resize(2);
    std::vector<int64_t> left, side;
    if (!decode_subframe(b, block_size, bps, &left)) return false;
    if (!decode_subframe(b, block_size, bps + 1, &side)) return false;
    (*chans)[0] = left;
    (*chans)[1].resize(left.size());
    for (size_t i = 0; i < left.size(); ++i)
      (*chans)[1][i] = left[i] - side[i];
  } else if (chan_code == 9) {  // right/side
    chans->resize(2);
    std::vector<int64_t> side, right;
    if (!decode_subframe(b, block_size, bps + 1, &side)) return false;
    if (!decode_subframe(b, block_size, bps, &right)) return false;
    (*chans)[1] = right;
    (*chans)[0].resize(right.size());
    for (size_t i = 0; i < right.size(); ++i)
      (*chans)[0][i] = right[i] + side[i];
  } else if (chan_code == 10) {  // mid/side
    chans->resize(2);
    std::vector<int64_t> mid, side;
    if (!decode_subframe(b, block_size, bps, &mid)) return false;
    if (!decode_subframe(b, block_size, bps + 1, &side)) return false;
    (*chans)[0].resize(mid.size());
    (*chans)[1].resize(mid.size());
    for (size_t i = 0; i < mid.size(); ++i) {
      int64_t m = (mid[i] << 1) | (side[i] & 1);
      (*chans)[0][i] = (m + side[i]) >> 1;
      (*chans)[1][i] = (m - side[i]) >> 1;
    }
  } else {
    return false;
  }

  b.align();
  b.read(16);  // frame CRC-16 (not verified)
  return b.ok;
}

// Full-file decode into a mono float buffer. Returns sample count or -1.
long decode_file(const char* path, float* out, long cap, int* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize < 42) {
    fclose(f);
    return -1;
  }
  std::vector<uint8_t> data((size_t)fsize);
  size_t got = fread(data.data(), 1, (size_t)fsize, f);
  fclose(f);
  if (got != (size_t)fsize) return -1;
  if (memcmp(data.data(), "fLaC", 4) != 0) return -1;

  // metadata blocks
  size_t pos = 4;
  StreamInfo info;
  bool have_info = false;
  while (true) {
    if (pos + 4 > data.size()) return -1;
    uint8_t head = data[pos];
    uint32_t size = ((uint32_t)data[pos + 1] << 16) |
                    ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    if ((head & 0x7F) == 0 && size >= 34) {  // STREAMINFO
      Bits b(data.data() + pos + 4, size, 0);
      b.read(16);
      b.read(16);
      b.read(24);
      b.read(24);
      info.sr = (uint32_t)b.read(20);
      info.channels = (int)b.read(3) + 1;
      info.bps = (int)b.read(5) + 1;
      info.total = b.read(36);
      have_info = b.ok;
    }
    pos += 4 + size;
    if (head & 0x80) break;
  }
  if (!have_info || pos > data.size()) return -1;

  Bits b(data.data(), data.size(), pos << 3);
  std::vector<std::vector<int64_t>> chans;
  uint32_t sr = info.sr;
  long total = 0;
  double scale = 1.0 / (double)(1ULL << (info.bps - 1));
  while ((b.pos >> 3) < data.size()) {
    if (!decode_frame(b, info, &chans, &sr)) return -1;
    long n = (long)chans[0].size();
    if (out != nullptr) {
      long n_write = n;
      if (total + n_write > cap) n_write = cap - total;
      size_t n_ch = chans.size();
      for (long i = 0; i < n_write; ++i) {
        double acc = 0.0;
        for (size_t c = 0; c < n_ch; ++c) acc += (double)chans[c][(size_t)i];
        out[total + i] = (float)(acc / (double)n_ch * scale);
      }
    }
    total += n;
    if (info.total && (uint64_t)total >= info.total) break;
  }
  if (info.total && (uint64_t)total > info.total) total = (long)info.total;
  *sr_out = (int)sr;
  return total;
}

}  // namespace

extern "C" {

// Two-call API (same shape as m2d_wav_decode): pass out=nullptr to get the
// mono sample count; then pass a buffer of at least that many floats.
// Returns the sample count, or -1 on any parse/IO error.
long m2d_flac_decode(const char* path, float* out, long cap, int* sr) {
  return decode_file(path, out, cap, sr);
}

}  // extern "C"
