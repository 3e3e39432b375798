// audiojax native runtime: the host-side serving loop, in C++.
//
// The reference delegates its native layer to ONNX Runtime's C++ EP and uses
// pydub/numpy on the host (SURVEY.md §2.0); audiojax keeps the TPU compute in
// XLA/Pallas and implements the host-side serving loop natively here:
//   * RIFF/WAVE parsing with PCM8/16/24/32 and float32 payloads
//   * channel mixdown to int16 mono
//   * PCM16 WAV encoding (in-memory RIFF assembly)
//   * fixed-window slicing with PAD_HEAD prefix and tail zero-pad (the
//     per-request hot loop of audiojax.runtime.session)
//   * linear resampling (align_corners=False, torch-interpolate parity)
//   * int16-domain RMS normalisation (reference Inference_*.py:115-135)
//   * Hann-taper overlap-add stitching of output windows (the reference
//     super-resolution host OLA, Inference_MossFormer_SR_ONNX.py:280-338)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Parse a WAV header from `data`. Returns 0 on success and fills the info
// fields; negative error codes otherwise.
int wav_parse_header(const uint8_t* data, int64_t size, int32_t* channels,
                     int32_t* sample_rate, int32_t* bits, int32_t* is_float,
                     int64_t* n_frames, int64_t* data_offset) {
  if (size < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  int32_t fmt_found = 0, ch = 0, rate = 0, bps = 0, fmt_tag = 0;
  while (pos + 8 <= size) {
    const uint8_t* hdr = data + pos;
    uint32_t chunk_size;
    memcpy(&chunk_size, hdr + 4, 4);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_size >= 16) {
      uint16_t tag, nch, bits16;
      uint32_t sr;
      memcpy(&tag, hdr + 8, 2);
      memcpy(&nch, hdr + 10, 2);
      memcpy(&sr, hdr + 12, 4);
      memcpy(&bits16, hdr + 22, 2);
      fmt_tag = tag;
      ch = nch;
      rate = (int32_t)sr;
      bps = bits16;
      fmt_found = 1;
    } else if (memcmp(hdr, "data", 4) == 0) {
      // bps < 8 would make (ch * (bps / 8)) zero -> SIGFPE on the divide;
      // sub-byte WAV payloads are unsupported anyway
      if (!fmt_found || ch <= 0 || bps < 8) return -2;
      if (fmt_tag != 1 && fmt_tag != 3 && fmt_tag != 0xFFFE) return -3;
      *channels = ch;
      *sample_rate = rate;
      *bits = bps;
      *is_float = (fmt_tag == 3) ? 1 : 0;
      *n_frames = (int64_t)chunk_size / (ch * (bps / 8));
      *data_offset = pos + 8;
      return 0;
    }
    pos += 8 + chunk_size + (chunk_size & 1);
  }
  return -4;
}

// Decode the data chunk to int16 mono (channel average). `out` must hold
// n_frames int16 samples.
int wav_decode_mono16(const uint8_t* data, int64_t data_offset, int64_t n_frames,
                      int32_t channels, int32_t bits, int32_t is_float,
                      int16_t* out) {
  const uint8_t* p = data + data_offset;
  const double inv_ch = 1.0 / channels;
  for (int64_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int32_t c = 0; c < channels; ++c) {
      const uint8_t* s = p + (i * channels + c) * (bits / 8);
      double v = 0.0;
      if (is_float && bits == 32) {
        float f;
        memcpy(&f, s, 4);
        v = (double)f * 32767.0;
      } else if (bits == 16) {
        int16_t x;
        memcpy(&x, s, 2);
        v = (double)x;
      } else if (bits == 32) {
        int32_t x;
        memcpy(&x, s, 4);
        v = (double)(x >> 16);
      } else if (bits == 24) {
        int32_t x = (s[0] | (s[1] << 8) | (s[2] << 16));
        if (x & 0x800000) x |= ~0xFFFFFF;  // sign extend
        v = (double)(x >> 8);
      } else if (bits == 8) {
        v = ((double)s[0] - 128.0) * 256.0;
      } else {
        return -1;
      }
      acc += v;
    }
    double m = acc * inv_ch;
    if (m > 32767.0) m = 32767.0;
    if (m < -32768.0) m = -32768.0;
    out[i] = (int16_t)lrint(m);  // round-half-even, matches numpy
  }
  return 0;
}

// Slice `audio` (n samples, already mono int16) into `num_windows` windows of
// `window` samples with stride `stride`, prefixing `pad_head` zeros and
// zero-padding the tail. `out` must hold num_windows*window int16.
int slice_windows(const int16_t* audio, int64_t n, int64_t window, int64_t stride,
                  int64_t pad_head, int64_t num_windows, int16_t* out) {
  if (window <= 0 || stride <= 0 || num_windows <= 0) return -1;
  const int64_t total = n + pad_head;
  for (int64_t w = 0; w < num_windows; ++w) {
    int64_t start = w * stride;  // position in the padded stream
    int16_t* dst = out + w * window;
    for (int64_t j = 0; j < window; ++j) {
      int64_t src = start + j - pad_head;  // unpadded index
      int64_t padded_idx = start + j;
      dst[j] = (padded_idx < pad_head || src >= n || src < 0) ? (int16_t)0 : audio[src];
    }
  }
  (void)total;
  return 0;
}

// Encode interleaved int16 frames as a PCM16 RIFF/WAVE blob. `out` must hold
// 44 + n_frames*channels*2 bytes. Returns the byte count written.
int64_t wav_encode_pcm16(const int16_t* samples, int64_t n_frames, int32_t channels,
                         int32_t sample_rate, uint8_t* out) {
  if (n_frames < 0 || channels <= 0 || sample_rate <= 0) return -1;
  const uint32_t data_bytes = (uint32_t)(n_frames * channels * 2);
  const uint32_t byte_rate = (uint32_t)sample_rate * channels * 2;
  const uint16_t block_align = (uint16_t)(channels * 2);
  uint8_t* p = out;
  memcpy(p, "RIFF", 4); p += 4;
  uint32_t riff_size = 36 + data_bytes;
  memcpy(p, &riff_size, 4); p += 4;
  memcpy(p, "WAVE", 4); p += 4;
  memcpy(p, "fmt ", 4); p += 4;
  uint32_t fmt_size = 16; memcpy(p, &fmt_size, 4); p += 4;
  uint16_t tag = 1; memcpy(p, &tag, 2); p += 2;
  uint16_t nch = (uint16_t)channels; memcpy(p, &nch, 2); p += 2;
  uint32_t sr = (uint32_t)sample_rate; memcpy(p, &sr, 4); p += 4;
  memcpy(p, &byte_rate, 4); p += 4;
  memcpy(p, &block_align, 2); p += 2;
  uint16_t bits = 16; memcpy(p, &bits, 2); p += 2;
  memcpy(p, "data", 4); p += 4;
  memcpy(p, &data_bytes, 4); p += 4;
  memcpy(p, samples, data_bytes); p += data_bytes;
  return (int64_t)(p - out);
}

// Linear resample (align_corners=False): int16 in (n), int16 out (out_n).
// Matches F.interpolate(mode="linear") / audio_io.resample_np exactly.
int resample_linear_i16(const int16_t* in, int64_t n, int16_t* out, int64_t out_n) {
  if (n <= 0 || out_n <= 0) return -1;
  const double step = (double)n / (double)out_n;
  for (int64_t i = 0; i < out_n; ++i) {
    double c = ((double)i + 0.5) * step - 0.5;
    if (c < 0.0) c = 0.0;
    if (c > (double)(n - 1)) c = (double)(n - 1);
    int64_t i0 = (int64_t)c;
    int64_t i1 = i0 + 1 < n ? i0 + 1 : n - 1;
    double frac = c - (double)i0;
    double v = (double)in[i0] * (1.0 - frac) + (double)in[i1] * frac;
    if (v > 32767.0) v = 32767.0;
    if (v < -32768.0) v = -32768.0;
    out[i] = (int16_t)lrint(v);
  }
  return 0;
}

// Batched rows variant: one call resamples a contiguous (rows, n) buffer into
// (rows, out_n) — avoids per-row ctypes call overhead from Python.
int resample_linear_rows_i16(const int16_t* in, int64_t rows, int64_t n,
                             int16_t* out, int64_t out_n) {
  if (rows <= 0) return -1;
  for (int64_t r = 0; r < rows; ++r) {
    int rc = resample_linear_i16(in + r * n, n, out + r * out_n, out_n);
    if (rc != 0) return rc;
  }
  return 0;
}

// RMS-normalise int16 samples to `target_rms` (reference
// Inference_GTCRN_ONNX.py:115-135): scale by target/(rms + 1e-7), clamp.
int normalise_rms_i16(const int16_t* in, int64_t n, double target_rms, int16_t* out) {
  if (n <= 0) return -1;
  double acc = 0.0;
  for (int64_t i = 0; i < n; ++i) acc += (double)in[i] * (double)in[i];
  double rms = sqrt(acc / (double)n);
  if (rms <= 0.0) {
    memcpy(out, in, (size_t)n * 2);
    return 0;
  }
  // Scale in f32 like the numpy fallback; truncate toward zero to match its
  // astype(int16). The RMS itself accumulates in double (serial) vs numpy's
  // float32 pairwise sum, so outputs may differ by 1 LSB between the native
  // and numpy paths — bounded by tests/test_native.py.
  float scale = (float)target_rms / ((float)rms + 1e-7f);
  for (int64_t i = 0; i < n; ++i) {
    float v = (float)in[i] * scale;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = (int16_t)v;  // C cast truncates toward zero = numpy astype
  }
  return 0;
}

// Hann-taper overlap-add stitch of `num` output windows of `w_out` samples at
// stride `stride_out` (< w_out). First/last windows keep their outer edges
// un-tapered; overlaps are normalised by the taper sum. Mirrors
// runtime.session.Session._stitch. `out` holds (num-1)*stride_out + w_out.
int ola_stitch_i16(const int16_t* windows, int64_t num, int64_t w_out,
                   int64_t stride_out, int16_t* out) {
  if (num <= 0 || w_out <= 0 || stride_out <= 0) return -1;
  const int64_t overlap = w_out - stride_out;
  const int64_t total = (num - 1) * stride_out + w_out;
  if (num == 1 || overlap <= 0) {
    memcpy(out, windows, (size_t)(num * w_out) * 2);
    return 0;
  }
  // ramp computed in double, stored f32 — bit-parity with the numpy reference
  std::vector<float> taper((size_t)w_out, 1.0f), ramp((size_t)overlap);
  for (int64_t i = 0; i < overlap; ++i)
    ramp[(size_t)i] = (float)(0.5 - 0.5 * cos(M_PI * (double)(i + 1) / (double)(overlap + 1)));
  for (int64_t i = 0; i < overlap; ++i) taper[(size_t)i] = ramp[(size_t)i];
  for (int64_t i = 0; i < overlap; ++i)  // tail = reversed ramp, written after the head
    taper[(size_t)(w_out - overlap + i)] = ramp[(size_t)(overlap - 1 - i)];
  std::vector<float> acc((size_t)total, 0.0f), norm((size_t)total, 0.0f);
  for (int64_t wi = 0; wi < num; ++wi) {
    const int16_t* src = windows + wi * w_out;
    const int64_t s = wi * stride_out;
    for (int64_t j = 0; j < w_out; ++j) {
      float t = taper[(size_t)j];
      if (wi == 0 && j < overlap) t = 1.0f;
      if (wi == num - 1 && j >= w_out - overlap) t = 1.0f;
      acc[(size_t)(s + j)] += (float)src[j] * t;
      norm[(size_t)(s + j)] += t;
    }
  }
  for (int64_t i = 0; i < total; ++i) {
    float d = norm[(size_t)i] > 1e-7f ? norm[(size_t)i] : 1e-7f;
    float v = acc[(size_t)i] / d;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = (int16_t)lrintf(v);
  }
  return 0;
}

}  // extern "C"

// ───────────────────────────── FLAC decoder ─────────────────────────────
// Subset decoder for the FLAC bitstream (constant / verbatim / fixed / LPC
// subframes, 4- and 5-bit Rice residuals with escape partitions, left-side /
// right-side / mid-side stereo decorrelation, wasted bits, CRC-8 + CRC-16
// verified fail-closed).  The reference ingests arbitrary formats through
// pydub/ffmpeg (/root/reference/GTCRN/Inference_GTCRN_ONNX.py:272); this
// image has no ffmpeg, so the native layer decodes the one lossless format
// that matters for speech corpora directly.  Lossless ⇒ the tests assert
// bit-exact round-trips against a from-scratch encoder.

namespace {

struct BitReader {
  const uint8_t* d;
  int64_t size;
  int64_t byte;
  int bit;  // 0..7, MSB-first
  bool error;
};

inline uint32_t br_u1(BitReader* br) {
  if (br->byte >= br->size) { br->error = true; return 0; }
  uint32_t v = (br->d[br->byte] >> (7 - br->bit)) & 1u;
  if (++br->bit == 8) { br->bit = 0; ++br->byte; }
  return v;
}

inline uint64_t br_bits(BitReader* br, int n) {
  uint64_t v = 0;
  for (int i = 0; i < n; ++i) v = (v << 1) | br_u1(br);
  return v;
}

inline int64_t br_sbits(BitReader* br, int n) {  // two's-complement signed
  uint64_t v = br_bits(br, n);
  if (n > 0 && (v >> (n - 1)) & 1u) return (int64_t)(v | (~UINT64_C(0) << n));
  return (int64_t)v;
}

inline uint32_t br_unary(BitReader* br) {
  uint32_t q = 0;
  while (!br->error && br_u1(br) == 0) ++q;
  return q;
}

inline void br_align(BitReader* br) {
  if (br->bit) { br->bit = 0; ++br->byte; }
}

uint8_t crc8(const uint8_t* d, int64_t n) {  // poly 0x07, init 0
  uint8_t c = 0;
  for (int64_t i = 0; i < n; ++i) {
    c ^= d[i];
    for (int k = 0; k < 8; ++k) c = (uint8_t)((c & 0x80) ? (c << 1) ^ 0x07 : c << 1);
  }
  return c;
}

uint16_t crc16(const uint8_t* d, int64_t n) {  // poly 0x8005, init 0
  uint16_t c = 0;
  for (int64_t i = 0; i < n; ++i) {
    c ^= (uint16_t)(d[i] << 8);
    for (int k = 0; k < 8; ++k) c = (uint16_t)((c & 0x8000) ? (c << 1) ^ 0x8005 : c << 1);
  }
  return c;
}

// STREAMINFO fields + offset of the first frame.  Returns 0 on success.
int flac_info(const uint8_t* d, int64_t size, int32_t* channels, int32_t* rate,
              int32_t* bps, int64_t* total, int64_t* first_frame) {
  if (size < 8 || memcmp(d, "fLaC", 4) != 0) return -1;
  int64_t pos = 4;
  bool saw_streaminfo = false;
  for (;;) {
    if (pos + 4 > size) return -2;
    const int last = d[pos] >> 7;
    const int type = d[pos] & 0x7f;
    const int64_t len = ((int64_t)d[pos + 1] << 16) | ((int64_t)d[pos + 2] << 8) | d[pos + 3];
    pos += 4;
    if (pos + len > size) return -2;
    if (type == 0) {
      if (len < 34) return -3;
      const uint8_t* s = d + pos;
      *rate = (int32_t)(((uint32_t)s[10] << 12) | ((uint32_t)s[11] << 4) | (s[12] >> 4));
      *channels = ((s[12] >> 1) & 0x7) + 1;
      *bps = (int32_t)((((s[12] & 1u) << 4) | (s[13] >> 4)) + 1);
      *total = ((int64_t)(s[13] & 0x0f) << 32) | ((int64_t)s[14] << 24) |
               ((int64_t)s[15] << 16) | ((int64_t)s[16] << 8) | s[17];
      saw_streaminfo = true;
    }
    pos += len;
    if (last) break;
  }
  if (!saw_streaminfo) return -3;
  *first_frame = pos;
  return 0;
}

// Decode one subframe into x[0..blocksize); bps_eff includes the +1 side bit.
// Returns 0 on success.
int decode_subframe(BitReader* br, int64_t* x, int blocksize, int bps_eff) {
  if (br_u1(br) != 0) return -10;  // mandatory zero pad bit
  const int type = (int)br_bits(br, 6);
  int wasted = 0;
  if (br_u1(br)) wasted = (int)br_unary(br) + 1;
  const int bps = bps_eff - wasted;
  int order;
  bool lpc = false;
  if (type == 0) {  // constant
    const int64_t v = br_sbits(br, bps);
    for (int i = 0; i < blocksize; ++i) x[i] = v;
    order = -1;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < blocksize; ++i) x[i] = br_sbits(br, bps);
    order = -1;
  } else if (type >= 8 && type <= 12) {
    order = type - 8;
  } else if (type >= 32) {
    order = type - 31;
    lpc = true;
  } else {
    return -11;
  }

  if (order >= 0) {
    for (int i = 0; i < order; ++i) x[i] = br_sbits(br, bps);  // warmup
    int precision = 0, shift = 0;
    int64_t coef[32];
    if (lpc) {
      precision = (int)br_bits(br, 4) + 1;
      if (precision == 16) return -12;  // 0b1111 is invalid
      shift = (int)br_sbits(br, 5);
      if (shift < 0) return -12;
      for (int i = 0; i < order; ++i) coef[i] = br_sbits(br, precision);
    }
    // residual
    const int method = (int)br_bits(br, 2);
    if (method > 1) return -13;
    const int plen = method == 0 ? 4 : 5;
    const int escape = method == 0 ? 0x0f : 0x1f;
    const int po = (int)br_bits(br, 4);
    const int nparts = 1 << po;
    if (blocksize % nparts != 0) return -13;
    int idx = order;
    for (int p = 0; p < nparts; ++p) {
      const int count = (blocksize >> po) - (p == 0 ? order : 0);
      if (count < 0 || idx + count > blocksize) return -13;
      const int param = (int)br_bits(br, plen);
      if (param == escape) {
        const int raw = (int)br_bits(br, 5);
        for (int i = 0; i < count; ++i) x[idx + i] = raw ? br_sbits(br, raw) : 0;
      } else {
        for (int i = 0; i < count; ++i) {
          const uint64_t q = br_unary(br);
          const uint64_t u = (q << param) | br_bits(br, param);
          x[idx + i] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // zigzag
        }
      }
      idx += count;
    }
    if (br->error) return -14;
    // reconstruct from residual
    if (lpc) {
      for (int i = order; i < blocksize; ++i) {
        int64_t pred = 0;
        for (int j = 0; j < order; ++j) pred += coef[j] * x[i - 1 - j];
        x[i] += pred >> shift;
      }
    } else {
      switch (order) {
        case 0: break;
        case 1: for (int i = 1; i < blocksize; ++i) x[i] += x[i - 1]; break;
        case 2: for (int i = 2; i < blocksize; ++i) x[i] += 2 * x[i - 1] - x[i - 2]; break;
        case 3: for (int i = 3; i < blocksize; ++i)
                  x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
                break;
        case 4: for (int i = 4; i < blocksize; ++i)
                  x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
                break;
        default: return -11;
      }
    }
  }
  if (wasted)
    for (int i = 0; i < blocksize; ++i) x[i] <<= wasted;
  return br->error ? -14 : 0;
}

}  // namespace

extern "C" {

// STREAMINFO probe: fills (channels, rate, bps, total_samples).  0 on success.
int flac_parse_header(const uint8_t* data, int64_t size, int32_t* channels,
                      int32_t* sample_rate, int32_t* bits, int64_t* n_frames) {
  int64_t first;
  return flac_info(data, size, channels, sample_rate, bits, n_frames, &first);
}

// Decode the whole stream to interleaved int16 (channels from the header;
// bps ≠ 16 is shifted to int16).  `out` must hold capacity·channels samples.
// Returns the number of frames (samples per channel) decoded, or a negative
// error code (fail-closed: any CRC mismatch or malformed field aborts).
int64_t flac_decode_i16(const uint8_t* data, int64_t size, int16_t* out,
                        int64_t capacity) {
  int32_t nch, rate, bps;
  int64_t total, pos;
  int rc = flac_info(data, size, &nch, &rate, &bps, &total, &pos);
  if (rc != 0) return rc;
  if (nch < 1 || nch > 8 || bps < 4 || bps > 32) return -3;

  std::vector<std::vector<int64_t>> ch((size_t)nch);
  int64_t written = 0;
  while (pos < size && written < capacity) {
    BitReader br{data, size, pos, 0, false};
    if (br_bits(&br, 14) != 0x3ffe) return -20;  // sync
    br_u1(&br);                     // reserved
    br_u1(&br);                     // blocking strategy
    const int bs_code = (int)br_bits(&br, 4);
    const int sr_code = (int)br_bits(&br, 4);
    const int chan_code = (int)br_bits(&br, 4);
    const int size_code = (int)br_bits(&br, 3);
    br_u1(&br);                     // reserved
    // UTF-8 coded frame/sample number: skip by its leading-byte length
    uint32_t lead = (uint32_t)br_bits(&br, 8);
    int follow = 0;
    for (uint32_t m = 0x80; lead & m; m >>= 1) ++follow;
    if (follow > 0) --follow;       // first 1-bit run counts the total bytes
    for (int i = 0; i < follow; ++i) br_bits(&br, 8);
    int blocksize;
    switch (bs_code) {
      case 1: blocksize = 192; break;
      case 2: case 3: case 4: case 5: blocksize = 576 << (bs_code - 2); break;
      case 6: blocksize = (int)br_bits(&br, 8) + 1; break;
      case 7: blocksize = (int)br_bits(&br, 16) + 1; break;
      default:
        if (bs_code >= 8) { blocksize = 256 << (bs_code - 8); break; }
        return -21;
    }
    if (sr_code == 12) br_bits(&br, 8);        // explicit rates: consume only —
    else if (sr_code == 13 || sr_code == 14) br_bits(&br, 16);  // header wins
    int fbps = bps;
    switch (size_code) {
      case 0: break;
      case 1: fbps = 8; break;
      case 2: fbps = 12; break;
      case 4: fbps = 16; break;
      case 5: fbps = 20; break;
      case 6: fbps = 24; break;
      case 7: fbps = 32; break;
      default: return -22;
    }
    if (br.error || br.bit != 0) return -23;
    const uint8_t hdr_crc = data[br.byte];
    if (crc8(data + pos, br.byte - pos) != hdr_crc) return -24;
    ++br.byte;

    int fch = nch;
    if (chan_code >= 8 && chan_code <= 10) fch = 2;
    else if (chan_code < 8) fch = chan_code + 1;
    else return -25;
    if (fch != nch) return -25;  // channel count must match STREAMINFO

    for (int c = 0; c < fch; ++c) {
      int eff = fbps;
      if ((chan_code == 8 && c == 1) || (chan_code == 9 && c == 0) ||
          (chan_code == 10 && c == 1))
        eff += 1;  // the side channel carries one extra bit
      ch[(size_t)c].assign((size_t)blocksize, 0);
      rc = decode_subframe(&br, ch[(size_t)c].data(), blocksize, eff);
      if (rc != 0) return rc;
    }
    br_align(&br);
    if (br.byte + 2 > size) return -26;
    const uint16_t frame_crc = (uint16_t)((data[br.byte] << 8) | data[br.byte + 1]);
    if (crc16(data + pos, br.byte - pos) != frame_crc) return -26;
    br.byte += 2;

    if (chan_code == 8) {        // left/side: right = left − side
      for (int i = 0; i < blocksize; ++i) ch[1][(size_t)i] = ch[0][(size_t)i] - ch[1][(size_t)i];
    } else if (chan_code == 9) { // side/right: left = side + right
      for (int i = 0; i < blocksize; ++i) ch[0][(size_t)i] = ch[0][(size_t)i] + ch[1][(size_t)i];
    } else if (chan_code == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t mid = ch[0][(size_t)i], side = ch[1][(size_t)i];
        mid = (mid << 1) | (side & 1);
        ch[0][(size_t)i] = (mid + side) >> 1;
        ch[1][(size_t)i] = (mid - side) >> 1;
      }
    }

    const int64_t n = blocksize < (capacity - written) ? blocksize : (capacity - written);
    for (int64_t i = 0; i < n; ++i)
      for (int c = 0; c < nch; ++c) {
        int64_t v = ch[(size_t)c][(size_t)i];
        if (fbps > 16) v >>= (fbps - 16);
        else if (fbps < 16) v <<= (16 - fbps);
        if (v > 32767) v = 32767;
        if (v < -32768) v = -32768;
        out[(written + i) * nch + c] = (int16_t)v;
      }
    written += n;
    pos = br.byte;
  }
  return written;
}

}  // extern "C"
