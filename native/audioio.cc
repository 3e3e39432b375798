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
      if (!fmt_found || ch <= 0 || bps <= 0) return -2;
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
