// audiojax native runtime: WAV decode + window slicing hot paths.
//
// The reference delegates its native layer to ONNX Runtime's C++ EP and uses
// pydub/numpy on the host (SURVEY.md §2.0); audiojax keeps the TPU compute in
// XLA/Pallas and implements the host-side serving loop natively here:
//   * RIFF/WAVE parsing with PCM8/16/24/32 and float32 payloads
//   * channel mixdown to int16 mono
//   * fixed-window slicing with PAD_HEAD prefix and tail zero-pad (the
//     per-request hot loop of audiojax.runtime.session)
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

}  // extern "C"
