// Native WAV codec + PCM<->float conversion for the host-side data path.
//
// The reference is pure Python (scipy.io.wavfile); this keeps the framework's
// host IO off the Python interpreter for production data loading: RIFF
// parsing, int16/int32/float32 decode to float64, and float->int16 encode
// with clipping, exposed through a minimal C ABI consumed via ctypes
// (world_tpu/io/native.py).  Build: native/build.sh (g++ -O3 -shared).
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>

extern "C" {

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits_per_sample;
  int32_t format;       // 1 = PCM, 3 = IEEE float
  int64_t n_frames;     // samples per channel
};

// Parse the RIFF header; returns 0 on success. data_offset/data_size locate
// the payload inside the file buffer.
static int parse_header(const uint8_t* buf, int64_t size, WavInfo* info,
                        int64_t* data_offset, int64_t* data_size) {
  if (size < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= size) {
    const uint8_t* chunk = buf + pos;
    uint32_t chunk_size;
    memcpy(&chunk_size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0 && chunk_size >= 16) {
      uint16_t fmt, channels, bits;
      uint32_t rate;
      memcpy(&fmt, chunk + 8, 2);
      memcpy(&channels, chunk + 10, 2);
      memcpy(&rate, chunk + 12, 4);
      memcpy(&bits, chunk + 22, 2);
      info->format = fmt == 0xFFFE ? 1 : fmt;  // extensible -> assume PCM
      info->channels = channels;
      info->sample_rate = static_cast<int32_t>(rate);
      info->bits_per_sample = bits;
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      if (!have_fmt) return -2;
      *data_offset = pos + 8;
      *data_size = chunk_size;
      if (*data_offset + *data_size > size) *data_size = size - *data_offset;
      int bytes = info->bits_per_sample / 8;
      info->n_frames = *data_size / (bytes * info->channels);
      return 0;
    }
    pos += 8 + chunk_size + (chunk_size & 1);
  }
  return -3;
}

// Read a wav file: fills info, writes mono float64 samples (channel mean,
// normalized like the reference scripts: int16/(2^15-1)) into out (caller
// allocates capacity elements). Returns number of frames written, <0 on error.
int64_t wav_read_mono_f64(const char* path, WavInfo* info, double* out,
                          int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -2;
  }
  fclose(f);

  int64_t off = 0, dsize = 0;
  if (parse_header(buf.data(), size, info, &off, &dsize) != 0) return -3;
  if (out == nullptr) return info->n_frames;  // size query
  int64_t n = info->n_frames < capacity ? info->n_frames : capacity;
  const uint8_t* d = buf.data() + off;
  int ch = info->channels;

  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      int64_t k = i * ch + c;
      double v = 0.0;
      if (info->format == 3 && info->bits_per_sample == 32) {
        float s;
        memcpy(&s, d + 4 * k, 4);
        v = s;
      } else if (info->bits_per_sample == 16) {
        int16_t s;
        memcpy(&s, d + 2 * k, 2);
        v = s / 32767.0;  // reference normalization (example/prosody.py:13)
      } else if (info->bits_per_sample == 32) {
        int32_t s;
        memcpy(&s, d + 4 * k, 4);
        v = s / 2147483647.0;
      } else if (info->bits_per_sample == 8) {
        v = (d[k] - 128) / 127.0;
      } else {
        return -4;
      }
      acc += v;
    }
    out[i] = acc / ch;
  }
  return n;
}

// Write mono float64 samples as 16-bit PCM with clipping. Returns 0 on ok.
int wav_write_i16(const char* path, int32_t sample_rate, const double* y,
                  int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_size = static_cast<uint32_t>(n * 2);
  uint32_t riff_size = 36 + data_size;
  uint16_t fmt = 1, channels = 1, bits = 16;
  uint32_t rate = static_cast<uint32_t>(sample_rate);
  uint32_t byte_rate = rate * 2;
  uint16_t block_align = 2;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_size, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  uint32_t fmt_size = 16;
  fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt, 2, 1, f);
  fwrite(&channels, 2, 1, f);
  fwrite(&rate, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block_align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_size, 4, 1, f);
  std::vector<int16_t> pcm(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    double v = y[i];
    if (v > 1.0) v = 1.0;
    if (v < -1.0) v = -1.0;
    pcm[static_cast<size_t>(i)] = static_cast<int16_t>(v * 32767.0);
  }
  fwrite(pcm.data(), 2, static_cast<size_t>(n), f);
  fclose(f);
  return 0;
}

}  // extern "C"
