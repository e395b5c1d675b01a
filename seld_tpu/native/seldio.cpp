// seldio — native audio IO for the SELD TPU framework.
//
// Parity role: the reference decodes WAV files through torchaudio's C++
// backend (ref dataset.py:18-25 `torchaudio.load`). The pure-Python
// fallback (seld_tpu/data/audio.py) uses the stdlib `wave` module, which
// (a) cannot read WAVE_FORMAT_IEEE_FLOAT files at all and (b) pays Python
// overhead on the 24-bit unpack path. This library is the native
// equivalent: a standalone RIFF/WAVE parser that decodes
// PCM 8/16/24/32-bit, IEEE float32/64, and WAVE_FORMAT_EXTENSIBLE
// wrappers of either, directly into a planar (channels, frames) float32
// buffer in [-1, 1].
//
// C ABI only (consumed via ctypes — no pybind11 in this image):
//   seldio_decode_wav(path, &data, &channels, &frames, &sr, err, errlen)
//     -> 0 on success; data is malloc'd planar float32 (C * N), caller
//        frees with seldio_free. On failure returns nonzero and writes a
//        NUL-terminated message into err.
//   seldio_free(ptr)
//   seldio_version()

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  bool ok = true;

  uint32_t u32() {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { ok = false; return 0; }
    return (uint32_t)b[0] | ((uint32_t)b[1] << 8) | ((uint32_t)b[2] << 16) |
           ((uint32_t)b[3] << 24);
  }
  uint16_t u16() {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { ok = false; return 0; }
    return (uint16_t)b[0] | ((uint16_t)b[1] << 8);
  }
  bool tag(char out[5]) {
    if (fread(out, 1, 4, f) != 4) { ok = false; return false; }
    out[4] = '\0';
    return true;
  }
  bool skip(long n) { return fseek(f, n, SEEK_CUR) == 0; }
};

void set_err(char* err, int errlen, const char* msg) {
  if (err && errlen > 0) {
    snprintf(err, (size_t)errlen, "%s", msg);
  }
}

constexpr uint16_t WAVE_FORMAT_PCM = 1;
constexpr uint16_t WAVE_FORMAT_IEEE_FLOAT = 3;
constexpr uint16_t WAVE_FORMAT_EXTENSIBLE = 0xFFFE;

}  // namespace

extern "C" {

const char* seldio_version() { return "seldio 1.0"; }

void seldio_free(float* p) { free(p); }

int seldio_decode_wav(const char* path, float** out_data, int32_t* out_channels,
                      int64_t* out_frames, int32_t* out_sr, char* err,
                      int32_t errlen) {
  *out_data = nullptr;
  FILE* f = fopen(path, "rb");
  if (!f) {
    set_err(err, errlen, "cannot open file");
    return 1;
  }
  // File size bound: chunk size fields are untrusted (a corrupt header
  // claiming 4 GB must not drive a 4 GB allocation).
  fseek(f, 0, SEEK_END);
  long file_size = ftell(f);
  fseek(f, 0, SEEK_SET);
  Reader r{f};

  char tag[5];
  if (!r.tag(tag) || strcmp(tag, "RIFF") != 0) {
    fclose(f);
    set_err(err, errlen, "not a RIFF file");
    return 2;
  }
  r.u32();  // riff size (unreliable for >4GB / streamed files; ignored)
  if (!r.tag(tag) || strcmp(tag, "WAVE") != 0) {
    fclose(f);
    set_err(err, errlen, "not a WAVE file");
    return 2;
  }

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  bool have_fmt = false;
  std::vector<uint8_t> payload;

  // Chunk walk: fmt must precede data; unknown chunks (LIST, fact, bext,
  // iXML...) are skipped with word alignment.
  while (r.tag(tag)) {
    uint32_t size = r.u32();
    if (!r.ok) break;
    if (strcmp(tag, "fmt ") == 0) {
      if (size < 16) {
        // A short fmt chunk would desynchronize the chunk walk (we always
        // consume 16 bytes below) and could silently decode garbage.
        fclose(f);
        set_err(err, errlen, "fmt chunk too small");
        return 3;
      }
      fmt = r.u16();
      channels = r.u16();
      sr = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      long remaining = (long)size - 16;
      if (fmt == WAVE_FORMAT_EXTENSIBLE && remaining >= 10) {
        uint16_t cbsize = r.u16();
        r.u16();  // valid bits per sample
        r.u32();  // channel mask
        uint16_t sub = r.u16();  // first 2 bytes of the SubFormat GUID
        fmt = sub;
        remaining -= 2 + 2 + 4 + 2;
        (void)cbsize;
      }
      if (remaining > 0 && !r.skip(remaining + (size & 1))) break;
      else if (remaining <= 0 && (size & 1) && !r.skip(1)) break;
      have_fmt = true;
    } else if (strcmp(tag, "data") == 0) {
      if (!have_fmt) {
        fclose(f);
        set_err(err, errlen, "data chunk before fmt chunk");
        return 3;
      }
      // Clamp to the bytes actually present; a size field pointing past
      // EOF is a corrupt/truncated file -> error out so the caller's
      // Python fallback (which will reject it cleanly) takes over.
      long here = ftell(f);
      long avail = file_size > here ? file_size - here : 0;
      if ((long)size > avail) {
        fclose(f);
        set_err(err, errlen, "data chunk size exceeds file size (truncated?)");
        return 3;
      }
      try {
        payload.resize(size);
      } catch (const std::bad_alloc&) {
        fclose(f);
        set_err(err, errlen, "data chunk too large to allocate");
        return 5;
      }
      if (size > 0 && fread(payload.data(), 1, size, f) != size) {
        fclose(f);
        set_err(err, errlen, "short read of data chunk");
        return 3;
      }
      break;
    } else {
      if (!r.skip((long)size + (size & 1))) break;
    }
  }
  fclose(f);

  if (!have_fmt || payload.empty()) {
    set_err(err, errlen, "missing fmt or data chunk");
    return 3;
  }
  if (channels == 0 || sr == 0) {
    set_err(err, errlen, "invalid fmt chunk (0 channels or 0 sample rate)");
    return 3;
  }

  const uint8_t* p = payload.data();
  size_t nbytes = payload.size();
  size_t bytes_per_sample;
  if (fmt == WAVE_FORMAT_PCM &&
      (bits == 8 || bits == 16 || bits == 24 || bits == 32)) {
    bytes_per_sample = bits / 8;
  } else if (fmt == WAVE_FORMAT_IEEE_FLOAT && (bits == 32 || bits == 64)) {
    bytes_per_sample = bits / 8;
  } else {
    set_err(err, errlen, "unsupported format (not PCM 8/16/24/32 or float 32/64)");
    return 4;
  }

  int64_t frames = (int64_t)(nbytes / (bytes_per_sample * channels));
  if (frames == 0) {
    // Non-empty data chunk smaller than one interleaved frame: rejecting
    // it explicitly (rather than malloc(0), which may legally return NULL
    // and masquerade as out-of-memory) routes load_wav to the Python
    // fallback with an accurate message.
    set_err(err, errlen, "data chunk smaller than one audio frame");
    return 3;
  }
  float* out = (float*)malloc(sizeof(float) * (size_t)frames * channels);
  if (!out) {
    set_err(err, errlen, "out of memory");
    return 5;
  }

  // Interleaved -> planar (channels, frames), normalized to [-1, 1] with
  // the same scale conventions as the Python decoder / torchaudio
  // (int16/32768, int32/2^31, int24/2^23, uint8 offset-binary).
  //
  // Single sequential pass over the payload (reads stream linearly; the
  // C planar write streams are few and cache-resident) — measured ~2-3x
  // faster than a per-channel strided walk on the 1-core host.
  const int C = channels;
  switch (fmt) {
    case WAVE_FORMAT_PCM:
      if (bits == 16) {
        const int16_t* s = (const int16_t*)p;  // WAV payloads are LE;
        // target is LE (x86/ARM little-endian assumed for this image).
        constexpr float k = 1.0f / 32768.0f;
        for (int64_t i = 0; i < frames; ++i)
          for (int c = 0; c < C; ++c) out[(size_t)c * frames + i] = k * s[i * C + c];
      } else if (bits == 24) {
        constexpr float k = 1.0f / 8388608.0f;
        const uint8_t* s = p;
        for (int64_t i = 0; i < frames; ++i)
          for (int c = 0; c < C; ++c, s += 3) {
            // Sign-extend by loading into the TOP 3 bytes of an int32.
            int32_t v = (int32_t)(((uint32_t)s[0] << 8) | ((uint32_t)s[1] << 16) |
                                  ((uint32_t)s[2] << 24)) >> 8;
            out[(size_t)c * frames + i] = k * (float)v;
          }
      } else if (bits == 32) {
        constexpr double k = 1.0 / 2147483648.0;
        const int32_t* s = (const int32_t*)p;
        for (int64_t i = 0; i < frames; ++i)
          for (int c = 0; c < C; ++c)
            out[(size_t)c * frames + i] = (float)(k * s[i * C + c]);
      } else {  // 8-bit offset binary
        constexpr float k = 1.0f / 128.0f;
        for (int64_t i = 0; i < frames; ++i)
          for (int c = 0; c < C; ++c)
            out[(size_t)c * frames + i] = k * ((float)p[i * C + c] - 128.0f);
      }
      break;
    case WAVE_FORMAT_IEEE_FLOAT:
      if (bits == 32) {
        const float* s = (const float*)p;
        for (int64_t i = 0; i < frames; ++i)
          for (int c = 0; c < C; ++c) out[(size_t)c * frames + i] = s[i * C + c];
      } else {  // float64
        const double* s = (const double*)p;
        for (int64_t i = 0; i < frames; ++i)
          for (int c = 0; c < C; ++c)
            out[(size_t)c * frames + i] = (float)s[i * C + c];
      }
      break;
  }

  *out_data = out;
  *out_channels = channels;
  *out_frames = frames;
  *out_sr = (int32_t)sr;
  return 0;
}

}  // extern "C"
