// Binary telemetry log codec — native tier of the telemetry subsystem.
//
// Reference: jiminy's TelemetryRecorder writes binary logs with fixed-size
// memory chunks and a constants header (SURVEY.md §2.1 "Telemetry", §5
// observability). This codec implements the host-side encoder/decoder for
// the jiminy_tpu log format:
//
//   [0:4)   magic "JTPU"
//   [4:8)   u32 version (=1)
//   [8:16)  u64 header length H
//   [16:16+H) UTF-8 JSON header: constants, variable names, rows, cols
//   [..]    float32 column-major-by-row data block, rows × cols
//
// Exposed with C linkage for ctypes. Buffered I/O with a single
// write/read of the data block — the device→host DMA drain hands a
// contiguous float32 buffer straight to disk with no Python copies.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {
constexpr char kMagic[4] = {'J', 'T', 'P', 'U'};
constexpr uint32_t kVersion = 1;
}  // namespace

extern "C" {

// Returns 0 on success, negative error codes otherwise.
int jtpu_write_log(const char* path, const char* header_json,
                   const float* data, uint64_t rows, uint64_t cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint64_t hlen = std::strlen(header_json);
  int ok = 1;
  ok &= std::fwrite(kMagic, 1, 4, f) == 4;
  ok &= std::fwrite(&kVersion, sizeof(kVersion), 1, f) == 1;
  ok &= std::fwrite(&hlen, sizeof(hlen), 1, f) == 1;
  ok &= std::fwrite(header_json, 1, hlen, f) == hlen;
  uint64_t n = rows * cols;
  if (n) ok &= std::fwrite(data, sizeof(float), n, f) == n;
  std::fclose(f);
  return ok ? 0 : -2;
}

// Appends rows to an existing log (streaming drain). Header rows count is
// NOT updated on disk; readers trust the data-block length instead.
int jtpu_append_rows(const char* path, const float* data, uint64_t rows,
                     uint64_t cols) {
  FILE* f = std::fopen(path, "ab");
  if (!f) return -1;
  uint64_t n = rows * cols;
  int ok = n ? std::fwrite(data, sizeof(float), n, f) == n : 1;
  std::fclose(f);
  return ok ? 0 : -2;
}

// Reads the header; returns header length, or negative error. If buf is
// non-null, copies up to buflen bytes of JSON into it.
int64_t jtpu_read_header(const char* path, char* buf, uint64_t buflen,
                         uint64_t* data_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version = 0;
  uint64_t hlen = 0;
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, kMagic, 4) != 0 ||
      std::fread(&version, sizeof(version), 1, f) != 1 || version != kVersion ||
      std::fread(&hlen, sizeof(hlen), 1, f) != 1) {
    std::fclose(f);
    return -2;
  }
  if (buf) {
    uint64_t m = hlen < buflen ? hlen : buflen;
    if (std::fread(buf, 1, m, f) != m) {
      std::fclose(f);
      return -3;
    }
  }
  if (data_floats) {
    if (std::fseek(f, 0, SEEK_END) != 0) {
      std::fclose(f);
      return -4;
    }
    long end = std::ftell(f);
    uint64_t data_off = 16 + hlen;
    *data_floats =
        end > static_cast<long>(data_off)
            ? (static_cast<uint64_t>(end) - data_off) / sizeof(float)
            : 0;
  }
  std::fclose(f);
  return static_cast<int64_t>(hlen);
}

// Reads up to max_floats of the data block into out. Returns count read.
int64_t jtpu_read_data(const char* path, float* out, uint64_t max_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version;
  uint64_t hlen;
  if (std::fread(magic, 1, 4, f) != 4 ||
      std::fread(&version, sizeof(version), 1, f) != 1 ||
      std::fread(&hlen, sizeof(hlen), 1, f) != 1 ||
      std::fseek(f, static_cast<long>(16 + hlen), SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  uint64_t n = std::fread(out, sizeof(float), max_floats, f);
  std::fclose(f);
  return static_cast<int64_t>(n);
}

}  // extern "C"
