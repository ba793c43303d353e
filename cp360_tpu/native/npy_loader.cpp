// Native batch .npy loader: parallel file reads into one contiguous buffer.
//
// The reference feeds training from thousands of small per-frame .npy files
// via torch DataLoader worker *processes* (temporal_model/train_temporal.py:
// 232-233).  Here a C++ thread pool reads a whole batch of files straight
// into the caller's pinned buffer with zero Python/GIL involvement — the
// host side of the TPU input pipeline.
//
// Format support: NPY v1.0/v2.0, C-order, any dtype (bytes are copied
// verbatim; the Python wrapper validates dtype/shape from the header of the
// first file and hands numpy a typed view).
//
// Build: g++ -O3 -shared -fPIC -pthread npy_loader.cpp -o libnpy_loader.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  uint64_t data_offset = 0;
  uint64_t data_bytes = 0;
  char error[256] = {0};
  bool ok = false;
};

// Parse enough of the NPY header to find the payload. Returns file size via
// stat-free seek; does not interpret dtype/shape (Python side does).
NpyInfo parse_header(FILE* f) {
  NpyInfo info;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    snprintf(info.error, sizeof(info.error), "bad NPY magic");
    return info;
  }
  const int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) {
      snprintf(info.error, sizeof(info.error), "truncated v1 header");
      return info;
    }
    header_len = b[0] | (b[1] << 8);
    info.data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) {
      snprintf(info.error, sizeof(info.error), "truncated v2 header");
      return info;
    }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    info.data_offset = 12 + header_len;
  }
  if (fseek(f, 0, SEEK_END) != 0) {
    snprintf(info.error, sizeof(info.error), "seek failed");
    return info;
  }
  long end = ftell(f);
  if (end < 0 || (uint64_t)end < info.data_offset) {
    snprintf(info.error, sizeof(info.error), "file smaller than header");
    return info;
  }
  info.data_bytes = (uint64_t)end - info.data_offset;
  info.ok = true;
  return info;
}

bool read_payload(const char* path, char* dst, uint64_t expected_bytes,
                  char* errbuf, size_t errlen) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(errbuf, errlen, "cannot open %s", path);
    return false;
  }
  NpyInfo info = parse_header(f);
  if (!info.ok) {
    snprintf(errbuf, errlen, "%s: %s", path, info.error);
    fclose(f);
    return false;
  }
  if (info.data_bytes != expected_bytes) {
    snprintf(errbuf, errlen, "%s: payload %llu bytes, expected %llu", path,
             (unsigned long long)info.data_bytes,
             (unsigned long long)expected_bytes);
    fclose(f);
    return false;
  }
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0 ||
      fread(dst, 1, expected_bytes, f) != expected_bytes) {
    snprintf(errbuf, errlen, "%s: short read", path);
    fclose(f);
    return false;
  }
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Returns the payload byte count of one .npy (0 on error; err filled).
uint64_t npy_payload_bytes(const char* path, char* err, int errlen) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(err, errlen, "cannot open %s", path);
    return 0;
  }
  NpyInfo info = parse_header(f);
  fclose(f);
  if (!info.ok) {
    snprintf(err, errlen, "%s: %s", path, info.error);
    return 0;
  }
  return info.data_bytes;
}

// Read n files' payloads (each exactly item_bytes) into out[i*item_bytes].
// paths: array of n C strings. n_threads <= 0 -> hardware_concurrency.
// Returns 0 on success, else the 1-based index of the first failed file
// (err describes it).
int npy_load_batch(const char** paths, int n, char* out, uint64_t item_bytes,
                   int n_threads, char* err, int errlen) {
  if (n <= 0) return 0;
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n) n_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> failed(0);  // 1-based index of first failure
  std::vector<std::string> errors(n);

  auto worker = [&]() {
    char local_err[512];
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      if (!read_payload(paths[i], out + (uint64_t)i * item_bytes, item_bytes,
                        local_err, sizeof(local_err))) {
        errors[i] = local_err;
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  int bad = failed.load();
  if (bad != 0) {
    snprintf(err, errlen, "%s", errors[bad - 1].c_str());
    return bad;
  }
  return 0;
}

}  // extern "C"
