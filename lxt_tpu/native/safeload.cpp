// Native safetensors loader: mmap + multithreaded dtype widening.
//
// The reference loads weights through torch (state_dict on CPU); here HF
// checkpoints are read directly: the safetensors container is mmap'd
// (zero-copy for same-dtype tensors) and bf16/f16 payloads are widened to
// f32 by a small thread pool. Exposed to Python via ctypes (lxt_tpu/io.py).
//
// File format (safetensors): u64 little-endian header length N, then N bytes
// of JSON {name: {dtype, shape, data_offsets:[begin,end]}, "__metadata__"?},
// then the tensor byte buffer. Offsets are relative to the end of the header.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread safeload.cpp -o libsafeload.so

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
  int fd = -1;
  void* base = nullptr;
  size_t size = 0;
};

inline float bf16_to_f32(uint16_t v) {
  uint32_t bits = static_cast<uint32_t>(v) << 16;
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(mant & 0x400)) { mant <<= 1; ++shift; }
      mant &= 0x3FF;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

void widen_range(const uint16_t* src, float* dst, size_t begin, size_t end,
                 int kind /*0=bf16, 1=f16*/) {
  if (kind == 0) {
    for (size_t i = begin; i < end; ++i) dst[i] = bf16_to_f32(src[i]);
  } else {
    for (size_t i = begin; i < end; ++i) dst[i] = f16_to_f32(src[i]);
  }
}

}  // namespace

extern "C" {

// Map a file; returns an opaque handle (heap Mapped*), null on failure or
// on a malformed container (size < 8 or header length past end-of-file) —
// rejecting truncated files here prevents out-of-bounds reads downstream.
void* sl_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) { ::close(fd); return nullptr; }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }
  uint64_t hlen;
  std::memcpy(&hlen, base, 8);
  if (hlen > static_cast<uint64_t>(st.st_size) - 8) {
    ::munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  ::madvise(base, st.st_size, MADV_WILLNEED);
  auto* m = new Mapped{fd, base, static_cast<size_t>(st.st_size)};
  return m;
}

uint64_t sl_header_len(void* handle) {
  auto* m = static_cast<Mapped*>(handle);
  if (!m || m->size < 8) return 0;
  uint64_t n;
  std::memcpy(&n, m->base, 8);
  return n;
}

// Pointer to the JSON header (NOT null-terminated; length = sl_header_len).
const char* sl_header(void* handle) {
  auto* m = static_cast<Mapped*>(handle);
  return static_cast<const char*>(m->base) + 8;
}

// Pointer to tensor data at byte offset `off` past the header.
const void* sl_data(void* handle, uint64_t off) {
  auto* m = static_cast<Mapped*>(handle);
  return static_cast<const char*>(m->base) + 8 + sl_header_len(handle) + off;
}

uint64_t sl_file_size(void* handle) {
  return static_cast<Mapped*>(handle)->size;
}

// Widen a half-precision payload into a caller-provided f32 buffer using
// `threads` workers. kind: 0 = bfloat16, 1 = float16.
void sl_widen(const void* src, float* dst, uint64_t count, int kind,
              int threads) {
  const auto* s = static_cast<const uint16_t*>(src);
  if (threads <= 1 || count < (1u << 20)) {
    widen_range(s, dst, 0, count, kind);
    return;
  }
  std::vector<std::thread> pool;
  uint64_t chunk = (count + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    uint64_t b = t * chunk;
    uint64_t e = b + chunk < count ? b + chunk : count;
    if (b >= e) break;
    pool.emplace_back(widen_range, s, dst, b, e, kind);
  }
  for (auto& th : pool) th.join();
}

void sl_close(void* handle) {
  auto* m = static_cast<Mapped*>(handle);
  if (!m) return;
  ::munmap(m->base, m->size);
  ::close(m->fd);
  delete m;
}

}  // extern "C"
