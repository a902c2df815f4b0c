// Out-of-core sliding-window batch loader for long multivariate series.
//
// The reference keeps entire series in device memory (its longest is
// T=2048, CRVAE_lorenz96.py:739) and materializes every window up front
// (arrange_input, author_CRVAE.py:335-353).  For production-scale series
// (T in the hundreds of millions) neither fits: this loader memory-maps a
// float32 (T, p) series file and assembles shuffled window minibatches
// directly into caller-provided buffers — the host-side IO/runtime role a
// framework needs where the reference had nothing.
//
// Plain C ABI (driven from Python via ctypes):
//   wl_open(path, t, p)                 -> handle (mmap, zero-copy)
//   wl_open_inline(data, t, p)          -> handle (caller-owned buffer)
//   wl_num_windows(h, context)          -> T - context
//   wl_fill_batch(h, idx, n, ctx, out)  -> gather n windows (n, ctx, p)
//   wl_fill_shifted_batch(...)          -> inputs + one-step targets
//   wl_standardize(h)                   -> per-variable (x - mean) / std
//                                          into an internal copy
//   wl_close(h)
//
// Thread-free by design: batch assembly is a straight memcpy sweep that
// saturates memory bandwidth on one core; parallel prefetch belongs a
// level up (double-buffer two handles).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Loader {
  const float* data = nullptr;   // (t, p) row-major
  float* owned = nullptr;        // standardized copy, if materialized
  void* mapped = nullptr;        // mmap base (if file-backed)
  size_t mapped_bytes = 0;
  int fd = -1;
  int64_t t = 0;
  int64_t p = 0;

  const float* active() const { return owned ? owned : data; }
};

}  // namespace

extern "C" {

void* wl_open(const char* path, int64_t t, int64_t p) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  size_t bytes = static_cast<size_t>(t) * p * sizeof(float);
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < bytes) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, bytes, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* h = new Loader();
  h->data = static_cast<const float*>(base);
  h->mapped = base;
  h->mapped_bytes = bytes;
  h->fd = fd;
  h->t = t;
  h->p = p;
  return h;
}

void* wl_open_inline(const float* data, int64_t t, int64_t p) {
  if (data == nullptr || t <= 0 || p <= 0) return nullptr;
  auto* h = new Loader();
  h->data = data;
  h->t = t;
  h->p = p;
  return h;
}

int64_t wl_num_windows(void* handle, int64_t context) {
  auto* h = static_cast<Loader*>(handle);
  if (!h || context >= h->t) return 0;
  return h->t - context;
}

// Gather windows[idx[i]] of length `context` into out (n, context, p).
// Returns 0 on success, -1 on a bad handle, -2 on an out-of-range index.
int wl_fill_batch(void* handle, const int64_t* idx, int64_t n,
                  int64_t context, float* out) {
  auto* h = static_cast<Loader*>(handle);
  if (!h || !idx || !out) return -1;
  const int64_t limit = h->t - context;
  const float* src = h->active();
  const size_t window_bytes = static_cast<size_t>(context) * h->p * sizeof(float);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t start = idx[i];
    if (start < 0 || start >= limit) return -2;
    std::memcpy(out + i * context * h->p, src + start * h->p, window_bytes);
  }
  return 0;
}

// Inputs plus one-step-shifted targets — the arrange_input contract
// (inputs[i, j] = series[idx[i] + j], targets shifted by one).
int wl_fill_shifted_batch(void* handle, const int64_t* idx, int64_t n,
                          int64_t context, float* inputs, float* targets) {
  auto* h = static_cast<Loader*>(handle);
  if (!h || !idx || !inputs || !targets) return -1;
  const int64_t limit = h->t - context;   // start + context must be < t
  const float* src = h->active();
  const size_t window_bytes = static_cast<size_t>(context) * h->p * sizeof(float);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t start = idx[i];
    if (start < 0 || start >= limit) return -2;
    std::memcpy(inputs + i * context * h->p, src + start * h->p, window_bytes);
    std::memcpy(targets + i * context * h->p, src + (start + 1) * h->p,
                window_bytes);
  }
  return 0;
}

// Per-variable standardization over time into an internal copy (the
// Lorenz-96 generator's normalization, CRVAE_lorenz96.py:718-721).
int wl_standardize(void* handle) {
  auto* h = static_cast<Loader*>(handle);
  if (!h) return -1;
  const float* src = h->active();
  float* dst = static_cast<float*>(
      std::malloc(static_cast<size_t>(h->t) * h->p * sizeof(float)));
  if (!dst) return -3;
  for (int64_t j = 0; j < h->p; ++j) {
    double mean = 0.0;
    for (int64_t i = 0; i < h->t; ++i) mean += src[i * h->p + j];
    mean /= static_cast<double>(h->t);
    double var = 0.0;
    for (int64_t i = 0; i < h->t; ++i) {
      const double d = src[i * h->p + j] - mean;
      var += d * d;
    }
    const double std = std::sqrt(var / static_cast<double>(h->t)) + 1e-8;
    for (int64_t i = 0; i < h->t; ++i) {
      dst[i * h->p + j] =
          static_cast<float>((src[i * h->p + j] - mean) / std);
    }
  }
  std::free(h->owned);
  h->owned = dst;
  return 0;
}

void wl_close(void* handle) {
  auto* h = static_cast<Loader*>(handle);
  if (!h) return;
  std::free(h->owned);
  if (h->mapped) munmap(h->mapped, h->mapped_bytes);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
