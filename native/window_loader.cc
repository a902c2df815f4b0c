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
//   wl_num_windows(h, ctx, shifted)     -> T - ctx + 1 plain, T - ctx shifted
//   wl_fill_batch(h, idx, n, ctx, out)  -> gather n windows (n, ctx, p)
//   wl_fill_shifted_batch(...)          -> inputs + one-step targets
//   wl_standardize(h)                   -> per-variable (x - mean) / std,
//                                          O(p) memory: stats are stored and
//                                          applied during fills
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
  double* mean = nullptr;        // (p,) standardization stats, if enabled
  double* inv_std = nullptr;     // (p,)
  void* mapped = nullptr;        // mmap base (if file-backed)
  size_t mapped_bytes = 0;
  int fd = -1;
  int64_t t = 0;
  int64_t p = 0;

  // Copy `rows` series rows starting at `start` into `out`, applying the
  // standardization stats when present.
  void copy_rows(int64_t start, int64_t rows, float* out) const {
    const float* src = data + start * p;
    if (!mean) {
      std::memcpy(out, src, static_cast<size_t>(rows) * p * sizeof(float));
      return;
    }
    for (int64_t i = 0; i < rows; ++i) {
      for (int64_t j = 0; j < p; ++j) {
        out[i * p + j] = static_cast<float>(
            (src[i * p + j] - mean[j]) * inv_std[j]);
      }
    }
  }
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

// Plain windows can start anywhere with start + context <= t (count
// T - ctx + 1, matching data.windows.sliding_windows); shifted pairs read
// one extra row, so start + context + 1 <= t (count T - ctx, matching
// arrange_input).
int64_t wl_num_windows(void* handle, int64_t context, int shifted) {
  auto* h = static_cast<Loader*>(handle);
  if (!h || context > h->t) return 0;
  const int64_t n = h->t - context + (shifted ? 0 : 1);
  return n > 0 ? n : 0;
}

// Gather windows[idx[i]] of length `context` into out (n, context, p).
// Returns 0 on success, -1 on a bad handle, -2 on an out-of-range index.
int wl_fill_batch(void* handle, const int64_t* idx, int64_t n,
                  int64_t context, float* out) {
  auto* h = static_cast<Loader*>(handle);
  if (!h || !idx || !out) return -1;
  const int64_t limit = wl_num_windows(handle, context, /*shifted=*/0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t start = idx[i];
    if (start < 0 || start >= limit) return -2;
    h->copy_rows(start, context, out + i * context * h->p);
  }
  return 0;
}

// Inputs plus one-step-shifted targets — the arrange_input contract
// (inputs[i, j] = series[idx[i] + j], targets shifted by one).
int wl_fill_shifted_batch(void* handle, const int64_t* idx, int64_t n,
                          int64_t context, float* inputs, float* targets) {
  auto* h = static_cast<Loader*>(handle);
  if (!h || !idx || !inputs || !targets) return -1;
  const int64_t limit = wl_num_windows(handle, context, /*shifted=*/1);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t start = idx[i];
    if (start < 0 || start >= limit) return -2;
    h->copy_rows(start, context, inputs + i * context * h->p);
    h->copy_rows(start + 1, context, targets + i * context * h->p);
  }
  return 0;
}

// Per-variable standardization over time (the Lorenz-96 generator's
// normalization, CRVAE_lorenz96.py:718-721).  O(p) memory: one streaming
// pass computes mean/std, which the fill paths then apply on the fly — no
// materialized copy, so arbitrarily long mmapped series stay out of core.
int wl_standardize(void* handle) {
  auto* h = static_cast<Loader*>(handle);
  if (!h) return -1;
  auto* mean = static_cast<double*>(std::calloc(h->p, sizeof(double)));
  auto* m2 = static_cast<double*>(std::calloc(h->p, sizeof(double)));
  auto* inv_std = static_cast<double*>(std::calloc(h->p, sizeof(double)));
  if (!mean || !m2 || !inv_std) {
    std::free(mean);
    std::free(m2);
    std::free(inv_std);
    return -3;
  }
  // Welford, one sequential pass over the (possibly mmapped) series.
  for (int64_t i = 0; i < h->t; ++i) {
    const float* row = h->data + i * h->p;
    for (int64_t j = 0; j < h->p; ++j) {
      const double delta = row[j] - mean[j];
      mean[j] += delta / static_cast<double>(i + 1);
      m2[j] += delta * (row[j] - mean[j]);
    }
  }
  for (int64_t j = 0; j < h->p; ++j) {
    const double std = std::sqrt(m2[j] / static_cast<double>(h->t)) + 1e-8;
    inv_std[j] = 1.0 / std;
  }
  std::free(m2);
  std::free(h->mean);
  std::free(h->inv_std);
  h->mean = mean;
  h->inv_std = inv_std;
  return 0;
}

void wl_close(void* handle) {
  auto* h = static_cast<Loader*>(handle);
  if (!h) return;
  std::free(h->mean);
  std::free(h->inv_std);
  if (h->mapped) munmap(h->mapped, h->mapped_bytes);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
