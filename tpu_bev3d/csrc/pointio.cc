// Native point-cloud IO for the data loader hot path.
//
// The reference's loader leans on torch's C++ dataloader workers for IO
// throughput (mmdet3d LoadPointsFromFile -> np.fromfile per sample under
// mmengine's worker pool). This is the tpu_bev3d native equivalent: a
// small C++ library that mmap-reads .bin point files, range-filters, and
// writes straight into the caller's fixed-capacity padded buffer — one
// pass, no intermediate numpy allocations. Exposed via ctypes
// (tpu_bev3d/datasets/pointio.py).
//
// Build: make -C tpu_bev3d/csrc   (produces libpointio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Read a float32 .bin of [N, load_dim] points; keep points whose first
// three dims fall inside [range_min, range_max); copy the first use_dim
// channels of up to capacity kept points into out [capacity, use_dim]
// (caller-zeroed or not — rows beyond the returned count are zeroed
// here). Returns number of valid rows written, or -1 on IO error.
int64_t pointio_load_bin(const char* path, int64_t load_dim,
                         int64_t use_dim, const float* range_min,
                         const float* range_max, int has_range,
                         float* out, int64_t capacity) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  const int64_t n_floats = st.st_size / sizeof(float);
  const int64_t n_pts = load_dim > 0 ? n_floats / load_dim : 0;
  const float* data = nullptr;
  void* mapped = nullptr;
  if (st.st_size > 0) {
    mapped = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (mapped == MAP_FAILED) {
      close(fd);
      return -1;
    }
    data = reinterpret_cast<const float*>(mapped);
  }
  int64_t kept = 0;
  for (int64_t i = 0; i < n_pts && kept < capacity; ++i) {
    const float* p = data + i * load_dim;
    if (has_range) {
      bool ok = true;
      for (int d = 0; d < 3; ++d) {
        if (!(p[d] >= range_min[d] && p[d] < range_max[d])) {
          ok = false;
          break;
        }
      }
      if (!ok) continue;
    }
    std::memcpy(out + kept * use_dim, p, use_dim * sizeof(float));
    ++kept;
  }
  // zero the padding tail so callers get a clean fixed-shape buffer
  if (kept < capacity) {
    std::memset(out + kept * use_dim, 0,
                (capacity - kept) * use_dim * sizeof(float));
  }
  if (mapped) munmap(mapped, st.st_size);
  close(fd);
  return kept;
}

// Batched variant: paths is a '\n'-joined list; each sample writes into
// out[b] of shape [capacity, use_dim]; counts[b] receives the row count.
// Returns 0 on success, -1 if any file failed (counts[b] = -1 there).
int32_t pointio_load_batch(const char* paths_joined, int64_t n_paths,
                           int64_t load_dim, int64_t use_dim,
                           const float* range_min, const float* range_max,
                           int has_range, float* out, int64_t capacity,
                           int64_t* counts) {
  const char* cur = paths_joined;
  int32_t status = 0;
  for (int64_t b = 0; b < n_paths; ++b) {
    const char* end = strchr(cur, '\n');
    char buf[4096];
    size_t len = end ? static_cast<size_t>(end - cur) : strlen(cur);
    if (len >= sizeof(buf)) len = sizeof(buf) - 1;
    std::memcpy(buf, cur, len);
    buf[len] = 0;
    counts[b] = pointio_load_bin(buf, load_dim, use_dim, range_min,
                                 range_max, has_range,
                                 out + b * capacity * use_dim, capacity);
    if (counts[b] < 0) status = -1;
    cur = end ? end + 1 : cur + len;
  }
  return status;
}

}  // extern "C"
