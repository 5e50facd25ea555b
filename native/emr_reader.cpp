// EMR corpus native reader: batched windowed gather from an mmap'd record
// file into a contiguous batch buffer.
//
// This is the framework's native input-pipeline fast path (the reference
// leans on LMDB + torch DataLoader worker processes, reference
// empose/data/datasets.py:19-62; here batch assembly is a multithreaded
// zero-parse memcpy into the padded batch layout expected by
// empose_tpu/data/batches.py). The Python side (empose_tpu/data/emr.py)
// parses the JSON footer index once and hands this library flat offset
// tables; the hot loop never touches Python.
//
// Build: make -C native   (produces native/libemr_reader.so, loaded via ctypes)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Opens and mmaps a file; returns base pointer (or nullptr) and size.
void* emr_mmap_open(const char* path, uint64_t* size_out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (base == MAP_FAILED) return nullptr;
  *size_out = static_cast<uint64_t>(st.st_size);
  return base;
}

void emr_mmap_close(void* base, uint64_t size) {
  if (base != nullptr) ::munmap(base, size);
}

// Gathers per-sample temporal windows of one field into a padded batch.
//
//   base        : mmap base pointer
//   offsets     : (n_samples,) byte offset of each sample's field blob
//   starts      : (n_samples,) window start frame per sample
//   n_frames    : (n_samples,) frames to copy per sample (<= pad_frames)
//   row_bytes   : bytes per frame row of this field
//   pad_frames  : padded frame count of the output batch
//   out         : (n_samples * pad_frames * row_bytes) zero-initialized by caller? No:
//                 this function zero-fills the padding tail itself.
//   n_threads   : worker threads (<=0 -> hardware_concurrency)
void emr_gather_windows(const char* base, const uint64_t* offsets, const int64_t* starts,
                        const int64_t* n_frames, int64_t n_samples, int64_t row_bytes,
                        int64_t pad_frames, char* out, int32_t n_threads) {
  const int64_t out_stride = pad_frames * row_bytes;
  int workers = n_threads > 0 ? n_threads : static_cast<int>(std::thread::hardware_concurrency());
  if (workers < 1) workers = 1;
  if (workers > n_samples) workers = static_cast<int>(n_samples);

  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_samples) break;
      const char* src = base + offsets[i] + starts[i] * row_bytes;
      const int64_t nbytes = n_frames[i] * row_bytes;
      char* dst = out + i * out_stride;
      std::memcpy(dst, src, nbytes);
      if (nbytes < out_stride) std::memset(dst + nbytes, 0, out_stride - nbytes);
    }
  };

  if (workers == 1) {
    work();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
}

// Gathers fixed-size per-sample blobs (e.g. betas) into a batch.
void emr_gather_fixed(const char* base, const uint64_t* offsets, int64_t n_samples,
                      int64_t blob_bytes, char* out) {
  for (int64_t i = 0; i < n_samples; ++i) {
    std::memcpy(out + i * blob_bytes, base + offsets[i], blob_bytes);
  }
}

}  // extern "C"
