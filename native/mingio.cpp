// mingio: native IO runtime for ming-univision-tpu.
//
// The reference stack leans on external native components for its runtime
// (decord C++ video, CUDA kernels, binary wheels). Our TPU-native equivalent
// needs fast host-side IO above the XLA compute path; this library provides:
//
//   1. mmap'd checkpoint reading with multithreaded materialization
//      (st_read_blocks): 16B-class checkpoints are ~32 GB of safetensors —
//      single-threaded python reads + copies dominate startup otherwise.
//   2. multithreaded 2-D transpose (st_read_transpose2d): torch stores linear
//      weights (out, in); our layout is (in, out). Transposing tens of GB in
//      numpy is single-threaded; here it's blocked and parallel.
//   3. multithreaded uint8 -> normalized fp32 CHW image batch conversion
//      (img_normalize_chw): the data-loader hot loop feeding the chip.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: make -C native   (produces libmingio.so)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct MappedFile {
  int fd = -1;
  void* base = nullptr;
  size_t size = 0;
};

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// run fn(i) for i in [0, n) over a thread pool
template <typename F>
void parallel_for(int64_t n, F fn, int max_threads = 0) {
  int nt = max_threads > 0 ? max_threads : hw_threads();
  if (n < nt) nt = static_cast<int>(n);
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      int64_t i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// mmap handle management
// ---------------------------------------------------------------------------

void* st_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(base, st.st_size, MADV_SEQUENTIAL);
  auto* mf = new MappedFile{fd, base, static_cast<size_t>(st.st_size)};
  return mf;
}

uint64_t st_size(void* handle) { return handle ? static_cast<MappedFile*>(handle)->size : 0; }

const void* st_base(void* handle) { return handle ? static_cast<MappedFile*>(handle)->base : nullptr; }

void st_close(void* handle) {
  if (!handle) return;
  auto* mf = static_cast<MappedFile*>(handle);
  munmap(mf->base, mf->size);
  ::close(mf->fd);
  delete mf;
}

// ---------------------------------------------------------------------------
// parallel block copy: materialize [offset, offset+nbytes) into dest
// ---------------------------------------------------------------------------

int st_read_blocks(void* handle, uint64_t offset, uint64_t nbytes, void* dest, int num_threads) {
  auto* mf = static_cast<MappedFile*>(handle);
  if (!mf || offset + nbytes > mf->size) return -1;
  const char* src = static_cast<const char*>(mf->base) + offset;
  char* dst = static_cast<char*>(dest);
  const uint64_t block = 8ull << 20;  // 8 MB blocks
  int64_t nblocks = static_cast<int64_t>((nbytes + block - 1) / block);
  parallel_for(
      nblocks,
      [&](int64_t b) {
        uint64_t lo = static_cast<uint64_t>(b) * block;
        uint64_t len = lo + block > nbytes ? nbytes - lo : block;
        std::memcpy(dst + lo, src + lo, len);
      },
      num_threads);
  return 0;
}

// ---------------------------------------------------------------------------
// parallel blocked 2-D transpose: (rows, cols) elem_size bytes -> (cols, rows)
// ---------------------------------------------------------------------------

int st_read_transpose2d(void* handle, uint64_t offset, uint64_t rows, uint64_t cols,
                        uint32_t elem_size, void* dest, int num_threads) {
  auto* mf = static_cast<MappedFile*>(handle);
  uint64_t nbytes = rows * cols * static_cast<uint64_t>(elem_size);
  if (!mf || offset + nbytes > mf->size) return -1;
  const char* src = static_cast<const char*>(mf->base) + offset;
  char* dst = static_cast<char*>(dest);
  const uint64_t TB = 64;  // tile edge
  uint64_t tiles_r = (rows + TB - 1) / TB;
  uint64_t tiles_c = (cols + TB - 1) / TB;
  parallel_for(
      static_cast<int64_t>(tiles_r * tiles_c),
      [&](int64_t t) {
        uint64_t tr = static_cast<uint64_t>(t) / tiles_c;
        uint64_t tc = static_cast<uint64_t>(t) % tiles_c;
        uint64_t r0 = tr * TB, r1 = std::min(rows, r0 + TB);
        uint64_t c0 = tc * TB, c1 = std::min(cols, c0 + TB);
        for (uint64_t r = r0; r < r1; ++r) {
          const char* srow = src + (r * cols + c0) * elem_size;
          for (uint64_t c = c0; c < c1; ++c) {
            std::memcpy(dst + (c * rows + r) * elem_size, srow + (c - c0) * elem_size, elem_size);
          }
        }
      },
      num_threads);
  return 0;
}

// ---------------------------------------------------------------------------
// image batch: uint8 HWC -> normalized fp32 CHW ((x/255 - mean) / std)
// ---------------------------------------------------------------------------

int img_normalize_chw(const uint8_t* src, uint64_t batch, uint64_t height, uint64_t width,
                      const float* mean, const float* stdv, float* dst, int num_threads) {
  const uint64_t hw = height * width;
  float inv_std[3], off[3];
  for (int c = 0; c < 3; ++c) {
    inv_std[c] = 1.0f / (255.0f * stdv[c]);
    off[c] = mean[c] / stdv[c];
  }
  parallel_for(
      static_cast<int64_t>(batch * height),
      [&](int64_t bh) {
        uint64_t b = static_cast<uint64_t>(bh) / height;
        uint64_t h = static_cast<uint64_t>(bh) % height;
        const uint8_t* s = src + (b * hw + h * width) * 3;
        float* d0 = dst + b * 3 * hw + h * width;
        for (uint64_t w = 0; w < width; ++w) {
          d0[w] = s[3 * w + 0] * inv_std[0] - off[0];
          d0[hw + w] = s[3 * w + 1] * inv_std[1] - off[1];
          d0[2 * hw + w] = s[3 * w + 2] * inv_std[2] - off[2];
        }
      },
      num_threads);
  return 0;
}

// ---------------------------------------------------------------------------
// prefetch queue: background-threaded image decode+normalize pipeline
// (the data-loader feeding the chip runs off the Python thread; ROADMAP P2)
// ---------------------------------------------------------------------------

struct PrefetchJob {
  uint64_t ticket;
  std::vector<uint8_t> src;  // owned copy of the HWC batch
  uint64_t batch, height, width;
  float mean[3], stdv[3];
  std::vector<float> out;  // filled by a worker
};

struct PrefetchQueue {
  std::mutex mu;
  std::condition_variable cv_in;   // workers wait for jobs
  std::condition_variable cv_out;  // consumers wait for results
  std::deque<PrefetchJob*> pending;
  std::deque<PrefetchJob*> done;
  std::vector<std::thread> workers;
  int in_flight = 0;  // submitted, not yet popped
  bool stop = false;

  explicit PrefetchQueue(int num_threads) {
    int nt = num_threads > 0 ? num_threads : std::max(1, hw_threads() / 2);
    for (int t = 0; t < nt; ++t) {
      workers.emplace_back([this]() { worker_loop(); });
    }
  }

  void worker_loop() {
    for (;;) {
      PrefetchJob* job = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_in.wait(lk, [&] { return stop || !pending.empty(); });
        if (stop && pending.empty()) return;
        job = pending.front();
        pending.pop_front();
      }
      job->out.resize(job->batch * 3 * job->height * job->width);
      img_normalize_chw(job->src.data(), job->batch, job->height, job->width, job->mean,
                        job->stdv, job->out.data(), 1);
      job->src.clear();
      job->src.shrink_to_fit();
      {
        std::lock_guard<std::mutex> lk(mu);
        done.push_back(job);
      }
      cv_out.notify_all();
    }
  }

  ~PrefetchQueue() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_in.notify_all();
    for (auto& th : workers) th.join();
    for (auto* j : pending) delete j;
    for (auto* j : done) delete j;
  }
};

void* pq_create(int num_threads) { return new PrefetchQueue(num_threads); }

void pq_destroy(void* q) { delete static_cast<PrefetchQueue*>(q); }

int pq_submit(void* qh, uint64_t ticket, const uint8_t* src, uint64_t batch, uint64_t height,
              uint64_t width, const float* mean, const float* stdv) {
  if (!qh || !src) return -1;
  auto* q = static_cast<PrefetchQueue*>(qh);
  auto* job = new PrefetchJob();
  job->ticket = ticket;
  job->batch = batch;
  job->height = height;
  job->width = width;
  std::memcpy(job->mean, mean, sizeof(job->mean));
  std::memcpy(job->stdv, stdv, sizeof(job->stdv));
  job->src.assign(src, src + batch * height * width * 3);
  {
    std::lock_guard<std::mutex> lk(q->mu);
    q->pending.push_back(job);
    ++q->in_flight;
  }
  q->cv_in.notify_one();
  return 0;
}

// Pop ANY completed job. Blocks when `block` != 0 and work is in flight.
// Returns 1 and fills (ticket, batch, height, width) + copies the floats into
// dest (must hold batch*3*h*w floats; pass dest_capacity to guard); 0 when
// nothing is ready; -1 when the queue is empty and idle.
int pq_pop(void* qh, int block, uint64_t* ticket, uint64_t* batch, uint64_t* height,
           uint64_t* width, float* dest, uint64_t dest_capacity) {
  if (!qh) return -1;
  auto* q = static_cast<PrefetchQueue*>(qh);
  std::unique_lock<std::mutex> lk(q->mu);
  if (q->done.empty() && q->in_flight == 0) return -1;
  if (block) {
    q->cv_out.wait(lk, [&] { return !q->done.empty(); });
  } else if (q->done.empty()) {
    return 0;
  }
  PrefetchJob* job = q->done.front();
  uint64_t n = job->batch * 3 * job->height * job->width;
  if (n > dest_capacity) return -2;
  q->done.pop_front();
  --q->in_flight;
  lk.unlock();
  *ticket = job->ticket;
  *batch = job->batch;
  *height = job->height;
  *width = job->width;
  std::memcpy(dest, job->out.data(), n * sizeof(float));
  delete job;
  return 1;
}

int mingio_version() { return 2; }

}  // extern "C"
