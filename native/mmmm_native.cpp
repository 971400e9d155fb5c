// mmmm_native: host-side native runtime for the MMMM-TPU data pipeline.
//
// The reference performs zstd decode + trilinear resize of 3-D volumes in
// Python dataloader workers (luolib load_pt_zst + MONAI transforms); on a TPU
// host the input pipeline must overlap with device compute so the ViT is never
// input-bound. This library provides:
//
//   - mmmm_zstd_decompress: one-shot zstd frame decode,
//   - mmmm_resize_trilinear_u8f32: uint8 volume -> float32 [0,1] trilinear
//     resample with half-pixel centers (matches jax.image.resize "linear"),
//   - a threaded file prefetcher (open/read/decompress off the Python thread):
//     mmmm_prefetcher_{create,submit,wait,destroy}.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmmmm_native.so \
//            mmmm_native.cpp -lzstd -lpthread

#include <zstd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// zstd
// ---------------------------------------------------------------------------

// Returns decompressed size, or -1 on error. If dst == nullptr, only returns
// the content size (for buffer allocation).
long long mmmm_zstd_decompress(const void* src, size_t src_size, void* dst,
                               size_t dst_capacity) {
  unsigned long long const content =
      ZSTD_getFrameContentSize(src, src_size);
  if (content == ZSTD_CONTENTSIZE_ERROR) return -1;
  if (dst == nullptr) {
    if (content == ZSTD_CONTENTSIZE_UNKNOWN) return -1;
    return (long long)content;
  }
  size_t const n = ZSTD_decompress(dst, dst_capacity, src, src_size);
  if (ZSTD_isError(n)) return -1;
  return (long long)n;
}

long long mmmm_zstd_compress(const void* src, size_t src_size, void* dst,
                             size_t dst_capacity, int level) {
  if (dst == nullptr) return (long long)ZSTD_compressBound(src_size);
  size_t const n = ZSTD_compress(dst, dst_capacity, src, src_size, level);
  if (ZSTD_isError(n)) return -1;
  return (long long)n;
}

// ---------------------------------------------------------------------------
// trilinear resize: uint8 (C, D, H, W) -> float32 (C, d, h, w) in [0, 1]
// half-pixel centers (align_corners=false)
// ---------------------------------------------------------------------------

void mmmm_resize_trilinear_u8f32(const uint8_t* src, int64_t C, int64_t D,
                                 int64_t H, int64_t W, float* dst, int64_t d,
                                 int64_t h, int64_t w) {
  const float sd = (float)D / d, sh = (float)H / h, sw = (float)W / w;
  std::vector<int64_t> z0(d), z1(d);
  std::vector<float> zf(d);
  for (int64_t i = 0; i < d; ++i) {
    float p = (i + 0.5f) * sd - 0.5f;
    if (p < 0) p = 0;
    if (p > D - 1) p = (float)(D - 1);
    z0[i] = (int64_t)p;
    z1[i] = z0[i] + 1 < D ? z0[i] + 1 : D - 1;
    zf[i] = p - z0[i];
  }
  std::vector<int64_t> y0(h), y1(h);
  std::vector<float> yf(h);
  for (int64_t i = 0; i < h; ++i) {
    float p = (i + 0.5f) * sh - 0.5f;
    if (p < 0) p = 0;
    if (p > H - 1) p = (float)(H - 1);
    y0[i] = (int64_t)p;
    y1[i] = y0[i] + 1 < H ? y0[i] + 1 : H - 1;
    yf[i] = p - y0[i];
  }
  std::vector<int64_t> x0(w), x1(w);
  std::vector<float> xf(w);
  for (int64_t i = 0; i < w; ++i) {
    float p = (i + 0.5f) * sw - 0.5f;
    if (p < 0) p = 0;
    if (p > W - 1) p = (float)(W - 1);
    x0[i] = (int64_t)p;
    x1[i] = x0[i] + 1 < W ? x0[i] + 1 : W - 1;
    xf[i] = p - x0[i];
  }
  const float inv255 = 1.0f / 255.0f;
  for (int64_t c = 0; c < C; ++c) {
    const uint8_t* sc = src + c * D * H * W;
    float* dc = dst + c * d * h * w;
    for (int64_t z = 0; z < d; ++z) {
      const uint8_t* s0 = sc + z0[z] * H * W;
      const uint8_t* s1 = sc + z1[z] * H * W;
      const float fz = zf[z];
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* r00 = s0 + y0[y] * W;
        const uint8_t* r01 = s0 + y1[y] * W;
        const uint8_t* r10 = s1 + y0[y] * W;
        const uint8_t* r11 = s1 + y1[y] * W;
        const float fy = yf[y];
        float* out = dc + (z * h + y) * w;
        for (int64_t x = 0; x < w; ++x) {
          const float fx = xf[x];
          const float a00 = r00[x0[x]] + fx * (r00[x1[x]] - r00[x0[x]]);
          const float a01 = r01[x0[x]] + fx * (r01[x1[x]] - r01[x0[x]]);
          const float a10 = r10[x0[x]] + fx * (r10[x1[x]] - r10[x0[x]]);
          const float a11 = r11[x0[x]] + fx * (r11[x1[x]] - r11[x0[x]]);
          const float a0 = a00 + fy * (a01 - a00);
          const float a1 = a10 + fy * (a11 - a10);
          out[x] = (a0 + fz * (a1 - a0)) * inv255;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// threaded file prefetcher: submit(path) -> background read+decompress;
// wait(id) blocks and hands out the buffer.
// ---------------------------------------------------------------------------

namespace {

struct Job {
  int64_t id;
  std::string path;
  std::vector<uint8_t> data;  // decompressed (or raw if not zstd)
  bool done = false;
  bool failed = false;
};

struct Prefetcher {
  std::deque<int64_t> queue;
  std::unordered_map<int64_t, Job> jobs;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  int64_t next_id = 1;

  explicit Prefetcher(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { this->worker(); });
  }

  ~Prefetcher() {
    stop = true;
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }

  static bool load(const std::string& path, std::vector<uint8_t>& out) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw((size_t)size);
    if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
      std::fclose(f);
      return false;
    }
    std::fclose(f);
    // zstd magic 0xFD2FB528 (little endian)
    if (raw.size() >= 4 && raw[0] == 0x28 && raw[1] == 0xB5 && raw[2] == 0x2F &&
        raw[3] == 0xFD) {
      long long n = mmmm_zstd_decompress(raw.data(), raw.size(), nullptr, 0);
      if (n < 0) return false;
      out.resize((size_t)n);
      return mmmm_zstd_decompress(raw.data(), raw.size(), out.data(),
                                  out.size()) == n;
    }
    out = std::move(raw);
    return true;
  }

  void worker() {
    for (;;) {
      int64_t id;
      std::string path;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_work.wait(lock, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        id = queue.front();
        queue.pop_front();
        path = jobs[id].path;
      }
      std::vector<uint8_t> data;
      bool ok = load(path, data);
      {
        std::lock_guard<std::mutex> lock(mu);
        Job& j = jobs[id];
        j.data = std::move(data);
        j.done = true;
        j.failed = !ok;
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

void* mmmm_prefetcher_create(int n_threads) {
  return new Prefetcher(n_threads > 0 ? n_threads : 2);
}

int64_t mmmm_prefetcher_submit(void* handle, const char* path) {
  auto* p = (Prefetcher*)handle;
  std::lock_guard<std::mutex> lock(p->mu);
  int64_t id = p->next_id++;
  p->jobs[id] = Job{id, path};
  p->queue.push_back(id);
  p->cv_work.notify_one();
  return id;
}

// Blocks until job `id` finishes. Returns size (>= 0) or -1 on failure.
// If dst != nullptr, copies up to dst_capacity bytes and frees the job.
long long mmmm_prefetcher_wait(void* handle, int64_t id, void* dst,
                               size_t dst_capacity) {
  auto* p = (Prefetcher*)handle;
  std::unique_lock<std::mutex> lock(p->mu);
  p->cv_done.wait(lock, [&] {
    auto it = p->jobs.find(id);
    return it == p->jobs.end() || it->second.done;
  });
  auto it = p->jobs.find(id);
  if (it == p->jobs.end() || it->second.failed) {
    if (it != p->jobs.end()) p->jobs.erase(it);
    return -1;
  }
  long long n = (long long)it->second.data.size();
  if (dst != nullptr) {
    std::memcpy(dst, it->second.data.data(),
                n < (long long)dst_capacity ? n : (long long)dst_capacity);
    p->jobs.erase(it);
  }
  return n;
}

void mmmm_prefetcher_destroy(void* handle) { delete (Prefetcher*)handle; }

}  // extern "C"
