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
  // Linear interpolation is exactly separable, so trilinear runs as three
  // 1-D passes (z, then y, then x). vs the direct 8-gather form this does
  // ~2x fewer multiply-adds AND the z/y passes are contiguous streams the
  // compiler auto-vectorizes (the 8 per-voxel u8 gathers blocked SIMD
  // entirely) — measured ~3x on the bench volume (48,420,420)->(32,384,384)
  // on the 1-core host. Same half-pixel-center taps; results differ from
  // the direct form only by fp32 reassociation (well under the 2e-3 test
  // tolerance against torch/jax).
  auto taps = [](int64_t n_src, int64_t n_dst, std::vector<int64_t>& i0,
                 std::vector<int64_t>& i1, std::vector<float>& f) {
    const float s = (float)n_src / n_dst;
    i0.resize(n_dst);
    i1.resize(n_dst);
    f.resize(n_dst);
    for (int64_t i = 0; i < n_dst; ++i) {
      float p = (i + 0.5f) * s - 0.5f;
      if (p < 0) p = 0;
      if (p > n_src - 1) p = (float)(n_src - 1);
      i0[i] = (int64_t)p;
      i1[i] = i0[i] + 1 < n_src ? i0[i] + 1 : n_src - 1;
      f[i] = p - i0[i];
    }
  };
  std::vector<int64_t> z0, z1, y0, y1, x0, x1;
  std::vector<float> zf, yf, xf;
  taps(D, d, z0, z1, zf);
  taps(H, h, y0, y1, yf);
  taps(W, w, x0, x1, xf);
  // Per-output-z slabs, NOT whole-volume intermediates: a full (d, H, W)
  // f32 z-pass buffer is ~23 MB of round-trip DRAM traffic on the bench
  // volume, which measured SLOWER than the direct 8-gather form on the
  // 1-core host. One (H, W) + one (h, W) slab (~1.3 MB) stay in L2.
  std::vector<float> zs((size_t)(H * W));
  std::vector<float> ys((size_t)(h * W));
  const float inv255 = 1.0f / 255.0f;
  for (int64_t c = 0; c < C; ++c) {
    const uint8_t* sc = src + c * D * H * W;
    float* dc = dst + c * d * h * w;
    for (int64_t z = 0; z < d; ++z) {
      // z pass (u8 -> f32 [0,1]): one output slice, contiguous streams
      const uint8_t* s0 = sc + z0[z] * H * W;
      const uint8_t* s1 = sc + z1[z] * H * W;
      const float fz = zf[z];
      for (int64_t i = 0; i < H * W; ++i) {
        const float a = s0[i];
        zs[i] = (a + fz * ((float)s1[i] - a)) * inv255;
      }
      // y pass: two contiguous rows per output row
      for (int64_t y = 0; y < h; ++y) {
        const float* r0 = zs.data() + y0[y] * W;
        const float* r1 = zs.data() + y1[y] * W;
        const float fy = yf[y];
        float* o = ys.data() + y * W;
        for (int64_t i = 0; i < W; ++i) o[i] = r0[i] + fy * (r1[i] - r0[i]);
      }
      // x pass: the only gathering pass, rows already in cache
      for (int64_t y = 0; y < h; ++y) {
        const float* row = ys.data() + y * W;
        float* o = dc + (z * h + y) * w;
        for (int64_t x = 0; x < w; ++x)
          o[x] = row[x0[x]] + xf[x] * (row[x1[x]] - row[x0[x]]);
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
