// Native host-side data pipeline for quantized_tpu.
//
// The reference leans on torch's native DataLoader workers + torchvision's
// C-backed transforms for input preprocessing (SURVEY.md section 2 #15, L0);
// this is the TPU-framework equivalent: a C++ thread-pool pipeline that takes
// raw uint8 HWC images and emits normalized f32 NHWC batches ready for
// device transfer. Exposed as a plain C ABI consumed via ctypes
// (quantized_tpu/data/native.py); ctypes releases the GIL for the call, so
// the pool overlaps with the Python training/serving loop.
//
// Semantics:
//  - resize: classic bilinear sampling with half-pixel centers (align_corners
//    = false). This matches the numpy oracle in tests/test_native_dataload.py
//    exactly; it intentionally does NOT reproduce PIL's antialiased
//    downsample — the PIL path remains the parity route for reference
//    accuracy comparisons, this is the high-throughput serving path.
//  - eval:  resize shorter side -> scale_size, center crop input_size,
//           x/255, (x - mean)/std per channel.
//  - train: reflect-free zero-pad + random crop (CIFAR recipe) or
//           resize+random crop, then random horizontal flip; xorshift64 PRNG
//           seeded per (seed, image index) => deterministic across pools.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct XorShift64 {
  uint64_t s;
  explicit XorShift64(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  // uniform in [0, n)
  uint32_t below(uint32_t n) { return n ? static_cast<uint32_t>(next() % n) : 0; }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// Bilinear resize, half-pixel centers, uint8 HWC -> uint8 HWC.
// Q8 fixed-point separable lerp: the vertical pass produces a Q8 uint16 row
// ((256-wy)*r0 + wy*r1, <= 65280), the horizontal pass combines two Q8
// samples in uint32 and rounds at Q16. Pure integer math — vectorizes at
// baseline x86-64 (no gathers) and is deterministic across platforms.
// The numpy oracle in tests/test_native_dataload.py implements the same
// fixed-point algorithm bit-for-bit.
void resize_bilinear(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                     int nh, int nw) {
  const double sy = static_cast<double>(h) / nh;
  const double sx = static_cast<double>(w) / nw;
  std::vector<int> x0s(nw), x1s(nw);
  std::vector<uint32_t> wxs(nw);
  for (int x = 0; x < nw; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    int x0 = static_cast<int>(std::floor(fx));
    uint32_t wx = static_cast<uint32_t>(std::lround((fx - x0) * 256.0));
    if (wx > 256) wx = 256;
    wxs[x] = wx;
    int x1 = x0 + 1;
    x0s[x] = (x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0)) * c;
    x1s[x] = (x1 < 0 ? 0 : (x1 >= w ? w - 1 : x1)) * c;
  }
  std::vector<uint16_t> vrow(static_cast<size_t>(w) * c);
  for (int y = 0; y < nh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = static_cast<int>(std::floor(fy));
    uint32_t wy = static_cast<uint32_t>(std::lround((fy - y0) * 256.0));
    if (wy > 256) wy = 256;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 >= h) y1 = h - 1;
    if (y0 >= h) y0 = h - 1;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * w * c;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w * c;
    const int wc = w * c;
    const uint32_t iwy = 256 - wy;
    for (int i = 0; i < wc; ++i)
      vrow[i] = static_cast<uint16_t>(iwy * r0[i] + wy * r1[i]);  // Q8
    uint8_t* orow = dst + static_cast<size_t>(y) * nw * c;
    for (int x = 0; x < nw; ++x) {
      const uint16_t* p0 = vrow.data() + x0s[x];
      const uint16_t* p1 = vrow.data() + x1s[x];
      const uint32_t wx = wxs[x], iwx = 256 - wx;
      uint8_t* out = orow + static_cast<size_t>(x) * c;
      for (int ch = 0; ch < c; ++ch) {
        uint32_t v = iwx * p0[ch] + wx * p1[ch];  // Q16
        out[ch] = static_cast<uint8_t>((v + 32768u) >> 16);
      }
    }
  }
}

// Crop src at (top,left) to size x size, scale to [0,1], normalize, write f32.
void crop_normalize(const uint8_t* src, int h, int w, int c, int top, int left,
                    int size, const float* mean, const float* std_, bool flip,
                    float* dst) {
  // (u/255 - mean)/std  ==  u * scale + bias, one FMA per element
  float scale[4], bias[4];
  for (int ch = 0; ch < c; ++ch) {
    scale[ch] = 1.0f / (255.0f * std_[ch]);
    bias[ch] = -mean[ch] / std_[ch];
  }
  for (int y = 0; y < size; ++y) {
    const uint8_t* row = src + (static_cast<size_t>(top + y) * w + left) * c;
    float* orow = dst + static_cast<size_t>(y) * size * c;
    if (!flip) {
      const int sc = size * c;
      for (int i = 0; i < sc; ++i) {
        const int ch = i % c;
        orow[i] = row[i] * scale[ch] + bias[ch];
      }
    } else {
      for (int x = 0; x < size; ++x) {
        const uint8_t* px = row + static_cast<size_t>(x) * c;
        float* opx = orow + static_cast<size_t>(size - 1 - x) * c;
        for (int ch = 0; ch < c; ++ch) opx[ch] = px[ch] * scale[ch] + bias[ch];
      }
    }
  }
}

// Zero-pad by `pad` then crop (CIFAR pad_random_crop). Reads logical padded
// coordinates without materializing the padded image.
void padded_crop_normalize(const uint8_t* src, int h, int w, int c, int pad,
                           int top, int left, int size, const float* mean,
                           const float* std_, bool flip, float* dst) {
  for (int y = 0; y < size; ++y) {
    int sy = top + y - pad;
    float* orow = dst + static_cast<size_t>(y) * size * c;
    for (int x = 0; x < size; ++x) {
      int sx = left + x - pad;
      float* opx = orow + static_cast<size_t>(flip ? (size - 1 - x) : x) * c;
      if (sy < 0 || sy >= h || sx < 0 || sx >= w) {
        for (int ch = 0; ch < c; ++ch) opx[ch] = (0.0f - mean[ch]) / std_[ch];
      } else {
        const uint8_t* px = src + (static_cast<size_t>(sy) * w + sx) * c;
        for (int ch = 0; ch < c; ++ch)
          opx[ch] = (px[ch] * (1.0f / 255.0f) - mean[ch]) / std_[ch];
      }
    }
  }
}

struct PipelineConfig {
  int input_size;
  int scale_size;
  int channels;
  float mean[4];
  float std_[4];
  int augment;     // 0 = eval, 1 = train
  int pad;         // CIFAR pad_random_crop when > 0
  uint64_t seed;
};

// One image: raw uint8 HWC -> f32 HWC into dst.
void process_one(const PipelineConfig& cfg, const uint8_t* img, int h, int w,
                 float* dst, uint64_t index) {
  const int c = cfg.channels;
  const int size = cfg.input_size;
  std::vector<uint8_t> scratch;
  XorShift64 rng(cfg.seed * 0x100000001b3ull + index + 1);

  if (cfg.augment && cfg.pad > 0) {
    // CIFAR: zero-pad + random crop + flip (no resize)
    int top = static_cast<int>(rng.below(2 * cfg.pad + 1));
    int left = static_cast<int>(rng.below(2 * cfg.pad + 1));
    bool flip = rng.uniform() < 0.5;
    padded_crop_normalize(img, h, w, c, cfg.pad, top, left, size, cfg.mean,
                          cfg.std_, flip, dst);
    return;
  }

  const uint8_t* cur = img;
  int ch_ = h, cw_ = w;
  if (h != size || w != size) {
    int nh, nw;
    if (h <= w) {
      nh = cfg.scale_size;
      nw = std::max(1, static_cast<int>(std::lround(
                           static_cast<double>(w) * cfg.scale_size / h)));
    } else {
      nw = cfg.scale_size;
      nh = std::max(1, static_cast<int>(std::lround(
                           static_cast<double>(h) * cfg.scale_size / w)));
    }
    scratch.resize(static_cast<size_t>(nh) * nw * c);
    resize_bilinear(img, h, w, c, scratch.data(), nh, nw);
    cur = scratch.data();
    ch_ = nh;
    cw_ = nw;
  }
  int top, left;
  bool flip = false;
  if (cfg.augment) {
    top = static_cast<int>(rng.below(std::max(1, ch_ - size + 1)));
    left = static_cast<int>(rng.below(std::max(1, cw_ - size + 1)));
    flip = rng.uniform() < 0.5;
  } else {
    top = std::max(0, (ch_ - size) / 2);
    left = std::max(0, (cw_ - size) / 2);
  }
  crop_normalize(cur, ch_, cw_, c, top, left, size, cfg.mean, cfg.std_, flip,
                 dst);
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void worker() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        job = std::move(q_.front());
        q_.pop();
      }
      job();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Pipeline {
  PipelineConfig cfg;
  ThreadPool pool;
  Pipeline(const PipelineConfig& c, int threads) : cfg(c), pool(threads) {}
};

}  // namespace

extern "C" {

void* qtpu_pipeline_create(int input_size, int scale_size, int channels,
                           const float* mean, const float* std_, int augment,
                           int pad, uint64_t seed, int threads) {
  PipelineConfig cfg;
  cfg.input_size = input_size;
  cfg.scale_size = scale_size;
  cfg.channels = channels;
  for (int i = 0; i < channels && i < 4; ++i) {
    cfg.mean[i] = mean[i];
    cfg.std_[i] = std_[i];
  }
  cfg.augment = augment;
  cfg.pad = pad;
  cfg.seed = seed;
  if (threads <= 0) threads = std::max(1u, std::thread::hardware_concurrency());
  return new Pipeline(cfg, threads);
}

void qtpu_pipeline_destroy(void* p) { delete static_cast<Pipeline*>(p); }

// Process a batch of same-shape images: src (n, h, w, c) uint8 contiguous,
// dst (n, input_size, input_size, c) f32. `base_index` feeds the per-image
// PRNG so successive batches draw fresh augmentations deterministically.
void qtpu_pipeline_run(void* p, const uint8_t* src, int n, int h, int w,
                       float* dst, uint64_t base_index) {
  Pipeline* pl = static_cast<Pipeline*>(p);
  const PipelineConfig& cfg = pl->cfg;
  const size_t in_stride = static_cast<size_t>(h) * w * cfg.channels;
  const size_t out_stride =
      static_cast<size_t>(cfg.input_size) * cfg.input_size * cfg.channels;
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pl->pool.submit([&, i] {
      process_one(cfg, src + i * in_stride, h, w, dst + i * out_stride,
                  base_index + i);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

// Variable-shape entry: per-image pointers and dims.
void qtpu_pipeline_run_varied(void* p, const uint8_t** srcs, const int* hs,
                              const int* ws, int n, float* dst,
                              uint64_t base_index) {
  Pipeline* pl = static_cast<Pipeline*>(p);
  const PipelineConfig& cfg = pl->cfg;
  const size_t out_stride =
      static_cast<size_t>(cfg.input_size) * cfg.input_size * cfg.channels;
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pl->pool.submit([&, i] {
      process_one(cfg, srcs[i], hs[i], ws[i], dst + i * out_stride,
                  base_index + i);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

}  // extern "C"
