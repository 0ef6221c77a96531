// polardepth_tpu native ingest runtime: threaded PNG decoding.
//
// The host-side job of this framework is PNG decode + batch assembly only
// (all image math runs on the TPU), so ingest throughput is decode-bound.
// This library decodes the HAMMER per-frame file set (8-bit gray pol
// captures, 8-bit RGB, 8-bit instance masks, 16-bit depth) with libpng on a
// persistent thread pool, writing directly into caller-provided batch
// buffers — no Python-side image objects, no GIL during decode.
//
// C ABI (consumed by polardepth_tpu/runtime/native.py via ctypes):
//   pd_png_info(path, &w, &h, &channels, &bit_depth) -> 0 | errno-style code
//   pd_png_decode(path, out, out_size)               -> decode one image
//   pd_png_decode_batch(paths, n, out, offsets, sizes, nthreads)
//
// 16-bit samples are emitted native-little-endian (png_set_swap); palette
// images expand to RGB; alpha is stripped (the datasets have none).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct PngReadResult {
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 0;
};

int read_png(const char* path, unsigned char* out, long out_size,
             PngReadResult* info_only) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 2;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return 3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // big-endian file -> native LE

  png_read_update_info(png, info);

  const int width = png_get_image_width(png, info);
  const int height = png_get_image_height(png, info);
  const int channels = png_get_channels(png, info);
  bit_depth = png_get_bit_depth(png, info);

  if (info_only) {
    info_only->width = width;
    info_only->height = height;
    info_only->channels = channels;
    info_only->bit_depth = bit_depth;
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
  }

  const long rowbytes = static_cast<long>(png_get_rowbytes(png, info));
  if (rowbytes * height > out_size) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 5;  // buffer too small
  }

  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// ---- persistent thread pool ------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool(int nthreads) {
  static ThreadPool* p = nullptr;
  static int size = 0;
  static std::mutex mu;
  std::lock_guard<std::mutex> lk(mu);
  if (!p || size < nthreads) {
    // pools only grow; old pool leaks deliberately (process-lifetime)
    p = new ThreadPool(nthreads);
    size = nthreads;
  }
  return p;
}

}  // namespace

extern "C" {

int pd_png_info(const char* path, int* w, int* h, int* ch, int* depth) {
  PngReadResult r;
  int rc = read_png(path, nullptr, 0, &r);
  if (rc) return rc;
  *w = r.width;
  *h = r.height;
  *ch = r.channels;
  *depth = r.bit_depth;
  return 0;
}

int pd_png_decode(const char* path, unsigned char* out, long out_size) {
  return read_png(path, out, out_size, nullptr);
}

int pd_png_decode_batch(const char** paths, int n, unsigned char* out,
                        const long* offsets, const long* sizes,
                        int nthreads) {
  if (n <= 0) return 0;
  if (nthreads <= 1) {
    for (int i = 0; i < n; ++i) {
      int rc = read_png(paths[i], out + offsets[i], sizes[i], nullptr);
      if (rc) return rc;
    }
    return 0;
  }
  std::atomic<int> next(0), err(0), done(0);
  std::mutex mu;
  std::condition_variable cv;
  ThreadPool* tp = pool(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    tp->submit([&] {
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        int rc = read_png(paths[i], out + offsets[i], sizes[i], nullptr);
        if (rc) err.store(rc);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done.fetch_add(1);
      }
      cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == nthreads; });
  return err.load();
}

}  // extern "C"
