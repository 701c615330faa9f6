// Native clip loader: multi-threaded JPEG decode for the input pipeline.
//
// TPU-native counterpart of the reference's native data path (the reference
// hides JPEG decode behind 4 threads x 12-process cv2 pools,
// lib/datasets/dataloader.py + lib/datasets/data_input_helper.py:51-61).
// This library decodes a whole clip's frames on a persistent C++ thread
// pool in one call, fully outside the GIL.
//
// Output is uint8 BGR HWC per frame (identical bytes to cv2.imread: JPEG
// decode is fully specified; libjpeg-turbo's JCS_EXT_BGR emits BGR
// directly), stacked contiguously (T, H, W, 3).
//
// C ABI (ctypes-friendly):
//   lfb_probe_jpeg(path, &h, &w)           -> 0 on success
//   lfb_decode_clip(paths, T, out, h, w,
//                   num_threads)           -> 0 on success (out: T*h*w*3)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

// Decode one JPEG file into BGR HWC uint8. Returns 0 on success.
int decode_file(const char* path, uint8_t* out, int expect_h, int expect_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo: direct BGR output
  jpeg_start_decompress(&cinfo);

  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (h != expect_h || w != expect_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -3;
  }

  const size_t stride = static_cast<size_t>(w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &dst, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Minimal persistent thread pool.
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> task) {
    {
      std::unique_lock<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

  int size() const { return static_cast<int>(workers_.size()); }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool(int want_threads) {
  static ThreadPool* p = nullptr;
  static std::mutex mu;
  std::unique_lock<std::mutex> lock(mu);
  if (p == nullptr) {
    int n = want_threads > 0 ? want_threads
                             : static_cast<int>(
                                   std::thread::hardware_concurrency());
    if (n < 1) n = 1;
    p = new ThreadPool(n);
  }
  return p;
}

}  // namespace

extern "C" {

int lfb_probe_jpeg(const char* path, int* height, int* width) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *height = static_cast<int>(cinfo.image_height);
  *width = static_cast<int>(cinfo.image_width);
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Decode num_frames JPEGs (all height x width) into out (T*H*W*3, BGR u8)
// on the shared persistent pool. Returns 0, or the first nonzero per-frame
// error code.
int lfb_decode_clip(const char** paths, int num_frames, uint8_t* out,
                    int height, int width, int num_threads) {
  ThreadPool* tp = pool(num_threads);
  std::atomic<int> status(0);
  std::atomic<int> remaining(num_frames);
  std::mutex done_mu;
  std::condition_variable done_cv;
  const size_t frame_elems = static_cast<size_t>(height) * width * 3;

  for (int i = 0; i < num_frames; ++i) {
    tp->submit([&, i] {
      const int rc = decode_file(paths[i], out + frame_elems * i,
                                 height, width);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::unique_lock<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return remaining.load() == 0; });
  return status.load();
}

}  // extern "C"
