// Native data loader: multi-threaded PNG decode + prefetch ring.
//
// TPU-native equivalent of the reference's image IO path: the reference
// drivers decode sequentially with cv::imread on the tracking thread
// (/root/reference/Examples/Stereo/stereo_kitti.cc:81-99); at TPU frame
// rates (sub-millisecond kernels) host-side decode becomes the bottleneck,
// so decoding runs in a worker pool ahead of the consumer with a bounded
// ring buffer (backpressure), exposed to Python via a plain C ABI (ctypes).
//
// Supports 8-bit grayscale (float32 out, [0,255]) and 16-bit grayscale
// (uint16 out, TUM depth PNGs). Build: see native/build.sh.

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int index = -1;
  int width = 0;
  int height = 0;
  int bitdepth = 0;          // 8 or 16
  std::vector<uint8_t> data; // row-major; 16-bit stored native-endian u16
  bool ok = false;
};

bool decode_png(const std::string& path, Image* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp);
    return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  // normalize: palette/rgb -> gray; <8bit -> 8bit; keep 16-bit as-is
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (depth == 16) png_set_swap(png);  // little-endian u16
  png_read_update_info(png, info);

  depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->bitdepth = depth;
  out->data.resize(rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 r = 0; r < h; ++r)
    rows[r] = out->data.data() + r * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  out->ok = true;
  return true;
}

struct Loader {
  std::vector<std::string> paths;
  size_t capacity = 8;
  std::atomic<size_t> next_job{0};
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  // min-heap by index so frames come out in order
  struct Cmp {
    bool operator()(const Image* a, const Image* b) const {
      return a->index > b->index;
    }
  };
  std::priority_queue<Image*, std::vector<Image*>, Cmp> ready;
  int emitted = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      size_t job = next_job.fetch_add(1);
      if (job >= paths.size() || stop) return;
      Image* img = new Image();
      img->index = static_cast<int>(job);
      decode_png(paths[job], img);
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] {
        return stop || ready.size() < capacity ||
               (ready.empty() ? true
                              : ready.top()->index > img->index);
      });
      if (stop) { delete img; return; }
      ready.push(img);
      cv_pop.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* slam_loader_open(const char** paths, int n, int n_threads,
                       int capacity) {
  Loader* L = new Loader();
  for (int i = 0; i < n; ++i) L->paths.emplace_back(paths[i]);
  L->capacity = capacity > 0 ? capacity : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Blocks until frame `emitted` is ready; copies into out (camera-native
// u8 for 8-bit, raw u16 for 16-bit). max_px is the caller's buffer
// capacity in PIXELS — a larger frame is NOT copied (rc -2).
// Returns: 8 or 16 (bitdepth) on success; 0 = end of stream;
// -1 = this frame failed to decode (stream continues);
// -2 = frame exceeds max_px (stream continues, frame dropped).
int slam_loader_next(void* handle, uint8_t* out_u8, uint16_t* out_u16,
                     int* out_w, int* out_h, long long max_px) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->emitted >= static_cast<int>(L->paths.size())) return 0;
  L->cv_pop.wait(lk, [&] {
    return L->stop ||
           (!L->ready.empty() && L->ready.top()->index == L->emitted);
  });
  if (L->stop) return 0;
  Image* img = L->ready.top();
  L->ready.pop();
  L->emitted++;
  L->cv_push.notify_all();
  lk.unlock();

  *out_w = img->width;
  *out_h = img->height;
  int bd = img->ok ? img->bitdepth : 0;
  size_t npx = static_cast<size_t>(img->width) * img->height;
  int rc;
  if (!img->ok || (bd != 8 && bd != 16)) {
    rc = -1;  // per-frame decode failure, distinct from end-of-stream
  } else if (max_px >= 0 && npx > static_cast<size_t>(max_px)) {
    rc = -2;  // would overflow the caller's buffers
  } else if (bd == 8 && out_u8) {
    std::memcpy(out_u8, img->data.data(), npx);
    rc = 8;
  } else if (bd == 16 && out_u16) {
    std::memcpy(out_u16, img->data.data(), npx * 2);
    rc = 16;
  } else {
    rc = -1;
  }
  delete img;
  return rc;
}

void slam_loader_close(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_push.notify_all();
  L->cv_pop.notify_all();
  for (auto& t : L->workers) t.join();
  while (!L->ready.empty()) {
    delete L->ready.top();
    L->ready.pop();
  }
  delete L;
}

}  // extern "C"
