// Native dataset loader: PNG decode + background prefetch ring.
//
// C++ replacement for the reference's image-IO + preload runtime
// (libvis/src/libvis/image_io_libpng.cc + applications/badslam/src/badslam/
// pre_load_thread.cc): decodes 16-bit depth and 8-bit RGB PNGs with libpng
// on a worker thread, keeping a small ring of decoded frames ahead of the
// consumer. Exposed to Python via a plain C ABI (ctypes — no pybind11 in
// this environment).
//
// Build: see native/build.sh (cc -O2 -shared -fPIC -lpng -lz -lpthread).

#include <png.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;      // 1 (u16 depth) or 3 (u8 rgb)
  int bit_depth = 0;     // 8 or 16
  std::vector<uint8_t> data;
  bool ok = false;
};

// Decode one PNG from disk. Depth PNGs are 16-bit grayscale (big-endian in
// the stream; converted to host little-endian u16). Color PNGs are
// expanded to 8-bit RGB.
Image DecodePng(const std::string& path) {
  Image out;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return out;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(f);
    return out;
  }

  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth == 16 && color_type != PNG_COLOR_TYPE_GRAY)
    png_set_strip_16(png);  // color stays 8-bit
  if (bit_depth == 16 && color_type == PNG_COLOR_TYPE_GRAY)
    png_set_swap(png);      // 16-bit depth: big-endian stream -> host LE
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  int out_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  out.width = static_cast<int>(width);
  out.height = static_cast<int>(height);
  out.channels = channels;
  out.bit_depth = out_depth;
  out.data.resize(rowbytes * height);

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out.data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  out.ok = true;
  return out;
}

// ---------------------------------------------------------------------------
// Prefetching loader: worker thread decodes ahead of the consumer.
// ---------------------------------------------------------------------------

class Loader {
 public:
  Loader(std::vector<std::string> paths, int ring)
      : paths_(std::move(paths)), ring_(ring), thread_([this] { Main(); }) {}

  ~Loader() {
    {
      std::lock_guard<std::mutex> lock(m_);
      quit_ = true;
    }
    cv_.notify_all();
    thread_.join();
  }

  // Blocking fetch of frame `index`; triggers prefetch of the following
  // `ring_` frames.
  std::shared_ptr<Image> Get(int index) {
    std::unique_lock<std::mutex> lock(m_);
    want_ = index;
    cv_.notify_all();
    cv_done_.wait(lock, [&] {
      return cache_.count(index) || quit_;
    });
    auto it = cache_.find(index);
    if (it == cache_.end()) return nullptr;
    auto img = it->second;
    // Evict everything older than the consumed frame.
    for (auto jt = cache_.begin(); jt != cache_.end();) {
      if (jt->first < index)
        jt = cache_.erase(jt);
      else
        ++jt;
    }
    return img;
  }

 private:
  void Main() {
    for (;;) {
      int target = -1;
      {
        std::unique_lock<std::mutex> lock(m_);
        cv_.wait(lock, [&] { return want_ >= 0 || quit_; });
        if (quit_) return;
        // Find the first not-yet-decoded frame in [want_, want_ + ring_].
        for (int i = want_;
             i <= want_ + ring_ && i < static_cast<int>(paths_.size()); ++i) {
          if (!cache_.count(i)) {
            target = i;
            break;
          }
        }
        if (target < 0) {
          cv_done_.notify_all();
          cv_.wait(lock, [&] { return quit_ || want_ != last_served_; });
          last_served_ = want_;
          continue;
        }
      }
      auto img = std::make_shared<Image>(DecodePng(paths_[target]));
      {
        std::lock_guard<std::mutex> lock(m_);
        cache_[target] = std::move(img);
      }
      cv_done_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int ring_;
  std::map<int, std::shared_ptr<Image>> cache_;
  int want_ = -1;
  int last_served_ = -2;
  bool quit_ = false;
  std::mutex m_;
  std::condition_variable cv_;
  std::condition_variable cv_done_;
  std::thread thread_;
};

}  // namespace

extern "C" {

// One-shot decode (no prefetch). Returns 1 on success and fills the
// metadata; call badslam_read_png_data afterwards with a buffer of
// width*height*channels*(bit_depth/8) bytes.
typedef struct {
  void* handle;
  int width, height, channels, bit_depth;
} BadslamPng;

int badslam_png_open(const char* path, BadslamPng* out) {
  auto* img = new Image(DecodePng(path));
  if (!img->ok) {
    delete img;
    return 0;
  }
  out->handle = img;
  out->width = img->width;
  out->height = img->height;
  out->channels = img->channels;
  out->bit_depth = img->bit_depth;
  return 1;
}

void badslam_png_data(BadslamPng* png, void* buffer) {
  auto* img = static_cast<Image*>(png->handle);
  std::memcpy(buffer, img->data.data(), img->data.size());
}

void badslam_png_close(BadslamPng* png) {
  delete static_cast<Image*>(png->handle);
  png->handle = nullptr;
}

// Prefetching loader API.
void* badslam_loader_create(const char** paths, int count, int ring) {
  std::vector<std::string> v(paths, paths + count);
  return new Loader(std::move(v), ring);
}

int badslam_loader_get(void* loader, int index, BadslamPng* out) {
  auto img = static_cast<Loader*>(loader)->Get(index);
  if (!img || !img->ok) return 0;
  auto* copy = new Image(*img);
  out->handle = copy;
  out->width = copy->width;
  out->height = copy->height;
  out->channels = copy->channels;
  out->bit_depth = copy->bit_depth;
  return 1;
}

void badslam_loader_destroy(void* loader) {
  delete static_cast<Loader*>(loader);
}

}  // extern "C"
