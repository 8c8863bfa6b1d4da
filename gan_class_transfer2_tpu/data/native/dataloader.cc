// Native data loader: decode → random-crop → flip → normalize → batch,
// with a worker thread pool and a bounded prefetch ring buffer.
//
// TPU-native counterpart of the reference's tf.data input pipeline
// (reference train.py:285-321): the reference delegates decode/augment to
// TensorFlow's C++ kernels under AUTOTUNE threading; this is the framework's
// own native implementation (libjpeg + libpng decoders — the reference uses
// decode_jpeg on .png globs relying on decoder tolerance; we sniff magic
// bytes and dispatch).
//
// Element semantics (must match data/pipeline.py::decode_image exactly):
//   * decode forced to 3 channels (grayscale broadcast, palette expanded)
//   * random crop to size×size when larger (uniform corner)
//   * random horizontal flip (p = 0.5)
//   * normalize uint8/128 − 1 → float32 in [−1, 0.9921875]
//
// C API (ctypes): dl_create / dl_next / dl_destroy / dl_decode_one.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  std::vector<uint8_t> data;  // H*W*3
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- PNG ------

struct PngReadCtx {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  PngReadCtx* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + count > ctx->size) {
    png_error(png, "png: read past end");
  }
  memcpy(out, ctx->data + ctx->pos, count);
  ctx->pos += count;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  // reject absurd header dims BEFORE allocating h*w*3 (a corrupt IHDR
  // claiming 100000x100000 would ask for ~30 GB and abort the process via
  // bad_alloc on a worker thread); 2^26 px = 67 MP, far past any sane input
  if (w == 0 || h == 0 || static_cast<uint64_t>(w) * h > (1ull << 26)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  // normalize to 8-bit RGB
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->data.resize(static_cast<size_t>(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; ++i)
    rows[i] = out->data.data() + static_cast<size_t>(i) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// --------------------------------------------------------------- JPEG ------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  // same absurd-dimension guard as decode_png (see comment there)
  if (cinfo.output_height == 0 || cinfo.output_width == 0 ||
      static_cast<uint64_t>(cinfo.output_height) * cinfo.output_width >
          (1ull << 26)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->data.resize(static_cast<size_t>(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        out->data.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, Image* out) {
  if (len >= 8 && memcmp(buf, "\x89PNG\r\n\x1a\n", 8) == 0)
    return decode_png(buf, len, out);
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, out);
  // fall through: try both (decoder tolerance like tf.image.decode_jpeg)
  return decode_png(buf, len, out) || decode_jpeg(buf, len, out);
}

// ------------------------------------------------------------ augment ------

// crop/flip/normalize into out[size*size*3] float32
bool augment_to(const Image& img, int size, std::mt19937_64* rng, float* out) {
  if (img.h < size || img.w < size) return false;
  int max_i = img.h - size, max_j = img.w - size;
  int ci = 0, cj = 0;
  if (max_i > 0) ci = static_cast<int>((*rng)() % (max_i + 1));
  if (max_j > 0) cj = static_cast<int>((*rng)() % (max_j + 1));
  bool flip = ((*rng)() & 1) != 0;
  for (int i = 0; i < size; ++i) {
    const uint8_t* src =
        img.data.data() + (static_cast<size_t>(ci + i) * img.w + cj) * 3;
    float* dst = out + static_cast<size_t>(i) * size * 3;
    if (!flip) {
      for (int j = 0; j < size * 3; ++j)
        dst[j] = static_cast<float>(src[j]) * (1.0f / 128.0f) - 1.0f;
    } else {
      for (int j = 0; j < size; ++j) {
        const uint8_t* p = src + (size - 1 - j) * 3;
        dst[j * 3 + 0] = static_cast<float>(p[0]) * (1.0f / 128.0f) - 1.0f;
        dst[j * 3 + 1] = static_cast<float>(p[1]) * (1.0f / 128.0f) - 1.0f;
        dst[j * 3 + 2] = static_cast<float>(p[2]) * (1.0f / 128.0f) - 1.0f;
      }
    }
  }
  return true;
}

// ------------------------------------------------------------- loader ------

struct Loader {
  std::vector<std::string> files;
  int size = 0;
  int batch = 0;
  int capacity = 0;
  std::atomic<bool> stop{false};
  std::atomic<bool> error{false};

  // Shared epoch permutation: workers draw file indices from ONE
  // shuffle-without-replacement stream, so every file is seen exactly once
  // per epoch across the whole pool — the reference's shuffle/repeat
  // semantics (train.py:318) and what pipeline.py's Python workers do.
  // Uniform-with-replacement draws would show some images 0 times and
  // others 3+ times per nominal epoch. One lock per DRAW (not per byte);
  // decode work dwarfs it.
  std::vector<uint32_t> perm;
  size_t perm_pos = 0;
  std::mt19937_64 perm_rng;
  std::mutex perm_mu;

  size_t next_file_index() {
    std::lock_guard<std::mutex> lk(perm_mu);
    if (perm_pos >= perm.size()) {
      std::shuffle(perm.begin(), perm.end(), perm_rng);
      perm_pos = 0;
    }
    return perm[perm_pos++];
  }

  std::mutex mu;
  std::condition_variable not_full, not_empty;
  std::queue<std::vector<float>> ready;
  std::string error_message;  // guarded by mu
  std::vector<std::thread> workers;

  ~Loader() {
    {
      // the store must happen under mu: a worker that has evaluated its
      // wait predicate (stop false, ring full) but not yet blocked would
      // otherwise miss the notify forever and t.join() would deadlock
      std::lock_guard<std::mutex> lk(mu);
      stop.store(true);
    }
    not_full.notify_all();
    not_empty.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

bool load_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  // ftell is -1 on non-seekable special files; resize((size_t)-1) would
  // throw length_error straight through a worker thread otherwise
  if (fseek(f, 0, SEEK_END) != 0) {
    fclose(f);
    return false;
  }
  long n = ftell(f);
  if (n < 0 || fseek(f, 0, SEEK_SET) != 0) {
    fclose(f);
    return false;
  }
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == static_cast<size_t>(n);
}

void fail_loader(Loader* L, const std::string& message) {
  {
    // stop/error stores under mu: a consumer between its wait-predicate
    // check and blocking would otherwise miss the notify forever (the
    // exact hang the fail-loudly guard exists to prevent)
    std::lock_guard<std::mutex> lk(L->mu);
    if (L->error_message.empty()) L->error_message = message;
    L->error.store(true);
    L->stop.store(true);
  }
  L->not_empty.notify_all();
  L->not_full.notify_all();
}

void worker_loop(Loader* L, std::mt19937_64* rng) {
  const size_t elem = static_cast<size_t>(L->size) * L->size * 3;
  // Tolerate scattered bad files (TF decoder tolerance), but fail loudly if
  // NOTHING decodes or fits the crop (e.g. every image smaller than `size`)
  // instead of hanging dl_next forever. Mirrors the Python pipeline's guard
  // (pipeline.py consecutive_failures).
  const long fail_limit =
      std::max<long>(100, 2 * static_cast<long>(L->files.size()));
  long consecutive_failures = 0;
  while (!L->stop.load()) {
    std::vector<float> batch(static_cast<size_t>(L->batch) * elem);
    int filled = 0;
    while (filled < L->batch && !L->stop.load()) {
      const std::string& path = L->files[L->next_file_index()];
      bool ok = false;
      try {
        std::vector<uint8_t> raw;
        Image img;
        ok = load_file(path, &raw) &&
             decode_any(raw.data(), raw.size(), &img) &&
             augment_to(img, L->size, rng, batch.data() + filled * elem);
      } catch (const std::exception&) {
        ok = false;  // e.g. bad_alloc on a corrupt header — a bad file,
                     // not a reason to abort the process
      }
      if (!ok) {
        if (++consecutive_failures >= fail_limit) {
          fail_loader(L, "native loader: " +
                             std::to_string(consecutive_failures) +
                             " consecutive decode/crop failures (last: " +
                             path + ")");
          return;
        }
        continue;
      }
      consecutive_failures = 0;
      ++filled;
    }
    std::unique_lock<std::mutex> lk(L->mu);
    L->not_full.wait(lk, [L] {
      return L->stop.load() || static_cast<int>(L->ready.size()) < L->capacity;
    });
    if (L->stop.load()) return;
    L->ready.push(std::move(batch));
    L->not_empty.notify_one();
  }
}

void worker_main(Loader* L, uint64_t seed) {
  std::mt19937_64 rng(seed);
  // an exception escaping a std::thread calls std::terminate and kills the
  // training process — convert it into the loader's fail-loudly path
  try {
    worker_loop(L, &rng);
  } catch (const std::exception& e) {
    fail_loader(L, std::string("native loader worker: ") + e.what());
  } catch (...) {
    fail_loader(L, "native loader worker: unknown exception");
  }
}

// ------------------------------------------------------------ resize -------

// bilinear shortest-side resize to `target` then center-crop target×target
void resize_center_crop(const Image& img, int target, uint8_t* out) {
  double scale = static_cast<double>(target) /
                 std::min(img.h, img.w);
  int rh = std::max(target, static_cast<int>(img.h * scale + 0.5));
  int rw = std::max(target, static_cast<int>(img.w * scale + 0.5));
  int off_h = (rh - target) / 2, off_w = (rw - target) / 2;
  for (int i = 0; i < target; ++i) {
    // map output row (in resized space) back to source coordinates
    double sy = (i + off_h + 0.5) * img.h / rh - 0.5;
    int y0 = std::max(0, std::min(img.h - 1, static_cast<int>(sy)));
    int y1 = std::min(img.h - 1, y0 + 1);
    double fy = std::max(0.0, std::min(1.0, sy - y0));
    for (int j = 0; j < target; ++j) {
      double sx = (j + off_w + 0.5) * img.w / rw - 0.5;
      int x0 = std::max(0, std::min(img.w - 1, static_cast<int>(sx)));
      int x1 = std::min(img.w - 1, x0 + 1);
      double fx = std::max(0.0, std::min(1.0, sx - x0));
      for (int c = 0; c < 3; ++c) {
        double v00 = img.data[(static_cast<size_t>(y0) * img.w + x0) * 3 + c];
        double v01 = img.data[(static_cast<size_t>(y0) * img.w + x1) * 3 + c];
        double v10 = img.data[(static_cast<size_t>(y1) * img.w + x0) * 3 + c];
        double v11 = img.data[(static_cast<size_t>(y1) * img.w + x1) * 3 + c];
        double v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                   v10 * fy * (1 - fx) + v11 * fy * fx;
        out[(static_cast<size_t>(i) * target + j) * 3 + c] =
            static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

}  // namespace

extern "C" {

// Build a packed uint8 dataset cache: header (magic, version, count, store)
// + count records of store*store*3 bytes (decode → bilinear shortest-side
// resize → center crop). Decode-once path for datasets read many times;
// the reader side is a zero-copy numpy memmap (data/cache.py).
// Returns the number of records written, or -1 on I/O failure.
int dl_cache_build(const char** files, int n_files, int store,
                   const char* out_path) try {
  if (store <= 0 || n_files <= 0) return -1;
  FILE* f = fopen(out_path, "wb");
  if (!f) return -1;
  uint32_t header[4] = {0x47435432u /*'GCT2'*/, 1u, 0u,
                        static_cast<uint32_t>(store)};
  if (fwrite(header, sizeof(header), 1, f) != 1) {
    fclose(f);
    return -1;
  }
  std::vector<uint8_t> rec(static_cast<size_t>(store) * store * 3);
  uint32_t written = 0;
  for (int i = 0; i < n_files; ++i) {
    Image img;
    try {
      std::vector<uint8_t> raw;
      if (!load_file(files[i], &raw) ||
          !decode_any(raw.data(), raw.size(), &img))
        continue;  // tolerate scattered bad files
    } catch (const std::exception&) {
      continue;  // corrupt-header huge alloc etc. — a bad file
    }
    // degenerate near-1-pixel dimensions (tracking-pixel GIFs in scraped
    // data) would resize to a stretched-constant record; the live loaders
    // skip such images (pipeline.decode_image), so must the cache
    if (img.h < 4 || img.w < 4) continue;
    resize_center_crop(img, store, rec.data());
    if (fwrite(rec.data(), rec.size(), 1, f) != 1) {
      fclose(f);
      return -1;
    }
    ++written;
  }
  // back-patch the record count; a silent failure here (disk full) would
  // report success for a cache whose header still says 0 records
  if (fseek(f, 2 * sizeof(uint32_t), SEEK_SET) != 0 ||
      fwrite(&written, sizeof(written), 1, f) != 1) {
    fclose(f);
    return -1;
  }
  if (fclose(f) != 0) return -1;  // flush of buffered records can fail too
  return static_cast<int>(written);
} catch (const std::exception&) {
  return -1;  // never let an exception cross the C ABI
}

// ----------------------------------------------------------- crc32c --------
// Castagnoli CRC (reflected), slicing-by-8 — serves the from-scratch
// TensorBoard event writer (utils/tensorboard.py): TFRecord framing masks a
// CRC32C over every payload, and the pure-Python byte loop costs ~0.2 s per
// logged image grid; this runs the same computation at GB/s.
struct Crc32cTables {
  uint32_t t[8][256];
  Crc32cTables() {
    const uint32_t poly = 0x82F63B78u;
    for (uint32_t n = 0; n < 256; ++n) {
      uint32_t c = n;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
      t[0][n] = c;
    }
    for (uint32_t n = 0; n < 256; ++n)
      for (int s = 1; s < 8; ++s)
        t[s][n] = (t[s - 1][n] >> 8) ^ t[0][t[s - 1][n] & 0xFF];
  }
};
const Crc32cTables kCrc;

uint32_t crc32c_impl(const uint8_t* p, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    w ^= crc;  // little-endian hosts only (this image is x86-64)
    crc = kCrc.t[7][w & 0xFF] ^ kCrc.t[6][(w >> 8) & 0xFF] ^
          kCrc.t[5][(w >> 16) & 0xFF] ^ kCrc.t[4][(w >> 24) & 0xFF] ^
          kCrc.t[3][(w >> 32) & 0xFF] ^ kCrc.t[2][(w >> 40) & 0xFF] ^
          kCrc.t[1][(w >> 48) & 0xFF] ^ kCrc.t[0][(w >> 56) & 0xFF];
    p += 8;
    n -= 8;
  }
  while (n--) crc = kCrc.t[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

void* dl_create(const char** files, int n_files, int size, int batch, int workers,
                int capacity, uint64_t seed) try {
  if (n_files <= 0 || size <= 0 || batch <= 0) return nullptr;
  Loader* L = new Loader();
  L->files.reserve(n_files);
  for (int i = 0; i < n_files; ++i) L->files.emplace_back(files[i]);
  L->size = size;
  L->batch = batch;
  L->capacity = capacity > 0 ? capacity : 2;
  L->perm.resize(n_files);
  for (int i = 0; i < n_files; ++i) L->perm[i] = static_cast<uint32_t>(i);
  L->perm_rng.seed(seed ^ 0xD1B54A32D192ED03ULL);
  L->perm_pos = L->perm.size();  // first draw shuffles epoch 0
  int w = workers > 0 ? workers : 2;
  for (int i = 0; i < w; ++i)
    L->workers.emplace_back(worker_main, L, seed * 0x9E3779B97F4A7C15ULL + i + 1);
  return L;
} catch (const std::exception&) {
  return nullptr;  // never let an exception cross the C ABI
}

// Blocks until a batch is available; copies batch*size*size*3 floats into out.
// Returns 0 on success, -1 when the loader stopped cleanly, -2 when the
// worker pool aborted on persistent decode failures (see dl_error).
int dl_next(void* handle, float* out) {
  if (!handle) return -1;  // closed handle: clean stop, not a segfault
  Loader* L = static_cast<Loader*>(handle);
  std::vector<float> batch;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->not_empty.wait(lk, [L] { return L->stop.load() || !L->ready.empty(); });
    if (L->ready.empty()) return L->error.load() ? -2 : -1;
    batch = std::move(L->ready.front());
    L->ready.pop();
    L->not_full.notify_one();
  }
  memcpy(out, batch.data(), batch.size() * sizeof(float));
  return 0;
}

// Error description after dl_next returned -2; valid until dl_destroy.
const char* dl_error(void* handle) {
  if (!handle) return "";
  Loader* L = static_cast<Loader*>(handle);
  std::lock_guard<std::mutex> lk(L->mu);
  return L->error_message.c_str();
}

void dl_destroy(void* handle) {
  if (handle) delete static_cast<Loader*>(handle);
}

// Single-image decode + augment (deterministic seed) for parity tests.
// ``out_capacity``: the caller's buffer length in floats — the decoder
// validates against it instead of trusting that the caller's header probe
// (PIL) and this decoder agree on dimensions (a lenient parse on one side
// would otherwise be a heap overflow). Returns 0 on success, -3 when the
// decoded image exceeds the buffer.
int dl_decode_one(const char* path, int size, uint64_t seed, int do_augment,
                  float* out, int64_t out_capacity, int* out_h,
                  int* out_w) try {
  std::vector<uint8_t> raw;
  Image img;
  if (!load_file(path, &raw) || !decode_any(raw.data(), raw.size(), &img))
    return -1;
  *out_h = img.h;
  *out_w = img.w;
  if (!do_augment) {
    // raw normalize only (no crop/flip)
    if (static_cast<int64_t>(img.data.size()) > out_capacity) return -3;
    for (size_t i = 0; i < img.data.size(); ++i)
      out[i] = static_cast<float>(img.data[i]) * (1.0f / 128.0f) - 1.0f;
    return 0;
  }
  if (static_cast<int64_t>(size) * size * 3 > out_capacity) return -3;
  std::mt19937_64 rng(seed);
  return augment_to(img, size, &rng, out) ? 0 : -2;
} catch (const std::exception&) {
  return -1;  // never let an exception cross the C ABI
}

// CRC32C (Castagnoli) over a byte buffer — see crc32c_impl above.
uint32_t dl_crc32c(const uint8_t* data, uint64_t n) {
  return crc32c_impl(data, static_cast<size_t>(n));
}

}  // extern "C"
