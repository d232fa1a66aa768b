// Native JPEG decode + resize for the video frame pipeline.
//
// The reference feeds its GPUs with 32 python worker *processes* running
// PIL decodes (dpc/main.py:311, dpc/dataset_3d.py:106).  Our loader is
// thread-based, so the decode hot path must drop the GIL and burn no Python
// cycles: this translation unit decodes baseline JPEGs with libjpeg,
// exploiting DCT-domain scaling (scale_num/8) to do most of the downscale
// for free, then finishes with a fixed-point bilinear resample to the exact
// target size.  Exposed as a C ABI consumed via ctypes
// (dpc_tpu/native/__init__.py); a pthread pool amortises across a batch.
//
// Build: g++ -O3 -shared -fPIC -o libdpcjpeg.so jpeg_decoder.cpp -ljpeg -lpthread

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <jpeglib.h>
#include <pthread.h>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resample (fixed-point 16.16) from src (h,w,3) to dst (th,tw,3).
void bilinear_rgb(const uint8_t* src, int h, int w, uint8_t* dst, int th,
                  int tw) {
  if (h == th && w == tw) {
    memcpy(dst, src, static_cast<size_t>(h) * w * 3);
    return;
  }
  const int64_t x_step = ((int64_t)w << 16) / tw;
  const int64_t y_step = ((int64_t)h << 16) / th;
  std::vector<int> x0s(tw), x1s(tw), wxs(tw);
  for (int x = 0; x < tw; ++x) {
    int64_t fx = x * x_step + (x_step >> 1) - (1 << 15);
    if (fx < 0) fx = 0;
    int xi = static_cast<int>(fx >> 16);
    x0s[x] = xi < w - 1 ? xi : w - 1;
    x1s[x] = xi + 1 < w ? xi + 1 : w - 1;
    wxs[x] = static_cast<int>(fx & 0xffff);
  }
  for (int y = 0; y < th; ++y) {
    int64_t fy = y * y_step + (y_step >> 1) - (1 << 15);
    if (fy < 0) fy = 0;
    int yi = static_cast<int>(fy >> 16);
    int y0 = yi < h - 1 ? yi : h - 1;
    int y1 = yi + 1 < h ? yi + 1 : h - 1;
    int wy = static_cast<int>(fy & 0xffff);
    const uint8_t* r0 = src + static_cast<size_t>(y0) * w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * tw * 3;
    for (int x = 0; x < tw; ++x) {
      const int x0 = x0s[x] * 3, x1 = x1s[x] * 3, wx = wxs[x];
      for (int c = 0; c < 3; ++c) {
        int top = r0[x0 + c] + (((r0[x1 + c] - r0[x0 + c]) * wx) >> 16);
        int bot = r1[x0 + c] + (((r1[x1 + c] - r1[x0 + c]) * wx) >> 16);
        out[x * 3 + c] =
            static_cast<uint8_t>(top + (((bot - top) * wy) >> 16));
      }
    }
  }
}

// Bilinear resample from a ROI of a virtual (sh, sw) image to the crop
// [cy:cy+ch, cx:cx+cw] of the virtual (oh, ow) output.  `src` holds rows
// [roi_y0, roi_y0+roi_h) x cols [roi_x0, roi_x0+roi_w) of the decoded
// image; the mapping is the same fixed-point 16.16 grid as bilinear_rgb,
// so a cropped decode produces bit-identical pixels to crop-after-resize.
void bilinear_rgb_roi(const uint8_t* src, int sh, int sw, int roi_y0,
                      int roi_x0, int roi_h, int roi_w, uint8_t* dst,
                      int oh, int ow, int cy, int cx, int ch, int cw) {
  const int64_t x_step = ((int64_t)sw << 16) / ow;
  const int64_t y_step = ((int64_t)sh << 16) / oh;
  std::vector<int> x0s(cw), x1s(cw), wxs(cw);
  for (int x = 0; x < cw; ++x) {
    int64_t fx = (int64_t)(cx + x) * x_step + (x_step >> 1) - (1 << 15);
    if (fx < 0) fx = 0;
    int xi = static_cast<int>(fx >> 16);
    int x0 = xi < sw - 1 ? xi : sw - 1;
    int x1 = xi + 1 < sw ? xi + 1 : sw - 1;
    x0s[x] = (x0 - roi_x0) * 3;
    x1s[x] = (x1 - roi_x0) * 3;
    wxs[x] = static_cast<int>(fx & 0xffff);
  }
  for (int y = 0; y < ch; ++y) {
    int64_t fy = (int64_t)(cy + y) * y_step + (y_step >> 1) - (1 << 15);
    if (fy < 0) fy = 0;
    int yi = static_cast<int>(fy >> 16);
    int y0 = yi < sh - 1 ? yi : sh - 1;
    int y1 = yi + 1 < sh ? yi + 1 : sh - 1;
    int wy = static_cast<int>(fy & 0xffff);
    const uint8_t* r0 = src + static_cast<size_t>(y0 - roi_y0) * roi_w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1 - roi_y0) * roi_w * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * cw * 3;
    for (int x = 0; x < cw; ++x) {
      const int x0 = x0s[x], x1 = x1s[x], wx = wxs[x];
      for (int c = 0; c < 3; ++c) {
        int top = r0[x0 + c] + (((r0[x1 + c] - r0[x0 + c]) * wx) >> 16);
        int bot = r1[x0 + c] + (((r1[x1 + c] - r1[x0 + c]) * wx) >> 16);
        out[x * 3 + c] =
            static_cast<uint8_t>(top + (((bot - top) * wy) >> 16));
      }
    }
  }
}

// Short-side output dims, matching data/augment.py::Scale's int() rule.
void shortside_dims(int h, int w, int s, int* oh, int* ow) {
  if ((w <= h && w == s) || (h <= w && h == s)) {
    *oh = h;
    *ow = w;
  } else if (w < h) {
    *ow = s;
    *oh = static_cast<int>((double)s * h / w);
  } else {
    *oh = s;
    *ow = static_cast<int>((double)s * w / h);
  }
}

}  // namespace

extern "C" {

// Decode header only: writes (height, width) into dims[0..1]; returns 0 ok.
int dpc_jpeg_dims(const uint8_t* data, int64_t len, int32_t* dims) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  dims[0] = cinfo.image_height;
  dims[1] = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode one JPEG to RGB and bilinear-resize into out (th × tw × 3).
// target th/tw <= 0 means "native size" (caller must size out accordingly,
// using dpc_jpeg_dims).  Uses DCT-domain M/8 scaling to land the cheapest
// decode that still covers the target.  Returns 0 on success.
int dpc_jpeg_decode_resize(const uint8_t* data, int64_t len, uint8_t* out,
                           int32_t th, int32_t tw) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (th > 0 && tw > 0) {
    // smallest M with ceil(dim·M/8) >= target on both axes
    int m = 8;
    for (int cand = 1; cand <= 8; ++cand) {
      long sh = (static_cast<long>(cinfo.image_height) * cand + 7) / 8;
      long sw = (static_cast<long>(cinfo.image_width) * cand + 7) / 8;
      if (sh >= th && sw >= tw) {
        m = cand;
        break;
      }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height, w = cinfo.output_width;
  const int stride = w * cinfo.output_components;
  std::vector<uint8_t> buf(static_cast<size_t>(h) * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  // read before teardown: jpeg_destroy_decompress is allowed to scrub
  // the struct (decode_scale_crop already saves it the same way)
  const int comps = cinfo.output_components;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (comps != 3) {
    // expand grayscale to RGB in place
    std::vector<uint8_t> rgb(static_cast<size_t>(h) * w * 3);
    for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = buf[i];
    }
    buf.swap(rgb);
  }
  if (th <= 0 || tw <= 0) {
    memcpy(out, buf.data(), static_cast<size_t>(h) * w * 3);
    return 0;
  }
  bilinear_rgb(buf.data(), h, w, out, th, tw);
  return 0;
}

// Decode fused with aspect-preserving short-side scaling and an ROI crop:
// scale so min(h, w) == short_side (augment.py::Scale semantics), then
// crop rows [cy, cy+ch) x cols [cx, cx+cw) of the SCALED image into
// out[ch, cw, 3].  Only the source region feeding the crop is IDCT'd:
// jpeg_crop_scanline restricts the column range (iMCU-aligned),
// jpeg_skip_scanlines skips the leading rows, and the decode is aborted
// after the last needed row — the host half of the --device_augment
// pipeline becomes part of the entropy decode itself.
// Returns 0 ok, 1 corrupt, 2 crop outside the scaled image (caller
// falls back to the full decode + numpy path, e.g. portrait frames
// that need reflect-padding).
int dpc_jpeg_decode_scale_crop(const uint8_t* data, int64_t len,
                               uint8_t* out, int32_t short_side,
                               int32_t cy, int32_t cx, int32_t ch,
                               int32_t cw) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  const int H = cinfo.image_height, W = cinfo.image_width;
  int oh, ow;
  shortside_dims(H, W, short_side, &oh, &ow);
  if (cy < 0 || cx < 0 || ch < 1 || cw < 1 || cy + ch > oh ||
      cx + cw > ow) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  int m = 8;
  for (int cand = 1; cand <= 8; ++cand) {
    long sh = (static_cast<long>(H) * cand + 7) / 8;
    long sw = (static_cast<long>(W) * cand + 7) / 8;
    if (sh >= oh && sw >= ow) {
      m = cand;
      break;
    }
  }
  cinfo.scale_num = m;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  const int sh = cinfo.output_height, sw = cinfo.output_width;
  // source span feeding the crop (16.16 grid of bilinear_rgb_roi)
  int x_lo, x_hi, y_lo, y_hi;
  if (sh == oh && sw == ow) {
    x_lo = cx; x_hi = cx + cw - 1;
    y_lo = cy; y_hi = cy + ch - 1;
  } else {
    const int64_t x_step = ((int64_t)sw << 16) / ow;
    const int64_t y_step = ((int64_t)sh << 16) / oh;
    int64_t fx0 = (int64_t)cx * x_step + (x_step >> 1) - (1 << 15);
    int64_t fx1 = (int64_t)(cx + cw - 1) * x_step + (x_step >> 1) -
                  (1 << 15);
    int64_t fy0 = (int64_t)cy * y_step + (y_step >> 1) - (1 << 15);
    int64_t fy1 = (int64_t)(cy + ch - 1) * y_step + (y_step >> 1) -
                  (1 << 15);
    if (fx0 < 0) fx0 = 0;
    if (fy0 < 0) fy0 = 0;
    if (fx1 < 0) fx1 = 0;
    if (fy1 < 0) fy1 = 0;
    x_lo = static_cast<int>(fx0 >> 16);
    y_lo = static_cast<int>(fy0 >> 16);
    x_hi = static_cast<int>(fx1 >> 16) + 1;
    y_hi = static_cast<int>(fy1 >> 16) + 1;
    if (x_lo > sw - 1) x_lo = sw - 1;
    if (y_lo > sh - 1) y_lo = sh - 1;
    if (x_hi > sw - 1) x_hi = sw - 1;
    if (y_hi > sh - 1) y_hi = sh - 1;
  }
  // fancy (h2v2) chroma upsampling loses context at the cropped-region
  // boundary: pad the span a few pixels so every pixel the output reads
  // has full upsampling context (verified bit-identical to the
  // crop-after-full-decode path in tests/test_native_jpeg.py)
  x_lo = x_lo > 4 ? x_lo - 4 : 0;
  y_lo = y_lo > 4 ? y_lo - 4 : 0;
  x_hi = x_hi + 4 < sw ? x_hi + 4 : sw - 1;
  y_hi = y_hi + 4 < sh ? y_hi + 4 : sh - 1;
  JDIMENSION xoff = x_lo, xw = x_hi - x_lo + 1;
  jpeg_crop_scanline(&cinfo, &xoff, &xw);  // widens to iMCU boundaries
  const int roi_x0 = static_cast<int>(xoff);
  const int roi_w = static_cast<int>(cinfo.output_width);
  const int comps = cinfo.output_components;
  jpeg_skip_scanlines(&cinfo, y_lo);
  const int roi_y0 = static_cast<int>(cinfo.output_scanline);
  const int roi_h = y_hi - roi_y0 + 1;
  const int stride = roi_w * comps;
  std::vector<uint8_t> buf(static_cast<size_t>(roi_h) * stride);
  while (cinfo.output_scanline < static_cast<JDIMENSION>(y_hi + 1)) {
    uint8_t* row =
        buf.data() +
        static_cast<size_t>(cinfo.output_scanline - roi_y0) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  // drop the tail without decoding it
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (comps != 3) {  // expand grayscale
    std::vector<uint8_t> rgb(static_cast<size_t>(roi_h) * roi_w * 3);
    for (size_t i = 0; i < static_cast<size_t>(roi_h) * roi_w; ++i)
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = buf[i];
    buf.swap(rgb);
  }
  if (sh == oh && sw == ow) {  // pure crop: slice rows out of the ROI
    for (int y = 0; y < ch; ++y)
      memcpy(out + static_cast<size_t>(y) * cw * 3,
             buf.data() +
                 static_cast<size_t>(cy + y - roi_y0) * roi_w * 3 +
                 static_cast<size_t>(cx - roi_x0) * 3,
             static_cast<size_t>(cw) * 3);
    return 0;
  }
  bilinear_rgb_roi(buf.data(), sh, sw, roi_y0, roi_x0, roi_h, roi_w, out,
                   oh, ow, cy, cx, ch, cw);
  return 0;
}

// ---------------------------------------------------------------------------
// Batched decode with a pthread pool.
// ---------------------------------------------------------------------------

struct BatchJob {
  const uint8_t* const* datas;
  const int64_t* lens;
  uint8_t* out;       // contiguous [n, th, tw, 3]
  int32_t th, tw;
  int32_t short_side, cy, cx;  // scale_crop mode when short_side > 0
  int n;
  int next;           // shared cursor
  int failures;
  pthread_mutex_t mu;
};

void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  const size_t frame_bytes =
      static_cast<size_t>(job->th) * job->tw * 3;
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->n) break;
    int rc =
        job->short_side > 0
            ? dpc_jpeg_decode_scale_crop(job->datas[i], job->lens[i],
                                         job->out + frame_bytes * i,
                                         job->short_side, job->cy,
                                         job->cx, job->th, job->tw)
            : dpc_jpeg_decode_resize(job->datas[i], job->lens[i],
                                     job->out + frame_bytes * i, job->th,
                                     job->tw);
    if (rc != 0) {
      pthread_mutex_lock(&job->mu);
      job->failures++;
      pthread_mutex_unlock(&job->mu);
      memset(job->out + frame_bytes * i, 0, frame_bytes);
    }
  }
  return nullptr;
}

// Decode n JPEGs into out[n, th, tw, 3] with `threads` workers.
// Returns the number of failed decodes (failed frames are zeroed).
int dpc_jpeg_decode_batch(const uint8_t* const* datas, const int64_t* lens,
                          int n, uint8_t* out, int32_t th, int32_t tw,
                          int threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  BatchJob job{datas, lens, out, th, tw, -1, 0, 0, n, 0, 0,
               PTHREAD_MUTEX_INITIALIZER};
  std::vector<pthread_t> tids(threads);
  for (int t = 0; t < threads; ++t)
    pthread_create(&tids[t], nullptr, batch_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
  return job.failures;
}

// Batched scale+crop decode: every frame of the clip shares one crop
// window (the consistent augmentation contract).  out is [n, ch, cw, 3].
// Returns the number of failed decodes; a frame whose crop falls outside
// its scaled image counts as failed (caller falls back per-frame).
int dpc_jpeg_decode_batch_scale_crop(const uint8_t* const* datas,
                                     const int64_t* lens, int n,
                                     uint8_t* out, int32_t short_side,
                                     int32_t cy, int32_t cx, int32_t ch,
                                     int32_t cw, int threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  BatchJob job{datas, lens, out, ch, cw, short_side, cy, cx, n, 0, 0,
               PTHREAD_MUTEX_INITIALIZER};
  std::vector<pthread_t> tids(threads);
  for (int t = 0; t < threads; ++t)
    pthread_create(&tids[t], nullptr, batch_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
  return job.failures;
}

}  // extern "C"
