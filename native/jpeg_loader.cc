// Native host-side JPEG batch decoder.
//
// TPU-native replacement for the reference's OpenCV C++ image-decode
// boundary (reference: utils.rs:8-21, `imdecode` + BGR->RGB).  At 5k+
// frames/s/chip the Python/Pillow decode path on the host becomes the
// feed bottleneck; this library decodes JPEG batches with libjpeg
// across a thread pool directly into a caller-provided contiguous
// [N, H, W, 3] RGB buffer ready for device transfer.
//
// C ABI only (consumed via ctypes from tpu_face/utils/native_loader.py;
// no pybind11 in this environment).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG from memory into out (RGB888, row-major).  If the
// image dimensions differ from (w, h) the decode fails (batch layout is
// fixed).  Returns 0 on success.
int decode_one(const uint8_t* data, unsigned long len, uint8_t* out,
               int w, int h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != w ||
      static_cast<int>(cinfo.output_height) != h ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t stride = static_cast<size_t>(w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode one JPEG into PLANAR RGB ([3, h, w], channel-major): each
// scanline is deinterleaved into the three planes as it is read.  The
// device-side warp kernels consume channel planes, so planar host
// output removes the frame-layout transpose from the accelerator step
// entirely.  Returns 0 on success.
int decode_one_planar(const uint8_t* data, unsigned long len,
                      uint8_t* out, int w, int h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != w ||
      static_cast<int>(cinfo.output_height) != h ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t plane = static_cast<size_t>(w) * h;
  while (cinfo.output_scanline < cinfo.output_height) {
    const size_t y = cinfo.output_scanline;
    JSAMPROW rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* r = out + y * w;
    uint8_t* g = out + plane + y * w;
    uint8_t* b = out + 2 * plane + y * w;
    for (int x = 0; x < w; ++x) {
      r[x] = row[3 * x];
      g[x] = row[3 * x + 1];
      b[x] = row[3 * x + 2];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Read (width, height) from a JPEG header.  Returns 0 on success.
int tpuface_jpeg_info(const uint8_t* data, unsigned long len, int* w,
                      int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int tpuface_jpeg_decode(const uint8_t* data, unsigned long len,
                        uint8_t* out, int w, int h) {
  return decode_one(data, len, out, w, h);
}

// Decode n same-sized JPEGs into one contiguous [n, h, w, 3] buffer
// using nthreads worker threads.  Returns the number of failed frames
// (their slots are zero-filled).
int tpuface_jpeg_decode_batch(const uint8_t* const* datas,
                              const unsigned long* lens, uint8_t* out,
                              int w, int h, int n, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  const size_t frame = static_cast<size_t>(w) * h * 3;
  std::vector<int> failures(nthreads, 0);
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += nthreads) {
        uint8_t* dst = out + frame * i;
        if (decode_one(datas[i], lens[i], dst, w, h) != 0) {
          std::memset(dst, 0, frame);
          failures[t]++;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

// Index the frames of an MJPEG byte stream (concatenated JPEGs, the
// usual IP-camera / multipart stream payload once headers are
// stripped).  A real segment-structure walk, not a marker grep:
// entropy-coded scan data escapes 0xFF as FF00/RSTn, so EOI inside a
// scan is found by skipping to the first FF followed by a non-fill,
// non-RST byte.  Writes up to max_n (offset, length) pairs; returns
// the number of frames found (which may equal max_n if truncated).
int tpuface_mjpeg_index(const uint8_t* data, unsigned long len,
                        unsigned long* offs, unsigned long* lens,
                        int max_n) {
  int n = 0;
  unsigned long pos = 0;
  while (n < max_n && pos + 4 <= len) {
    // find SOI
    while (pos + 2 <= len && !(data[pos] == 0xFF &&
                               data[pos + 1] == 0xD8)) {
      pos++;
    }
    if (pos + 2 > len) break;
    const unsigned long start = pos;
    unsigned long p = pos + 2;
    unsigned long resync = start + 2;
    bool done = false, bad = false;
    while (!done && !bad) {
      // marker must start with FF (skip fill bytes)
      if (p + 2 > len) { bad = true; break; }
      if (data[p] != 0xFF) { bad = true; break; }
      while (p + 1 < len && data[p + 1] == 0xFF) p++;   // fill
      if (p + 2 > len) { bad = true; break; }
      const uint8_t m = data[p + 1];
      if (m == 0xD9) {                                  // EOI
        offs[n] = start;
        lens[n] = (p + 2) - start;
        n++;
        pos = p + 2;
        done = true;
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        p += 2;                                         // standalone
      } else if (m == 0xD8) {
        // Unexpected SOI where a segment should start: the previous
        // frame was truncated (malformed stream).  Were it read as a
        // length segment, two data bytes would become a bogus length
        // and the walk could emit garbage slices.  Drop the truncated
        // frame and resync AT this SOI so the next frame is kept.
        bad = true;
        resync = p;
      } else if (m == 0xDA) {                           // SOS
        if (p + 4 > len) { bad = true; break; }
        const unsigned long seg =
            (static_cast<unsigned long>(data[p + 2]) << 8) | data[p + 3];
        p += 2 + seg;
        // entropy-coded data: skip to next real marker
        while (p + 2 <= len &&
               !(data[p] == 0xFF && data[p + 1] != 0x00 &&
                 !(data[p + 1] >= 0xD0 && data[p + 1] <= 0xD7))) {
          p++;
        }
      } else {                                          // length segment
        if (p + 4 > len) { bad = true; break; }
        const unsigned long seg =
            (static_cast<unsigned long>(data[p + 2]) << 8) | data[p + 3];
        p += 2 + seg;
      }
    }
    if (bad) pos = resync;   // past the bogus SOI, or AT a nested one
  }
  return n;
}

// Planar variant of the batch decoder: out is [n, 3, h, w] RGB planes
// (the layout the device warp kernels consume, so the accelerator
// never pays a frame transpose).  Returns the number of failed frames
// (zero-filled slots).
int tpuface_jpeg_decode_batch_planar(const uint8_t* const* datas,
                                     const unsigned long* lens,
                                     uint8_t* out, int w, int h, int n,
                                     int nthreads) {
  if (nthreads < 1) nthreads = 1;
  const size_t frame = static_cast<size_t>(w) * h * 3;
  std::vector<int> failures(nthreads, 0);
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += nthreads) {
        uint8_t* dst = out + frame * i;
        if (decode_one_planar(datas[i], lens[i], dst, w, h) != 0) {
          std::memset(dst, 0, frame);
          failures[t]++;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
