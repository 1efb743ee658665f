// cova_native: native host runtime for the CoVA-TPU input pipeline.
//
// The reference's data loading leans on native code inside its Python deps
// (PIL's zlib/PNG decoder, torch DataLoader worker processes —
// /root/reference/datasets.py:96-97,227-258). This library provides the
// TPU framework's native equivalent: a libpng-based screenshot decoder and a
// bbox-CSV parser, both runnable across a pthread pool so batch assembly
// saturates host cores without Python in the loop. Exposed to Python via
// ctypes (cova_tpu/data/native_loader.py).
//
// Build: make -C native   (produces libcova_native.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <png.h>
#include <pthread.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

// Decode one PNG to tightly-packed RGB8 [h, w, 3].
// Images smaller than (h, w) are zero-padded bottom/right; larger ones are
// cropped. Returns 0 on success, negative error codes otherwise.
int cova_decode_png(const char* path, unsigned char* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;

  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return -2;
  }

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return -3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return -3;
  }
  // Declared before setjmp (and volatile, so its post-setjmp value is
  // defined after a longjmp): a mid-stream decode error inside
  // png_read_row lands in the handler AFTER the row buffer is allocated —
  // without the free this leaked rowbytes per corrupt image.
  png_bytep volatile row = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free((void*)row);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }

  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 img_w = png_get_image_width(png, info);
  png_uint_32 img_h = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  // Normalize every input format to 8-bit RGB, matching PIL's
  // convert("RGB") (the Python fallback this decoder must mirror). Alpha is
  // stripped UNCONDITIONALLY: png_set_palette_to_rgb sets PNG_EXPAND, which
  // also expands a tRNS transparency chunk into a full alpha channel even
  // though the original color_type carries no alpha mask — gating the strip
  // on the original color_type used to leave 4-byte RGBA rows that the RGB
  // memcpy below channel-shifted. Stripping is a no-op when no alpha exists,
  // and dropping the expanded alpha leaves exactly PIL's RGB values (PIL's
  // convert("RGB") ignores tRNS).
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  // Safety net: after the transform chain the rows must be exactly RGB8.
  // Fail with an error code rather than memcpy'ing mismatched row widths.
  if (png_get_channels(png, info) != 3 || png_get_bit_depth(png, info) != 8) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -7;
  }

  size_t rowbytes = png_get_rowbytes(png, info);
  row = (png_bytep)malloc(rowbytes);
  if (!row) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -5;
  }

  memset(out, 0, (size_t)h * w * 3);
  int copy_w = (int)img_w < w ? (int)img_w : w;
  // libpng requires reading all rows in order; read and copy the ones in
  // range. (Interlaced images would need the full-image path; web
  // screenshots are non-interlaced — fail fast otherwise.)
  if (png_get_interlace_type(png, info) != PNG_INTERLACE_NONE) {
    free(row);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -6;
  }
  for (png_uint_32 y = 0; y < img_h; y++) {
    png_read_row(png, row, nullptr);
    if ((int)y < h) {
      memcpy(out + (size_t)y * w * 3, row, (size_t)copy_w * 3);
    }
  }

  free(row);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// Threaded batch decode
// ---------------------------------------------------------------------------

// Space-to-depth(4) of an RGB image: [h, w, 3] -> [h/4, w/4, 48], channel
// order (dy, dx, c) — the layout the TPU stem conv consumes directly (a
// 3-channel tensor is lane-padded 3->128 in TPU tiled memory; shipping the
// s2d form avoids a ~6 ms/step on-device rearrange). Each inner copy moves
// 4 pixels x 3 bytes = 12 contiguous bytes.
void cova_s2d4(const unsigned char* in, unsigned char* out, int h, int w) {
  int U = h / 4, V = w / 4;
  for (int u = 0; u < U; u++) {
    for (int dy = 0; dy < 4; dy++) {
      const unsigned char* row = in + (size_t)(u * 4 + dy) * w * 3;
      unsigned char* dst = out + (size_t)u * V * 48 + dy * 12;
      for (int v = 0; v < V; v++) {
        memcpy(dst + (size_t)v * 48, row + (size_t)v * 12, 12);
      }
    }
  }
}

struct DecodeTask {
  const char** paths;
  unsigned char* out;
  int n, h, w;
  int s2d4;          // nonzero: emit [h/4, w/4, 48] instead of [h, w, 3]
  int next;          // next index to claim
  int failures;      // count of failed decodes
  pthread_mutex_t mu;
};

static void* decode_worker(void* arg) {
  DecodeTask* t = (DecodeTask*)arg;
  size_t img_bytes = (size_t)t->h * t->w * 3;  // same total in s2d form
  unsigned char* tmp = nullptr;
  if (t->s2d4) tmp = (unsigned char*)malloc(img_bytes);
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->n) break;
    unsigned char* slot = t->out + (size_t)i * img_bytes;
    unsigned char* target = t->s2d4 ? tmp : slot;
    // A worker whose scratch allocation failed marks its claims as failed
    // decodes (healthy workers keep competing for the rest) rather than
    // writing through NULL.
    int rc = (t->s2d4 && !tmp)
                 ? -1
                 : cova_decode_png(t->paths[i], target, t->h, t->w);
    if (rc != 0) {
      pthread_mutex_lock(&t->mu);
      t->failures++;
      pthread_mutex_unlock(&t->mu);
    } else if (t->s2d4) {
      cova_s2d4(tmp, slot, t->h, t->w);
    }
  }
  free(tmp);
  return nullptr;
}

// Decode n PNGs into out (n contiguous [h, w, 3] slabs — or, with
// s2d4 != 0, n contiguous [h/4, w/4, 48] space-to-depth slabs) using
// `nthreads` worker threads. Returns the number of failed decodes.
int cova_decode_png_batch_ex(const char** paths, int n, unsigned char* out,
                             int h, int w, int nthreads, int s2d4) {
  if (n <= 0) return 0;
  if (s2d4 && (h % 4 || w % 4)) return -1;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;

  DecodeTask task;
  task.paths = paths;
  task.out = out;
  task.n = n;
  task.h = h;
  task.w = w;
  task.s2d4 = s2d4;
  task.next = 0;
  task.failures = 0;
  pthread_mutex_init(&task.mu, nullptr);

  pthread_t threads[64];
  if (nthreads > 64) nthreads = 64;
  int spawned = 0;
  for (; spawned < nthreads - 1; spawned++) {
    if (pthread_create(&threads[spawned], nullptr, decode_worker, &task)) break;
  }
  decode_worker(&task);  // caller thread participates
  for (int i = 0; i < spawned; i++) pthread_join(threads[i], nullptr);
  pthread_mutex_destroy(&task.mu);
  return task.failures;
}

int cova_decode_png_batch(const char** paths, int n, unsigned char* out,
                          int h, int w, int nthreads) {
  return cova_decode_png_batch_ex(paths, n, out, h, w, nthreads, 0);
}

// ---------------------------------------------------------------------------
// BBox CSV parse: rows "x,y,w,h,label" with one header line.
// ---------------------------------------------------------------------------

// Parses up to max_rows rows of 5 floats into out. Returns the number of
// rows parsed, or a negative error code.
int cova_parse_bbox_csv(const char* path, float* out, int max_rows) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;

  // Slurp the file (bbox CSVs are a few KB).
  fseek(fp, 0, SEEK_END);
  long size = ftell(fp);
  fseek(fp, 0, SEEK_SET);
  char* buf = (char*)malloc(size + 1);
  if (!buf) {
    fclose(fp);
    return -2;
  }
  size_t got = fread(buf, 1, size, fp);
  fclose(fp);
  buf[got] = '\0';

  char* p = strchr(buf, '\n');  // skip header
  if (!p) {
    free(buf);
    return 0;
  }
  p++;

  int rows = 0;
  while (rows < max_rows) {
    // Skip blank lines / stray whitespace between rows.
    while (*p == '\n' || *p == '\r' || *p == ' ') p++;
    if (!*p) break;
    char* end = p;
    int ok = 1;
    for (int c = 0; c < 5; c++) {
      if (c > 0) {
        while (*p == ' ') p++;
        if (*p != ',') {
          ok = 0;
          break;
        }
        p++;
      }
      while (*p == ' ') p++;
      // A row with fewer than 5 fields must ERROR, not let strtof skip
      // the newline and silently merge with the next row (shifting every
      // subsequent box/label) — np.loadtxt raises on the same file.
      if (*p == '\n' || *p == '\r' || *p == '\0') {
        ok = 0;
        break;
      }
      out[rows * 5 + c] = strtof(p, &end);
      if (end == p) {
        ok = 0;
        break;
      }
      p = end;
    }
    if (!ok) {
      free(buf);
      return -3;  // malformed row
    }
    rows++;
    while (*p && *p != '\n') p++;
    if (*p == '\n') p++;
  }
  free(buf);
  return rows;
}

}  // extern "C"
