// vrag_store: native host runtime for the TPU visual-RAG index.
//
// The reference offloads its hot host paths to an external Rust server
// (Qdrant) — here the equivalents are in-process:
//   * vrs_pack_aligned   : OpenMP-parallel L2-normalize + scatter of ragged
//                          doc token matrices into the 32-row-aligned flat
//                          layout the Pallas kernels DMA from (seal hot path)
//   * vrs_quantize_int8  : per-row symmetric int8 quantization with scales
//   * VRAG1 file format  : single-file binary collection (named sections,
//                          crc32-checked) written with raw I/O and read
//                          zero-copy via mmap -> numpy views
//   * vrs_filter_*       : columnar predicate kernels over interned payload
//                          columns -> candidate bitmasks
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// crc32 (static table, standard polynomial)
// ---------------------------------------------------------------------------

static uint32_t crc_table[256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t vrs_crc32(const uint8_t* data, int64_t n) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (int64_t i = 0; i < n; i++) c = crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Seal-path packing
// ---------------------------------------------------------------------------

// Pack ragged [total_rows, dim] f32 rows (docs concatenated in order) into a
// pre-zeroed aligned flat buffer. offsets_out[i] = aligned start row of doc i.
// Returns rows used (excluding caller-added tail padding), or -1 on error.
int64_t vrs_pack_aligned(const float* src, const int32_t* lengths, int32_t n_docs,
                         int32_t dim, int32_t align, float* dst, int64_t dst_rows,
                         int64_t* offsets_out, int32_t normalize) {
  if (align <= 0 || dim <= 0 || n_docs < 0) return -1;
  // compute aligned offsets (prefix scan, serial: n_docs is small)
  int64_t pos = 0;
  std::vector<int64_t> src_off(n_docs);
  int64_t src_pos = 0;
  for (int32_t i = 0; i < n_docs; i++) {
    offsets_out[i] = pos;
    src_off[i] = src_pos;
    int64_t ln = lengths[i];
    pos += ((ln + align - 1) / align) * align;
    src_pos += ln;
  }
  if (pos > dst_rows) return -1;

#pragma omp parallel for schedule(dynamic, 8)
  for (int32_t i = 0; i < n_docs; i++) {
    const float* s = src + src_off[i] * dim;
    float* d = dst + offsets_out[i] * dim;
    int64_t ln = lengths[i];
    for (int64_t r = 0; r < ln; r++) {
      const float* row = s + r * dim;
      float* out = d + r * dim;
      if (normalize) {
        double acc = 0.0;
        for (int32_t c = 0; c < dim; c++) acc += (double)row[c] * row[c];
        float inv = acc > 1e-24 ? (float)(1.0 / std::sqrt(acc)) : 0.0f;
        for (int32_t c = 0; c < dim; c++) out[c] = row[c] * inv;
      } else {
        std::memcpy(out, row, sizeof(float) * dim);
      }
    }
  }
  return pos;
}

// Per-DOC symmetric int8 quantization over the aligned ragged layout:
// scale_i = max|doc_i rows| / 127 (doc-constant scales commute with the
// MaxSim row-max + query-sum, so kernels apply them once per candidate).
void vrs_quantize_per_doc(const float* flat, const int64_t* offsets,
                          const int32_t* lengths, int32_t n_docs, int32_t dim,
                          int8_t* q_out, float* scales_out) {
#pragma omp parallel for schedule(dynamic, 8)
  for (int32_t i = 0; i < n_docs; i++) {
    const float* block = flat + offsets[i] * dim;
    int64_t n = (int64_t)lengths[i] * dim;
    float m = 0.0f;
    for (int64_t j = 0; j < n; j++) m = std::max(m, std::fabs(block[j]));
    float scale = m > 0.0f ? m / 127.0f : 1.0f;
    scales_out[i] = scale;
    float inv = 1.0f / scale;
    int8_t* out = q_out + offsets[i] * dim;
    for (int64_t j = 0; j < n; j++) {
      float v = std::nearbyint(block[j] * inv);
      v = std::max(-127.0f, std::min(127.0f, v));
      out[j] = (int8_t)v;
    }
  }
}

// Per-row symmetric int8 quantization: scale = max|row|/127.
void vrs_quantize_int8(const float* src, int64_t rows, int32_t dim, int8_t* q_out,
                       float* scales_out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; r++) {
    const float* row = src + r * dim;
    float m = 0.0f;
    for (int32_t c = 0; c < dim; c++) m = std::max(m, std::fabs(row[c]));
    float scale = m > 0.0f ? m / 127.0f : 1.0f;
    scales_out[r] = scale;
    float inv = 1.0f / scale;
    int8_t* out = q_out + r * dim;
    for (int32_t c = 0; c < dim; c++) {
      float v = std::nearbyint(row[c] * inv);
      v = std::max(-127.0f, std::min(127.0f, v));
      out[c] = (int8_t)v;
    }
  }
}

// fp32 -> bf16 (round-to-nearest-even). numpy's ml_dtypes astype runs a
// slow per-element path (~150 MB/s); this loop saturates memory bandwidth.
void vrs_f32_to_bf16(const float* src, uint16_t* dst, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    uint32_t bits;
    std::memcpy(&bits, &src[i], 4);
    if ((bits & 0x7F800000u) == 0x7F800000u && (bits & 0x007FFFFFu)) {
      dst[i] = (uint16_t)((bits >> 16) | 0x40u);  // quiet NaN, keep sign
      continue;
    }
    uint32_t lsb = (bits >> 16) & 1u;
    bits += 0x7FFFu + lsb;  // round to nearest even
    dst[i] = (uint16_t)(bits >> 16);
  }
}

// ---------------------------------------------------------------------------
// VRAG1 single-file collection format
//
//   [magic "VRAG1\0\0\0"][u32 n_sections][u32 reserved]
//   per section: [u16 name_len][name bytes][u8 dtype][u8 ndim]
//                [i64 shape[ndim]][i64 nbytes][u32 crc32][data (8-aligned)]
//
// dtype codes: 0=f32 1=f16 2=bf16(raw u16) 3=i8 4=i32 5=i64 6=u8(blob)
// ---------------------------------------------------------------------------

struct Writer {
  FILE* f;
  uint32_t n_sections;
  long count_pos;
};

static std::vector<Writer*> g_writers;

void* vrs_writer_open(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  Writer* w = new Writer{f, 0, 0};
  const char magic[8] = {'V', 'R', 'A', 'G', '1', 0, 0, 0};
  std::fwrite(magic, 1, 8, f);
  w->count_pos = std::ftell(f);
  uint32_t zero = 0;
  std::fwrite(&zero, 4, 1, f);  // n_sections placeholder
  std::fwrite(&zero, 4, 1, f);  // reserved
  return w;
}

static void pad_to_8(FILE* f) {
  long p = std::ftell(f);
  static const char zeros[8] = {0};
  long rem = p % 8;
  if (rem) std::fwrite(zeros, 1, 8 - rem, f);
}

int vrs_writer_add(void* handle, const char* name, uint8_t dtype, uint8_t ndim,
                   const int64_t* shape, const uint8_t* data, int64_t nbytes) {
  Writer* w = (Writer*)handle;
  if (!w || !w->f) return -1;
  uint16_t nl = (uint16_t)std::strlen(name);
  std::fwrite(&nl, 2, 1, w->f);
  std::fwrite(name, 1, nl, w->f);
  std::fwrite(&dtype, 1, 1, w->f);
  std::fwrite(&ndim, 1, 1, w->f);
  std::fwrite(shape, 8, ndim, w->f);
  std::fwrite(&nbytes, 8, 1, w->f);
  uint32_t crc = vrs_crc32(data, nbytes);
  std::fwrite(&crc, 4, 1, w->f);
  pad_to_8(w->f);
  if (nbytes > 0 && std::fwrite(data, 1, (size_t)nbytes, w->f) != (size_t)nbytes)
    return -2;
  pad_to_8(w->f);
  w->n_sections++;
  return 0;
}

int vrs_writer_close(void* handle) {
  Writer* w = (Writer*)handle;
  if (!w) return -1;
  std::fseek(w->f, w->count_pos, SEEK_SET);
  std::fwrite(&w->n_sections, 4, 1, w->f);
  int rc = std::fclose(w->f);
  delete w;
  return rc;
}

// Reader: parse the table of contents from a caller-mmapped buffer.
// Fills parallel arrays (caller-allocated, max_sections entries):
//   name_offs/name_lens, dtypes, ndims, shapes (flattened, 8 per section),
//   data_offs, data_lens, crcs. Returns n_sections or negative error.
int vrs_read_toc(const uint8_t* buf, int64_t nbytes, int32_t max_sections,
                 int64_t* name_offs, int32_t* name_lens, uint8_t* dtypes,
                 uint8_t* ndims, int64_t* shapes, int64_t* data_offs,
                 int64_t* data_lens, uint32_t* crcs) {
  if (nbytes < 16 || std::memcmp(buf, "VRAG1", 5) != 0) return -1;
  uint32_t n;
  std::memcpy(&n, buf + 8, 4);
  if (max_sections < 0 || n > (uint32_t)max_sections) return -2;
  int64_t p = 16;
  for (uint32_t i = 0; i < n; i++) {
    // Per-field bounds checks: a corrupt/crafted header must fail cleanly,
    // not read past the mmap or scatter past the caller's 8-slot shape rows.
    if (p + 2 > nbytes) return -3;
    uint16_t nl;
    std::memcpy(&nl, buf + p, 2);
    p += 2;
    if (p + (int64_t)nl + 2 > nbytes) return -3;
    name_offs[i] = p;
    name_lens[i] = nl;
    p += nl;
    dtypes[i] = buf[p++];
    ndims[i] = buf[p++];
    if (ndims[i] > 8) return -5;  // callers allocate 8 shape slots/section
    if (p + 8 * (int64_t)ndims[i] + 12 > nbytes) return -3;
    for (int d = 0; d < ndims[i]; d++) {
      std::memcpy(&shapes[i * 8 + d], buf + p, 8);
      p += 8;
    }
    int64_t len;
    std::memcpy(&len, buf + p, 8);
    p += 8;
    std::memcpy(&crcs[i], buf + p, 4);
    p += 4;
    if (len < 0) return -6;
    p = (p + 7) & ~7LL;
    data_offs[i] = p;
    data_lens[i] = len;
    if (len > nbytes - p) return -4;  // avoids p+len overflow
    p += len;
    p = (p + 7) & ~7LL;
    if (p > nbytes) return -4;
  }
  return (int)n;
}

// ---------------------------------------------------------------------------
// Columnar payload filter kernels (interned int32 codes)
// ---------------------------------------------------------------------------

void vrs_filter_eq_i32(const int32_t* col, int64_t n, int32_t value, uint8_t* mask_io) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) mask_io[i] = mask_io[i] && (col[i] == value);
}

void vrs_filter_in_i32(const int32_t* col, int64_t n, const int32_t* values,
                       int32_t n_values, uint8_t* mask_io) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    if (!mask_io[i]) continue;
    uint8_t hit = 0;
    for (int32_t v = 0; v < n_values; v++)
      if (col[i] == values[v]) { hit = 1; break; }
    mask_io[i] = hit;
  }
}

int vrs_openmp_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
