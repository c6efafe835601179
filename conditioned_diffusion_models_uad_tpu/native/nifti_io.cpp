// Native NIfTI-1 reader/writer.
//
// The reference's data path reads NIfTI through SimpleITK — a C++ library
// driven from Python (reference: src/datamodules/create_dataset.py:252-258
// sitk_reader). This is the TPU framework's native equivalent: a small,
// dependency-free C++ reader (zlib for .nii.gz) exposed through a C ABI and
// bound with ctypes. Calls release the GIL inside ctypes, so a Python thread
// pool gets true parallel file decoding (the prefetch loader in
// data/native.py).
//
// Supported: NIfTI-1 (348-byte header, magic n+1/ni1), gzip or raw, little-
// endian files (the dataset norm), datatypes uint8/int16/int32/float32/
// float64/uint16, scl_slope/scl_inter application, up to 4 dims (the 4th is
// accepted but callers typically take volume 0).
//
// Build: g++ -O3 -shared -fPIC nifti_io.cpp -o libniftiio.so -lz
// (plus -DUSE_LIBDEFLATE -ldeflate when libdeflate headers are present;
// done lazily by native/binding.py at import; see there for the fallback).
//
// Decode strategy (single-core hosts are the loader bottleneck — see
// PARITY.md "loader feed"): .nii.gz files are inflated with libdeflate's
// whole-buffer gzip decoder when available (~2-3x zlib's streaming inflate)
// directly into the caller's buffer — `nifti_read_stream` decodes the whole
// decompressed stream (header + voxels) into one numpy allocation with ZERO
// intermediate copies, so Python can view the voxel payload in the file's
// native dtype and ship it to the accelerator as-is (dtype conversion,
// scl scaling and the x-fastest->xyz transpose all run on device).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <zlib.h>
#ifdef USE_LIBDEFLATE
#include <libdeflate.h>
#endif

struct NiftiInfo {
  int32_t ndim;
  int32_t shape[7];
  float spacing[7];
  int32_t datatype;
  float scl_slope;
  float scl_inter;
  int64_t nelem;
  int64_t vox_offset;
};

// ---------------------------------------------------------------------------
// gz-or-raw buffered reader
// ---------------------------------------------------------------------------
struct Reader {
  gzFile gz = nullptr;
  FILE* f = nullptr;
  bool ok() const { return gz || f; }
  int64_t read(void* dst, int64_t n) {
    if (gz) return gzread(gz, dst, (unsigned)n);
    return (int64_t)fread(dst, 1, (size_t)n, f);
  }
  void close() {
    if (gz) gzclose(gz);
    if (f) fclose(f);
    gz = nullptr;
    f = nullptr;
  }
};

static bool open_reader(const char* path, Reader* r) {
  size_t len = strlen(path);
  bool is_gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
  if (is_gz) {
    r->gz = gzopen(path, "rb");
    // set a big internal buffer for throughput
    if (r->gz) gzbuffer(r->gz, 1 << 20);
  } else {
    r->f = fopen(path, "rb");
  }
  return r->ok();
}

#pragma pack(push, 1)
struct Nifti1Header {          // 348 bytes
  int32_t sizeof_hdr;
  char data_type[10];
  char db_name[18];
  int32_t extents;
  int16_t session_error;
  char regular;
  char dim_info;
  int16_t dim[8];
  float intent_p1, intent_p2, intent_p3;
  int16_t intent_code;
  int16_t datatype;
  int16_t bitpix;
  int16_t slice_start;
  float pixdim[8];
  float vox_offset;
  float scl_slope;
  float scl_inter;
  int16_t slice_end;
  char slice_code;
  char xyzt_units;
  float cal_max, cal_min;
  float slice_duration, toffset;
  int32_t glmax, glmin;
  char descrip[80];
  char aux_file[24];
  int16_t qform_code, sform_code;
  float quatern_b, quatern_c, quatern_d;
  float qoffset_x, qoffset_y, qoffset_z;
  float srow_x[4], srow_y[4], srow_z[4];
  char intent_name[16];
  char magic[4];
};
#pragma pack(pop)

enum { DT_UINT8 = 2, DT_INT16 = 4, DT_INT32 = 8, DT_FLOAT32 = 16,
       DT_FLOAT64 = 64, DT_INT8 = 256, DT_UINT16 = 512, DT_UINT32 = 768 };

static int dtype_size(int dt) {
  switch (dt) {
    case DT_UINT8: case DT_INT8: return 1;
    case DT_INT16: case DT_UINT16: return 2;
    case DT_INT32: case DT_UINT32: case DT_FLOAT32: return 4;
    case DT_FLOAT64: return 8;
    default: return 0;
  }
}

// Returns 0 on success, negative error codes otherwise.
extern "C" int nifti_get_info(const char* path, NiftiInfo* info) {
  Reader r;
  if (!open_reader(path, &r)) return -1;
  Nifti1Header h;
  if (r.read(&h, sizeof(h)) != (int64_t)sizeof(h)) { r.close(); return -2; }
  r.close();
  if (h.sizeof_hdr != 348) return -3;  // big-endian / NIfTI-2 unsupported
  if (!(h.magic[0] == 'n' && (h.magic[1] == '+' || h.magic[1] == 'i'))) return -4;
  if (!dtype_size(h.datatype)) return -5;
  int nd = h.dim[0];
  if (nd < 1 || nd > 7) return -6;
  info->ndim = nd;
  info->nelem = 1;
  for (int i = 0; i < 7; i++) {
    int32_t s = (i < nd) ? h.dim[i + 1] : 1;
    if (s < 1) s = 1;
    info->shape[i] = s;
    info->spacing[i] = (i < nd) ? h.pixdim[i + 1] : 1.0f;
    info->nelem *= s;
  }
  info->datatype = h.datatype;
  info->scl_slope = h.scl_slope;
  info->scl_inter = h.scl_inter;
  int64_t off = (int64_t)h.vox_offset;
  info->vox_offset = off < 348 ? 352 : off;
  return 0;
}

// ---------------------------------------------------------------------------
// Whole-stream decode: header + voxel payload into one caller buffer.
// Returns bytes written (== out_nbytes) or a negative error code. The caller
// sizes out_nbytes = vox_offset + nelem * itemsize from nifti_get_info.
// ---------------------------------------------------------------------------
extern "C" int64_t nifti_read_stream(const char* path, unsigned char* out,
                                     int64_t out_nbytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // peek the gzip magic
  unsigned char magic[2] = {0, 0};
  size_t got2 = fread(magic, 1, 2, f);
  bool is_gz = got2 == 2 && magic[0] == 0x1f && magic[1] == 0x8b;
  if (!is_gz) {
    // raw .nii: read the stream head directly into out
    if (fseek(f, 0, SEEK_SET) != 0) { fclose(f); return -2; }
    int64_t got = (int64_t)fread(out, 1, (size_t)out_nbytes, f);
    fclose(f);
    return got == out_nbytes ? got : -10;
  }
#ifdef USE_LIBDEFLATE
  {
    // whole-buffer gzip decode: slurp the compressed file, inflate straight
    // into out. Falls through to the zlib streaming path on any mismatch
    // (multi-member streams, trailing data, allocation failure).
    if (fseek(f, 0, SEEK_END) == 0) {
      int64_t csize = ftell(f);
      if (csize > 0 && fseek(f, 0, SEEK_SET) == 0) {
        unsigned char* cbuf = (unsigned char*)malloc((size_t)csize);
        if (cbuf) {
          int64_t got = (int64_t)fread(cbuf, 1, (size_t)csize, f);
          if (got == csize) {
            struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
            if (d) {
              size_t actual = 0;
              enum libdeflate_result rc = libdeflate_gzip_decompress(
                  d, cbuf, (size_t)csize, out, (size_t)out_nbytes, &actual);
              libdeflate_free_decompressor(d);
              if (rc == LIBDEFLATE_SUCCESS && (int64_t)actual == out_nbytes) {
                free(cbuf);
                fclose(f);
                return out_nbytes;
              }
            }
          }
          free(cbuf);
        }
      }
    }
    if (fseek(f, 0, SEEK_SET) != 0) { fclose(f); return -2; }
  }
#endif
  fclose(f);
  // zlib streaming fallback (also handles multi-member/oversized streams)
  gzFile gz = gzopen(path, "rb");
  if (!gz) return -1;
  gzbuffer(gz, 1 << 20);
  int64_t got = 0;
  while (got < out_nbytes) {
    int k = gzread(gz, out + got, (unsigned)(out_nbytes - got));
    if (k <= 0) break;
    got += k;
  }
  gzclose(gz);
  return got == out_nbytes ? got : -10;
}

template <typename T>
static void convert(const unsigned char* src, float* dst, int64_t n,
                    float slope, float inter) {
  const T* s = (const T*)src;
  if (slope == 0.0f) slope = 1.0f;
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else {
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i] * slope + inter;
  }
}

// Read voxel data as float32 into out (caller allocates nelem floats).
// Decodes the whole stream once into a reusable thread-local scratch (warm
// pages — no fresh mmap/page-fault churn per call), then converts.
extern "C" int nifti_read_f32(const char* path, float* out, int64_t nelem) {
  NiftiInfo info;
  int rc = nifti_get_info(path, &info);
  if (rc) return rc;
  if (info.nelem != nelem) return -7;

  int esz = dtype_size(info.datatype);
  int64_t total = info.vox_offset + nelem * esz;
  static thread_local unsigned char* scratch = nullptr;
  static thread_local int64_t scratch_cap = 0;
  if (scratch_cap < total) {
    unsigned char* p = (unsigned char*)realloc(scratch, (size_t)total);
    if (!p) return -9;
    scratch = p;
    scratch_cap = total;
  }
  int64_t got = nifti_read_stream(path, scratch, total);
  if (got != total) return got < 0 ? (int)got : -10;

  const unsigned char* raw = scratch + info.vox_offset;
  float sl = info.scl_slope, in = info.scl_inter;
  switch (info.datatype) {
    case DT_UINT8:   convert<uint8_t>(raw, out, nelem, sl, in); break;
    case DT_INT8:    convert<int8_t>(raw, out, nelem, sl, in); break;
    case DT_INT16:   convert<int16_t>(raw, out, nelem, sl, in); break;
    case DT_UINT16:  convert<uint16_t>(raw, out, nelem, sl, in); break;
    case DT_INT32:   convert<int32_t>(raw, out, nelem, sl, in); break;
    case DT_UINT32:  convert<uint32_t>(raw, out, nelem, sl, in); break;
    case DT_FLOAT32: convert<float>(raw, out, nelem, sl, in); break;
    case DT_FLOAT64: convert<double>(raw, out, nelem, sl, in); break;
    default: return -5;
  }
  return 0;
}

// Write a float32 volume as (optionally gzipped) NIfTI-1.
extern "C" int nifti_write_f32(const char* path, const float* data,
                               const int32_t* shape, int32_t ndim,
                               const float* spacing) {
  Nifti1Header h;
  memset(&h, 0, sizeof(h));
  h.sizeof_hdr = 348;
  h.dim[0] = (int16_t)ndim;
  int64_t nelem = 1;
  for (int i = 0; i < 7; i++) {
    int32_t s = i < ndim ? shape[i] : 1;
    h.dim[i + 1] = (int16_t)s;
    if (i < ndim) nelem *= s;
    h.pixdim[i + 1] = (i < ndim && spacing) ? spacing[i] : 1.0f;
  }
  h.datatype = DT_FLOAT32;
  h.bitpix = 32;
  h.vox_offset = 352.0f;
  h.scl_slope = 1.0f;
  h.magic[0] = 'n'; h.magic[1] = '+'; h.magic[2] = '1'; h.magic[3] = 0;
  h.qform_code = 0;
  h.sform_code = 1;
  h.srow_x[0] = spacing ? spacing[0] : 1.0f;
  h.srow_y[1] = spacing ? (ndim > 1 ? spacing[1] : 1.0f) : 1.0f;
  h.srow_z[2] = spacing ? (ndim > 2 ? spacing[2] : 1.0f) : 1.0f;

  char pad[4] = {0, 0, 0, 0};
  size_t len = strlen(path);
  bool is_gz = len > 3 && strcmp(path + len - 3, ".gz") == 0;
  if (is_gz) {
    gzFile g = gzopen(path, "wb");
    if (!g) return -1;
    gzbuffer(g, 1 << 20);
    if (gzwrite(g, &h, sizeof(h)) != (int)sizeof(h)) { gzclose(g); return -2; }
    gzwrite(g, pad, 4);
    int64_t nbytes = nelem * 4;
    if (gzwrite(g, data, (unsigned)nbytes) != (int)nbytes) { gzclose(g); return -2; }
    gzclose(g);
  } else {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    fwrite(&h, sizeof(h), 1, f);
    fwrite(pad, 4, 1, f);
    fwrite(data, 4, (size_t)nelem, f);
    fclose(f);
  }
  return 0;
}
