// nerfpp_native: host-side native runtime helpers.
//
// The reference implements its data layer in C++ against the COLMAP library
// and OpenCV (ColmapReconstruction.cpp, NeRFDataset.cpp, PyramidEmbedder.cpp).
// This library provides the TPU framework's native equivalents where host-side
// throughput genuinely matters:
//
//  - colmap_read_*: zero-dependency parsers for the COLMAP sparse binary model
//    (cameras.bin / images.bin / points3D.bin) returning flat arrays — large
//    reconstructions parse orders of magnitude faster than Python struct loops.
//  - pyramid_lookup: the multi-scale patch-embedding trilinear pixel lookup
//    (PyramidEmbedder.cpp:230-310), OpenMP-parallel over pixels — used when
//    dense per-image [H, W, E] supervision maps don't fit in memory.
//  - compute_near_far: per-image visible-point distance percentiles
//    (ColmapReconstruction.cpp:224-254) over the full reconstruction.
//
// Exposed with a plain C ABI consumed via ctypes (native/__init__.py).
// Build: cmake or `g++ -O3 -march=native -fopenmp -shared -fPIC`.

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

// ---------------------------------------------------------------------------
// COLMAP binary model parsing
// ---------------------------------------------------------------------------

// Model id -> number of parameters (COLMAP convention).
static int camera_model_num_params(int model_id) {
  switch (model_id) {
    case 0: return 3;   // SIMPLE_PINHOLE
    case 1: return 4;   // PINHOLE
    case 2: return 4;   // SIMPLE_RADIAL
    case 3: return 5;   // RADIAL
    case 4: return 8;   // OPENCV
    case 5: return 8;   // OPENCV_FISHEYE
    case 6: return 12;  // FULL_OPENCV
    case 7: return 5;   // FOV
    case 8: return 4;   // SIMPLE_RADIAL_FISHEYE
    case 9: return 5;   // RADIAL_FISHEYE
    case 10: return 12; // THIN_PRISM_FISHEYE
    default: return -1;
  }
}

namespace {
struct Reader {
  FILE* f;
  bool ok;
  explicit Reader(const char* path) : f(fopen(path, "rb")), ok(f != nullptr) {}
  ~Reader() { if (f) fclose(f); }
  template <typename T>
  T read() {
    T v{};
    if (fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;
  }
  void read_bytes(void* dst, size_t n) {
    if (fread(dst, 1, n, f) != n) ok = false;
  }
  std::string read_cstring() {
    std::string s;
    int c;
    while ((c = fgetc(f)) != EOF && c != '\0') s.push_back(char(c));
    if (c == EOF) ok = false;
    return s;
  }
};

}  // namespace

extern "C" {

// cameras.bin -> n cameras. Caller passes capacity; arrays:
//   ids[n], model_ids[n], widths[n], heights[n], params[n*12] (zero padded),
//   n_params[n]. Returns camera count or -1 on error.
int colmap_read_cameras_bin(const char* path, int capacity, int32_t* ids,
                            int32_t* model_ids, int64_t* widths,
                            int64_t* heights, double* params,
                            int32_t* n_params) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok || (int)n > capacity) return -1;
  for (uint64_t i = 0; i < n; i++) {
    ids[i] = r.read<int32_t>();
    model_ids[i] = r.read<int32_t>();
    widths[i] = (int64_t)r.read<uint64_t>();
    heights[i] = (int64_t)r.read<uint64_t>();
    int np = camera_model_num_params(model_ids[i]);
    if (np < 0 || np > 12) return -1;
    n_params[i] = np;
    memset(params + i * 12, 0, 12 * sizeof(double));
    r.read_bytes(params + i * 12, np * sizeof(double));
    if (!r.ok) return -1;
  }
  return (int)n;
}

// images.bin first pass: returns (n_images, total_points2d) via out params.
int colmap_scan_images_bin(const char* path, int64_t* n_images,
                           int64_t* total_points2d) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  uint64_t total = 0;
  for (uint64_t i = 0; i < n && r.ok; i++) {
    r.read<int32_t>();                    // image_id
    fseek(r.f, 7 * sizeof(double), SEEK_CUR);  // qvec + tvec
    r.read<int32_t>();                    // camera_id
    r.read_cstring();                     // name
    uint64_t npts = r.read<uint64_t>();
    total += npts;
    fseek(r.f, (long)(npts * (2 * sizeof(double) + sizeof(int64_t))), SEEK_CUR);
  }
  if (!r.ok) return -1;
  *n_images = (int64_t)n;
  *total_points2d = (int64_t)total;
  return 0;
}

// images.bin second pass. Arrays sized from the scan:
//   image_ids[n], qvecs[n*4], tvecs[n*3], camera_ids[n],
//   names (concatenated, '\0'-separated, capacity names_cap),
//   pt_offsets[n+1], xys[total*2], point3d_ids[total].
int colmap_read_images_bin(const char* path, int64_t n, int64_t total,
                           int32_t* image_ids, double* qvecs, double* tvecs,
                           int32_t* camera_ids, char* names, int64_t names_cap,
                           int64_t* pt_offsets, double* xys,
                           int64_t* point3d_ids) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n_file = r.read<uint64_t>();
  if ((int64_t)n_file != n) return -1;
  int64_t name_pos = 0, pt_pos = 0;
  for (int64_t i = 0; i < n && r.ok; i++) {
    image_ids[i] = r.read<int32_t>();
    r.read_bytes(qvecs + i * 4, 4 * sizeof(double));
    r.read_bytes(tvecs + i * 3, 3 * sizeof(double));
    camera_ids[i] = r.read<int32_t>();
    std::string name = r.read_cstring();
    if (name_pos + (int64_t)name.size() + 1 > names_cap) return -1;
    memcpy(names + name_pos, name.c_str(), name.size() + 1);
    name_pos += (int64_t)name.size() + 1;
    uint64_t npts = r.read<uint64_t>();
    pt_offsets[i] = pt_pos;
    if (pt_pos + (int64_t)npts > total) return -1;
    for (uint64_t k = 0; k < npts; k++) {
      xys[(pt_pos + (int64_t)k) * 2 + 0] = r.read<double>();
      xys[(pt_pos + (int64_t)k) * 2 + 1] = r.read<double>();
      point3d_ids[pt_pos + (int64_t)k] = r.read<int64_t>();
    }
    pt_pos += (int64_t)npts;
  }
  pt_offsets[n] = pt_pos;
  return r.ok ? 0 : -1;
}

// points3D.bin scan: number of points.
int64_t colmap_scan_points3d_bin(const char* path) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  return r.ok ? (int64_t)n : -1;
}

// points3D.bin read: ids[n], xyz[n*3], rgb[n*3], errors[n].
int colmap_read_points3d_bin(const char* path, int64_t n, int64_t* ids,
                             double* xyz, uint8_t* rgb, double* errors) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n_file = r.read<uint64_t>();
  if ((int64_t)n_file != n) return -1;
  for (int64_t i = 0; i < n && r.ok; i++) {
    ids[i] = r.read<int64_t>();
    r.read_bytes(xyz + i * 3, 3 * sizeof(double));
    r.read_bytes(rgb + i * 3, 3);
    errors[i] = r.read<double>();
    uint64_t track_len = r.read<uint64_t>();
    fseek(r.f, (long)(track_len * 2 * sizeof(int32_t)), SEEK_CUR);
  }
  return r.ok ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Per-image near/far percentiles over visible 3D points
// (ColmapReconstruction.cpp:224-254; measured from the true camera center)
// ---------------------------------------------------------------------------

// For one image: qvec[4] (w,x,y,z), tvec[3] w2c; pts3d[m*3] are the xyz of the
// image's visible points. Writes near/far.
int compute_near_far(const double* qvec, const double* tvec,
                     const double* pts3d, int64_t m, float near_percentile,
                     float far_percentile, float* near_out, float* far_out) {
  if (m <= 0) {
    *near_out = 0.f;
    *far_out = 0.f;
    return 0;
  }
  // rotation from quaternion; camera center = -R^T t
  double w = qvec[0], x = qvec[1], y = qvec[2], z = qvec[3];
  double n = std::sqrt(w * w + x * x + y * y + z * z);
  w /= n; x /= n; y /= n; z /= n;
  double R[9] = {
      1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w,
      2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w,
      2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y};
  double c[3];
  for (int i = 0; i < 3; i++)
    c[i] = -(R[0 * 3 + i] * tvec[0] + R[1 * 3 + i] * tvec[1] +
             R[2 * 3 + i] * tvec[2]);

  std::vector<float> d((size_t)m);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < m; i++) {
    double dx = pts3d[i * 3 + 0] - c[0];
    double dy = pts3d[i * 3 + 1] - c[1];
    double dz = pts3d[i * 3 + 2] - c[2];
    d[(size_t)i] = (float)std::sqrt(dx * dx + dy * dy + dz * dz);
  }
  std::sort(d.begin(), d.end());
  size_t near_idx = std::min((size_t)(near_percentile * m), (size_t)(m - 1));
  size_t far_idx = std::min((size_t)(far_percentile * m), (size_t)(m - 1));
  *near_out = d[near_idx];
  *far_out = d[far_idx];
  return 0;
}

// ---------------------------------------------------------------------------
// Pyramid embedding pixel lookup (PyramidEmbedder.cpp:230-310)
// ---------------------------------------------------------------------------

// Dense per-zoom grids for ONE image: grids = concatenated [nh_z, nw_z, E]
// arrays; zoom z in [min_zoom, max_zoom]; grid_offsets[z - min_zoom] indexes
// the first float of zoom z's grid; nh[z], nw[z] give its shape.
// Queries: xs[n], ys[n] pixel coords, one shared scale. Output out[n*E],
// L2-normalized. Bilinear over patch centers per zoom, linear across the two
// zooms bracketing log2(scale). OpenMP over queries.
int pyramid_lookup(const float* grids, const int64_t* grid_offsets,
                   const int32_t* nh, const int32_t* nw, int min_zoom,
                   int max_zoom, int embed_dim, float img_size, float overlap,
                   const float* xs, const float* ys, int64_t n_queries,
                   float scale, float* out) {
  int n_zooms = max_zoom - min_zoom + 1;
  if (n_zooms <= 0) return -1;

  float logs = std::log2(std::max(scale, std::pow(2.f, (float)min_zoom)));
  int z1 = (int)std::floor(logs);
  z1 = std::max(min_zoom, std::min(z1, max_zoom));
  int z2 = std::min(z1 + 1, max_zoom);
  float t = std::max(0.f, std::min(logs - (float)z1, 1.f));

  auto level_lookup = [&](int zoom, float xq, float yq, float* dst) {
    int zi = zoom - min_zoom;
    const float* g = grids + grid_offsets[zi];
    int h = nh[zi], w = nw[zi];
    float win = img_size * std::pow(2.f, (float)zoom);
    float stride = win * (1.f - overlap);
    float fx = (xq - win / 2.f) / stride;
    float fy = (yq - win / 2.f) / stride;
    int x0 = std::max(0, std::min((int)std::floor(fx), w - 1));
    int x1 = std::min(x0 + 1, w - 1);
    int y0 = std::max(0, std::min((int)std::floor(fy), h - 1));
    int y1 = std::min(y0 + 1, h - 1);
    float tx = std::max(0.f, std::min(fx - (float)x0, 1.f));
    float ty = std::max(0.f, std::min(fy - (float)y0, 1.f));
    const float* e00 = g + ((int64_t)y0 * w + x0) * embed_dim;
    const float* e01 = g + ((int64_t)y0 * w + x1) * embed_dim;
    const float* e10 = g + ((int64_t)y1 * w + x0) * embed_dim;
    const float* e11 = g + ((int64_t)y1 * w + x1) * embed_dim;
    for (int k = 0; k < embed_dim; k++) {
      float top = e00[k] * (1 - tx) + e01[k] * tx;
      float bot = e10[k] * (1 - tx) + e11[k] * tx;
      dst[k] = top * (1 - ty) + bot * ty;
    }
  };

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t q = 0; q < n_queries; q++) {
    float* dst = out + q * embed_dim;
    std::vector<float> tmp((size_t)embed_dim);
    level_lookup(z1, xs[q], ys[q], dst);
    if (z2 != z1 && t > 0.f) {
      level_lookup(z2, xs[q], ys[q], tmp.data());
      for (int k = 0; k < embed_dim; k++)
        dst[k] = dst[k] * (1 - t) + tmp[k] * t;
    }
    float norm = 0.f;
    for (int k = 0; k < embed_dim; k++) norm += dst[k] * dst[k];
    norm = std::sqrt(norm);
    if (norm > 1e-8f)
      for (int k = 0; k < embed_dim; k++) dst[k] /= norm;
  }
  return 0;
}

int nerfpp_native_version() { return 1; }

}  // extern "C"
