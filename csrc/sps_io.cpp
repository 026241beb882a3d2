// sps_io: native data plane for the sps_tpu framework.
//
// The reference delegates its host-side data plane to native third-party
// code: ROS1 pub/sub + rosbag replay for streaming and libtorch DataLoader
// workers for training (SURVEY.md §2b). This library is the TPU-framework
// equivalent: a small C++ runtime for
//   * .npy (float32, C-order) point-cloud loading,
//   * a threaded replay pipeline that prefetches + pads scans into
//     fixed-capacity buffers while the device computes (rosbag/scans_pub
//     replacement on a 1-core host),
//   * an exact hash-grid radius join (scipy cKDTree replacement for
//     host-side dataset preparation and verification).
//
// Exposed as a C ABI consumed via ctypes (sps_tpu/native/__init__.py).
// Build: make -C csrc   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// Minimal .npy parser (float32/float64, C-order, 1-2D).
struct NpyArray {
  std::vector<float> data;
  int64_t rows = 0, cols = 0;
  bool ok = false;
};

NpyArray load_npy_f32(const char* path) {
  NpyArray out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6) != 0) {
    std::fclose(f);
    return out;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint16_t h;
    if (std::fread(&h, 2, 1, f) != 1) { std::fclose(f); return out; }
    hlen = h;
  } else {
    if (std::fread(&hlen, 4, 1, f) != 1) { std::fclose(f); return out; }
  }
  std::string header(hlen, '\0');
  if (std::fread(header.data(), 1, hlen, f) != hlen) { std::fclose(f); return out; }

  bool f8 = header.find("'<f8'") != std::string::npos;
  bool f4 = header.find("'<f4'") != std::string::npos;
  if ((!f4 && !f8) || header.find("'fortran_order': True") != std::string::npos) {
    std::fclose(f);
    return out;
  }
  auto sp = header.find("'shape':");
  auto lp = header.find('(', sp);
  auto rp = header.find(')', lp);
  if (sp == std::string::npos || lp == std::string::npos || rp == std::string::npos) {
    std::fclose(f);
    return out;
  }
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  int64_t dims[2] = {0, 1};
  int nd = 0;
  const char* p = shape.c_str();
  while (*p && nd < 2) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    dims[nd++] = std::strtoll(p, const_cast<char**>(&p), 10);
  }
  if (nd == 0) { std::fclose(f); return out; }
  out.rows = dims[0];
  out.cols = nd == 2 ? dims[1] : 1;
  int64_t count = out.rows * out.cols;
  out.data.resize(count);
  if (f4) {
    if (std::fread(out.data.data(), 4, count, f) != size_t(count)) {
      std::fclose(f);
      return out;
    }
  } else {
    std::vector<double> tmp(count);
    if (std::fread(tmp.data(), 8, count, f) != size_t(count)) {
      std::fclose(f);
      return out;
    }
    for (int64_t i = 0; i < count; i++) out.data[i] = float(tmp[i]);
  }
  std::fclose(f);
  out.ok = true;
  return out;
}

// ----------------------------------------------------------------------
// Replayer: worker thread prefetching scans into a bounded queue.
struct Replayer {
  std::vector<std::string> paths;
  int64_t cap_rows, cols;
  size_t depth;
  std::deque<NpyArray> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::thread worker;
  std::atomic<bool> stop{false};
  size_t next_load = 0;

  void run() {
    for (size_t i = 0; i < paths.size() && !stop; i++) {
      NpyArray a = load_npy_f32(paths[i].c_str());
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return queue.size() < depth || stop; });
      if (stop) return;
      queue.push_back(std::move(a));
      cv_pop.notify_one();
    }
  }
};

// Hash grid for the radius join.
inline uint64_t cell_key(int64_t x, int64_t y, int64_t z) {
  return (uint64_t(x) * 0x9E3779B185EBCA87ULL) ^
         (uint64_t(y) * 0xC2B2AE3D27D4EB4FULL) ^
         (uint64_t(z) * 0x165667B19E3779F9ULL);
}

}  // namespace

extern "C" {

// Returns a malloc'd float buffer (caller frees via sps_free); rows/cols out.
float* sps_npy_load_f32(const char* path, int64_t* rows, int64_t* cols) {
  NpyArray a = load_npy_f32(path);
  if (!a.ok) return nullptr;
  float* buf = static_cast<float*>(std::malloc(a.data.size() * sizeof(float)));
  std::memcpy(buf, a.data.data(), a.data.size() * sizeof(float));
  *rows = a.rows;
  *cols = a.cols;
  return buf;
}

void sps_free(void* p) { std::free(p); }

void* sps_replayer_create(const char** paths, int n, int64_t cap_rows,
                          int64_t cols, int depth) {
  auto* r = new Replayer();
  for (int i = 0; i < n; i++) r->paths.emplace_back(paths[i]);
  r->cap_rows = cap_rows;
  r->cols = cols;
  r->depth = depth > 0 ? depth : 4;
  r->worker = std::thread([r] { r->run(); });
  return r;
}

// Copies the next scan into out[cap_rows*cols] (zero padded) and returns
// the real row count; -1 when the sequence is exhausted, -2 on load error.
int64_t sps_replayer_next(void* rp, float* out) {
  auto* r = static_cast<Replayer*>(rp);
  NpyArray a;
  {
    std::unique_lock<std::mutex> lk(r->mu);
    if (r->next_load >= r->paths.size() && r->queue.empty()) return -1;
    r->cv_pop.wait(lk, [&] { return !r->queue.empty(); });
    a = std::move(r->queue.front());
    r->queue.pop_front();
    r->next_load++;
    r->cv_push.notify_one();
  }
  if (!a.ok) return -2;
  std::memset(out, 0, r->cap_rows * r->cols * sizeof(float));
  int64_t rows = a.rows < r->cap_rows ? a.rows : r->cap_rows;
  int64_t c = a.cols < r->cols ? a.cols : r->cols;
  for (int64_t i = 0; i < rows; i++)
    std::memcpy(out + i * r->cols, a.data.data() + i * a.cols, c * sizeof(float));
  return rows;
}

void sps_replayer_destroy(void* rp) {
  auto* r = static_cast<Replayer*>(rp);
  r->stop = true;
  r->cv_push.notify_all();
  if (r->worker.joinable()) r->worker.join();
  delete r;
}

// Exact radius join: mask[j] = 1 iff any scan point within r of query j.
// Open-addressing hash grid over scan cells (cell edge = r), 27-cell probe
// with exact distance tests — same result set as cKDTree.query_ball_tree
// (/root/reference/src/sps/datasets/blt_dataset.py:258-271), deduplicated.
void sps_radius_join(const float* scan, int64_t n, const float* query,
                     int64_t m, float radius, uint8_t* mask) {
  if (n == 0) {
    std::memset(mask, 0, m);
    return;
  }
  // Table: slot -> head index; chain via next[].
  size_t cap = 1;
  while (cap < size_t(n) * 2) cap <<= 1;
  std::vector<int64_t> head(cap, -1), nxt(n, -1);
  std::vector<int64_t> cells(n * 3);
  const float inv = 1.0f / radius;
  for (int64_t i = 0; i < n; i++) {
    int64_t cx = int64_t(std::floor(scan[i * 3 + 0] * inv));
    int64_t cy = int64_t(std::floor(scan[i * 3 + 1] * inv));
    int64_t cz = int64_t(std::floor(scan[i * 3 + 2] * inv));
    cells[i * 3] = cx;
    cells[i * 3 + 1] = cy;
    cells[i * 3 + 2] = cz;
    size_t s = cell_key(cx, cy, cz) & (cap - 1);
    nxt[i] = head[s];
    head[s] = i;
  }
  const float r2 = radius * radius;
  for (int64_t j = 0; j < m; j++) {
    const float qx = query[j * 3], qy = query[j * 3 + 1], qz = query[j * 3 + 2];
    int64_t cx = int64_t(std::floor(qx * inv));
    int64_t cy = int64_t(std::floor(qy * inv));
    int64_t cz = int64_t(std::floor(qz * inv));
    uint8_t hit = 0;
    for (int dx = -1; dx <= 1 && !hit; dx++)
      for (int dy = -1; dy <= 1 && !hit; dy++)
        for (int dz = -1; dz <= 1 && !hit; dz++) {
          size_t s = cell_key(cx + dx, cy + dy, cz + dz) & (cap - 1);
          for (int64_t i = head[s]; i >= 0; i = nxt[i]) {
            if (cells[i * 3] != cx + dx || cells[i * 3 + 1] != cy + dy ||
                cells[i * 3 + 2] != cz + dz)
              continue;  // different cell sharing the slot chain
            float ddx = scan[i * 3] - qx, ddy = scan[i * 3 + 1] - qy,
                  ddz = scan[i * 3 + 2] - qz;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
              hit = 1;
              break;
            }
          }
        }
    mask[j] = hit;
  }
}

}  // extern "C"
