/* npy IO + multi-threaded prefetching batch loader. See ipdm_native.h. */

#include "ipdm_native.h"

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

/* ---------------------------------------------------------------- npy IO */

static int parse_header(FILE *f, char *dtype_code, int *elem_size, int *ndim,
                        int64_t *shape, int *fortran_order,
                        int64_t *data_offset) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -2;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return -1;
    hlen = b[0] | (b[1] << 8);
    *data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return -1;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    *data_offset = 12 + hlen;
  }
  std::string hdr(hlen, '\0');
  if (fread(&hdr[0], 1, hlen, f) != hlen) return -1;

  /* descr */
  size_t dp = hdr.find("'descr'");
  if (dp == std::string::npos) return -3;
  size_t q1 = hdr.find('\'', dp + 7);
  size_t q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  char kind = 0;
  int esz = 0;
  for (char c : descr) {
    if (c == 'f' || c == 'i' || c == 'u' || c == 'b') kind = c;
    if (c >= '1' && c <= '9') esz = c - '0';
  }
  if (!kind || !esz) return -3;
  *dtype_code = kind;
  *elem_size = esz;

  /* fortran_order */
  *fortran_order = hdr.find("'fortran_order': True") != std::string::npos;

  /* shape tuple */
  size_t sp = hdr.find("'shape'");
  if (sp == std::string::npos) return -4;
  size_t p1 = hdr.find('(', sp);
  size_t p2 = hdr.find(')', p1);
  std::string tup = hdr.substr(p1 + 1, p2 - p1 - 1);
  int nd = 0;
  const char *s = tup.c_str();
  while (*s && nd < 8) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    shape[nd++] = strtoll(s, (char **)&s, 10);
  }
  *ndim = nd;
  return 0;
}

extern "C" int npy_probe(const char *path, char *dtype_code, int *elem_size,
                         int *ndim, int64_t *shape, int *fortran_order,
                         int64_t *data_offset) {
  FILE *f = fopen(path, "rb");
  if (!f) return -10;
  int rc = parse_header(f, dtype_code, elem_size, ndim, shape, fortran_order,
                        data_offset);
  fclose(f);
  return rc;
}

extern "C" int npy_read_f32(const char *path, float *out, int64_t n_elems) {
  char kind;
  int esz, nd, fort;
  int64_t shape[8], off;
  FILE *f = fopen(path, "rb");
  if (!f) return -10;
  int rc = parse_header(f, &kind, &esz, &nd, shape, &fort, &off);
  if (rc) {
    fclose(f);
    return rc;
  }
  int64_t total = 1;
  for (int i = 0; i < nd; i++) total *= shape[i];
  if (total != n_elems) {
    fclose(f);
    return -5;
  }
  fseek(f, off, SEEK_SET);
  int result = 0;
  if (kind == 'f' && esz == 4) {
    if (fread(out, 4, total, f) != (size_t)total) result = -6;
  } else {
    std::vector<unsigned char> buf(total * esz);
    if (fread(buf.data(), esz, total, f) != (size_t)total) {
      result = -6;
    } else if (kind == 'f' && esz == 8) {
      const double *p = (const double *)buf.data();
      for (int64_t i = 0; i < total; i++) out[i] = (float)p[i];
    } else if (kind == 'u' && esz == 1) {
      for (int64_t i = 0; i < total; i++) out[i] = buf[i];
    } else if (kind == 'u' && esz == 2) {
      const uint16_t *p = (const uint16_t *)buf.data();
      for (int64_t i = 0; i < total; i++) out[i] = p[i];
    } else if (kind == 'i' && esz == 2) {
      const int16_t *p = (const int16_t *)buf.data();
      for (int64_t i = 0; i < total; i++) out[i] = p[i];
    } else if (kind == 'i' && esz == 4) {
      const int32_t *p = (const int32_t *)buf.data();
      for (int64_t i = 0; i < total; i++) out[i] = (float)p[i];
    } else {
      result = -7;
    }
  }
  fclose(f);
  /* fortran-order 2-D sources transpose into C order */
  if (result == 0 && fort && nd == 2) {
    std::vector<float> t(total);
    int64_t H = shape[0], W = shape[1];
    for (int64_t j = 0; j < W; j++)
      for (int64_t i = 0; i < H; i++) t[i * W + j] = out[j * H + i];
    memcpy(out, t.data(), total * sizeof(float));
  }
  return result;
}

/* ----------------------------------------------------- prefetching loader */

struct Loader {
  std::vector<std::string> paths;
  int64_t H, W;
  std::vector<int64_t> indices;
  int batch;
  int queue_depth;
  std::atomic<int64_t> cursor{0};  /* next batch id to *claim* */
  int64_t n_batches;

  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  /* batch id → data, delivered in order */
  std::queue<std::pair<int64_t, std::vector<float>>> ready;
  int64_t next_deliver = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      int64_t b = cursor.fetch_add(1);
      if (b >= n_batches || stop.load()) return;
      int64_t base = b * batch;
      int64_t n = std::min<int64_t>(batch, (int64_t)indices.size() - base);
      std::vector<float> buf(batch * H * W, 0.0f);
      for (int64_t k = 0; k < n; k++) {
        int64_t idx = indices[base + k];
        npy_read_f32(paths[idx].c_str(), buf.data() + k * H * W, H * W);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] {
        return stop.load() || (int)ready.size() < queue_depth;
      });
      if (stop.load()) return;
      ready.emplace(b, std::move(buf));
      cv_get.notify_all();
    }
  }
};

extern "C" Loader *loader_create(const char **paths, int n_files, int64_t H,
                                 int64_t W, const int64_t *indices,
                                 int64_t n_indices, int batch, int n_threads,
                                 int queue_depth) {
  Loader *ld = new Loader();
  ld->paths.assign(paths, paths + n_files);
  ld->H = H;
  ld->W = W;
  ld->indices.assign(indices, indices + n_indices);
  ld->batch = batch;
  ld->queue_depth = queue_depth > 0 ? queue_depth : 4;
  ld->n_batches = (n_indices + batch - 1) / batch;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; i++)
    ld->workers.emplace_back([ld] { ld->worker(); });
  return ld;
}

extern "C" int loader_next(Loader *ld, float *out) {
  std::unique_lock<std::mutex> lk(ld->mu);
  if (ld->next_deliver >= ld->n_batches) return 0;
  int64_t want = ld->next_deliver;
  /* in-order delivery: wait until batch `want` is at the queue head */
  for (;;) {
    ld->cv_get.wait(lk, [&] { return !ld->ready.empty() || ld->stop.load(); });
    if (ld->stop.load()) return 0;
    if (ld->ready.front().first == want) break;
    /* rotate: out-of-order batch — requeue behind (rare, bounded) */
    auto item = std::move(ld->ready.front());
    ld->ready.pop();
    ld->ready.push(std::move(item));
  }
  auto &buf = ld->ready.front().second;
  memcpy(out, buf.data(), buf.size() * sizeof(float));
  ld->ready.pop();
  ld->next_deliver++;
  ld->cv_put.notify_all();
  int64_t base = want * ld->batch;
  return (int)std::min<int64_t>(ld->batch,
                                (int64_t)ld->indices.size() - base);
}

extern "C" void loader_destroy(Loader *ld) {
  ld->stop.store(true);
  ld->cv_put.notify_all();
  ld->cv_get.notify_all();
  for (auto &t : ld->workers) t.join();
  delete ld;
}
