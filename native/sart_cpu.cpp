/* CPU fan-beam footprint projector pair + OS-SART + NSL0-TV.
 *
 * Independent C++ derivation of the same physics as
 * ipdm_tpu/recon/{geometry,projector,sart}.py — the golden cross-check for
 * the JAX path, and the native analog of the reference CPU driver
 * (TASART2DNSL0_cpu.cpp). Math summary:
 *   - per view: detector-edge ray lines with unit-normalised (A,B,C) and a
 *     folded direction angle in [0°,45°];
 *   - per pixel: 5-bin trapezoid footprint = adjacent differences of
 *     pixel/half-plane overlap areas, sampled bilinearly from an analytic
 *     area LUT with the "negative distance → voxBase − value" sign fold;
 *   - FP scatter with 1/(div·dr) scaling; BP gather with area/div weights;
 *   - OS-SART: correction (m − p)/n per subset, update λ·Σbp/Σnorm, λ
 *     decays ×0.95 per sweep from 0.24; TV: smoothed-L0 gradient with
 *     sech² weights, step α·‖Δx_SART‖/‖g‖, σ annealed ×0.9 (floor 0.1).
 */

#include "ipdm_native.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct Lines {
  std::vector<float> fold;  /* [nr+1] folded angle, degrees */
  std::vector<double> A, B, C;
};

double ta_dx(const FanGeom *g) {
  return g->dx * std::sqrt(2.0) * 0.5 / (g->ta_dimx - 1);
}
double ta_dy(const FanGeom *g) { return 45.0 / (g->ta_dimy - 1); }
double vox_base(const FanGeom *g) { return std::fabs(g->dx * g->dy); }

Lines make_lines(const FanGeom *g, double beta) {
  int nlines = g->nr + 1;
  Lines L;
  L.fold.resize(nlines);
  L.A.resize(nlines);
  L.B.resize(nlines);
  L.C.resize(nlines);
  double sx = -g->dso * std::sin(beta), sy = g->dso * std::cos(beta);
  double rr = g->nr * g->dr * 0.5;
  double s0 = -rr + g->offset_r * g->dr;
  for (int i = 0; i < nlines; i++) {
    double gamma = s0 + i * g->dr;
    double px = sx + g->dsd * std::sin(beta + gamma);
    double py = sy - g->dsd * std::cos(beta + gamma);
    double vx = px - sx, vy = py - sy;
    double ang = std::atan2(vy, vx) * 180.0 / kPi;
    if (ang < 0) ang += 360.0;
    double a = std::fmod(ang, 90.0);
    L.fold[i] = (float)std::min(a, 90.0 - a);
    double A = py - sy, B = sx - px, C = px * sy - sx * py;
    double Z = std::sqrt(A * A + B * B);
    L.A[i] = A / Z;
    L.B[i] = B / Z;
    L.C[i] = C / Z;
  }
  return L;
}

double fetch_lut(const FanGeom *g, const float *lut, double fold_deg,
                 double pos) {
  double u = std::fabs(pos) / ta_dx(g);
  double v = fold_deg / ta_dy(g);
  u = std::min(std::max(u, 0.0), (double)g->ta_dimx - 1);
  v = std::min(std::max(v, 0.0), (double)g->ta_dimy - 1);
  int u0 = (int)u, v0 = (int)v;
  int u1 = std::min(u0 + 1, g->ta_dimx - 1);
  int v1 = std::min(v0 + 1, g->ta_dimy - 1);
  double fu = u - u0, fv = v - v0;
  double val = (1 - fu) * (1 - fv) * lut[v0 * g->ta_dimx + u0] +
               fu * (1 - fv) * lut[v0 * g->ta_dimx + u1] +
               (1 - fu) * fv * lut[v1 * g->ta_dimx + u0] +
               fu * fv * lut[v1 * g->ta_dimx + u1];
  return pos < 0.0 ? vox_base(g) - val : val;
}

struct Foot {
  double div;
  int s_bin;
  double areas[5];
};

Foot footprint(const FanGeom *g, const float *lut, const Lines &L, double beta,
               double x, double y) {
  double cs = std::cos(beta), sn = std::sin(beta);
  double sx = -g->dso * sn, sy = g->dso * cs;
  Foot f;
  double dxs = x - sx, dys = y - sy;
  f.div = std::sqrt(dxs * dxs + dys * dys);
  double s_dot = x * cs + y * sn;
  double t_dot = x * sn - y * cs;
  double gamma = std::atan(s_dot / (t_dot + g->dso));
  f.s_bin = (int)std::floor(gamma / g->dr + 0.5 * (g->nr - 1) - g->offset_r) -
            2; /* nfoot/2 */
  int nlines = g->nr + 1;
  double A[6];
  for (int k = 0; k <= 5; k++) {
    int idx = std::min(std::max(f.s_bin + k, 0), nlines - 1);
    double pos = L.A[idx] * x + L.B[idx] * y + L.C[idx];
    A[k] = fetch_lut(g, lut, L.fold[idx], pos);
  }
  for (int k = 0; k < 5; k++) f.areas[k] = std::fabs(A[k] - A[k + 1]);
  return f;
}

void pixel_center(const FanGeom *g, int ix, int iy, double *x, double *y) {
  *x = (ix + 0.5) * g->dx - g->nx * g->dx * 0.5 + g->offset_x;
  *y = (iy + 0.5) * g->dy - g->ny * g->dy * 0.5 + g->offset_y;
}

/* FP of one view into proj_row[nr]; x may be null → projects ones (norm). */
void fp_view(const FanGeom *g, const float *lut, double beta_deg,
             const float *x, float *proj_row) {
  double beta = beta_deg * kPi / 180.0;
  Lines L = make_lines(g, beta);
  std::fill(proj_row, proj_row + g->nr, 0.0f);
  for (int iy = 0; iy < g->ny; iy++)
    for (int ix = 0; ix < g->nx; ix++) {
      double px, py;
      pixel_center(g, ix, iy, &px, &py);
      Foot f = footprint(g, lut, L, beta, px, py);
      double att = (x ? x[iy * g->nx + ix] : 1.0) / f.div;
      for (int k = 0; k < 5; k++) {
        int b = f.s_bin + k;
        if (b >= 0 && b < g->nr) proj_row[b] += (float)(att * f.areas[k]);
      }
    }
  double inv_dr = 1.0 / g->dr;
  for (int i = 0; i < g->nr; i++) proj_row[i] *= (float)inv_dr;
}

/* BP of one view's correction; accumulates bp and norm (clamp addressing). */
void bp_view(const FanGeom *g, const float *lut, double beta_deg,
             const float *corr, float *bp, float *norm) {
  double beta = beta_deg * kPi / 180.0;
  Lines L = make_lines(g, beta);
  double inv_dr = 1.0 / g->dr;
  for (int iy = 0; iy < g->ny; iy++)
    for (int ix = 0; ix < g->nx; ix++) {
      double px, py;
      pixel_center(g, ix, iy, &px, &py);
      Foot f = footprint(g, lut, L, beta, px, py);
      double acc = 0.0, nacc = 0.0;
      for (int k = 0; k < 5; k++) {
        int b = std::min(std::max(f.s_bin + k, 0), g->nr - 1);
        acc += corr[b] * f.areas[k];
        nacc += f.areas[k];
      }
      bp[iy * g->nx + ix] += (float)(acc / f.div);
      norm[iy * g->nx + ix] += (float)(nacc / f.div * inv_dr);
    }
}

void parallel_views(int na, int n_threads,
                    const std::function<void(int)> &fn) {
  if (n_threads <= 1) {
    for (int v = 0; v < na; v++) fn(v);
    return;
  }
  std::vector<std::thread> ts;
  std::atomic<int> next{0};
  for (int t = 0; t < n_threads; t++)
    ts.emplace_back([&] {
      for (;;) {
        int v = next.fetch_add(1);
        if (v >= na) return;
        fn(v);
      }
    });
  for (auto &t : ts) t.join();
}

}  // namespace

extern "C" void make_area_lut(const FanGeom *g, float *lut) {
  double h = g->dx * 0.5;
  double tdx = ta_dx(g), tdy = ta_dy(g);
  for (int j = 0; j < g->ta_dimy; j++) {
    double phi = j * tdy * kPi / 180.0;
    double t = std::cos(phi), s = std::sin(phi);
    for (int i = 0; i < g->ta_dimx; i++) {
      double d = i * tdx;
      double area;
      if (s < 1e-12) {
        area = 2 * h * (h - std::min(std::max(d, -h), h));
      } else {
        double x0 = (d - h * s) / t, x1 = (d + h * s) / t;
        double c0 = std::min(std::max(x0, -h), h);
        double c1 = std::min(std::max(x1, -h), h);
        auto F = [&](double x) {
          return ((h * s - d) * x + 0.5 * t * x * x) / s;
        };
        area = 2 * h * (h - c1) + (F(c1) - F(c0));
      }
      lut[j * g->ta_dimx + i] =
          (float)std::min(std::max(area, 0.0), vox_base(g));
    }
  }
}

extern "C" void fp_project(const FanGeom *g, const float *lut,
                           const float *betas_deg, const float *x, float *proj,
                           int n_threads) {
  parallel_views(g->na, n_threads, [&](int v) {
    fp_view(g, lut, betas_deg[v], x, proj + (int64_t)v * g->nr);
  });
}

extern "C" void bp_project(const FanGeom *g, const float *lut,
                           const float *betas_deg, const float *proj, float *x,
                           int n_threads) {
  int64_t P = (int64_t)g->nx * g->ny;
  std::fill(x, x + P, 0.0f);
  std::vector<float> norm(P, 0.0f);
  /* serial over views (accumulating); parallel inside via per-thread bufs */
  int nt = std::max(1, n_threads);
  std::vector<std::vector<float>> bps(nt, std::vector<float>(P, 0.0f));
  std::vector<std::vector<float>> nms(nt, std::vector<float>(P, 0.0f));
  std::vector<std::thread> ts;
  std::atomic<int> next{0};
  for (int t = 0; t < nt; t++)
    ts.emplace_back([&, t] {
      for (;;) {
        int v = next.fetch_add(1);
        if (v >= g->na) return;
        bp_view(g, lut, betas_deg[v], proj + (int64_t)v * g->nr,
                bps[t].data(), nms[t].data());
      }
    });
  for (auto &th : ts) th.join();
  for (int t = 0; t < nt; t++)
    for (int64_t i = 0; i < P; i++) x[i] += bps[t][i];
}

extern "C" void sart_reconstruct(const FanGeom *g, const float *lut,
                                 const float *betas_deg, const float *proj,
                                 float *x, int nstart, int ntv, int nsubsets,
                                 int n_threads) {
  int64_t P = (int64_t)g->nx * g->ny;
  std::vector<float> xv(P, 0.0f), x_res(P, 0.0f);
  int sub_size = g->na / nsubsets;
  double lam = 0.24, alpha = 0.1, sigma = 0.8;
  const double mins = 1e-4;

  std::vector<float> p_row(g->nr), n_row(g->nr), corr(g->nr);
  for (int sweep = 0; sweep < nstart; sweep++) {
    std::vector<float> x_back = xv;
    for (int s = 0; s < nsubsets; s++) {
      std::vector<float> bp(P, 0.0f), norm(P, 0.0f);
      std::mutex acc_mu;
      std::vector<int> views(sub_size);
      for (int k = 0; k < sub_size; k++) views[k] = s + k * nsubsets;
      int nt = std::max(1, n_threads);
      std::vector<std::thread> ts;
      std::atomic<int> next{0};
      std::vector<std::vector<float>> bps(nt, std::vector<float>(P, 0.0f));
      std::vector<std::vector<float>> nms(nt, std::vector<float>(P, 0.0f));
      for (int t = 0; t < nt; t++)
        ts.emplace_back([&, t] {
          std::vector<float> pr(g->nr), nr_(g->nr), cr(g->nr);
          for (;;) {
            int vi = next.fetch_add(1);
            if (vi >= sub_size) return;
            int v = views[vi];
            fp_view(g, lut, betas_deg[v], xv.data(), pr.data());
            fp_view(g, lut, betas_deg[v], nullptr, nr_.data());
            for (int i = 0; i < g->nr; i++) {
              double n = nr_[i];
              cr[i] = n > 0.0
                          ? (float)((proj[(int64_t)v * g->nr + i] - pr[i]) /
                                    (n * g->dr))
                          : 0.0f;
            }
            bp_view(g, lut, betas_deg[v], cr.data(), bps[t].data(),
                    nms[t].data());
          }
        });
      for (auto &th : ts) th.join();
      for (int t = 0; t < nt; t++)
        for (int64_t i = 0; i < P; i++) {
          bp[i] += bps[t][i];
          norm[i] += nms[t][i];
        }
      for (int64_t i = 0; i < P; i++) {
        double upd = norm[i] > 0.0 ? lam * bp[i] / norm[i] : 0.0;
        xv[i] = std::max(0.0, (double)xv[i] + upd);
      }
    }
    double dp = 0.0;
    for (int64_t i = 0; i < P; i++) {
      double d = xv[i] - x_back[i];
      dp += d * d;
    }
    dp = std::sqrt(dp);
    x_res = xv; /* post-SART snapshot: the returned volume */
    sigma = std::max(sigma * 0.90, 0.1);
    double dtvg = alpha * dp;
    if (ntv > 0) {
      std::vector<float> x_pre = xv;
      for (int it = 0; it < ntv; it++) {
        std::vector<float> grad(P);
        auto at = [&](int ix, int iy) {
          ix = std::min(std::max(ix, 0), g->nx - 1);
          iy = std::min(std::max(iy, 0), g->ny - 1);
          return (double)xv[(int64_t)iy * g->nx + ix];
        };
        auto W = [&](double D) {
          double e = std::exp(D / (2 * sigma)) + std::exp(-D / (2 * sigma));
          return (2.0 / sigma) / (e * e);
        };
        for (int iy = 0; iy < g->ny; iy++)
          for (int ix = 0; ix < g->nx; ix++) {
            double c = at(ix, iy), right = at(ix + 1, iy), down = at(ix, iy + 1);
            double left = at(ix - 1, iy), up = at(ix, iy - 1);
            double up_right = at(ix + 1, iy - 1), left_down = at(ix - 1, iy + 1);
            double D_xy = std::sqrt(mins * mins + (c - right) * (c - right) +
                                    (c - down) * (c - down));
            double Dxm = std::sqrt(mins * mins + (left - c) * (left - c) +
                                   (left - left_down) * (left - left_down));
            double Dym = std::sqrt(mins * mins + (up - c) * (up - c) +
                                   (up - up_right) * (up - up_right));
            double tv = W(D_xy) * ((c - right) + (c - down)) / D_xy;
            tv -= W(Dxm) * (left - c) / Dxm;
            tv -= W(Dym) * (up - c) / Dym;
            grad[(int64_t)iy * g->nx + ix] =
                tv < mins * mins ? 0.0f : (float)tv;
          }
        for (int64_t i = 0; i < P; i++)
          if (xv[i] < 0 && grad[i] > 0) grad[i] = 1e-8f;
        double ng = 0.0;
        for (int64_t i = 0; i < P; i++) ng += (double)grad[i] * grad[i];
        ng = std::sqrt(ng);
        for (int64_t i = 0; i < P; i++) {
          double v = std::max(0.0, (double)xv[i]);
          xv[i] = (float)(v - dtvg / ng * grad[i]);
        }
      }
      double dg = 0.0;
      for (int64_t i = 0; i < P; i++) {
        double d = xv[i] - x_pre[i];
        dg += d * d;
      }
      if (std::sqrt(dg) > 0.995 * dp) alpha *= 0.96;
    }
    lam *= 0.95;
  }
  memcpy(x, x_res.data(), P * sizeof(float));
}
