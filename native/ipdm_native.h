/* ipdm_native — native runtime components of the TPU IPDM framework.
 *
 * The reference implements its performance-critical host components in
 * C++/CUDA (Recon/TASART2DNSL0-Cpp/: SART reconstructor, footprint
 * projector, libtorch binding, CPU driver). The TPU build keeps the hot
 * *device* path in XLA/Pallas, and provides native equivalents for the
 * host-side runtime instead:
 *
 *   - npy_* : zero-copy .npy loading (mmap) + header parsing — the data
 *     layer's IO engine (replaces the reference's np.load per __getitem__).
 *   - loader_* : multi-threaded prefetching batch loader with a bounded
 *     ring queue — the equivalent of torch DataLoader worker processes
 *     (which the reference ships disabled, train_test_utils.py:374).
 *   - sart_* / fp_* : an independent CPU implementation of the area-LUT
 *     footprint projector pair and OS-SART sweep (same math as
 *     TASART2DNSL0.cu:253-479 re-derived from geometry, not translated) —
 *     the golden cross-check for the JAX/Pallas projectors, and the analog
 *     of the reference's native CPU driver (TASART2DNSL0_cpu.cpp).
 *
 * C ABI throughout: consumed from Python via ctypes (no pybind11 in the
 * image).
 */
#ifndef IPDM_NATIVE_H
#define IPDM_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---------------------------------------------------------------- npy IO */

/* Parse an .npy (v1/v2) header. Returns 0 on success. On success fills
 * dtype_code ('f'=float32, 'd'=float64, 'u'=uint8/16/32 by size, 'i'=int),
 * elem_size, ndim, shape[8], fortran_order, data_offset. */
int npy_probe(const char *path, char *dtype_code, int *elem_size, int *ndim,
              int64_t *shape /*[8]*/, int *fortran_order,
              int64_t *data_offset);

/* Read the full array as float32 into out (size n_elems). Converts from
 * f32/f64/u8/u16/i16/i32 sources. Returns 0 on success. */
int npy_read_f32(const char *path, float *out, int64_t n_elems);

/* ----------------------------------------------------- prefetching loader */

typedef struct Loader Loader;

/* Create a loader over n_files paths (each an .npy holding one [H,W] f32-
 * convertible slice). indices: the epoch-ordered sample index stream of
 * length n_indices (from the Python RandomSampler). Each get() returns the
 * next `batch` slices stacked [batch, H, W]. n_threads decode workers,
 * queue_depth batches buffered ahead. */
Loader *loader_create(const char **paths, int n_files, int64_t H, int64_t W,
                      const int64_t *indices, int64_t n_indices, int batch,
                      int n_threads, int queue_depth);

/* Blocking: fill out[batch*H*W] with the next batch. Returns number of
 * samples filled (0 = stream exhausted). */
int loader_next(Loader *ld, float *out);

void loader_destroy(Loader *ld);

/* ----------------------------------------------- fan-beam CPU projectors */

typedef struct {
  double dso, dsd;      /* source-isocenter / source-detector distance (cm) */
  int nx, ny;           /* image grid */
  double dx, dy;        /* pixel pitch (cm) */
  double offset_x, offset_y;
  int nr;               /* detector bins */
  double dr;            /* bin angular pitch (rad) */
  double offset_r;      /* detector center offset (bins) */
  int na;               /* number of views */
  int ta_dimx, ta_dimy; /* area-LUT dims (distance × folded angle) */
} FanGeom;

/* Forward-project image x[ny*nx] into proj[na*nr] using the trapezoid
 * footprint method with the analytic area LUT (lut[ta_dimy*ta_dimx],
 * betas_deg[na]). Multi-threaded over views. */
void fp_project(const FanGeom *g, const float *lut, const float *betas_deg,
                const float *x, float *proj, int n_threads);

/* Back-project proj[na*nr] into x[ny*nx] (transpose of fp_project). */
void bp_project(const FanGeom *g, const float *lut, const float *betas_deg,
                const float *proj, float *x, int n_threads);

/* OS-SART reconstruction with optional NSL0-TV steps; proj[na*nr] →
 * x[ny*nx]. nsubsets interleaved ordered subsets per sweep, nstart sweeps,
 * relaxation 0.24·0.95^sweep; ntv TV descent steps per sweep with the
 * annealed smoothed-L0 weights (sigma 0.8→·0.9, floor 0.1). Returns the
 * post-SART volume of the last sweep (the native reference's convention). */
void sart_reconstruct(const FanGeom *g, const float *lut,
                      const float *betas_deg, const float *proj, float *x,
                      int nstart, int ntv, int nsubsets, int n_threads);

/* Build the analytic trapezoid area LUT (ta_dimy × ta_dimx, row-major) for
 * geometry g — same closed-form square/half-plane overlap as
 * ipdm_tpu.recon.geometry.area_lut. */
void make_area_lut(const FanGeom *g, float *lut);

#ifdef __cplusplus
}
#endif

#endif /* IPDM_NATIVE_H */
