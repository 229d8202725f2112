"""Fast TPU fan-beam FBP: rebin-to-parallel + slice-gather backprojection.

The direct fan-beam backprojection (recon/fbp.py, faithful to the reference
FBP_kernel.py) evaluates, for every (pixel, view) pair, an arctan-derived
detector index and performs an *arbitrary elementwise gather* from the
filtered projection row. On TPU, XLA lowers arbitrary gathers to a scalar
path (~10 ns/element → ~11 s for 2000×512²); the trig is irrelevant — the
gather is the entire cost (measured).

This module restructures the computation so that every per-pixel access is a
**contiguous-slice gather** (`start[:, None] + iota` — a pattern XLA lowers
to fast sliced loads) and all remaining arbitrary gathers touch only
sinogram-sized data (~10⁶ elements, not 10⁹):

  1. **Fan → parallel rebinning.**  A fan ray (view θ, fan angle γ) is the
     parallel ray (φ = θ+γ, t = D·sinγ).  On a uniform (φ, t) grid the fan
     detector index depends only on the t-column and the view shift is
     affine in the φ-index, so rebinning is: per-column row-gather (det-major
     slice gather) + per-column circular view shift (slice gather) + two
     lerps.
  2. **Parallel ramp filter** (R-L kernel on the t-grid) via rFFT.
  3. **Backprojection.**  For a parallel view φ, the t-index of pixel (i,j)
     is affine in j: pos = a·j + b_i with a = Δp·cosφ/dt shared by the whole
     view.  Resample the filtered row once onto the stride-a grid
     (Q[m] = P(a·m+β₀), an Lq≈2n elementwise gather per view), and the
     pixel value becomes Q[o_i + j] — a per-row contiguous slice with a
     per-row fractional lerp.  Views are processed in four quadrant groups
     (x-driven / y-driven × sign) so the drive coefficient stays in
     [1/√2, 1.36]; y-driven groups accumulate into the transposed image.

Equivalent discretisation of the same inverse Radon transform as the
reference fan FBP (one extra linear interpolation from the rebinning);
validated against recon/fbp.py on phantoms in tests/test_fbp_fast.py.
~20× faster than the direct path on a v5e chip.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.recon.fbp import FBPGeometry, SIEMENS_FBP


class _FastPlan:
    """Precomputed static tables for one FBPGeometry (host numpy)."""

    def __init__(self, g: FBPGeometry, oversample: float = 2.0):
        self.g = g
        N, M = g.N, g.M
        self.D = float(g.D)
        self.da = float(g.da)
        # fan-angle of (flipped) detector bin b: nda[b]
        nda = g.nda.astype(np.float64)
        self.nda0 = float(nda[0])
        gamma_max = float(np.abs(nda).max())
        # parallel t grid
        self.Nt = int(N * oversample)
        T = self.D * math.sin(gamma_max + self.da)
        self.T = T
        self.dt = 2 * T / (self.Nt - 1)
        t = -T + np.arange(self.Nt) * self.dt
        gamma_t = np.arcsin(np.clip(t / self.D, -1, 1))
        # per-column fan det index (continuous, reference lerp convention:
        # value(γ) = lerp(pj[ci-1], pj[ci]) at pos=(γ-nda0)/da+0.5, lam=frac)
        dp = (gamma_t - self.nda0) / self.da - 0.5
        self.det_i0 = np.clip(np.floor(dp).astype(np.int64), 0, N - 2)
        self.det_f = (dp - np.floor(dp)).astype(np.float32)
        self.det_valid = ((dp >= 0.0) & (dp <= N - 1)).astype(np.float32)
        # Fan ray (θ, γ) in pixel coords satisfies x·sin(θ−γ)+y·cos(θ−γ)
        # = D·sinγ (the direct BP samples alpha where s = x·sinθ+y·cosθ,
        # tt = x·cosθ−y·sinθ). So the parallel angle is φ = θ−γ with normal
        # (sinφ, cosφ): θ = φ_k + γ → view shift +γ/Δθ.
        dtheta = 2 * math.pi / M
        self.dphi = dtheta
        sv = gamma_t / dtheta            # view shift (may be ±)
        sv_mod = np.mod(sv, M)           # circular
        self.view_i0 = np.floor(sv_mod).astype(np.int64)
        self.view_f = (sv_mod - self.view_i0).astype(np.float32)
        # parallel-beam R-L kernel on the t grid, length 2·Nt−1
        nn = np.arange(-(self.Nt - 1), self.Nt)
        h = np.zeros(2 * self.Nt - 1)
        h[self.Nt - 1] = 1.0 / (4 * self.dt ** 2)
        odd = nn % 2 != 0
        h[odd] = -1.0 / (math.pi * nn[odd] * self.dt) ** 2
        self.h_par = (h * self.dt).astype(np.float32)
        # pixel grids (identical to FBPGeometry._getrphi conventions)
        n, L = g.grid_n, g.grid_l
        i = np.arange(1, n + 1)
        self.y = ((n + 1 - i - n / 2 - 0.5) * 2 * L / n)   # rows (desc)
        self.x = ((i - n / 2 - 0.5) * 2 * L / n)           # cols (asc)
        self.dp_pix = 2 * L / n
        self.n = n
        # view angles φ_k = k·Δθ; quadrant groups (static, contiguous after
        # argsort of group id — M uniform over 2π makes them 4 arcs + wraps)
        phis = np.arange(M) * dtheta
        c, s = np.cos(phis), np.sin(phis)
        self.phis = phis
        # pos = (x·sinφ + y·cosφ + T)/dt → x-driven when |sinφ| dominates
        self.group_xdrive = np.abs(s) >= np.abs(c)
        self.cosphi = c
        self.sinphi = s
        # slice-gather capacity for the Q resample; Kq sub-steps per drive
        # pixel keep the resampled grid at ≤1 t-bin spacing (no aliasing of
        # the ramp-filtered signal: fine step = a/Kq ≤ 1 since a ≤ Δp/dt)
        self.Lq = 2 * n + 8
        self.Kq = max(1, int(math.ceil(self.dp_pix / self.dt)))

    def key(self):
        return id(self)


_PLANS = {}


def _plan_for(g: FBPGeometry, oversample: float = 2.0) -> _FastPlan:
    k = (g.N, g.M, g.grid_n, g.grid_l, g.D, g.da, oversample)
    if k not in _PLANS:
        _PLANS[k] = _FastPlan(g, oversample=oversample)
    return _PLANS[k]


def _rebin(pj: jnp.ndarray, p: _FastPlan) -> jnp.ndarray:
    """[B, M, N] fan (already det-flipped) → [B, M, Nt] parallel."""
    B, M, N = pj.shape
    det_major = jnp.swapaxes(pj, 1, 2)             # [B, N, M]
    # per-column detector lerp: rows det_i0 / det_i0+1 (row slice gathers)
    r0 = det_major[:, jnp.asarray(p.det_i0), :]    # [B, Nt, M]
    r1 = det_major[:, jnp.asarray(p.det_i0 + 1), :]
    fd = jnp.asarray(p.det_f)[None, :, None]
    G = (1 - fd) * r0 + fd * r1
    G = G * jnp.asarray(p.det_valid)[None, :, None]
    # per-column circular view shift (k + s_j) mod M: double the view axis
    # so the wrap becomes a plain contiguous slice (start+iota fast pattern)
    Gpad = jnp.concatenate([G, G], axis=2)                   # [B, Nt, 2M]
    flat = Gpad.reshape(B, -1)                               # [B, Nt·2M]
    base = (jnp.arange(p.Nt, dtype=jnp.int32) * (2 * M)
            + jnp.asarray(p.view_i0, dtype=jnp.int32))       # [Nt]
    iota = jnp.arange(M, dtype=jnp.int32)
    idx_a = base[:, None] + iota[None, :]                    # [Nt, M]
    fv = jnp.asarray(p.view_f)[None, :, None]
    va = flat[:, idx_a]                                      # [B, Nt, M]
    vb = flat[:, idx_a + 1]
    P = (1 - fv) * va + fv * vb
    return jnp.swapaxes(P, 1, 2)                             # [B, M, Nt]


def _ramp_parallel(P: jnp.ndarray, p: _FastPlan) -> jnp.ndarray:
    """Ramp-filter along t via rFFT (≡ 'full' convolution centre slice)."""
    Nt = p.Nt
    Lf = int(2 ** math.ceil(math.log2(3 * Nt - 2)))
    K = jnp.fft.rfft(jnp.asarray(p.h_par), n=Lf)
    F = jnp.fft.rfft(P, n=Lf, axis=-1)
    full = jnp.fft.irfft(F * K, n=Lf, axis=-1)
    return full[..., Nt - 1: 2 * Nt - 1]


# static row-unroll factor for the BP kernel's row loop (A/B probes)
_BP_ROW_UNROLL = 1


def _use_pallas(n: int) -> bool:
    try:
        return (jax.devices()[0].platform == "tpu" and n % 128 == 0)
    except Exception:
        return False


def _prep_group(Pf, p: _FastPlan, view_idx: np.ndarray, xdrive: bool):
    """Per-view fine resample + per-row tap offsets for one BP view group.
    Pf: [B, M, Nt]. Returns (T2 [V, B, LqK], start0 [V, n], start1 [V, n],
    o_frac [V, n])."""
    n = p.n
    dt = p.dt
    T = p.T
    Lq = p.Lq
    cos_g = jnp.asarray(p.cosphi[view_idx].astype(np.float32))
    sin_g = jnp.asarray(p.sinphi[view_idx].astype(np.float32))
    P_g = Pf[:, jnp.asarray(view_idx), :]          # [B, V, Nt] row gather

    xs = jnp.asarray(p.x.astype(np.float32))       # drive axis coords (asc)
    ys = jnp.asarray(p.y.astype(np.float32))       # other axis (desc rows)

    # pos(i,j) = (x_j·sinφ + y_i·cosφ + T)/dt
    if xdrive:
        drive_coord, other_coord = xs, ys
        drive_trig, other_trig = sin_g, cos_g
    else:
        drive_coord, other_coord = ys, xs
        drive_trig, other_trig = cos_g, sin_g

    Kq = p.Kq
    LqK = Lq * Kq      # fine resample length (Q'-index m, step a/Kq)
    L2 = Lq            # rows of the (Kq, Lq) transposed fine grid

    Nt = p.Nt
    B = P_g.shape[0]

    def coords_one(a_trig, o_trig):
        """Per-view resample coordinates + per-row tap offsets."""
        # pos(o, d) = (drive[d]·a_trig + other[o]·o_trig + T)/dt = a·d + b_o
        a = (drive_coord[1] - drive_coord[0]) * a_trig / dt
        b = (other_coord * o_trig + drive_coord[0] * a_trig + T) / dt
        sgn = jnp.sign(a)
        a_abs = jnp.abs(a)
        # fine grid Q'[m] = P_v at t-index sgn·((a/Kq)·m + β0): sub-pixel
        # stride ≤ 1 t-bin, so no information is lost before the pixel lerp
        b_adj = jnp.where(sgn > 0, b, -b)          # pos = a_abs·d + b_adj (×sgn)
        beta0 = jnp.min(b_adj) - a_abs
        step = a_abs / Kq
        mq = jnp.arange(LqK, dtype=jnp.float32)
        qpos = sgn * (step * mq + beta0)           # t-index sampled by Q'
        qi = jnp.floor(qpos)
        qf = (qpos - qi).astype(jnp.float32)
        qi0 = jnp.clip(qi.astype(jnp.int32), 0, Nt - 1)
        qvalid = ((qpos >= 0.0) & (qpos <= Nt - 1)).astype(jnp.float32)
        # row offsets in fine units: m*(o, d) = Kq·d + o'_o
        o_real = (b_adj - beta0) / step
        o_int = jnp.floor(o_real).astype(jnp.int32)
        o_frac = (o_real - jnp.floor(o_real)).astype(jnp.float32)
        o_int = jnp.clip(o_int, 0, LqK - n * Kq - 2)
        k0 = o_int % Kq
        r0 = o_int // Kq
        o1 = o_int + 1
        start0 = k0 * L2 + r0                      # per-row flat starts
        start1 = (o1 % Kq) * L2 + o1 // Kq
        return qi0, qf, qvalid, start0, start1, o_frac

    qi0, qf, qvalid, start0, start1, o_frac = jax.vmap(coords_one)(
        drive_trig, other_trig)
    qi1 = jnp.minimum(qi0 + 1, Nt - 1)

    def gather_one(P_v, i0, i1, f, val):
        return ((1 - f) * P_v[:, i0] + f * P_v[:, i1]) * val

    Qp = jax.vmap(gather_one, in_axes=(1, 0, 0, 0, 0))(
        P_g, qi0, qi1, qf, qvalid)                 # [V, B, LqK]
    # flat layout T2[k·L2 + r] = Q'[r·Kq + k] so that the pixel tap at
    # Q'-index Kq·j + o_i is the contiguous window start_i + j
    T2 = jnp.swapaxes(Qp.reshape(-1, B, L2, Kq), 2, 3).reshape(-1, B, LqK)
    return T2, start0, start1, o_frac


def _bp_group(Pf, p: _FastPlan, view_idx: np.ndarray, xdrive: bool):
    """Backproject one group of views. Pf: [B, M, Nt]. Returns [B, n, n]
    (already in standard row/col orientation).

    On TPU the per-row shifted-window reads run in the Pallas kernel
    (ops.pallas.shift.bp_shift_accumulate); XLA would lower them as
    arbitrary gathers on the scalar path (measured 10 ns/element — slower
    than the direct fan BP it was meant to replace)."""
    B = Pf.shape[0]
    n = p.n
    Kq = p.Kq
    LqK = p.Lq * Kq
    T2, start0, start1, o_frac = _prep_group(Pf, p, view_idx, xdrive)

    if _use_pallas(n):
        from ipdm_tpu.ops.pallas.shift import (bp_shift_accumulate_batched,
                                               pad_views)
        # pad flat length to a 128 multiple with roll headroom
        Lpad = (-(LqK + 128)) % 128 + LqK + 128
        T2p = jnp.pad(T2, ((0, 0), (0, 0), (0, Lpad - LqK)))
        s0 = jnp.minimum(start0, Lpad - n - 128)
        s1 = jnp.minimum(start1, Lpad - n - 128)
        s0, s1, fr, T2p = pad_views(s0, s1, o_frac, T2p)
        # batch chunking keeps the kernel's 128-rotation VMEM table
        # (128·Bc·Lpad·itemsize B) within ~7 MB
        Bc = max(1, (7 << 20) // (128 * Lpad * T2p.dtype.itemsize))
        outs = []
        for b0 in range(0, B, Bc):
            outs.append(bp_shift_accumulate_batched(
                T2p[:, b0:b0 + Bc, :], s0, s1, fr, n,
                row_unroll=_BP_ROW_UNROLL))
        acc = jnp.concatenate(outs, axis=0)        # [B, n, n]
    else:
        iota = jnp.arange(n, dtype=jnp.int32)[None, :]

        def taps(T2v, s0v, s1v, fv):
            v0 = T2v[:, s0v[:, None] + iota]       # [B, n(other), n(drive)]
            v1 = T2v[:, s1v[:, None] + iota]
            return ((1 - fv)[None, :, None] * v0
                    + fv[None, :, None] * v1)

        acc = jax.vmap(taps)(T2, start0, start1, o_frac).sum(axis=0)
    if xdrive:
        return acc                                 # rows=y(desc), cols=x ✓
    return jnp.swapaxes(acc, 1, 2)                 # transpose back


@partial(jax.jit, static_argnames=("g", "flip"))
def fbp_convert_fast(pj: jnp.ndarray, g: FBPGeometry = SIEMENS_FBP,
                     flip: bool = True) -> jnp.ndarray:
    """Drop-in fast equivalent of recon.fbp.fbp_convert: [B, M, N] sinograms
    → [B, n, n] images (same flip conventions, same scale)."""
    p = _plan_for(g)
    if flip:
        pj = pj[:, :, ::-1]
    P = _rebin(pj, p)
    M = g.M
    if M % 2 == 0:
        # Half-turn fold: parallel view φ+π samples the same rays as view φ
        # with t reversed (t grid is symmetric and the R-L ramp is even, so
        # the fold commutes with the filter). Folding BEFORE the ramp
        # halves the FFT work as well as the BP work, at identical output
        # (up to fp addition order).
        P = P[:, :M // 2] + P[:, M // 2:, ::-1]
        xdm = p.group_xdrive[:M // 2]
    else:
        xdm = p.group_xdrive
    Pf = _ramp_parallel(P, p)
    # half dφ: 360° of parallel views covers every ray twice
    Pf = Pf * jnp.float32(p.dphi * 0.5)
    xd = np.nonzero(xdm)[0]
    yd = np.nonzero(~xdm)[0]
    img = _bp_group(Pf, p, xd, True) + _bp_group(Pf, p, yd, False)
    if flip:
        img = img[:, :, ::-1]
    return img
