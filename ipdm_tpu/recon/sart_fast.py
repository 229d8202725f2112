"""Fast TPU OS-SART: rebinned-parallel geometry, Pallas shift kernels.

The exact fan-beam footprint SART (recon/sart.py, faithful to the native
reconstructor TASART2DNSL0.cu) spends its time in arbitrary per-pixel
gathers/scatters (footprint line tables, LUT lookups, FP scatter, BP gather)
— the TPU scalar-path problem measured at ~10 ns/element. This module
re-derives the iterative reconstruction TPU-first:

  * the measured fan sinogram is rebinned once to parallel geometry
    (recon.fbp_fast machinery) and **folded to a half turn**: parallel views
    φ and φ+π sample identical ray integrals (t ↦ −t), so the 2000-view
    rebinned grid is 2× redundant; averaging the two halves halves every
    FP/BP sweep's work at equal information content (the fold is exact on
    the symmetric t grid; set fold=False for the unfolded system);
  * the iteration runs ENTIRELY on each view group's fine ray grid in
    ratio space — no gathers inside the sweep loop. Once per convert the
    measured parallel sinogram is converted to the ray-average ratio
    R = m_t / n_t (n_t = FP of ones, static) and resampled onto the fine
    grids; the per-subset SART correction is then the pure elementwise
    corr = valid · (R_fine − T / n_fine), because a fine ray's measured
    value in deposit units is m'_fine = n_fine · R (both sides are the
    same ray functional applied to the image). The t grid never appears
    inside the sweeps;
  * the default path runs each sweep as ONE fused Pallas launch per drive
    axis (`ops.pallas.shift.os_sart_sweep`): grid over that drive's
    subsets, the image persisting in the revisited output block, each grid
    step = FP plane-deposit → elementwise ratio correction → BP roll-table
    reads accumulated straight into the image → relaxed update → clamp
    (the unfused per-subset kernel chain issued ~3200 device thunks per
    convert and was bound by the ~0.5 ms thunk sequencing floor;
    `fused=False` keeps it for A/B);
  * all per-view index/weight tables are rebuilt ON DEVICE from [V]-sized
    scalars (deposit offsets are affine in the non-driven coordinate) —
    embedding them as jitted constants made outer programs ~100 MB of HLO;
  * the batch dim **rides inside the kernels and the sweep scan** — the
    progressive pipeline's three guided-iteration converts run as one
    B=3 reconstruction at ~the cost of one;
  * views are partitioned into drive-pure angle-interleaved ordered
    subsets (y-driven work runs on the transposed image between the two
    per-sweep kernel launches); the OS subset order is a free choice — the
    reference's is 2000 single-view subsets (TASART2DNSL0.cu:832-882);
  * `sample_rate` view subsampling (recons_torch's sparse-view mode,
    TASART2DNSL0_PyAPI.cpp:37) keeps every sample_rate-th (folded) view in
    the iteration;
  * SART constants follow the reference: relaxation 0.24·0.95^sweep,
    correction (m−p)/n, nonnegativity clamp, post-SART snapshot returned,
    NSL0-TV steps with annealed σ (recon.sart.nsl0_tv_grad).

Off TPU the kernels run in interpreter mode (CPU test suite).

Output orientation matches `fbp_convert` (and hence the ART path of
recon.convertor after its transpose); validated against the exact SART on
phantoms in tests/test_sart_fast.py.
"""

from __future__ import annotations

import math
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.ops.pallas.shift import (VB, anterp_taps,
                                       bp_shift_accumulate_batched,
                                       fp_plane_deposit, os_sart_sweep_mm)
from ipdm_tpu.ops.pallas import shift as _shift
from ipdm_tpu.recon.fbp import FBPGeometry
from ipdm_tpu.recon.fbp_fast import _FastPlan, _plan_for, _rebin
from ipdm_tpu.recon.sart import nsl0_tv_grad

# The fused path always runs the MXU tap-matrix sweep kernel: the per-row
# VPU sweep variant (os_sart_sweep + IPDM_SART_MM gate) was pruned after
# the round-4 host A/B measured it 2.5x slower (331 vs 130 ms/sinogram,
# docs/PERF.md); git history at the round-4 commits.
import os as _os
# views stacked per roll/realign op in the MM kernel (VMEM-bound: the
# 128-residue plane scratch is [128, G, B, L] f32). Vpad is a multiple of
# VB=8, so 2/4/8 are all legal; G=4 halves the per-sweep roll-op count vs
# G=2 at ~2x the plane scratch. A/B on the round-3 bench host
# (scripts/probe_sart_mm.py, B=3, nstart=10): G=2 435 ms/convert, G=4
# 394 ms (131 ms/sinogram); hardware old-vs-mm check unchanged. G=8's
# plane scratch (14 MB) exceeds the ~16 MB VMEM budget.
_MM_G = int(_os.environ.get("IPDM_SART_MM_G", "4"))
if _MM_G < 1:
    raise ValueError(f"IPDM_SART_MM_G must be a positive int, got {_MM_G}")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _Group:
    """Static per-(subset, branch) view group tables (host numpy).

    `ids` are GLOBAL view indices (drive the angle tables); `local_ids` are
    the rows of the (possibly folded/decimated) parallel sinogram the group
    reads/writes.

    One flat fine layout serves both projectors: fine ray index
    m ∈ [0, K·Lq) lives at flat index f = (m % K)·Lq + m // K, so a
    zero-stuffed row deposit (stride K in m) is a contiguous width-n
    window in f, and the BP read taps use the very same windows."""

    def __init__(self, p: _FastPlan, ids: np.ndarray, local_ids: np.ndarray,
                 xdrive: bool, Kf: int):
        self.p = p
        self.ids = ids
        self.local_ids = local_ids
        self.xdrive = xdrive
        self.V = len(ids)
        self.Vpad = _round_up(max(self.V, 1), VB)
        self.K = Kf
        n = p.n
        dt = p.dt
        if xdrive:
            drive, other = p.x, p.y
            dtrig, otrig = p.sinphi[ids], p.cosphi[ids]
        else:
            drive, other = p.y, p.x
            dtrig, otrig = p.cosphi[ids], p.sinphi[ids]
        a = (drive[1] - drive[0]) * dtrig / dt                 # [V]
        b = (other[:, None] * otrig[None, :]
             + drive[0] * dtrig[None, :] + p.T) / dt           # [n, V]
        sgn = np.sign(a)
        a_abs = np.abs(a)
        b_adj = np.where(sgn > 0, b, -b)
        step = a_abs / Kf                                      # [V]
        beta0 = b_adj.min(axis=0) - 2 * step                   # [V]
        o_real = (b_adj - beta0[None, :]) / step[None, :]      # [n, V]
        self.o_int = np.floor(o_real).astype(np.int32).T       # [V, n]
        self.sgn = sgn.astype(np.float32)
        self.step = step.astype(np.float32)
        self.beta0 = beta0.astype(np.float32)
        # small per-view vectors for on-device table reconstruction
        self.other = other.astype(np.float32)                  # [n]
        self.ob = (otrig / dt).astype(np.float32)              # [V]
        self.c0 = ((drive[0] * dtrig + p.T) / dt).astype(np.float32)
        # unified flat layout: Lq sized so every deposit/read window stays
        # inside one k-plane (r_max + Wn + roll margin ≤ Lq)
        self.Wn = _round_up(n, 128)
        o_hi = int(self.o_int.max() + 1 if self.V else 0)
        self.Lq = o_hi // Kf + self.Wn + 132
        self.L = _round_up(Kf * self.Lq + 128, 128)

    def _pad_vec(self, v: np.ndarray, fill=0.0) -> jnp.ndarray:
        """[V] host vector → [Vpad] device vector (tiny HLO constant)."""
        if self.Vpad > self.V:
            v = np.pad(v, (0, self.Vpad - self.V), constant_values=fill)
        return jnp.asarray(v)

    def dev_row_tables(self):
        """(s0, s1 int32, frac f32), each [Vpad, n], computed ON DEVICE
        from per-view scalars. Embedding the host [V, n] index tables as
        jitted constants made outer programs ~100 MB of HLO (700 s
        compiles); here the only constants are [V]- and [n]-vectors. Row y
        of view v deposits at o = (sgn·b(y, v) − β0_v)/step_v with
        b = other_y·ob_v + c0_v (affine in the non-driven coordinate)."""
        other = jnp.asarray(self.other)                        # [n]
        ob = self._pad_vec(self.ob)
        c0 = self._pad_vec(self.c0)
        sgn = self._pad_vec(self.sgn)
        step = self._pad_vec(self.step, fill=1.0)
        beta0 = self._pad_vec(self.beta0)
        b = other[None, :] * ob[:, None] + c0[:, None]         # [Vpad, n]
        o = (jnp.where(sgn[:, None] > 0, b, -b)
             - beta0[:, None]) / step[:, None]
        oi = jnp.floor(o)
        frac = (o - oi).astype(jnp.float32)
        smax = self.L - self.Wn - 128
        oi = jnp.clip(oi.astype(jnp.int32), 0, smax)
        s0 = (oi % self.K) * self.Lq + oi // self.K
        oi1 = oi + 1
        s1 = (oi1 % self.K) * self.Lq + oi1 // self.K
        live = (jnp.arange(self.Vpad) < self.V)[:, None]
        return (jnp.clip(jnp.where(live, s0, 0), 0, smax),
                jnp.clip(jnp.where(live, s1, 0), 0, smax),
                jnp.where(live, frac, 0.0))

    def fine_tables(self):
        """t→fine resample tables over the flat layout, ON DEVICE (see
        dev_row_tables), padded to Vpad: (qi0, qi1 int32 [Vpad, L], qf f32,
        qvalid f32). Fine ray m(f) = (f % Lq)·K + f // Lq sits at t
        position sgn·(step·m + β0); pad rows are masked dead."""
        Nt = self.p.Nt
        f = jnp.arange(self.L, dtype=jnp.int32)
        m = (f % self.Lq) * self.K + f // self.Lq              # [L]
        live_f = (f // self.Lq) < self.K
        sgn = self._pad_vec(self.sgn)
        step = self._pad_vec(self.step, fill=1.0)
        beta0 = self._pad_vec(self.beta0)
        qpos = (sgn[:, None] * (step[:, None] * m[None, :].astype(jnp.float32)
                                + beta0[:, None]))             # [Vpad, L]
        qi = jnp.floor(qpos)
        qf = (qpos - qi).astype(jnp.float32)
        qi0 = jnp.clip(qi.astype(jnp.int32), 0, Nt - 1)
        qi1 = jnp.clip(qi.astype(jnp.int32) + 1, 0, Nt - 1)
        live_v = (jnp.arange(self.Vpad) < self.V)[:, None]
        qvalid = ((qpos >= 0.0) & (qpos <= Nt - 1) & live_f[None, :]
                  & live_v).astype(jnp.float32)
        return qi0, qi1, qf, qvalid


class _SartFastPlan:
    """Static tables for one (geometry, nsubsets, view subset).

    kf overrides the fine-grid refinement: the default ceil(dp_pix/dt)
    keeps the fine ray spacing ≤ 1 t-bin; kf=1 sets it to the per-view row
    advance (≈ pixel pitch) — the grid the MXU sweep kernel requires (flat
    starts monotone with |Δs| ≤ 1 per row; see os_sart_sweep_mm)."""

    def __init__(self, g: FBPGeometry, nsubsets: int,
                 view_ids: np.ndarray = None, kf: int = None):
        self.g = g
        self.p = _plan_for(g, oversample=1.0)
        p = self.p
        if view_ids is None:
            view_ids = np.arange(g.M)
        self.view_ids = np.asarray(view_ids)
        nv = len(self.view_ids)
        while nsubsets > 1 and nv % nsubsets:
            nsubsets -= 1
        self.nsubsets = nsubsets
        self.sub_size = nv // nsubsets
        self.Kf = int(kf) if kf else max(1, int(math.ceil(p.dp_pix / p.dt)))
        self.Kq = self.Kf
        order = np.arange(nv).reshape(self.sub_size, nsubsets).T
        self.order = order
        xd = p.group_xdrive
        self.groups = []        # [nsubsets] of (x_group, y_group)
        for s in range(nsubsets):
            loc = order[s]
            glob = self.view_ids[loc]
            m = xd[glob]
            gx = _Group(p, glob[m], loc[m], True, self.Kf)
            gy = _Group(p, glob[~m], loc[~m], False, self.Kf)
            self.groups.append((gx, gy))
        # full-view groups for project_fast / norms
        loc_all = np.arange(nv)
        m = xd[self.view_ids]
        self.gx_all = _Group(p, self.view_ids[m], loc_all[m], True, self.Kf)
        self.gy_all = _Group(p, self.view_ids[~m], loc_all[~m], False,
                             self.Kf)
        # fused-sweep drive partitions: each drive's views split into
        # angle-interleaved subsets of ≤ Vp views (one grid step each in
        # os_sart_sweep); subset row r of drive table = drive view r
        self.dsub = {}          # drive -> (S, Vp, idx [S, Vp] into drive
        #                         rows, pad marked with -1)
        vp_target = max(1, -(-nv // max(1, self.nsubsets)))
        for key, grp in (("x", self.gx_all), ("y", self.gy_all)):
            Vd = grp.V
            if Vd == 0:
                self.dsub[key] = (0, 0, np.zeros((0, 0), np.int64))
                continue
            S = max(1, -(-Vd // vp_target))
            while -(-Vd // S) > 16:   # cap Vp at 16 (fused-kernel VMEM)
                S += 1
            Vp = _round_up(-(-Vd // S), VB)
            idx = np.full((S, Vp), -1, np.int64)
            for s in range(S):
                rows = np.arange(s, Vd, S)
                idx[s, :len(rows)] = rows
            self.dsub[key] = (S, Vp, idx)
        self._norms = {}

    def _fused_tables(self, key: str):
        """SMEM tables for one drive's fused sweep: s0, s1 int32 and frac
        f32, each [S, Vp, n] (pad rows −1 → appended zero row). Built on
        device from the drive group's dev_row_tables."""
        grp = self.gx_all if key == "x" else self.gy_all
        S, Vp, idx = self.dsub[key]
        s0, s1, frac = grp.dev_row_tables()                    # [Vpad, n]
        ii = jnp.asarray(idx)

        def take(a):
            ext = jnp.concatenate(
                [a[:grp.V], jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)
            return ext[ii]
        return take(s0), take(s1), take(frac)

    # -- FP ------------------------------------------------------------

    def _fp_group_fine(self, img: jnp.ndarray, grp: _Group) -> jnp.ndarray:
        """FP of one branch group onto its flat fine grid. img [B, n, n]
        (fbp frame). Returns [Vpad, B, L] deposit-unit ray sums."""
        p = self.p
        n = p.n
        B = img.shape[0]
        if grp.V == 0:
            return jnp.zeros((grp.Vpad, B, grp.L), img.dtype)
        src = img if grp.xdrive else jnp.swapaxes(img, 1, 2)
        rows = jnp.swapaxes(src, 0, 1)                         # [n, B, n]
        if grp.Wn > n:
            rows = jnp.pad(rows, ((0, 0), (0, 0), (0, grp.Wn - n)))
        scale = np.float32(p.dp_pix * p.dp_pix / p.dt)
        s0, s1, frac = grp.dev_row_tables()
        live = (jnp.arange(grp.Vpad) < grp.V)[:, None]
        w0 = jnp.where(live, (1.0 - frac) * scale, 0.0)
        w1 = frac * scale
        return fp_plane_deposit(rows, s0, s1, w0, w1, grp.L)

    def _fp_group(self, img: jnp.ndarray, grp: _Group) -> jnp.ndarray:
        """FP of one branch group anterpolated onto the t bins (used by
        project_fast and the static n_t norms — NOT in the SART loop).
        img [B, n, n] (fbp frame). Returns [B, V, Nt] ray sums."""
        p = self.p
        Kf = self.Kf
        B = img.shape[0]
        if grp.V == 0:
            return jnp.zeros((B, 0, p.Nt), img.dtype)
        T = self._fp_group_fine(img, grp)[:grp.V]              # [V, B, L]
        Mfine = Kf * grp.Lq
        Wt = 2 * Kf + 2
        # The anterpolation onto the t bins is a windowed multi-tap
        # resample of the fine rays in m-order; one Pallas kernel
        # (anterp_taps) replaces the scalar-path gathers
        # (take_along_axis measured 1.06 s for the 512² projection).
        # For Kf > 1 the flat layout interleaves k-planes (flat
        # f = (m%K)·Lq + m//K), so m-order is recovered EXACTLY by a
        # [K, Lq]→[Lq, K] transpose + reshape (A[k,j] is ray jK+k) —
        # pure data movement, no gathers. Contract: within-128-block
        # index span < _WTR_D − Wt.
        span_ok = (grp.V > 0
                   and 128.0 / max(float(np.min(grp.step)), 1e-6) + Wt
                   < _shift._WTR_D - 2)
        if span_ok:
            if Kf == 1:
                Tm = T[:, :, :Mfine]
            else:
                Tm = (T[:, :, :Kf * grp.Lq]
                      .reshape(grp.V, B, Kf, grp.Lq)
                      .transpose(0, 1, 3, 2)
                      .reshape(grp.V, B, Mfine))               # m-order
            Lp = _round_up(p.Nt, 128)
            d = jnp.minimum(jnp.arange(Lp, dtype=jnp.float32),
                            float(p.Nt - 1))[None, :]          # [1, Lp]
            sgn = jnp.asarray(grp.sgn)[:, None]
            step = jnp.asarray(grp.step)[:, None]
            beta0 = jnp.asarray(grp.beta0)[:, None]
            d_adj = jnp.where(sgn > 0, d, -d)
            m0 = jnp.floor((d_adj - 1.0 - beta0) / step).astype(jnp.int32)
            qi0 = jnp.clip(m0, 0, max(Mfine - 1, 0))           # [V, Lp]
            ks = jnp.arange(Wt, dtype=jnp.float32)[None, :, None]
            midx = qi0[:, None, :].astype(jnp.float32) + ks    # [V, Wt, Lp]
            qpos = sgn[:, None] * (step[:, None] * midx + beta0[:, None])
            W = jnp.maximum(0.0, 1.0 - jnp.abs(qpos - d[:, None]))
            W = W * (midx < Mfine)
            if Lp > p.Nt:                                      # padded bins
                W = W * (jnp.arange(Lp) < p.Nt)
            Mpad = _round_up(Mfine, 128) + _shift._WTR_WIN
            Tp = jnp.pad(Tm, ((0, 0), (0, 0), (0, Mpad - Mfine)))
            out = anterp_taps(Tp, qi0, W.astype(jnp.float32))[:, :, :p.Nt]
            return jnp.swapaxes(out, 0, 1)                     # [B, V, Nt]
        # general-Kf fallback: the flat fine layout interleaves k-planes
        # (non-monotone in m) — windowed gathers per tap
        d = jnp.arange(p.Nt, dtype=jnp.float32)[None, :]       # [1, Nt]
        sgn = jnp.asarray(grp.sgn)[:, None]
        step = jnp.asarray(grp.step)[:, None]
        beta0 = jnp.asarray(grp.beta0)[:, None]
        d_adj = jnp.where(sgn > 0, d, -d)
        m_lo = (d_adj - 1.0 - beta0) / step
        m0 = jnp.floor(m_lo).astype(jnp.int32)
        out = jnp.zeros((B, grp.V, p.Nt), img.dtype)
        for k in range(Wt):
            m = m0 + k
            qpos = sgn * (step * m.astype(jnp.float32) + beta0)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(qpos - d))
            mc = jnp.clip(m, 0, Mfine - 1)
            fi = (mc % Kf) * grp.Lq + mc // Kf                 # [V, Nt]
            valid = ((m >= 0) & (m < Mfine)).astype(img.dtype)
            # measured on v5e: the single 3-D take_along_axis beats B
            # unrolled 2-D gathers (1198 vs 1616 ms project_fast)
            idx = jnp.broadcast_to(fi[:, None, :], (grp.V, B, p.Nt))
            out = out + jnp.swapaxes(
                jnp.take_along_axis(T, idx, axis=2), 0, 1) * (w * valid)[None]
        return out                                             # [B, V, Nt]

    # -- BP ------------------------------------------------------------

    def _bp_group_fine(self, corr: jnp.ndarray, grp: _Group) -> jnp.ndarray:
        """Adjoint of _fp_group_fine (without the area scale): corr
        [Vpad, B, L] in the flat fine layout → [B, n, n] (fbp frame)."""
        p = self.p
        n = p.n
        B = corr.shape[1]
        if grp.V == 0:
            return jnp.zeros((B, n, n), corr.dtype)
        s0, s1, frac = grp.dev_row_tables()
        out = bp_shift_accumulate_batched(corr, s0, s1, frac, n)
        return out if grp.xdrive else jnp.swapaxes(out, 1, 2)

    def _resample_to_fine(self, R: jnp.ndarray, grp: _Group) -> jnp.ndarray:
        """Resample per-view t-grid signals R [B, nv, Nt] onto the group's
        flat fine grid (two static taps): [Vpad, B, L]. Once per convert.

        Lowering (r5): the flat layout is K contiguous planes of length
        Lq; within plane p the source position is sgn·(step·(j·K+p)+β0) —
        MONOTONE in j with |slope| = step·K = |a| ≤ ~1.3. Laying each
        plane at a 128-aligned offset makes every 128-bin block's source
        span ≤ |a|·127+2 < the anterp window bound, so the whole resample
        is ONE `anterp_taps` Pallas call (roll + banded tap matrix + MXU)
        instead of two flat take_along_axis gathers — those ran the TPU
        scalar gather path at ~0.7 GB/s, 4×26 ms per 3-sinogram convert
        (r5 trace, docs/PERF.md)."""
        B = R.shape[0]
        if grp.V == 0:
            return jnp.zeros((grp.Vpad, B, grp.L), R.dtype)
        rv = jnp.swapaxes(R[:, jnp.asarray(grp.local_ids)], 0, 1)
        if grp.Vpad > grp.V:
            rv = jnp.pad(rv, ((0, grp.Vpad - grp.V), (0, 0), (0, 0)))
        Nt = self.p.Nt
        amax = float(np.max(grp.step)) * grp.K if grp.V else 0.0
        if amax * 127 + 2 >= _shift._WTR_D - 4:
            return self._resample_to_fine_gather(rv, grp, B)
        K, Lq = grp.K, grp.Lq
        Lqp = _round_up(Lq, 128)
        # per-plane tables (on device, from per-view scalars — same
        # construction as fine_tables but in [Vpad, K, Lqp] plane layout)
        sgn = grp._pad_vec(grp.sgn)[:, None, None]
        step = grp._pad_vec(grp.step, fill=1.0)[:, None, None]
        beta0 = grp._pad_vec(grp.beta0)[:, None, None]
        m = (jnp.arange(Lqp, dtype=jnp.int32)[None, :] * K
             + jnp.arange(K, dtype=jnp.int32)[:, None])       # [K, Lqp]
        qpos = sgn * (step * m[None].astype(jnp.float32) + beta0)
        qi = jnp.floor(qpos)
        qf = (qpos - qi).astype(jnp.float32)
        qi0u = jnp.clip(qi.astype(jnp.int32), 0, Nt - 1)
        same = (jnp.clip(qi.astype(jnp.int32) + 1, 0, Nt - 1)
                == qi0u).astype(jnp.float32)
        # exact clipped-lerp semantics: where qi+1 clips onto qi0u the
        # second tap folds into the first
        w0 = (1 - qf) + qf * same
        w1 = qf * (1 - same)
        Vp = grp.Vpad
        qi_flat = qi0u.reshape(Vp, K * Lqp)
        W = jnp.stack([w0, w1], axis=1).reshape(Vp, 2, K * Lqp)
        Ntp = _round_up(Nt + _shift._WTR_WIN, 128)
        P = jnp.pad(rv, ((0, 0), (0, 0), (0, Ntp - Nt)))
        out = anterp_taps(P, qi_flat, W)                      # [Vp,B,KLqp]
        out = out.reshape(Vp, B, K, Lqp)[..., :Lq].reshape(Vp, B, K * Lq)
        return jnp.pad(out, ((0, 0), (0, 0), (0, grp.L - K * Lq)))

    def _resample_to_fine_gather(self, rv, grp, B):
        """take_along_axis fallback (steep-slope geometries where a
        128-block's source span would exceed the anterp window)."""
        qi0, qi1, qf, qvalid = grp.fine_tables()
        # 3-D gathers measured faster than B-unrolled 2-D on v5e (SART
        # B=3: 3.18 s with this form vs 5.38 s unrolled)
        i0 = jnp.broadcast_to(qi0[:, None, :], (grp.Vpad, B, grp.L))
        i1 = jnp.broadcast_to(qi1[:, None, :], (grp.Vpad, B, grp.L))
        f = qf[:, None, :]
        return ((1 - f) * jnp.take_along_axis(rv, i0, axis=2)
                + f * jnp.take_along_axis(rv, i1, axis=2))     # [Vpad, B, L]


_SPLANS = {}


def _splan_for(g: FBPGeometry, nsubsets: int, fold: bool = False,
               sample_rate: int = 1, kf: int = None) -> _SartFastPlan:
    k = (g.N, g.M, g.grid_n, g.grid_l, g.D, g.da, nsubsets, fold,
         sample_rate, kf)
    if k not in _SPLANS:
        ids = np.arange(g.M // 2 if fold else g.M)
        if sample_rate > 1:
            ids = ids[::sample_rate]
        _SPLANS[k] = _SartFastPlan(g, nsubsets, view_ids=ids, kf=kf)
    return _SPLANS[k]


def _trace_clean() -> bool:
    try:
        return jax.core.trace_state_clean()
    except Exception:
        return False


def _norms_for(sp: _SartFastPlan, fused: bool = False):
    """Precompute the static normalization tables (see _compute_norms /
    _compute_norms_fused).

    The tables are always CONCRETE arrays: when first requested from inside
    an outer jit trace, the norm math runs under ensure_compile_time_eval
    (eager at trace time) instead of being traced into the caller's
    program. Tracing it in both re-executed the norms every call AND blew
    the caller's executable up ~60× — the bench's whole-slice program
    carried the traced per-subset norm pipeline (measured 686 MB vs ~10 MB
    for the same convert with concrete norms; the executable fetch through
    the relay made that a warmup cost, docs/PERF.md). Concrete tables are
    hoisted by jit as runtime parameters, not embedded constants."""
    if fused in sp._norms:
        return sp._norms[fused]

    def compute():
        return _compute_norms_fused(sp) if fused else _compute_norms(sp)

    if _trace_clean():
        norms = compute()
    else:
        # JAX trace state is thread-local: a worker thread sees no ambient
        # trace, so the norm pipeline executes eagerly on device at trace
        # time. (ensure_compile_time_eval can't be used here — the Pallas
        # kernels' fori_loop literal bounds become captured eval-context
        # tracers.)
        import concurrent.futures
        with concurrent.futures.ThreadPoolExecutor(1) as ex:
            norms = ex.submit(compute).result()
    sp._norms[fused] = norms
    return norms


def _compute_norms(sp: _SartFastPlan):
    """Static tables driving the in-loop elementwise correction:

      nt_full  [nv, Nt]  — t-grid FP of ones per global view (R denominator)
      fine[s][br] = (inv_nf, valid) [Vpad, L] — fine-ray norm reciprocal
                    and live-bin mask per subset branch
      bp_norms [nsubsets, n, n] — BP of the live masks (update denominator)
    """
    p = sp.p
    eps = 1e-8
    nv = len(sp.view_ids)
    ones_img = jnp.ones((1, p.n, p.n), jnp.float32)
    nt_full = jnp.zeros((nv, p.Nt), jnp.float32)
    for grp in (sp.gx_all, sp.gy_all):
        if grp.V:
            nt = sp._fp_group(ones_img, grp)[0]                # [V, Nt]
            nt_full = nt_full.at[jnp.asarray(grp.local_ids)].set(nt)
    fine = []
    bp_n = []
    for s in range(sp.nsubsets):
        per_branch = []
        bp = jnp.zeros((1, p.n, p.n), jnp.float32)
        for grp in sp.groups[s]:
            nf = sp._fp_group_fine(ones_img, grp)[:, 0, :]     # [Vpad, L]
            qvalid = jnp.asarray(grp.fine_tables()[3]) if grp.V else None
            valid = ((nf > eps).astype(jnp.float32) * qvalid
                     if grp.V else jnp.zeros_like(nf))
            inv_nf = jnp.where(valid > 0, 1.0 / jnp.maximum(nf, eps), 0.0)
            per_branch.append((inv_nf, valid))
            bp = bp + sp._bp_group_fine(valid[:, None, :], grp)
        fine.append(per_branch)
        bp_n.append(bp[0])
    return (nt_full, fine, jnp.stack(bp_n))


def _compute_norms_fused(sp: _SartFastPlan):
    """Static tables for the fused drive-blocked sweeps (os_sart_sweep):

      nt_full [nv, Nt] — t-grid FP of ones per global view (R denominator)
      per drive key: dict with
        valid [Vpad, L]   — live-ray mask over the drive's full view set
        inv2  [S, Vp, L]  — pre-masked scale/n_fine in subset layout (the
                            kernel deposits with raw (1−frac, frac) weights,
                            so the area scale folds in here)
        nrmi  [S, n, n]   — per-subset 1/BP(valid) in DRIVE frame
    """
    p = sp.p
    eps = 1e-8
    nv = len(sp.view_ids)
    scale = np.float32(p.dp_pix * p.dp_pix / p.dt)
    ones_img = jnp.ones((1, p.n, p.n), jnp.float32)
    nt_full = jnp.zeros((nv, p.Nt), jnp.float32)
    per_drive = {}
    for key, grp in (("x", sp.gx_all), ("y", sp.gy_all)):
        if grp.V == 0:
            continue
        nt = sp._fp_group(ones_img, grp)[0]                    # [V, Nt]
        nt_full = nt_full.at[jnp.asarray(grp.local_ids)].set(nt)
        S, Vp, idx = sp.dsub[key]
        nf = sp._fp_group_fine(ones_img, grp)[:, 0, :]         # [Vpad, L]
        qvalid = jnp.asarray(grp.fine_tables()[3])
        valid = (nf > eps).astype(jnp.float32) * qvalid
        inv2_rows = jnp.where(valid > 0,
                              scale / jnp.maximum(nf, eps), 0.0)
        ext = jnp.concatenate(
            [inv2_rows[:grp.V], jnp.zeros((1, grp.L), jnp.float32)])
        inv2 = ext[jnp.asarray(idx)]                           # [S, Vp, L]
        s0, s1, frac = sp._fused_tables(key)
        vext = jnp.concatenate(
            [valid[:grp.V], jnp.zeros((1, grp.L), jnp.float32)])
        vsub = vext[jnp.asarray(idx)]                          # [S, Vp, L]
        nrm = []
        for s in range(S):
            bpn = bp_shift_accumulate_batched(
                vsub[s][:, None, :], jnp.asarray(s0[s]), jnp.asarray(s1[s]),
                jnp.asarray(frac[s]), p.n, vb=min(8, Vp))[0]   # [n, n]
            nrm.append(jnp.where(bpn > eps, 1.0 / jnp.maximum(bpn, eps),
                                 0.0))
        per_drive[key] = dict(valid=valid, inv2=inv2,
                              nrmi=jnp.stack(nrm),
                              s0=jnp.asarray(s0),
                              frac=jnp.asarray(frac))
    return (nt_full, per_drive)


@partial(jax.jit, static_argnames=("sp", "nstart", "ntv", "mm_bf16"))
def _sart_iterate_fused(sp: _SartFastPlan, par: jnp.ndarray, norms,
                        nstart: int, ntv: int,
                        mm_bf16: bool = False) -> jnp.ndarray:
    """OS-SART via the fused drive-blocked sweep kernel: per sweep, ONE
    os_sart_sweep launch per drive axis (grid over that drive's subsets)
    instead of ~4 thunks per (subset, branch) — the unfused loop's ~0.5 ms
    thunk-sequencing floor dominates its runtime (measured: convert time
    scales with nsubsets, not with view count)."""
    p = sp.p
    n = p.n
    eps = 1e-8
    B = par.shape[0]
    nt_full, per_drive = norms
    R = jnp.where(nt_full[None] > eps, par / jnp.maximum(nt_full[None], eps),
                  0.0)
    # measured ratios, resampled to each drive's fine grid and laid out
    # [S, Vp, B, L] once per convert
    rf = {}
    for key, grp in (("x", sp.gx_all), ("y", sp.gy_all)):
        if grp.V == 0:
            continue
        d = per_drive[key]
        S, Vp, idx = sp.dsub[key]
        rfa = sp._resample_to_fine(R, grp) * d["valid"][:, None, :]
        ext = jnp.concatenate(
            [rfa[:grp.V], jnp.zeros((1, B, grp.L), rfa.dtype)])
        rf[key] = ext[jnp.asarray(idx)]                        # [S,Vp,B,L]

    lam0, alpha0, sigma0 = 0.24, 0.1, 0.8
    x0 = jnp.zeros((B, n, n), jnp.float32)
    tv_grad_b = jax.vmap(nsl0_tv_grad, in_axes=(0, None))

    def drive_sweep(x, key, lam):
        d = per_drive[key]
        return os_sart_sweep_mm(x, rf[key], d["inv2"], d["frac"],
                                d["s0"], d["nrmi"], lam, G=_MM_G,
                                bf16=mm_bf16)

    def sweep(carry, it):
        x, lam, alpha, sigma = carry
        x_back = x
        if sp.gx_all.V:
            x = drive_sweep(x, "x", lam)
        if sp.gy_all.V:
            x = jnp.swapaxes(drive_sweep(jnp.swapaxes(x, 1, 2), "y", lam),
                             1, 2)
        dp = jnp.sqrt(jnp.sum((x - x_back) ** 2, axis=(1, 2)))  # [B]
        x_res = x
        sigma = jnp.maximum(sigma * 0.90, 0.1)
        dtvg = alpha * dp

        def tv_step(xc, _):
            gr = tv_grad_b(xc, sigma)
            gr = jnp.where((xc < 0) & (gr > 0), 1e-8, gr)
            xc = jnp.maximum(xc, 0.0)
            normg = jnp.sqrt(jnp.sum(gr ** 2, axis=(1, 2)))
            return (xc - (dtvg / jnp.maximum(normg, 1e-12))[:, None, None]
                    * gr, None)

        if ntv > 0:
            x_pre = x
            x, _ = jax.lax.scan(tv_step, x, None, length=ntv)
            dg = jnp.sqrt(jnp.sum((x - x_pre) ** 2, axis=(1, 2)))
            alpha = jnp.where(dg > 0.995 * dp, alpha * 0.96, alpha)
        lam = lam * 0.95
        return (x, lam, alpha, sigma), x_res

    (_, _, _, _), x_res_all = jax.lax.scan(
        sweep, (x0, jnp.float32(lam0),
                jnp.full((B,), alpha0, jnp.float32),
                jnp.float32(sigma0)), jnp.arange(nstart))
    return x_res_all[-1]


@partial(jax.jit, static_argnames=("sp", "nstart", "ntv"))
def _sart_iterate(sp: _SartFastPlan, par: jnp.ndarray, norms,
                  nstart: int, ntv: int) -> jnp.ndarray:
    """OS-SART for a BATCH of sinograms par [B, V', Nt] → [B, n, n]
    (fbp frame). The sweep loop is gather-free: per subset branch it is
    FP kernel → elementwise ratio correction → BP kernel (all batch items
    ride inside the Pallas kernels)."""
    p = sp.p
    n = p.n
    eps = 1e-8
    B = par.shape[0]
    nt_full, fine, bp_norms = norms
    # measured ray-average ratio R = m_t / n_t, resampled to the fine grids
    # ONCE per convert (the only gathers in the whole reconstruction)
    R = jnp.where(nt_full[None] > eps, par / jnp.maximum(nt_full[None], eps),
                  0.0)
    Rf = [[sp._resample_to_fine(R, grp) for grp in sp.groups[s]]
          for s in range(sp.nsubsets)]
    lam0, alpha0, sigma0 = 0.24, 0.1, 0.8
    x0 = jnp.zeros((B, n, n), jnp.float32)
    tv_grad_b = jax.vmap(nsl0_tv_grad, in_axes=(0, None))

    def sweep(carry, it):
        x, lam, alpha, sigma = carry           # x [B,n,n], alpha [B]
        x_back = x
        for s in range(sp.nsubsets):
            bp = jnp.zeros((B, n, n), jnp.float32)
            for br, grp in enumerate(sp.groups[s]):
                if grp.V == 0:
                    continue
                inv_nf, valid = fine[s][br]
                T = sp._fp_group_fine(x, grp)                 # [Vp, B, L]
                corr = ((Rf[s][br] - T * inv_nf[:, None, :])
                        * valid[:, None, :])
                bp = bp + sp._bp_group_fine(corr, grp)
            nbp = bp_norms[s][None]
            upd = jnp.where(nbp > eps, lam * bp / jnp.maximum(nbp, eps),
                            0.0)
            x = jnp.maximum(x + upd, 0.0)
        dp = jnp.sqrt(jnp.sum((x - x_back) ** 2, axis=(1, 2)))  # [B]
        x_res = x
        sigma = jnp.maximum(sigma * 0.90, 0.1)
        dtvg = alpha * dp                                       # [B]

        def tv_step(xc, _):
            gr = tv_grad_b(xc, sigma)
            gr = jnp.where((xc < 0) & (gr > 0), 1e-8, gr)
            xc = jnp.maximum(xc, 0.0)
            normg = jnp.sqrt(jnp.sum(gr ** 2, axis=(1, 2)))     # [B]
            return (xc - (dtvg / jnp.maximum(normg, 1e-12))[:, None, None]
                    * gr, None)

        if ntv > 0:
            x_pre = x
            x, _ = jax.lax.scan(tv_step, x, None, length=ntv)
            dg = jnp.sqrt(jnp.sum((x - x_pre) ** 2, axis=(1, 2)))
            alpha = jnp.where(dg > 0.995 * dp, alpha * 0.96, alpha)
        lam = lam * 0.95
        return (x, lam, alpha, sigma), x_res

    (_, _, _, _), x_res_all = jax.lax.scan(
        sweep, (x0, jnp.float32(lam0),
                jnp.full((B,), alpha0, jnp.float32),
                jnp.float32(sigma0)), jnp.arange(nstart))
    return x_res_all[-1]


def sart_fast_convert(pj: jnp.ndarray, g: FBPGeometry, nstart: int = 10,
                      ntv: int = 0, nsubsets: int = 40,
                      sample_rate: int = 1, fold: bool = True,
                      fused: bool = True,
                      mm_bf16: bool = False) -> jnp.ndarray:
    """[B, na, nr] fan sinograms → [B, n, n] images in fbp_convert
    orientation. Drop-in fast ART for the Convertor (reference semantics:
    recons_torch nstart sweeps, ntv TV steps, sample_rate view subsampling
    — TASART2DNSL0_PyAPI.cpp:33-57, re-derived in folded rebinned-parallel
    geometry with Pallas projectors). The whole batch reconstructs in one
    jitted scan; `fused=True` (default) runs the MXU tap-matrix sweep
    kernel on a Kf=1 fine grid (os_sart_sweep_mm), `fused=False` the
    unfused per-subset kernel chain (the cross-validation fallback)."""
    sample_rate = int(sample_rate)
    fold = bool(fold) and g.M % 2 == 0
    fused = bool(fused)
    sp = _splan_for(g, nsubsets, fold=fold, sample_rate=sample_rate,
                    kf=1 if fused else None)
    norms = _norms_for(sp, fused=fused)
    pj = pj[:, :, ::-1]                      # detector flip (fbp convention)
    par = _rebin(pj, sp.p)                   # [B, M, Nt]
    if fold:
        M = g.M
        par = 0.5 * (par[:, :M // 2, :] + par[:, M // 2:, ::-1])
    if sample_rate > 1:
        par = par[:, ::sample_rate]
    if fused:
        img = _sart_iterate_fused(sp, par, norms, int(nstart), int(ntv),
                                  mm_bf16=bool(mm_bf16))
    else:
        img = _sart_iterate(sp, par, norms, int(nstart), int(ntv))
    return img[:, :, ::-1]                   # x flip (fbp convention)


# ---------------------------------------------------------------------------
# Fast forward projection: image → fan sinogram (proj_torch equivalent)
# ---------------------------------------------------------------------------


def _inverse_rebin(par: jnp.ndarray, p: _FastPlan, n_det: int,
                   nda0: float, da: float) -> jnp.ndarray:
    """[B, M, Nt] parallel → [B, M, n_det] fan (det-flipped convention).

    Fan ray (θ_i, γ_b) = parallel ray (φ = θ_i − γ_b, t = D·sinγ_b): per
    fan-detector column the t coordinate is constant and the view shift is
    affine in the view index — the mirror of _rebin."""
    B, M, Nt = par.shape
    gamma_b = nda0 + np.arange(n_det) * da
    t_b = p.D * np.sin(gamma_b)
    tb = (t_b + p.T) / p.dt
    tb0 = np.clip(np.floor(tb).astype(np.int64), 0, Nt - 2)
    tbf = (tb - np.floor(tb)).astype(np.float32)
    tvalid = ((tb >= 0) & (tb <= Nt - 1)).astype(np.float32)
    dtheta = 2 * math.pi / M
    sv = -gamma_b / dtheta                     # φ index = i − γ_b/Δθ
    sv_mod = np.mod(sv, M)
    v0 = np.floor(sv_mod).astype(np.int64)
    vf = (sv_mod - v0).astype(np.float32)

    det_major = jnp.swapaxes(par, 1, 2)        # [B, Nt, M]
    r0 = det_major[:, jnp.asarray(tb0), :]     # [B, n_det, M] row gathers
    r1 = det_major[:, jnp.asarray(tb0 + 1), :]
    f = jnp.asarray(tbf)[None, :, None]
    G = ((1 - f) * r0 + f * r1) * jnp.asarray(tvalid)[None, :, None]
    Gpad = jnp.concatenate([G, G], axis=2)     # circular views
    flat = Gpad.reshape(B, -1)
    base = (jnp.arange(n_det, dtype=jnp.int32) * (2 * M)
            + jnp.asarray(v0, dtype=jnp.int32))
    iota = jnp.arange(M, dtype=jnp.int32)
    idx = base[:, None] + iota[None, :]
    va = flat[:, idx]                          # [B, n_det, M]
    vb = flat[:, idx + 1]
    fv = jnp.asarray(vf)[None, :, None]
    fan = (1 - fv) * va + fv * vb
    return jnp.swapaxes(fan, 1, 2)             # [B, M, n_det]


@functools.lru_cache(maxsize=8)
def _project_fast_fn(g: FBPGeometry, n_det: int, nda0: float, da: float):
    """Build + jit the projection program once per geometry: the jitted
    closure used to be recreated per call, costing ~0.8 s of host
    retrace/lowering per projection (round-4 trace, docs/PERF.md)."""
    fold = g.M % 2 == 0
    # natural-Kf plan (full ray-sampling accuracy); the k-plane
    # de-interleave in _fp_group keeps the anterpolation on the
    # anterp_taps Pallas kernel (the old plan fell back to 14
    # windowed-gather fusions at 2 GB/s — 77 ms of the projection)
    sp = _splan_for(g, 1, fold=fold)
    # view reassembly as a one-hot permutation matmul: the .at[].set
    # scatter ran at 2 GB/s (2 x 12 ms); the MXU does it in ~0.1 ms
    nv = len(sp.view_ids)
    perm = np.zeros((nv,), np.int64)
    order = np.concatenate([sp.gx_all.local_ids, sp.gy_all.local_ids])
    perm[order] = np.arange(nv)
    phot = np.zeros((nv, nv), np.float32)
    phot[np.arange(nv), perm] = 1.0
    phot_d = jnp.asarray(phot)

    @jax.jit
    def run(vol):
        internal = jnp.swapaxes(vol, 1, 2)[:, :, ::-1]         # [B, n, n]
        fx = sp._fp_group(internal, sp.gx_all)                 # [B, Vx, Nt]
        fy = sp._fp_group(internal, sp.gy_all)
        cat = jnp.concatenate([fx, fy], axis=1)                # [B, nv, Nt]
        par = jnp.einsum("vk,bkt->bvt", phot_d, cat,
                         preferred_element_type=jnp.float32
                         ).astype(vol.dtype)
        if fold:
            par = jnp.concatenate([par, par[:, :, ::-1]], axis=1)
        fan = _inverse_rebin(par, sp.p, n_det, nda0, da)
        return fan[:, :, ::-1]                 # undo detector flip

    return run


def project_fast(volume: jnp.ndarray, g: FBPGeometry, n_det: int,
                 nda0: float, da: float) -> jnp.ndarray:
    """[B, ny, nx] images (recon.projector volume convention) → [B, na, nr]
    fan sinograms. Fast equivalent of recon.convertor.project / the native
    proj_torch binding (TASART2DNSL0_PyAPI.cpp:63-80). FP runs on the
    folded half-turn view set; the φ+π half is the exact t-mirror."""
    return _project_fast_fn(g, int(n_det), float(nda0), float(da))(volume)
