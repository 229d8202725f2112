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
  * **FP** per view: image rows are deposited at per-row dynamic offsets
    into a (k, r)-transposed fine grid by the Pallas `fp_plane_deposit`
    kernel (aligned plane deposits, no per-row rolls), then anterpolated
    onto the t-bins with small windowed gathers;
  * **BP** per view: per-row dynamic windows of the sub-stride resampled
    correction, accumulated by the Pallas `bp_shift_accumulate_batched`
    kernel;
  * the batch dim **rides inside both kernels and the sweep scan** — the
    progressive pipeline's three guided-iteration converts run as one
    B=3 reconstruction at ~the cost of one;
  * views are processed in ordered subsets; each subset splits statically
    into x-driven / y-driven quadrant groups (y-driven work runs on the
    transposed image); subsets unroll inside one sweep body that lax.scans
    over the `nstart` sweeps;
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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.ops.pallas.shift import (VB, bp_shift_accumulate_batched,
                                       fp_plane_deposit)
from ipdm_tpu.recon.fbp import FBPGeometry
from ipdm_tpu.recon.fbp_fast import _FastPlan, _plan_for, _rebin
from ipdm_tpu.recon.sart import nsl0_tv_grad


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _Group:
    """Static per-(subset, branch) view group tables (host numpy).

    `ids` are GLOBAL view indices (drive the angle tables); `local_ids` are
    the rows of the (possibly folded/decimated) parallel sinogram the group
    reads/writes."""

    def __init__(self, p: _FastPlan, ids: np.ndarray, local_ids: np.ndarray,
                 xdrive: bool, Kf: int):
        self.ids = ids
        self.local_ids = local_ids
        self.xdrive = xdrive
        self.V = len(ids)
        self.Vpad = _round_up(max(self.V, 1), VB)
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
        o_int = np.floor(o_real).astype(np.int32)
        self.o_frac = (o_real - np.floor(o_real)).astype(np.float32).T
        self.o_int = o_int.T                                   # [V, n]
        self.sgn = sgn.astype(np.float32)
        self.step = step.astype(np.float32)
        self.beta0 = beta0.astype(np.float32)
        # BP fine-grid capacity (stuffed width n·Kf + max offset + margin)
        self.W = n * Kf
        Lf_needed = int(self.o_int.max() if self.V else 0) + self.W + 2
        self.Lf = _round_up(Lf_needed + 256, 128)
        # FP v2 flat (k, r) deposit layout: T[k·Lq_fp + r] = fine[r·Kf + k].
        # A stuffed-row deposit at fine offset o becomes a contiguous
        # width-n deposit at flat start (o%Kf)·Lq_fp + o//Kf.
        self.Wn = _round_up(n, 128)
        o_hi = int(self.o_int.max() + 1 if self.V else 0)
        self.Lq_fp = o_hi // Kf + n + 2
        self.Lfp = _round_up(Kf * self.Lq_fp + 384, 128)
        o64 = self.o_int.astype(np.int64)
        self.s0_fp = ((o64 % Kf) * self.Lq_fp + o64 // Kf).astype(np.int32)
        o64 += 1
        self.s1_fp = ((o64 % Kf) * self.Lq_fp + o64 // Kf).astype(np.int32)

    def pad_v(self, arr: np.ndarray, fill=0) -> np.ndarray:
        if self.V == self.Vpad:
            return arr
        pads = [(0, self.Vpad - self.V)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pads, constant_values=fill)


class _SartFastPlan:
    """Static tables for one (geometry, nsubsets, view subset)."""

    def __init__(self, g: FBPGeometry, nsubsets: int,
                 view_ids: np.ndarray = None):
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
        self.Kf = max(1, int(math.ceil(p.dp_pix / p.dt)))
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
        self._norms = None

    # -- FP ------------------------------------------------------------

    def _fp_group(self, img: jnp.ndarray, grp: _Group) -> jnp.ndarray:
        """FP of one branch group. img [B, n, n] (fbp frame).
        Returns [B, V, Nt] ray sums (views in grp order)."""
        p = self.p
        n = p.n
        Kf = self.Kf
        B = img.shape[0]
        if grp.V == 0:
            return jnp.zeros((B, 0, p.Nt), img.dtype)
        src = img if grp.xdrive else jnp.swapaxes(img, 1, 2)
        rows = jnp.swapaxes(src, 0, 1)                         # [n, B, n]
        if grp.Wn > n:
            rows = jnp.pad(rows, ((0, 0), (0, 0), (0, grp.Wn - n)))
        scale = np.float32(p.dp_pix * p.dp_pix / p.dt)
        s0 = jnp.asarray(grp.pad_v(grp.s0_fp))
        s1 = jnp.asarray(grp.pad_v(grp.s1_fp))
        w0 = jnp.asarray(grp.pad_v((1.0 - grp.o_frac) * scale))
        w1 = jnp.asarray(grp.pad_v(grp.o_frac * scale))
        T = fp_plane_deposit(rows, s0, s1, w0, w1, grp.Lfp)[:grp.V]
        # anterpolate fine → t bins (small per-view windowed gathers);
        # fine index m lives at flat (m%Kf)·Lq_fp + m//Kf
        d = jnp.arange(p.Nt, dtype=jnp.float32)[None, :]       # [1, Nt]
        sgn = jnp.asarray(grp.sgn)[:, None]
        step = jnp.asarray(grp.step)[:, None]
        beta0 = jnp.asarray(grp.beta0)[:, None]
        d_adj = jnp.where(sgn > 0, d, -d)
        m_lo = (d_adj - 1.0 - beta0) / step
        m0 = jnp.floor(m_lo).astype(jnp.int32)
        Mfine = Kf * grp.Lq_fp
        out = jnp.zeros((grp.V, B, p.Nt), img.dtype)
        Wt = 2 * Kf + 2
        for k in range(Wt):
            m = m0 + k
            qpos = sgn * (step * m.astype(jnp.float32) + beta0)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(qpos - d))
            mc = jnp.clip(m, 0, Mfine - 1)
            fi = (mc % Kf) * grp.Lq_fp + mc // Kf              # [V, Nt]
            valid = ((m >= 0) & (m < Mfine)).astype(img.dtype)
            idx = jnp.broadcast_to(fi[:, None, :], (grp.V, B, p.Nt))
            out = out + (jnp.take_along_axis(T, idx, axis=2)
                         * (w * valid)[:, None, :])
        return jnp.swapaxes(out, 0, 1)                         # [B, V, Nt]

    # -- BP ------------------------------------------------------------

    def _bp_group(self, rays: jnp.ndarray, grp: _Group) -> jnp.ndarray:
        """BP of one branch group's rays [B, V, Nt] → [B, n, n] (fbp frame).

        Taps at fine index m = Kq·d + o_int[v, o] read through the
        transposed flat layout T2[k·Lq + r] = Q'[r·Kq + k] so each tap is a
        contiguous window (the Pallas kernel's access pattern)."""
        p = self.p
        n = p.n
        Kq = self.Kq
        B = rays.shape[0]
        if grp.V == 0:
            return jnp.zeros((B, n, n), rays.dtype)
        Lq = grp.Lf // Kq          # r rows in the fine grid (Lf = Lq·Kq)
        LqK = grp.Lf
        # resample rays onto the group's fine grid (same anchoring as FP:
        # t-index of fine m is sgn·(step·m + β0))
        sgn = jnp.asarray(grp.sgn)[:, None]
        step = jnp.asarray(grp.step)[:, None]
        beta0 = jnp.asarray(grp.beta0)[:, None]
        mq = jnp.arange(LqK, dtype=jnp.float32)[None, :]
        qpos = sgn * (step * mq + beta0)
        qi = jnp.floor(qpos)
        qf = (qpos - qi).astype(rays.dtype)[:, None, :]
        qi0 = jnp.clip(qi.astype(jnp.int32), 0, p.Nt - 1)
        qi1 = jnp.clip(qi.astype(jnp.int32) + 1, 0, p.Nt - 1)
        qvalid = ((qpos >= 0.0)
                  & (qpos <= p.Nt - 1)).astype(rays.dtype)[:, None, :]
        rv = jnp.swapaxes(rays, 0, 1)                          # [V, B, Nt]
        i0 = jnp.broadcast_to(qi0[:, None, :], (grp.V, B, LqK))
        i1 = jnp.broadcast_to(qi1[:, None, :], (grp.V, B, LqK))
        Qp = ((1 - qf) * jnp.take_along_axis(rv, i0, axis=2)
              + qf * jnp.take_along_axis(rv, i1, axis=2)) * qvalid
        # transposed flat layout: T2[k·Lq + r] = Q'[r·Kq + k]
        T2 = jnp.swapaxes(Qp.reshape(grp.V, B, Lq, Kq), 2, 3).reshape(
            grp.V, B, LqK)
        Lpad = _round_up(LqK + 256, 128)
        T2 = jnp.pad(T2, ((0, 0), (0, 0), (0, Lpad - LqK)))
        # tap decomposition (clip r so windows stay inside a k-row)
        o_int = np.minimum(grp.o_int, (Lq - n - 1) * Kq - 1)
        k0 = o_int % Kq
        r0 = o_int // Kq
        o1 = o_int + 1
        start0 = k0 * Lq + r0
        start1 = (o1 % Kq) * Lq + o1 // Kq
        s0 = jnp.asarray(grp.pad_v(start0.astype(np.int32)))
        s1 = jnp.asarray(grp.pad_v(start1.astype(np.int32)))
        frac = jnp.asarray(grp.pad_v(grp.o_frac))
        T2 = jnp.pad(T2, ((0, s0.shape[0] - T2.shape[0]), (0, 0), (0, 0)))
        out = bp_shift_accumulate_batched(T2, s0, s1, frac, n)  # [B, n, n]
        return out if grp.xdrive else jnp.swapaxes(out, 1, 2)


_SPLANS = {}


def _splan_for(g: FBPGeometry, nsubsets: int, fold: bool = False,
               sample_rate: int = 1) -> _SartFastPlan:
    k = (g.N, g.M, g.grid_n, g.grid_l, g.D, g.da, nsubsets, fold,
         sample_rate)
    if k not in _SPLANS:
        ids = np.arange(g.M // 2 if fold else g.M)
        if sample_rate > 1:
            ids = ids[::sample_rate]
        _SPLANS[k] = _SartFastPlan(g, nsubsets, view_ids=ids)
    return _SPLANS[k]


def _trace_clean() -> bool:
    try:
        return jax.core.trace_state_clean()
    except Exception:
        return False


def _norms_for(sp: _SartFastPlan):
    """Precompute FP(1) per (subset, branch) and BP(1) per subset.

    The cache must only ever hold CONCRETE arrays: when first called from
    inside an outer jit trace, caching would store tracers and leak them
    into later calls (UnexpectedTracerError). Inside a trace we recompute —
    the norm math simply becomes part of the traced program."""
    if sp._norms is not None:
        return sp._norms
    norms = _compute_norms(sp)
    if _trace_clean():
        sp._norms = norms
    return norms


def _compute_norms(sp: _SartFastPlan):
    p = sp.p
    ones_img = jnp.ones((1, p.n, p.n), jnp.float32)
    fp_n = []
    bp_n = []
    for s in range(sp.nsubsets):
        gx, gy = sp.groups[s]
        fx = sp._fp_group(ones_img, gx)[0]                     # [V, Nt]
        fy = sp._fp_group(ones_img, gy)[0]
        bx = sp._bp_group(jnp.ones((1, gx.V, p.Nt), jnp.float32), gx)[0]
        by = sp._bp_group(jnp.ones((1, gy.V, p.Nt), jnp.float32), gy)[0]
        fp_n.append((fx, fy))
        bp_n.append(bx + by)
    return (fp_n, jnp.stack(bp_n))


@partial(jax.jit, static_argnames=("sp", "nstart", "ntv"))
def _sart_iterate(sp: _SartFastPlan, par: jnp.ndarray, fp_norms,
                  bp_norms, nstart: int, ntv: int) -> jnp.ndarray:
    """OS-SART for a BATCH of sinograms par [B, V', Nt] → [B, n, n]
    (fbp frame). All batch items ride inside the Pallas kernels."""
    p = sp.p
    n = p.n
    eps = 1e-8
    B = par.shape[0]
    # static per-group measured rows
    m_rows = [(par[:, jnp.asarray(gx.local_ids)],
               par[:, jnp.asarray(gy.local_ids)])
              for gx, gy in sp.groups]
    lam0, alpha0, sigma0 = 0.24, 0.1, 0.8
    x0 = jnp.zeros((B, n, n), jnp.float32)
    tv_grad_b = jax.vmap(nsl0_tv_grad, in_axes=(0, None))

    def sweep(carry, it):
        x, lam, alpha, sigma = carry           # x [B,n,n], alpha [B]
        x_back = x
        for s in range(sp.nsubsets):
            gx, gy = sp.groups[s]
            bp = jnp.zeros((B, n, n), jnp.float32)
            for grp, m_g, nfp in ((gx, m_rows[s][0], fp_norms[s][0]),
                                  (gy, m_rows[s][1], fp_norms[s][1])):
                if grp.V == 0:
                    continue
                pfp = sp._fp_group(x, grp)                    # [B, V, Nt]
                corr = jnp.where(nfp[None] > eps, (m_g - pfp)
                                 / jnp.maximum(nfp[None], eps), 0.0)
                bp = bp + sp._bp_group(corr, grp)
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
                      sample_rate: int = 1,
                      fold: bool = True) -> jnp.ndarray:
    """[B, na, nr] fan sinograms → [B, n, n] images in fbp_convert
    orientation. Drop-in fast ART for the Convertor (reference semantics:
    recons_torch nstart sweeps, ntv TV steps, sample_rate view subsampling
    — TASART2DNSL0_PyAPI.cpp:33-57, re-derived in folded rebinned-parallel
    geometry with Pallas projectors). The whole batch reconstructs in one
    jitted scan."""
    sample_rate = int(sample_rate)
    fold = bool(fold) and g.M % 2 == 0
    sp = _splan_for(g, nsubsets, fold=fold, sample_rate=sample_rate)
    fp_norms, bp_norms = _norms_for(sp)
    pj = pj[:, :, ::-1]                      # detector flip (fbp convention)
    par = _rebin(pj, sp.p)                   # [B, M, Nt]
    if fold:
        M = g.M
        par = 0.5 * (par[:, :M // 2, :] + par[:, M // 2:, ::-1])
    if sample_rate > 1:
        par = par[:, ::sample_rate]
    img = _sart_iterate(sp, par, fp_norms, bp_norms, int(nstart), int(ntv))
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


def project_fast(volume: jnp.ndarray, g: FBPGeometry, n_det: int,
                 nda0: float, da: float) -> jnp.ndarray:
    """[B, ny, nx] images (recon.projector volume convention) → [B, na, nr]
    fan sinograms. Fast equivalent of recon.convertor.project / the native
    proj_torch binding (TASART2DNSL0_PyAPI.cpp:63-80). FP runs on the
    folded half-turn view set; the φ+π half is the exact t-mirror."""
    fold = g.M % 2 == 0
    sp = _splan_for(g, 1, fold=fold)

    @partial(jax.jit, static_argnames=())
    def run(vol):
        internal = jnp.swapaxes(vol, 1, 2)[:, :, ::-1]         # [B, n, n]
        B = vol.shape[0]
        nv = len(sp.view_ids)
        fx = sp._fp_group(internal, sp.gx_all)                 # [B, Vx, Nt]
        fy = sp._fp_group(internal, sp.gy_all)
        par = jnp.zeros((B, nv, sp.p.Nt), vol.dtype)
        par = par.at[:, jnp.asarray(sp.gx_all.local_ids)].set(fx)
        par = par.at[:, jnp.asarray(sp.gy_all.local_ids)].set(fy)
        if fold:
            par = jnp.concatenate([par, par[:, :, ::-1]], axis=1)
        fan = _inverse_rebin(par, sp.p, n_det, nda0, da)
        return fan[:, :, ::-1]                 # undo detector flip
    return run(volume)
