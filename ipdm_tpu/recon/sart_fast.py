"""Fast TPU OS-SART: rebinned-parallel geometry, gather-light projectors.

The exact fan-beam footprint SART (recon/sart.py, faithful to the native
reconstructor TASART2DNSL0.cu) spends its time in arbitrary per-pixel
gathers/scatters (footprint line tables, LUT lookups, FP scatter, BP gather)
— the same scalar-path problem measured for the direct FBP (~10 ns/element).
This module re-derives the iterative reconstruction TPU-first:

  * the measured fan sinogram is rebinned once to parallel geometry
    (recon.fbp_fast machinery — per-column slice gathers);
  * **FP** (per view): zero-stuffed pixel rows are sheared onto a fine
    ray-aligned grid by per-row affine gathers (`iota − start` pattern),
    column-summed, and anterpolated onto the t-bins with a small windowed
    gather — no scatters anywhere;
  * **BP**: the slice-gather backprojection of fbp_fast (unfiltered);
  * views are processed per ordered subset under one `lax.scan`; x-driven /
    y-driven quadrants are handled by branch-masked accumulation with one
    transpose per subset;
  * SART constants follow the reference: relaxation 0.24·0.95^sweep,
    correction (m−p)/n, nonnegativity clamp, post-SART snapshot returned,
    NSL0-TV steps with annealed σ (recon.sart.nsl0_tv_grad).

Output orientation matches `fbp_convert` (and hence the ART path of
recon.convertor after its transpose); validated against the exact SART on
phantoms in tests/test_sart_fast.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.recon.fbp import FBPGeometry
from ipdm_tpu.recon.fbp_fast import _FastPlan, _plan_for, _rebin
from ipdm_tpu.recon.sart import nsl0_tv_grad


def _fp_one_view(img, cos_v, sin_v, xdrive_v, p: _FastPlan, Kf: int,
                 Lf: int):
    """FP of one parallel view. img: [B, n, n] plus its transpose selected
    by branch; returns [B, Nt] ray sums (t-bin hat deposition)."""
    n = p.n
    dt = p.dt
    T = p.T
    xs = jnp.asarray(p.x.astype(np.float32))
    ys = jnp.asarray(p.y.astype(np.float32))
    # branch-select drive/other axes (x-driven: drive=x/j, coeff sinφ)
    drive_coord = jnp.where(xdrive_v, xs, ys)
    other_coord = jnp.where(xdrive_v, ys, xs)
    drive_trig = jnp.where(xdrive_v, sin_v, cos_v)
    other_trig = jnp.where(xdrive_v, cos_v, sin_v)
    src = jnp.where(xdrive_v, img, jnp.swapaxes(img, 1, 2))

    a = (drive_coord[1] - drive_coord[0]) * drive_trig / dt
    b = (other_coord * other_trig + drive_coord[0] * drive_trig + T) / dt
    sgn = jnp.sign(a)
    a_abs = jnp.abs(a)
    b_adj = jnp.where(sgn > 0, b, -b)
    step = a_abs / Kf
    beta0 = jnp.min(b_adj) - 2 * step
    o_real = (b_adj - beta0) / step
    o_int = jnp.floor(o_real).astype(jnp.int32)
    o_frac = (o_real - jnp.floor(o_real)).astype(src.dtype)

    # zero-stuffed rows: z[i, Kf·j] = src[i, j], padded for the shear gather
    B = src.shape[0]
    z = jnp.zeros((B, n, n, Kf), src.dtype).at[..., 0].set(src)
    z = z.reshape(B, n, n * Kf)
    pad = Lf
    zp = jnp.pad(z, ((0, 0), (0, 0), (pad, pad)))
    # shear: E[i, m] = z[i, m − o_i] (affine gather), deposits at m and m+1
    iota = jnp.arange(Lf, dtype=jnp.int32)[None, :]
    idx0 = pad + iota - o_int[:, None]
    idx1 = idx0 - 1
    rows = jnp.arange(n)[:, None]
    e0 = zp[:, rows, idx0]                         # [B, n, Lf]
    e1 = zp[:, rows, idx1]
    fine = ((1 - o_frac)[None, :, None] * e0
            + o_frac[None, :, None] * e1).sum(axis=1)  # [B, Lf]
    # splat mass → line-integral scale: each pixel deposits its value once;
    # pixel density along t is a/Δt-bins so ∫ds per pixel = Δp²/dt
    # (the |drive_trig| Jacobians cancel — view-independent weight)
    fine = fine * (p.dp_pix * p.dp_pix / p.dt)

    # anterpolate fine grid → t bins: t-index of fine m is sgn·(step·m+β0)
    d = jnp.arange(p.Nt, dtype=jnp.float32)
    d_adj = jnp.where(sgn > 0, d, -d)              # solve step·m+β0 = d_adj
    m_lo = (d_adj - 1.0 - beta0) / step
    W = 2 * Kf + 2
    m0 = jnp.floor(m_lo).astype(jnp.int32)
    out = jnp.zeros((src.shape[0], p.Nt), src.dtype)
    for k in range(W):
        m = m0 + k
        qpos = sgn * (step * m.astype(jnp.float32) + beta0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(qpos - d))
        mc = jnp.clip(m, 0, Lf - 1)
        valid = ((m >= 0) & (m < Lf)).astype(src.dtype)
        out = out + fine[:, mc] * (w * valid)[None, :]
    return out


def _bp_one_view(rays, cos_v, sin_v, xdrive_v, p: _FastPlan, Kq: int,
                 LqK: int):
    """BP of one parallel view's ray values [B, Nt] → [B, n, n] in the
    branch's driven orientation (caller transposes y-driven results)."""
    n = p.n
    dt = p.dt
    T = p.T
    L2 = p.Lq
    xs = jnp.asarray(p.x.astype(np.float32))
    ys = jnp.asarray(p.y.astype(np.float32))
    drive_coord = jnp.where(xdrive_v, xs, ys)
    other_coord = jnp.where(xdrive_v, ys, xs)
    drive_trig = jnp.where(xdrive_v, sin_v, cos_v)
    other_trig = jnp.where(xdrive_v, cos_v, sin_v)

    a = (drive_coord[1] - drive_coord[0]) * drive_trig / dt
    b = (other_coord * other_trig + drive_coord[0] * drive_trig + T) / dt
    sgn = jnp.sign(a)
    a_abs = jnp.abs(a)
    b_adj = jnp.where(sgn > 0, b, -b)
    beta0 = jnp.min(b_adj) - a_abs
    step = a_abs / Kq
    mq = jnp.arange(LqK, dtype=jnp.float32)
    qpos = sgn * (step * mq + beta0)
    qi = jnp.floor(qpos)
    qf = (qpos - qi).astype(rays.dtype)
    qi0 = jnp.clip(qi.astype(jnp.int32), 0, p.Nt - 1)
    qi1 = jnp.clip(qi.astype(jnp.int32) + 1, 0, p.Nt - 1)
    qvalid = ((qpos >= 0.0) & (qpos <= p.Nt - 1)).astype(rays.dtype)
    Qp = ((1 - qf) * rays[:, qi0] + qf * rays[:, qi1]) * qvalid   # [B, LqK]
    T2 = jnp.swapaxes(Qp.reshape(-1, L2, Kq), 1, 2).reshape(-1, LqK)
    o_real = (b_adj - beta0) / step
    o_int = jnp.floor(o_real).astype(jnp.int32)
    o_frac = (o_real - jnp.floor(o_real)).astype(rays.dtype)
    o_int = jnp.clip(o_int, 0, LqK - n * Kq - 2)
    k0 = o_int % Kq
    r0 = o_int // Kq
    o1 = o_int + 1
    start0 = k0 * L2 + r0
    start1 = (o1 % Kq) * L2 + o1 // Kq
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    v0 = T2[:, start0[:, None] + iota]
    v1 = T2[:, start1[:, None] + iota]
    return (1 - o_frac)[None, :, None] * v0 + o_frac[None, :, None] * v1


class _SartFastPlan:
    """Static tables + jitted subset kernel for one (geometry, nsubsets)."""

    def __init__(self, g: FBPGeometry, nsubsets: int):
        self.p = _plan_for(g, oversample=1.0)
        p = self.p
        self.nsubsets = nsubsets
        na = g.M
        assert na % nsubsets == 0, "nsubsets must divide view count"
        self.sub_size = na // nsubsets
        order = np.arange(na).reshape(self.sub_size, nsubsets).T
        self.order = order                        # [nsubsets, sub_size]
        self.Kf = max(1, int(math.ceil(p.dp_pix / p.dt)))
        # worst-case fine index = max row offset (≈ n·Kf for 45° views)
        # + Kf·n from the drive sweep
        self.Lf = 2 * p.n * self.Kf + 2 * self.Kf + 8
        self.Kq = self.Kf
        self.LqK = p.Lq * self.Kq
        self.cos_t = jnp.asarray(p.cosphi.astype(np.float32))
        self.sin_t = jnp.asarray(p.sinphi.astype(np.float32))
        self.xdrive_t = jnp.asarray(p.group_xdrive)
        self._norms = None

    def fp_subset(self, img, view_ids):
        """FP over a subset: img [B,n,n] → [B, V, Nt]."""
        cos_v = self.cos_t[view_ids]
        sin_v = self.sin_t[view_ids]
        xd = self.xdrive_t[view_ids]
        return jax.vmap(
            lambda c, s, x: _fp_one_view(img, c, s, x, self.p, self.Kf,
                                         self.Lf),
            out_axes=1)(cos_v, sin_v, xd)

    def bp_subset(self, rays, view_ids):
        """BP over a subset: rays [B, V, Nt] → [B, n, n]."""
        cos_v = self.cos_t[view_ids]
        sin_v = self.sin_t[view_ids]
        xd = self.xdrive_t[view_ids]
        per_view = jax.vmap(
            lambda r, c, s, x: _bp_one_view(r, c, s, x, self.p, self.Kq,
                                            self.LqK),
            in_axes=(1, 0, 0, 0), out_axes=0)(rays, cos_v, sin_v, xd)
        mask = xd.astype(per_view.dtype)[:, None, None, None]
        acc_x = (per_view * mask).sum(axis=0)
        acc_y = (per_view * (1 - mask)).sum(axis=0)
        return acc_x + jnp.swapaxes(acc_y, 1, 2)


_SPLANS = {}


def _splan_for(g: FBPGeometry, nsubsets: int) -> _SartFastPlan:
    k = (g.N, g.M, g.grid_n, g.grid_l, g.D, g.da, nsubsets)
    if k not in _SPLANS:
        while nsubsets > 1 and g.M % nsubsets:
            nsubsets -= 1
        _SPLANS[k] = _SartFastPlan(g, nsubsets)
    return _SPLANS[k]


@partial(jax.jit, static_argnames=("sp", "nstart", "ntv"))
def _sart_iterate(sp: _SartFastPlan, par: jnp.ndarray, norms_fp, norms_bp,
                  nstart: int, ntv: int) -> jnp.ndarray:
    """OS-SART on the parallel sinogram par [B, M, Nt] → image [B, n, n]."""
    p = sp.p
    B = par.shape[0]
    n = p.n
    order = jnp.asarray(sp.order, dtype=jnp.int32)
    x = jnp.zeros((B, n, n), jnp.float32)
    lam0, alpha0, sigma0 = 0.24, 0.1, 0.8

    def subset_step(x, s):
        ids = order[s]
        m = jnp.take(par, ids, axis=1)                 # [B, V, Nt]
        pfp = sp.fp_subset(x, ids)
        nfp = jnp.take(norms_fp, ids, axis=0)[None]    # [1, V, Nt]
        corr = jnp.where(nfp > 1e-8, (m - pfp) / jnp.maximum(nfp, 1e-8),
                         0.0)
        bp = sp.bp_subset(corr, ids)
        nbp = norms_bp[s][None]                        # [1, n, n]
        return bp, nbp

    def sweep(carry, it):
        x, lam, alpha, sigma = carry
        x_back = x

        def one_subset(x, s):
            bp, nbp = subset_step(x, s)
            upd = jnp.where(nbp > 1e-8, lam * bp / jnp.maximum(nbp, 1e-8),
                            0.0)
            return jnp.maximum(x + upd, 0.0), None

        x, _ = jax.lax.scan(one_subset, x,
                            jnp.arange(sp.nsubsets, dtype=jnp.int32))
        dp = jnp.sqrt(jnp.sum((x - x_back) ** 2))
        x_res = x
        sigma = jnp.maximum(sigma * 0.90, 0.1)
        dtvg = alpha * dp

        def tv_step(x, _):
            g = jax.vmap(lambda xi: nsl0_tv_grad(xi, sigma))(x)
            g = jnp.where((x < 0) & (g > 0), 1e-8, g)
            x = jnp.maximum(x, 0.0)
            normg = jnp.sqrt(jnp.sum(g ** 2))
            return x - dtvg / jnp.maximum(normg, 1e-12) * g, None

        if ntv > 0:
            x_pre = x
            x, _ = jax.lax.scan(tv_step, x, None, length=ntv)
            dg = jnp.sqrt(jnp.sum((x - x_pre) ** 2))
            alpha = jnp.where(dg > 0.995 * dp, alpha * 0.96, alpha)
        lam = lam * 0.95
        return (x, lam, alpha, sigma), x_res

    (_, _, _, _), x_res_all = jax.lax.scan(
        sweep, (x, jnp.float32(lam0), jnp.float32(alpha0),
                jnp.float32(sigma0)), jnp.arange(nstart))
    return x_res_all[-1]


def _norms_for(sp: _SartFastPlan):
    """Precompute FP(1)[view, t] and per-subset BP(1) norm images."""
    if sp._norms is None:
        p = sp.p
        ones_img = jnp.ones((1, p.n, p.n), jnp.float32)
        all_ids = jnp.arange(p.g.M, dtype=jnp.int32)

        @jax.jit
        def compute():
            nf = sp.fp_subset(ones_img, all_ids)[0]        # [M, Nt]
            nbs = []
            for s in range(sp.nsubsets):
                ids = jnp.asarray(sp.order[s], dtype=jnp.int32)
                ones_rays = jnp.ones((1, sp.sub_size, p.Nt), jnp.float32)
                nbs.append(sp.bp_subset(ones_rays, ids)[0])
            return nf, jnp.stack(nbs)
        sp._norms = jax.tree_util.tree_map(
            jax.lax.stop_gradient, compute())
    return sp._norms


def sart_fast_convert(pj: jnp.ndarray, g: FBPGeometry, nstart: int = 10,
                      ntv: int = 0, nsubsets: int = 40,
                      sample_rate: int = 1) -> jnp.ndarray:
    """[B, na, nr] fan sinograms → [B, n, n] images in fbp_convert
    orientation. Drop-in fast ART for the Convertor (reference semantics:
    recons_torch nstart sweeps, ntv TV steps — TASART2DNSL0_PyAPI.cpp:33-57,
    re-derived in rebinned-parallel geometry)."""
    sp = _splan_for(g, nsubsets)
    norms_fp, norms_bp = _norms_for(sp)
    pj = pj[:, :, ::-1]                      # detector flip (fbp convention)
    par = _rebin(pj, sp.p)                   # [B, M, Nt]
    img = _sart_iterate(sp, par, norms_fp, norms_bp, int(nstart), int(ntv))
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
    gamma_b = nda0 + np.arange(n_det) * da + 0.5 * da * 0.0
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
    proj_torch binding (TASART2DNSL0_PyAPI.cpp:63-80)."""
    sp = _splan_for(g, 1)
    internal = jnp.swapaxes(volume, 1, 2)[:, :, ::-1]
    ids = jnp.arange(g.M, dtype=jnp.int32)

    @jax.jit
    def run(img):
        par = sp.fp_subset(img, ids)           # [B, M, Nt]
        fan = _inverse_rebin(par, sp.p, n_det, nda0, da)
        return fan[:, :, ::-1]                 # undo detector flip

    return run(internal)
