"""OS-SART + NSL0-TV iterative reconstruction, fully on-device.

TPU redesign of the native reconstructor's DoReconstruction loop
(TASART2DNSL0.cu:721-956): the reference performs nsart sweeps of 2000
*sequential* single-angle SART updates (hostile to a wide-vector machine);
here the sweep is restructured as **ordered-subset SART** — angles are grouped
into `nsubsets` interleaved subsets, every angle in a subset computes its
correction against the same volume (batched with vmap), and one volume update
is applied per subset. nsubsets == na reproduces the reference's per-angle
ordering exactly; the shipped default (cfg.sart_subsets) trades a little
per-sweep convergence for ~subset-size× more parallelism, with the relaxation
λ = 0.24·0.95^sweep decay preserved (TASART2DNSL0.cu:730,924).

The NSL0-TV regulariser (Grad_NSL0TV, TASART2DNSL0.cu:483-539) is pure
elementwise stencil math with clamp-padded edges; the adaptive TV step size
dtvg = α·‖Δx_SART‖ and the α/σ annealing rules are preserved
(TASART2DNSL0.cu:830,892-925).

As in the native code, the returned volume is the post-SART (pre-TV) state of
the final sweep (x_res, TASART2DNSL0.cu:890,930).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.recon.geometry import FanBeamGeometry
from ipdm_tpu.recon.projector import (bp_norm_one_angle,
                                      bp_one_angle, footprint_for_angle,
                                      fp_norm_one_angle, fp_one_angle,
                                      pixel_centers)


def nsl0_tv_grad(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Smoothed-L0 TV gradient with sech² weights (Grad_NSL0TV,
    TASART2DNSL0.cu:483-539). x: [ny, nx]; edges replicate (texture clamp)."""
    mins = 1e-4
    xp = jnp.pad(x, 1, mode="edge")
    c = xp[1:-1, 1:-1]
    right = xp[1:-1, 2:]    # (x+1, y)   : +x neighbour (ix+1)
    down = xp[2:, 1:-1]     # (x, y+1)   : +y neighbour (iy+1)
    left = xp[1:-1, :-2]
    up = xp[:-2, 1:-1]
    up_right = xp[:-2, 2:]      # (x+1, y-1)
    left_down = xp[2:, :-2]     # (x-1, y+1)

    def W(D):
        e = jnp.exp(D / (2 * sigma)) + jnp.exp(-D / (2 * sigma))
        return (2.0 / sigma) / (e * e)

    D_xy = jnp.sqrt(mins * mins + (c - right) ** 2 + (c - down) ** 2)
    Dx_minus = jnp.sqrt(mins * mins + (left - c) ** 2 + (left - left_down) ** 2)
    Dy_minus = jnp.sqrt(mins * mins + (up - c) ** 2 + (up - up_right) ** 2)

    temp = W(D_xy) * ((c - right) + (c - down)) / D_xy
    temp = temp - W(Dx_minus) * (left - c) / Dx_minus
    temp = temp - W(Dy_minus) * (up - c) / Dy_minus
    return jnp.where(temp < mins * mins, 0.0, temp)


def _subset_update(x_flat: jnp.ndarray, proj_rows: jnp.ndarray,
                   betas_sub: jnp.ndarray, lam: jnp.ndarray,
                   geom: FanBeamGeometry, lut: jnp.ndarray,
                   xy: jnp.ndarray) -> jnp.ndarray:
    """One OS-SART volume update from a subset of views.

    Per view (vmapped): footprint → FP(x), FP(1) → correction
    (1/dr)·(m − p)/n (correction_kernel, TASART2DNSL0.cu:443-460) → BP.
    Then x ← max(x + λ·Σbp/Σnorm, 0) (update_kernel, :462-479)."""

    def per_angle(beta_deg, m_row):
        foot = footprint_for_angle(geom, lut, xy, beta_deg)
        p = fp_one_angle(x_flat, foot, geom)
        n = fp_norm_one_angle(foot, geom)
        corr = jnp.where(n > 0.0, (1.0 / geom.dr) * (m_row - p) / n, 0.0)
        bp = bp_one_angle(corr, foot, geom)
        norm = bp_norm_one_angle(foot, geom)
        return bp, norm

    bp, norm = jax.vmap(per_angle)(betas_sub, proj_rows)
    bp = bp.sum(axis=0)
    norm = norm.sum(axis=0)
    upd = jnp.where(norm > 0.0, lam * bp / norm, 0.0)
    return jnp.maximum(x_flat + upd, 0.0)


@partial(jax.jit,
         static_argnames=("geom", "nstart", "ntv", "nsubsets", "sample_rate"))
def sart_reconstruct(proj: jnp.ndarray, geom: FanBeamGeometry,
                     lut: jnp.ndarray, betas: jnp.ndarray,
                     nstart: int = 10, ntv: int = 0, nsubsets: int = 40,
                     sample_rate: int = 1,
                     x0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reconstruct a [na, nr] sinogram → [ny, nx] volume.

    Equivalent of recons_torch (TASART2DNSL0_PyAPI.cpp:33-57) for one item;
    note the caller-side transpose convention is handled by
    ipdm_tpu.recon.convertor. sample_rate subsamples views (every k-th view,
    as params.na = 2000/sample_rate in the binding)."""
    na = geom.na // sample_rate
    betas_used = betas[::sample_rate][:na]
    proj_used = proj[::sample_rate][:na]
    assert na % nsubsets == 0, "nsubsets must divide number of views"
    sub_size = na // nsubsets
    # interleaved subsets: subset k = views [k, k+nsubsets, k+2·nsubsets, ...]
    order = np.arange(na).reshape(sub_size, nsubsets).T  # [nsubsets, sub_size]
    order = jnp.asarray(order, dtype=jnp.int32)

    xy = jnp.asarray(pixel_centers(geom)).reshape(-1, 2)
    P = geom.nx * geom.ny
    x = jnp.zeros((P,), jnp.float32) if x0 is None else x0.reshape(-1)

    lam0, alpha0, sigma0 = 0.24, 0.1, 0.8

    def sweep(carry, it):
        x, lam, alpha, sigma = carry
        x_back = x

        def subset_step(x, sub_idx):
            idx = order[sub_idx]
            x = _subset_update(x, proj_used[idx], betas_used[idx], lam,
                               geom, lut, xy)
            return x, None

        x, _ = jax.lax.scan(subset_step, x,
                            jnp.arange(nsubsets, dtype=jnp.int32))
        dp = jnp.linalg.norm(x - x_back)
        x_res = x  # post-SART snapshot: the native output (cu:890,930)
        sigma = jnp.maximum(sigma * 0.90, 0.1)
        dtvg = alpha * dp

        def tv_step(x, _):
            g = nsl0_tv_grad(x.reshape(geom.ny, geom.nx), sigma).reshape(-1)
            # nonnegative kernel (cu:543-558): x clamped; grad zeroed where
            # the pre-clamp x was negative and grad positive
            g = jnp.where((x < 0) & (g > 0), 1e-8, g)
            x = jnp.maximum(x, 0.0)
            normg = jnp.linalg.norm(g)
            x = x - dtvg / normg * g
            return x, None

        if ntv > 0:
            x_pre_tv = x
            x, _ = jax.lax.scan(tv_step, x, None, length=ntv)
            dg = jnp.linalg.norm(x - x_pre_tv)
            alpha = jnp.where(dg > 0.995 * dp, alpha * 0.96, alpha)
        lam = lam * 0.95
        return (x, lam, alpha, sigma), x_res

    (_, _, _, _), x_res_all = jax.lax.scan(
        sweep, (x, jnp.float32(lam0), jnp.float32(alpha0),
                jnp.float32(sigma0)), jnp.arange(nstart))
    return x_res_all[-1].reshape(geom.ny, geom.nx)
