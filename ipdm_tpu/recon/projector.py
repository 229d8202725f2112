"""Matched fan-beam footprint projector pair (forward + back), pure XLA.

TPU-native re-derivation of the native CUDA trapezoid-footprint projectors
(reference Recon/TASART2DNSL0-Cpp/TASART2DNSL0.cu: update_lines_kernel :270,
fetchAreaLut :253, lut_init_foot_kernel :304, lut_fp_kernel :343,
apply_geodiv_kernel :385, lut_bp_kernel :397). The per-angle footprint —
5 detector-bin weights per pixel, computed as differences of cumulative
pixel/half-plane overlap areas from the LUT — is identical math; the execution
model is redesigned:

  * the footprint is computed on-device as fused elementwise XLA (no host
    round-trips, no per-angle kernel launches);
  * FP is a masked scatter-add and BP the exactly-transposed gather, so the
    pair is adjoint by construction (verified in tests);
  * angles batch with vmap and the SART sweep runs under lax.scan
    (see ipdm_tpu.recon.sart).

A Pallas fast path that reformulates FP/BP as MXU matmuls against a lazily
materialised one-hot weight matrix lives in ipdm_tpu.ops.pallas.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.recon.geometry import FanBeamGeometry


class Footprint(NamedTuple):
    """Per-pixel footprint for one view: flattened over ny·nx pixels."""
    div: jnp.ndarray    # [P] pixel-source distance
    s_bin: jnp.ndarray  # [P] int32 first detector bin of the footprint
    areas: jnp.ndarray  # [P, nfoot] overlap areas per bin


def pixel_centers(geom: FanBeamGeometry) -> np.ndarray:
    """Pixel centers [ny, nx, 2] with the native indexing (iy major, ix minor;
    x from ix, y from iy) — TASART2DNSL0.cu lut_init_foot_kernel:316-317."""
    ix = np.arange(geom.nx, dtype=np.float64)
    iy = np.arange(geom.ny, dtype=np.float64)
    x = (ix + 0.5) * geom.dx - geom.xx + geom.offset_x
    y = (iy + 0.5) * geom.dy - geom.yy + geom.offset_y
    xy = np.stack(np.meshgrid(x, y, indexing="xy"), axis=-1)  # [ny, nx, 2]
    return xy.astype(np.float32)


def fold_angle_deg(ang: jnp.ndarray) -> jnp.ndarray:
    """Fold a direction angle in degrees ∈ [0,360) into [0°,45°] by octant
    (TASART2DNSL0.cu:291-298)."""
    a = jnp.mod(ang, 90.0)
    return jnp.minimum(a, 90.0 - a)


def line_params(geom: FanBeamGeometry, beta: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Detector-edge ray lines for view angle beta (radians).

    Returns (fold_ang_deg [nlines], abc [nlines, 3]) where abc·(x,y,1) is the
    signed pixel-line distance (unit-normalized), matching
    update_lines_kernel (TASART2DNSL0.cu:270-301)."""
    nlines = geom.nr + 1
    # src = R(β)·(0, dso) with R(β)·v = (v.x·cosβ − v.y·sinβ,
    #                                    v.x·sinβ + v.y·cosβ)
    src = jnp.stack([-geom.dso * jnp.sin(beta), geom.dso * jnp.cos(beta)])
    s0 = -geom.rr + geom.offset_r * geom.dr
    gamma = s0 + jnp.arange(nlines, dtype=jnp.float32) * geom.dr
    p1 = jnp.stack([src[0] + geom.dsd * jnp.sin(beta + gamma),
                    src[1] - geom.dsd * jnp.cos(beta + gamma)], axis=-1)
    rayvec = p1 - src[None, :]
    ang = jnp.arctan2(rayvec[:, 1], rayvec[:, 0]) * (180.0 / math.pi)
    ang = jnp.where(ang < 0, ang + 360.0, ang)
    A = p1[:, 1] - src[1]
    B = src[0] - p1[:, 0]
    C = p1[:, 0] * src[1] - src[0] * p1[:, 1]
    Z = jnp.sqrt(A * A + B * B)
    abc = jnp.stack([A / Z, B / Z, C / Z], axis=-1)
    return fold_angle_deg(ang), abc


def fetch_area_lut(lut: jnp.ndarray, geom: FanBeamGeometry,
                   fold_ang: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LUT sample with clamp addressing + the sign trick
    (fetchAreaLut, TASART2DNSL0.cu:253-268). fold_ang in degrees, pos the
    signed distance. Broadcasts over any shape."""
    ny_l, nx_l = lut.shape  # (ta_dimy, ta_dimx)
    u = jnp.abs(pos) / geom.ta_dx
    v = fold_ang / geom.ta_dy
    u = jnp.clip(u, 0.0, nx_l - 1.0)
    v = jnp.clip(v, 0.0, ny_l - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, nx_l - 1)
    v1 = jnp.minimum(v0 + 1, ny_l - 1)
    fu = u - u0
    fv = v - v0
    val = ((1 - fu) * (1 - fv) * lut[v0, u0] + fu * (1 - fv) * lut[v0, u1]
           + (1 - fu) * fv * lut[v1, u0] + fu * fv * lut[v1, u1])
    return jnp.where(pos < 0.0, geom.vox_base - val, val)


def footprint_for_angle(geom: FanBeamGeometry, lut: jnp.ndarray,
                        xy: jnp.ndarray, beta_deg: jnp.ndarray) -> Footprint:
    """Compute div, s_bin and the 5 footprint areas for every pixel at one
    view (lut_init_foot_kernel, TASART2DNSL0.cu:304-341). xy: [P,2] f32."""
    beta = (beta_deg - geom.angle_start) * (math.pi / 180.0)
    fold_ang, abc = line_params(geom, beta)
    cs, sn = jnp.cos(beta), jnp.sin(beta)
    # uv_t = R·(0,−1), uv_s = R·(1,0), src = R·(0, dso)
    uv_t = jnp.stack([sn, -cs])
    uv_s = jnp.stack([cs, sn])
    src = jnp.stack([-geom.dso * sn, geom.dso * cs])

    d_src = xy - src[None, :]
    div = jnp.sqrt(jnp.sum(d_src * d_src, axis=-1))

    s_dot = xy @ uv_s
    t_dot = xy @ uv_t
    gamma = jnp.arctan(s_dot / (t_dot + geom.dso))
    nfoot2 = geom.nfoot // 2
    s_bin = (jnp.floor(gamma / geom.dr + 0.5 * (geom.nr - 1)
                       - geom.offset_r).astype(jnp.int32) - nfoot2)

    # 6 cumulative areas at lines s_bin .. s_bin+5 (clamped to valid lines)
    nlines = geom.nr + 1
    offs = jnp.arange(geom.nfoot + 1, dtype=jnp.int32)
    idx = jnp.clip(s_bin[:, None] + offs[None, :], 0, nlines - 1)  # [P,6]
    a = fold_ang[idx]                                      # [P,6]
    l_abc = abc[idx]                                       # [P,6,3]
    pos = (l_abc[..., 0] * xy[:, None, 0] + l_abc[..., 1] * xy[:, None, 1]
           + l_abc[..., 2])
    A = fetch_area_lut(lut, geom, a, pos)                  # [P,6]
    areas = jnp.abs(A[:, :-1] - A[:, 1:])                  # [P,5]
    return Footprint(div=div, s_bin=s_bin, areas=areas)


def fp_one_angle(x_flat: jnp.ndarray, foot: Footprint,
                 geom: FanBeamGeometry) -> jnp.ndarray:
    """Forward-project one view: proj[is] = (1/dr)·Σ_p x_p/div_p·area_{p,f}
    (lut_fp_kernel + apply_geodiv_kernel, TASART2DNSL0.cu:343-393).
    Returns [nr]."""
    vals = (x_flat / foot.div)[:, None] * foot.areas       # [P,5]
    offs = jnp.arange(geom.nfoot, dtype=jnp.int32)
    idx = foot.s_bin[:, None] + offs[None, :]              # [P,5]
    valid = (idx >= 0) & (idx < geom.nr)
    vals = jnp.where(valid, vals, 0.0)
    idx = jnp.clip(idx, 0, geom.nr - 1)
    proj = jnp.zeros((geom.nr,), x_flat.dtype).at[idx.reshape(-1)].add(
        vals.reshape(-1))
    return proj * (1.0 / geom.dr)


def fp_norm_one_angle(foot: Footprint, geom: FanBeamGeometry) -> jnp.ndarray:
    """FP of the all-ones image (SART row-sum normaliser)."""
    return fp_one_angle(jnp.ones_like(foot.div), foot, geom)


def bp_one_angle(corr: jnp.ndarray, foot: Footprint,
                 geom: FanBeamGeometry) -> jnp.ndarray:
    """Back-project one view's correction onto the pixel grid:
    img[p] = Σ_f corr[clamp(s_bin+f)]·area/div
    (lut_bp_kernel, TASART2DNSL0.cu:397-441 — clamp addressing, no bound
    mask, matching the CUDA texture semantics). Returns [P]."""
    offs = jnp.arange(geom.nfoot, dtype=jnp.int32)
    idx = jnp.clip(foot.s_bin[:, None] + offs[None, :], 0, geom.nr - 1)
    g = corr[idx]                                          # [P,5]
    return jnp.sum(g * foot.areas, axis=-1) / foot.div


def bp_norm_one_angle(foot: Footprint, geom: FanBeamGeometry) -> jnp.ndarray:
    """BP of the geodiv row (val>0 branch of lut_bp_kernel):
    norm[p] = (1/dr)·Σ_f area/div."""
    return jnp.sum(foot.areas, axis=-1) / foot.div * (1.0 / geom.dr)


@partial(jax.jit, static_argnames=("geom", "block"))
def forward_project(x: jnp.ndarray, geom: FanBeamGeometry, lut: jnp.ndarray,
                    betas: jnp.ndarray, block: int = 20) -> jnp.ndarray:
    """Full sinogram FP of image x [ny, nx] → [na, nr].

    Equivalent of the native DoProjection (TASART2DNSL0.cu:1335-1438) /
    proj_torch binding (TASART2DNSL0_PyAPI.cpp:63-80). Views are processed in
    vmapped blocks under lax.map to bound memory while batching compute."""
    xy = jnp.asarray(pixel_centers(geom)).reshape(-1, 2)
    x_flat = x.reshape(-1)

    def one(beta_deg):
        foot = footprint_for_angle(geom, lut, xy, beta_deg)
        return fp_one_angle(x_flat, foot, geom)

    while block > 1 and geom.na % block:
        block -= 1
    nb = geom.na // block
    betas_b = betas.reshape(nb, block)
    proj = jax.lax.map(lambda b: jax.vmap(one)(b), betas_b)
    return proj.reshape(geom.na, geom.nr)


def forward_project_batch(x: jnp.ndarray, geom: FanBeamGeometry,
                          lut: jnp.ndarray, betas: jnp.ndarray,
                          block: int = 20) -> jnp.ndarray:
    """Batched FP: x [B, ny, nx] → [B, na, nr]."""
    return jax.vmap(lambda xi: forward_project(xi, geom, lut, betas,
                                               block=block))(x)
