"""Domain-convertor facade: sinogram ↔ image.

Reference-compatible surface for init_convertor (Utils/train_test_utils.py:
225-233) and the pybind API (recons_torch / proj_torch,
TASART2DNSL0_PyAPI.cpp:33-90), including the recons output transpose
(permute(0,2,1), PyAPI.cpp:52-54) and the FBP detector-flip convention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.recon.fbp import SIEMENS_FBP, FBPGeometry, fbp_convert
from ipdm_tpu.recon.geometry import SIEMENS, FanBeamGeometry, area_lut, \
    default_betas
from ipdm_tpu.recon.projector import forward_project_batch
from ipdm_tpu.recon.sart import sart_reconstruct


def recons(proj: jnp.ndarray, geom: FanBeamGeometry = SIEMENS,
           lut: Optional[jnp.ndarray] = None,
           betas: Optional[jnp.ndarray] = None, nstart: int = 10,
           ntv: int = 0, nsubsets: int = 40, sample_rate: int = 1,
           permute: bool = True) -> jnp.ndarray:
    """ART/TV reconstruction of [B, na, nr] sinograms → [B, ny, nx] images.

    Drop-in equivalent of recons_torch (TASART2DNSL0_PyAPI.cpp:33-57):
    nstart SART sweeps, ntv TV steps per sweep, optional view subsampling,
    and the output transpose the binding applies (permute=True)."""
    if lut is None:
        lut = jnp.asarray(area_lut(geom))
    if betas is None:
        betas = jnp.asarray(default_betas(geom))
    out = jax.vmap(lambda p: sart_reconstruct(
        p, geom, lut, betas, nstart=nstart, ntv=ntv, nsubsets=nsubsets,
        sample_rate=sample_rate))(proj)
    if permute:
        out = jnp.transpose(out, (0, 2, 1))
    return out


def project(volume: jnp.ndarray, geom: FanBeamGeometry = SIEMENS,
            lut: Optional[jnp.ndarray] = None,
            betas: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Forward projection of [B, ny, nx] images → [B, na, nr] sinograms
    (proj_torch, TASART2DNSL0_PyAPI.cpp:63-80). Note the binding feeds the
    volume buffer without the recons transpose, so callers holding images in
    the recons (permuted) convention should pass volume.transpose(0,2,1)."""
    if lut is None:
        lut = jnp.asarray(area_lut(geom))
    if betas is None:
        betas = jnp.asarray(default_betas(geom))
    return forward_project_batch(volume, geom, lut, betas)


def fbp_geom_from_fan(geom: FanBeamGeometry) -> FBPGeometry:
    """Derive the FBP geometry from a FanBeamGeometry (same scanner seen
    through the FBP code's parameterisation; det_offset flips sign because
    the FBP path flips the detector axis — FBP_kernel.py:41,99)."""
    return FBPGeometry(n_det=geom.nr, n_views=geom.na, grid_n=geom.nx,
                       grid_l=geom.nx * geom.dx / 2.0, os_=geom.dso,
                       od=geom.dsd - geom.dso, da=geom.dr,
                       det_offset=-geom.offset_r,
                       view_step_deg=360.0 / geom.na)


class Convertor:
    """Callable convertor bundle the orchestrator uses: `.convert(pj)` maps
    [B, na, nr] → [B, n, n] with either FBP or ART
    (init_convertor, train_test_utils.py:225-233; "TV" is realized as ART
    with ntv > 0, as in the reference configs)."""

    def __init__(self, kind: str, ntv: int = 0, nstart: int = 10,
                 nsubsets: int = 40, geom: FanBeamGeometry = SIEMENS,
                 fbp_geom: Optional[FBPGeometry] = None,
                 exact_fbp: bool = False, exact_art: bool = False,
                 sample_rate: int = 1):
        assert kind in ("FBP", "ART", "TV")
        self.kind = kind
        self.geom = geom
        if fbp_geom is None:
            fbp_geom = (SIEMENS_FBP if geom is SIEMENS
                        else fbp_geom_from_fan(geom))
        self.fbp_geom = fbp_geom
        # fast FBP = rebin-to-parallel slice-gather path (recon.fbp_fast),
        # ~20× the direct fan BP on TPU; exact_fbp forces the
        # reference-faithful direct path (golden parity runs)
        self.exact_fbp = exact_fbp
        # fast ART = rebinned-parallel OS-SART (recon.sart_fast); exact_art
        # forces the fan-beam footprint SART (recon.sart) for parity runs
        self.exact_art = exact_art
        while nsubsets > 1 and geom.na % nsubsets:
            nsubsets -= 1
        self.lut = jnp.asarray(area_lut(geom))
        self.betas = jnp.asarray(default_betas(geom))
        self.ntv = ntv if kind != "TV" else max(ntv, 1)
        self.nstart = nstart
        self.nsubsets = nsubsets
        self.sample_rate = sample_rate

    def convert(self, pj: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "FBP":
            if self.exact_fbp:
                return fbp_convert(pj, self.fbp_geom)
            from ipdm_tpu.recon.fbp_fast import fbp_convert_fast
            return fbp_convert_fast(pj, self.fbp_geom)
        if self.exact_art:
            return recons(pj, self.geom, self.lut, self.betas,
                          nstart=self.nstart, ntv=self.ntv,
                          nsubsets=self.nsubsets,
                          sample_rate=self.sample_rate, permute=True)
        from ipdm_tpu.recon.sart_fast import sart_fast_convert
        return sart_fast_convert(pj, self.fbp_geom, nstart=self.nstart,
                                 ntv=self.ntv, nsubsets=self.nsubsets,
                                 sample_rate=self.sample_rate)

    def project(self, volume: jnp.ndarray) -> jnp.ndarray:
        return project(volume, self.geom, self.lut, self.betas)

    __call__ = convert
