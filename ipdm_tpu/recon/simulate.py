"""Low-dose CT simulation: dose-reduction noise in the log-sinogram domain.

On-device, batched redesign of the reference simulator
(Utils/Low_dose_CT_simulate.py:13-52): same compound-Poisson Gaussian
approximation with electronic noise Ne = 5.8 and photon flux N0 = 1.4e5,

    σ²(p) = (1−f)·exp(p)·(1 + (1+f)·Ne·exp(p)/(f·N0)) / (f·N0)

applied as p + σ(p)·n, n~N(0,1). Where the reference spawns a multiprocessing
pool and reconstructs each noisy sinogram through the native ART binding, the
TPU version vmaps the noise over the batch and reconstructs with the
rebinned-parallel OS-SART (Pallas projectors) — a single device computation,
no process pool, no host round-trips. `exact=True` switches to the fan-beam
footprint SART for parity studies.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ipdm_tpu.recon.convertor import fbp_geom_from_fan, recons
from ipdm_tpu.recon.geometry import SIEMENS, FanBeamGeometry

NE = 5.8
N0 = 1.4e5


def add_noise(data: jnp.ndarray, rng, factor: float = 0.5) -> jnp.ndarray:
    """Noisy low-dose sinogram at dose `factor` (exact formula of
    Low_dose_CT_simulate.py:38-44). data: any shape."""
    n = jax.random.normal(rng, data.shape, data.dtype)
    e = jnp.exp(data)
    var = (1 - factor) * e * (1 + ((1 + factor) * NE * e) / (factor * N0)) \
        / (factor * N0)
    return data + jnp.sqrt(var) * n


def simulate_ldct_batch(clean_proj: jnp.ndarray, rng, dose: float = 0.25,
                        geom: FanBeamGeometry = SIEMENS, nstart: int = 10,
                        nsubsets: int = 40, exact: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, na, nr] clean sinograms → (noisy sinograms, LD images [B, ny, nx]).

    Mirrors the per-file worker (Low_dose_CT_simulate.py:13-35) as one batched
    device computation."""
    noisy = add_noise(clean_proj, rng, dose)
    if exact:
        ld_img = recons(noisy, geom, nstart=nstart, nsubsets=nsubsets,
                        permute=True)
    else:
        from ipdm_tpu.recon.sart_fast import sart_fast_convert
        ld_img = sart_fast_convert(noisy, fbp_geom_from_fan(geom),
                                   nstart=nstart, nsubsets=nsubsets)
    return noisy, ld_img
