"""Probe: round-2 SART/FBP fast-path timings on the real TPU.

Measures (dependency-chained, single scalar readback per timing — see
project memory on the axon relay):
  * fbp_convert_fast B=3 (folded)
  * sart_fast_convert B=1 and B=3 (folded, new plane-deposit FP kernel)
  * project_fast B=1 (folded)
Run alone (1 CPU core): timeout 3000 python scripts/probe_sart2.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from ipdm_tpu.utils.comp_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ipdm_tpu.recon.fbp import SIEMENS_FBP  # noqa: E402
from ipdm_tpu.recon.fbp_fast import fbp_convert_fast  # noqa: E402
from ipdm_tpu.recon.sart_fast import project_fast, sart_fast_convert  # noqa: E402

print("device:", jax.devices()[0])
host = np.random.default_rng(0)
g = SIEMENS_FBP


def timed(name, fn, reps=3):
    t0 = time.time()
    out = fn(0)
    s = float(jnp.asarray(out).sum())
    print(f"{name}: compile+1st {time.time()-t0:.1f}s (sum={s:.4g})",
          flush=True)
    t0 = time.time()
    outs = [fn(i + 1) for i in range(reps)]
    _ = float(sum(jnp.asarray(o).sum() for o in outs))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.0f} ms steady (n={reps})", flush=True)
    return dt


pj3 = jnp.asarray(host.random((3, 2000, 912), np.float32) * 4.0)
pj1 = pj3[:1]
img1 = jnp.asarray(host.random((1, 512, 512), np.float32) * 0.03)

# first measurement of a process is warm-up-inflated (relay quirk): burn it
timed("warmup (discard)", lambda i: fbp_convert_fast(pj1 + i * 1e-6, g))
timed("fbp_fast B=3 folded", lambda i: fbp_convert_fast(pj3 + i * 1e-6, g))
# SART timings drift between runs (relay/tenancy noise) — interleave two
# measurement sets per config so within-process drift is visible
for rep in (1, 2):
    timed(f"sart_fast B=1 folded #{rep}", lambda i: sart_fast_convert(
        pj1 + i * 1e-6, g, nstart=10, nsubsets=40), reps=3)
    timed(f"sart_fast B=3 folded #{rep}", lambda i: sart_fast_convert(
        pj3 + i * 1e-6, g, nstart=10, nsubsets=40), reps=3)
timed("project_fast B=1", lambda i: project_fast(
    img1 + i * 1e-6, g, 912, float(g.nda[0]), float(g.da)), reps=3)
