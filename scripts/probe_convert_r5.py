"""Round-5: trace the ART convert stage exactly as the bench runs it
(batched 3-sinogram OS-SART, nstart=10, nsubsets=40, SIEMENS_FBP) — the
0.44 s/slice convert has never been per-HLO traced since the MXU
tap-matrix sweep landed. Aggregate with:
    python scripts/trace_agg.py /tmp/jxtrace_conv 25 3

Run on TPU, alone on the box.
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ipdm_tpu.utils.comp_cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from ipdm_tpu.recon.fbp import SIEMENS_FBP
from ipdm_tpu.recon.sart_fast import sart_fast_convert

rng = np.random.default_rng(0)
stacked = jnp.asarray(rng.random((3, 2000, 912), np.float32) * 4.0)


def convert(x):
    return sart_fast_convert(x, SIEMENS_FBP, nstart=10, ntv=0, nsubsets=40)


g = jax.jit(convert)
y = g(stacked); _ = float(y.sum())
t0 = time.time()
y = g(stacked); _ = float(y.sum())
dt = time.time() - t0
print(f"convert(3 sinograms): {dt * 1e3:.0f} ms total, "
      f"{dt / 3 * 1e3:.0f} ms/sinogram", flush=True)
with jax.profiler.trace("/tmp/jxtrace_conv"):
    y = g(stacked)
    _ = float(y.sum())
print("trace written to /tmp/jxtrace_conv", flush=True)
