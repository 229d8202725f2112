"""TPU A/B: os_sart_sweep FP pattern — plane-deposit vs direct roll-deposit.

Interleaved within one process (relay drift). Production geometry, B=3.
Run alone: timeout 4000 python scripts/probe_oss_fp.py
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
from ipdm_tpu.recon.sart_fast import sart_fast_convert  # noqa: E402

print("device:", jax.devices()[0], flush=True)
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


pj3 = jnp.asarray(host.random((3, 2000, 912), np.float32) * 4.0)
timed("warmup (discard)", lambda i: fbp_convert_fast(pj3[:1] + i * 1e-6, g))
for rep in (1, 2):
    timed(f"oss fp=plane B=3 #{rep}", lambda i: sart_fast_convert(
        pj3 + i * 1e-6, g, nstart=10, nsubsets=40, fp_roll=False), reps=3)
    timed(f"oss fp=roll  B=3 #{rep}", lambda i: sart_fast_convert(
        pj3 + i * 1e-6, g, nstart=10, nsubsets=40, fp_roll=True), reps=3)
