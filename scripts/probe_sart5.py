"""A/B probe: fused OS-SART convert — row_unroll {1,8} × fp_roll {off,on},
production geometry (2000 views, 912 det, 512², B=3, nstart=10, ns=40).
Dependency-chained timing, run twice for drift.
  timeout 3000 python scripts/probe_sart5.py
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

import ipdm_tpu.recon.sart_fast as sf  # noqa: E402
from ipdm_tpu.recon.fbp import SIEMENS_FBP  # noqa: E402

print("device:", jax.devices()[0], flush=True)
host = np.random.default_rng(0)
pj0 = jnp.asarray(host.random((3, 2000, 912), np.float32) * 8.0)

variants = {}
for ru in (1, 8):
    for fp_roll in (False, True):
        sf._OSS_ROW_UNROLL = ru
        variants[ru, fp_roll] = jax.jit(
            lambda x, _fr=fp_roll: sf.sart_fast_convert(
                x, SIEMENS_FBP, nstart=10, ntv=0, nsubsets=40, fp_roll=_fr))
        t0 = time.time()
        out = jax.block_until_ready(variants[ru, fp_roll](pj0))
        print(f"compile ru={ru} fp_roll={fp_roll}: {time.time()-t0:.1f}s "
              f"sum={float(jnp.sum(out)):.6g}", flush=True)
sf._OSS_ROW_UNROLL = 1


def timed(name, fn, reps=3):
    x = pj0
    out = fn(x)
    t0 = time.time()
    for _ in range(reps):
        x = pj0 + out[0, 0, 0] * 1e-12
        out = fn(x)
    _ = float(out[0, 0, 0])
    print(f"  {name}: {(time.time()-t0)/reps*1e3:.0f} ms "
          f"(n={reps}, chained)", flush=True)


for pas in (1, 2):
    print(f"pass {pas}:", flush=True)
    for (ru, fp_roll), fn in variants.items():
        timed(f"sart B=3 ru={ru} fp_roll={int(fp_roll)}", fn)
