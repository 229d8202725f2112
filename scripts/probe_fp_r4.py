"""Round-4 project_fast attribution: time the full 512^2 -> 2000x912 fan
projection, then trace it and aggregate per-HLO device time (where do the
~1.3 s go: _fp_group_fine deposit kernel, anterp, inverse-rebin gathers?).
Run on TPU (default env), alone on the box.
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

from ipdm_tpu.recon import sart_fast
from ipdm_tpu.recon.convertor import fbp_geom_from_fan
from ipdm_tpu.recon.geometry import FanBeamGeometry
from ipdm_tpu.recon.phantom import shepp_logan

fan = FanBeamGeometry(nx=512, ny=512, dx=42 / 512, dy=42 / 512, nr=912,
                      dr=0.0010125, na=2000, ta_dimx=1501, ta_dimy=181)
g = fbp_geom_from_fan(fan)
ph = jnp.asarray(np.asarray(shepp_logan(512), np.float32) * 0.03)[None]

y = sart_fast.project_fast(ph, g, fan.nr, float(g.nda[0]), float(g.da))
_ = float(y.sum())
t0 = time.time()
x = ph
N = 3
for i in range(N):
    y = sart_fast.project_fast(x, g, fan.nr, float(g.nda[0]), float(g.da))
    x = ph + 1e-6 * jnp.abs(y[:, :512, :512])
_ = float(x.sum())
print(f"project_fast: {(time.time()-t0)/N*1e3:.0f} ms", flush=True)

with jax.profiler.trace("/tmp/jxtrace_fp"):
    y = sart_fast.project_fast(x, g, fan.nr, float(g.nda[0]), float(g.da))
    _ = float(y.sum())

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from trace_agg import report

report("/tmp/jxtrace_fp", top_n=20)
