"""Trace the proj UNet eval at B=2 to attribute the batch anti-scaling
(B=1 62.6 -> B=2 190.5 ms/slice-eval on the round-4 host): per-HLO
aggregation names the ops whose cost grows superlinearly in B.
Run on TPU, alone: python scripts/probe_batch_trace.py [B]
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

from ipdm_tpu.models import unet as U

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
model = U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                    num_res_blocks=2, attention_resolutions=(16, 32),
                    channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                    dtype=jnp.bfloat16)
x = jnp.asarray(np.random.default_rng(1).random((B, 2000, 912, 1),
                                                np.float32))
tvec = jnp.zeros((B,), jnp.int32)
p = jax.jit(model.init)(jax.random.PRNGKey(0), x, tvec)
jax.block_until_ready(p)


def f(p, h):
    def body(c, _):
        y = model.apply(p, c, tvec)
        return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                           c.dtype), ()
    out, _ = jax.lax.scan(body, h, None, length=8)
    return out


g = jax.jit(f)
y = g(p, x); _ = float(y.sum())
t0 = time.time(); y = g(p, y); _ = float(y.sum())
print(f"proj B={B}: {(time.time()-t0)/8*1e3:.1f} ms/eval", flush=True)
with jax.profiler.trace(f"/tmp/jxtrace_b{B}"):
    y = g(p, y)
    _ = float(y.sum())
from trace_agg import report

report(f"/tmp/jxtrace_b{B}", top_n=25, divisor=8.0)
