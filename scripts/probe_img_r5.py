"""Round-5: first per-HLO device trace of the IMG UNet eval (512², the
other half of the slice cost — 22.1 ms/eval in r4, never traced; VERDICT
r4 weak #1 asks what it is made of). Same methodology as
probe_r4_proj.py prof: 8 chained evals in one scan program, a
jax.profiler trace, aggregate with scripts/trace_agg.py /tmp/jxtrace_img
25 8.

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

from ipdm_tpu.models.unet import UNetModel

img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(8, 16),
                      channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)
k = jax.random.PRNGKey(0)
tvec = jnp.zeros((1,), jnp.int32)
x = jnp.asarray(np.random.default_rng(1).random((1, 512, 512, 1),
                                                np.float32))
p = jax.jit(img_model.init)(k, x, tvec)
jax.block_until_ready(p)


def f(p, x):
    def body(c, _):
        y = img_model.apply(p, c, tvec)
        return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype), c.dtype), ()
    out, _ = jax.lax.scan(body, x, None, length=8)
    return out


g = jax.jit(f)
y = g(p, x); _ = float(y.sum())
t0 = time.time(); y = g(p, y); _ = float(y.sum())
print(f"img scan-eval: {(time.time() - t0) / 8 * 1e3:.1f} ms/eval",
      flush=True)
with jax.profiler.trace("/tmp/jxtrace_img"):
    y = g(p, y)
    _ = float(y.sum())
print("trace written to /tmp/jxtrace_img", flush=True)
