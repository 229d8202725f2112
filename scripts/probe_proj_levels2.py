"""Proj-UNet per-level in-situ cost, v2 (round-3 host).

Same whole-program differencing as probe_proj_levels.py, but only the
k >= 4 truncations: executing the k<=3 (fractional-channel-only) models
reproducibly CRASHES this host's TPU worker ("kernel fault", observed
twice on 2026-08-19), while the full model runs fine. Δ(k) isolates deep
level k; the shallow planar stack = T(k=4) minus its deep remainder.

Usage: python scripts/probe_proj_levels2.py [reps]
"""
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from ipdm_tpu.utils.comp_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.models.unet import UNetModel

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
FULL_MULT = (0.0625, 0.125, 0.25, 2, 2, 4, 4)
ATTN = (16, 32)
X = jnp.asarray(np.random.default_rng(0).random((1, 2000, 912, 1)),
                jnp.float32)
T = jnp.zeros((1,), jnp.int32)


def bench_model(mult, label):
    m = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                  num_res_blocks=2, attention_resolutions=ATTN,
                  channel_mult=mult, dtype=jnp.bfloat16)
    p = jax.jit(m.init)(jax.random.PRNGKey(0), X, T)

    def f(pp, x):
        def body(c, _):
            y = m.apply(pp, c, T)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                               c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    g = jax.jit(f)
    y = g(p, X)
    _ = float(y.sum())
    t0 = time.time()
    y = g(p, y)
    _ = float(y.sum())
    dt = (time.time() - t0) / REPS
    print(f"{label:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


print(f"device: {jax.devices()[0].device_kind}  reps={REPS}", flush=True)
prev = None
for k in range(4, len(FULL_MULT) + 1):
    mult = FULL_MULT[:k]
    dt = bench_model(mult, f"levels<={k-1} mult={mult}")
    if prev is not None:
        print(f"{'':34s} Δ level {k-1}: {(dt-prev)*1e3:+8.2f} ms",
              flush=True)
    prev = dt
