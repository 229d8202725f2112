"""Locate the proj-UNet's in-situ time per pyramid level.

The corrected perf model (docs/PERF.md) says the full proj eval runs at
~11 TF/s while the same deep convs hit ~50 TF/s in isolation — GN/silu,
attention and conv lowering were each ruled out by no-op probes. This
probe takes the complement: time the full model and channel_mult
TRUNCATIONS (dropping levels from the deep end), same process, chained
reps, one scalar readback. T(M_k) - T(M_{k-1}) isolates the in-situ
incremental cost of level k (plus the middle-block delta, noted per row).

Usage: python scripts/probe_proj_levels.py [reps]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.models.unet import UNetModel

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
FULL_MULT = (0.0625, 0.125, 0.25, 2, 2, 4, 4)
ATTN = (16, 32)
X = jnp.asarray(np.random.default_rng(0).random((1, 2000, 912, 1)),
                jnp.float32)
T = jnp.zeros((1,), jnp.int32)


def flops(model, x):
    c = jax.jit(lambda p, a, b: model.apply(p, a, b)).lower(
        model.init(jax.random.PRNGKey(0), x, T), x, T).compile()
    return c.cost_analysis().get("flops", 0.0)


def bench_model(mult, label):
    m = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                  num_res_blocks=2, attention_resolutions=ATTN,
                  channel_mult=mult, dtype=jnp.bfloat16)
    p = jax.jit(m.init)(jax.random.PRNGKey(0), X, T)
    f = jax.jit(lambda pp, a: m.apply(pp, a, T))
    y = f(p, X)
    _ = float(y.sum())                      # compile + settle
    t0 = time.time()
    y = X
    for _ in range(REPS):
        y = f(p, y[..., :1] if y.shape[-1] != 1 else y)
    _ = float(y.sum())                      # one readback fences the chain
    dt = (time.time() - t0) / REPS
    gf = flops(m, X) / 1e9
    print(f"{label:28s} {dt*1e3:8.2f} ms  {gf:7.1f} GFLOP "
          f"{gf/dt/1e3:6.1f} TF/s")
    return dt


print(f"device: {jax.devices()[0].device_kind}  reps={REPS}")
prev = None
for k in range(2, len(FULL_MULT) + 1):
    mult = FULL_MULT[:k]
    dt = bench_model(mult, f"levels<= {k-1} mult={mult}")
    if prev is not None:
        print(f"{'':28s} Δ level {k-1}: {(dt-prev)*1e3:+8.2f} ms")
    prev = dt
