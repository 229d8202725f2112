"""TPU probe: img/proj UNet eval times after the fused 2x-upsample conv.

Baselines (round 1, bf16): img 512^2 18.4 ms, proj 2000x912 28.0 ms.
The fused _up2_conv applies to every even-size (dst == 2*src) upsample:
all img upsamples, and the proj deep ups whose sizes are even.

Timing: dependency-chained reps, one scalar readback (axon relay rules).
Run alone: timeout 1800 python scripts/probe_eval2.py
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

from ipdm_tpu.models.unet import UNetModel  # noqa: E402

print("device:", jax.devices()[0], flush=True)
host = np.random.default_rng(0)


def timed(name, fn, x0, reps=20):
    t0 = time.time()
    out = fn(x0)
    _ = float(out.sum())
    print(f"{name}: compile+1st {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        x0 = x0 + out[0, 0, 0, 0] * 1e-12   # chain
        out = fn(x0)
    _ = float(out.sum())
    print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms (n={reps}, chained)",
          flush=True)


img = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                num_res_blocks=2, attention_resolutions=(16,),
                channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)
proj = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                 num_res_blocks=2, attention_resolutions=(32,),
                 channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                 dtype=jnp.bfloat16)

xi = jnp.asarray(host.random((1, 512, 512, 1), np.float32))
xp = jnp.asarray(host.random((1, 2000, 912, 1), np.float32))
tvec = jnp.full((1,), 10, jnp.int32)

pi = jax.jit(img.init)(jax.random.PRNGKey(0), xi, tvec)
pp = jax.jit(proj.init)(jax.random.PRNGKey(1), xp, tvec)

fi = jax.jit(lambda x: img.apply(pi, x, tvec))
fp = jax.jit(lambda x: proj.apply(pp, x, tvec))

# warm-up discard (first measurement of a process is relay-inflated)
timed("warmup img (discard)", fi, xi, reps=5)
timed("img 512^2 bf16", fi, xi)
timed("proj 2000x912 bf16", fp, xp)
