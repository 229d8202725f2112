"""Bisect the round-2-host UNet eval regression: the 3.56 s/slice headline
was recorded before 3e8c011 (VPU scalar-FMA planar convs), 7959c4c
(flash-attention) and be870db (GN one-pass) landed; on this host the proj
eval measures ~86 ms vs the recorded 28 ms. A/B each landed default.
  timeout 3000 python scripts/probe_host_bisect.py
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

import ipdm_tpu.models.unet as um  # noqa: E402

print("device:", jax.devices()[0], flush=True)

rng = jax.random.PRNGKey(0)
tvec = jnp.zeros((1,), jnp.int32)
host = np.random.default_rng(0)

cases = {
    "img ": ((1, 512, 512, 1), dict(
        in_channels=1, model_channels=64, out_channels=1,
        num_res_blocks=2, attention_resolutions=(8, 16),
        channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)),
    "proj": ((1, 2000, 912, 1), dict(
        in_channels=1, model_channels=64, out_channels=1,
        num_res_blocks=2, attention_resolutions=(16, 32),
        channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
        dtype=jnp.bfloat16)),
}

# variant -> (VPU_UNROLL_MAX, FLASH_MIN_SEQ)
variants = {
    "base(vpu64,flash)": (64, 4096),
    "vpu0      ": (0, 4096),
    "noflash   ": (64, 10 ** 9),
    "vpu0+noflash": (0, 10 ** 9),
}

fns = {}
xs = {}
for name, (shape, kw) in cases.items():
    x = jnp.asarray(host.standard_normal(shape).astype(np.float32))
    xs[name] = x
    m = um.UNetModel(**kw)
    params = jax.jit(m.init)(rng, x, tvec)
    vlist = (list(variants) if name == "proj"
             else ["base(vpu64,flash)", "noflash   "])
    for v in vlist:
        um.VPU_UNROLL_MAX, um.FLASH_MIN_SEQ = variants[v]
        fns[name, v] = jax.jit(
            lambda h, _m=m, _p=params: _m.apply(_p, h, tvec) + h)
        t0 = time.time()
        y = jax.block_until_ready(fns[name, v](x))
        print(f"compile {name} {v}: {time.time()-t0:.1f}s "
              f"sum={float(jnp.sum(y)):.4g}", flush=True)
um.VPU_UNROLL_MAX, um.FLASH_MIN_SEQ = 64, 4096


def timed(name, fn, x0, reps=12):
    h = x0
    t0 = time.time()
    for _ in range(reps):
        h = fn(h)
    s = float(jnp.sum(h))
    print(f"  {name}: {(time.time()-t0)/reps*1e3:.1f} ms "
          f"(n={reps}, chained) sum={s:.4g}", flush=True)


for pas in (1, 2):
    print(f"pass {pas}:", flush=True)
    for (name, v), fn in fns.items():
        timed(f"{name} {v}", fn, xs[name])
