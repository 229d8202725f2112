"""Round-4 session-3 host baseline: dispatch + proj/img eval B=1 with
current defaults (fused planar unit CO<=160, flash blocks, smallC=stack).
Chained scan-eval timing ended by a scalar readback."""
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


def log(*a):
    print(*a, flush=True)


dev = jax.devices()[0]
log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
x = jnp.ones((8, 128), jnp.float32)
f = jax.jit(lambda h: h * 1.0000001 + 0.0)
x = f(x); _ = float(x.sum())
t0 = time.time()
for _ in range(50):
    x = f(x)
_ = float(x.sum())
log(f"tiny-op chained dispatch: {(time.time()-t0)/50*1e3:.2f} ms/call")

rng = np.random.default_rng(1)
for kind in ("proj", "img"):
    if kind == "proj":
        model = U.UNetModel(in_channels=1, model_channels=64,
                            out_channels=1, num_res_blocks=2,
                            attention_resolutions=(16, 32),
                            channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                            dtype=jnp.bfloat16)
        H, W = 2000, 912
    else:
        model = U.UNetModel(in_channels=1, model_channels=64,
                            out_channels=1, num_res_blocks=2,
                            attention_resolutions=(16,),
                            channel_mult=(1, 1, 2, 2, 4, 4),
                            dtype=jnp.bfloat16)
        H, W = 512, 512
    x1 = jnp.asarray(rng.random((1, H, W, 1), np.float32))
    tv = jnp.zeros((1,), jnp.int32)
    p = jax.jit(model.init)(jax.random.PRNGKey(0), x1, tv)
    jax.block_until_ready(p)
    reps = 8

    @jax.jit
    def prog(p, h):
        def body(c, _):
            y = model.apply(p, c, tv)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                               c.dtype), ()
        out, _ = jax.lax.scan(body, h, None, length=reps)
        return out

    t0 = time.time()
    x1 = prog(p, x1); _ = float(x1.sum())
    log(f"{kind}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    calls = 3
    for _ in range(calls):
        x1 = prog(p, x1)
    _ = float(x1.sum())
    log(f"{kind} bf16 B=1: {(time.time()-t0)/calls/reps*1e3:.2f} ms/eval")
log("done")
