"""In-context TPU A/B of the fused planar unit kernel (PLANAR_FUSED) vs
the incumbent per-output-channel stack lowering, full proj + img UNet
evals, chained-scan timing. Also sweeps the kernel's H-block size.

Run on TPU (default env), alone on the box:
    python scripts/probe_planar_fused.py [proj|img|ht]
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

k1 = jax.random.PRNGKey(0)
tvec = jnp.zeros((1,), jnp.int32)


def build_and_time(kind, fused, ht=64, reps=8, max_co=None):
    U.PLANAR_FUSED = "1" if fused else "0"
    U.PLANAR_FUSED_HT = ht
    if max_co is not None:
        U.PLANAR_FUSED_MAX_CO = max_co
    if kind == "proj":
        model = U.UNetModel(in_channels=1, model_channels=64,
                            out_channels=1, num_res_blocks=2,
                            attention_resolutions=(16, 32),
                            channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                            dtype=jnp.bfloat16)
        shape = (1, 2000, 912, 1)
    else:
        model = U.UNetModel(in_channels=1, model_channels=64,
                            out_channels=1, num_res_blocks=2,
                            attention_resolutions=(16,),
                            channel_mult=(1, 1, 2, 2, 4, 4),
                            dtype=jnp.bfloat16)
        shape = (1, 512, 512, 1)
    x = jnp.asarray(np.random.default_rng(1).random(shape, np.float32))
    p = jax.jit(model.init)(k1, x, tvec)
    jax.block_until_ready(p)

    def f(p, h):
        def body(c, _):
            y = model.apply(p, c, tvec)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                               c.dtype), ()
        out, _ = jax.lax.scan(body, h, None, length=reps)
        return out

    g = jax.jit(f)
    t0 = time.time()
    y = g(p, x); _ = float(y.sum())
    print(f"{kind} fused={fused} ht={ht}: compile+first "
          f"{time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    y = g(p, y); _ = float(y.sum())
    print(f"{kind} fused={fused} ht={ht}: "
          f"{(time.time()-t0)/reps*1e3:.1f} ms/eval", flush=True)
    return np.asarray(jnp.asarray(y, jnp.float32))


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "proj"):
    y1 = build_and_time("proj", True)
    y0 = build_and_time("proj", False)
    print("proj context max|d| (8 chained evals, bf16):",
          float(np.max(np.abs(y1 - y0))), flush=True)
if which in ("all", "img"):
    # img has no planar levels at channel_mult=(1,...) — expect a wash
    z1 = build_and_time("img", True)
    z0 = build_and_time("img", False)
    print("img context max|d|:", float(np.max(np.abs(z1 - z0))),
          flush=True)
if which == "ht":
    for ht in (32, 64, 128, 256):
        build_and_time("proj", True, ht=ht)
if which == "co":
    # per-unit engine gate sweep: 0=incumbent everywhere, 112=small-CO
    # units fused, big ones einsum+composed affine, huge=all fused
    for co in (112, 10 ** 9, 160, 64):
        build_and_time("proj", True, max_co=co)
if which == "co5":
    # round-5 sweep with the v2 body: does the 16->16 (CO=256) unit pair
    # now beat its einsum lowering? planar.py v2 guard allows CO<=256.
    for co in (160, 256):
        build_and_time("proj", True, max_co=co)
if which == "co5b":
    # with the C>=16 8-channel split (r5): 24->8 (CO=192) = 3 chained
    # C=8 kernels, 16->16 (CO=256) = 2 chained 8->16 kernels — re-sweep
    # the gate now that wide-C units no longer hit the slow v2 body
    for co in (192, 256):
        build_and_time("proj", True, max_co=co)
print("done", flush=True)
