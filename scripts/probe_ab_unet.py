"""TPU A/B probe: isolate the UNet eval regression (proj 28 -> 80 ms).

Suspects: the fused subposition upsample (_up2_conv, UP2_FUSED) and the
up-path planar gate change (UP_GATE_IN_LIMIT, ADVICE #2 fix). Times the
proj model under all four combos and the img model with fused on/off.
Round-1 reference points: proj 28.0 ms, img 18.4 ms (bf16, chained).

Run alone: timeout 4000 python scripts/probe_ab_unet.py
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

import ipdm_tpu.models.unet as unet  # noqa: E402

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


xi = jnp.asarray(host.random((1, 512, 512, 1), np.float32))
xp = jnp.asarray(host.random((1, 2000, 912, 1), np.float32))
tvec = jnp.full((1,), 10, jnp.int32)


def build(kind):
    if kind == "img":
        m = unet.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(16,),
                           channel_mult=(1, 1, 2, 2, 4, 4),
                           dtype=jnp.bfloat16)
        x = xi
    else:
        m = unet.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(32,),
                           channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                           dtype=jnp.bfloat16)
        x = xp
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x, tvec)
    return jax.jit(lambda xx: m.apply(p, xx, tvec)), x


# warm-up discard
unet.UP2_FUSED, unet.UP_GATE_IN_LIMIT = False, False
f, x = build("img")
timed("warmup img F,F (discard)", f, x, reps=5)
timed("img fused=F (round-1 config)", f, x)

unet.UP2_FUSED = True
f, x = build("img")
timed("img fused=T", f, x)

for fused, gate in ((False, False), (True, False), (False, True),
                    (True, True)):
    unet.UP2_FUSED, unet.UP_GATE_IN_LIMIT = fused, gate
    f, x = build("proj")
    tag = f"proj fused={'T' if fused else 'F'} gate={'T' if gate else 'F'}"
    timed(tag, f, x)
