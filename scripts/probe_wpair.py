"""A/B probe: WPAIR_N64 (W-packed Co<128 convs → full MXU fill) on the
img (512²) and proj (2000×912) UNets, bf16, flagship archs. Whole-eval
chained timing, both variants compiled in one process, run twice for
drift.
  timeout 3000 python scripts/probe_wpair.py
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

fns = {}
xs = {}
for name, (shape, kw) in cases.items():
    x = jnp.asarray(host.standard_normal(shape).astype(np.float32))
    xs[name] = x
    m = um.UNetModel(**kw)
    params = jax.jit(m.init)(rng, x, tvec)
    for flag in (False, True):
        um.WPAIR_N64 = flag
        fns[name, flag] = jax.jit(
            lambda h, _m=m, _p=params: _m.apply(_p, h, tvec) + h)
        t0 = time.time()
        y = jax.block_until_ready(fns[name, flag](x))
        print(f"compile {name} wpack={flag}: {time.time()-t0:.1f}s "
              f"sum={float(jnp.sum(y)):.4g}", flush=True)
    a = np.asarray(fns[name, False](x), np.float32)
    b = np.asarray(fns[name, True](x), np.float32)
    print(f"{name} parity: max|d|={np.abs(a-b).max():.3e} (bf16)",
          flush=True)

# extra proj variants:
#  vpu256 — VPU unroll raised to 256: the 16ch planar convs
#           (cin*cout=256) run as one fused FMA pass instead of nine
#           M-stream einsums
#  pconv  — every stride-1 planar conv through the single-pass Pallas
#           kernel (ops/pallas/planar_conv.py)
um.WPAIR_N64 = True
for tag, setup in (("vpu256", lambda: setattr(um, "VPU_UNROLL_MAX", 256)),
                   ("pconv", lambda: setattr(um, "PLANAR_PALLAS_CONV",
                                             True))):
    old = (um.VPU_UNROLL_MAX, um.PLANAR_PALLAS_CONV)
    setup()
    _mv = um.UNetModel(**cases["proj"][1])
    _pv = jax.jit(_mv.init)(rng, xs["proj"], tvec)
    fns["proj", tag] = jax.jit(
        lambda h, _m=_mv, _p=_pv: _m.apply(_p, h, tvec) + h)
    t0 = time.time()
    try:
        y = jax.block_until_ready(fns["proj", tag](xs["proj"]))
        print(f"compile proj {tag}: {time.time()-t0:.1f}s "
              f"sum={float(jnp.sum(y)):.4g}", flush=True)
    except Exception as e:
        print(f"proj {tag} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        del fns["proj", tag]
    um.VPU_UNROLL_MAX, um.PLANAR_PALLAS_CONV = old


def timed(name, fn, x0, reps=12):
    h = x0
    t0 = time.time()
    for _ in range(reps):
        h = fn(h)                      # chained: input <- prev output
    s = float(jnp.sum(h))
    print(f"  {name}: {(time.time()-t0)/reps*1e3:.1f} ms "
          f"(n={reps}, chained) sum={s:.4g}", flush=True)


# B=2 variants: if a 2-slice batch costs <2x a 1-slice eval, batching
# lifts the slices/sec headline directly
for name in cases:
    x2 = jnp.concatenate([xs[name], xs[name] * 0.7], axis=0)
    xs[name + "B2"] = x2
    t0 = time.time()
    y = jax.block_until_ready(fns[name, True](x2))
    print(f"compile {name} B2: {time.time()-t0:.1f}s "
          f"sum={float(jnp.sum(y)):.4g}", flush=True)

for pas in (1, 2):
    print(f"pass {pas}:", flush=True)
    for name in cases:
        timed(f"{name} eval wpack=off", fns[name, False], xs[name])
        timed(f"{name} eval wpack=on ", fns[name, True], xs[name])
        timed(f"{name} eval wpack B=2 ", fns[name, True],
              xs[name + "B2"])
    for tag in ("vpu256", "pconv"):
        if ("proj", tag) in fns:
            timed(f"proj eval wpack+{tag}", fns["proj", tag], xs["proj"])
