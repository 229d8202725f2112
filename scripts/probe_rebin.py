"""A/B probe: Pallas rebin_view_lerp vs XLA flat-gather rebin inside the
full fbp_convert_fast program (production Siemens geometry, B=3).
Parity check + dependency-chained timing, suite run twice for drift.
  timeout 3000 python scripts/probe_rebin.py
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

import ipdm_tpu.recon.fbp_fast as ff  # noqa: E402
from ipdm_tpu.recon.fbp import SIEMENS_FBP  # noqa: E402

print("device:", jax.devices()[0], flush=True)
host = np.random.default_rng(0)
pj0 = jnp.asarray(host.random((3, 2000, 912), np.float32) * 8.0)

raw = ff.fbp_convert_fast.__wrapped__

ff._REBIN_PALLAS = False
f_off = jax.jit(lambda x: raw(x, SIEMENS_FBP, True))
t0 = time.time()
out_off = jax.block_until_ready(f_off(pj0))
print(f"compile off: {time.time()-t0:.1f}s", flush=True)

ff._REBIN_PALLAS = True
f_on = jax.jit(lambda x: raw(x, SIEMENS_FBP, True))
t0 = time.time()
out_on = jax.block_until_ready(f_on(pj0))
print(f"compile on:  {time.time()-t0:.1f}s", flush=True)

ff._PREP_PALLAS = True
f_all = jax.jit(lambda x: raw(x, SIEMENS_FBP, True))
t0 = time.time()
try:
    out_all = jax.block_until_ready(f_all(pj0))
    print(f"compile on+prep: {time.time()-t0:.1f}s", flush=True)
    d = np.abs(np.asarray(out_all) - np.asarray(out_on)).max()
    print(f"prep parity: max|d|={d:.3e}", flush=True)
except Exception as e:
    print(f"prep-pallas FAILED: {type(e).__name__}: {str(e)[:300]}",
          flush=True)
    f_all = None
ff._PREP_PALLAS = False

a, b = np.asarray(out_off), np.asarray(out_on)
print(f"parity: max|d|={np.abs(a-b).max():.3e} "
      f"rel={np.abs(a-b).max()/max(np.abs(a).max(),1e-9):.3e}", flush=True)


def timed(name, fn, reps=6):
    x = pj0
    out = fn(x)
    t0 = time.time()
    for _ in range(reps):
        x = pj0 + out[0, 0, 0] * 1e-12     # chain: input <- prev output
        out = fn(x)
    s = float(out.sum())
    print(f"  {name}: {(time.time()-t0)/reps*1e3:.0f} ms "
          f"(n={reps}, chained) sum={s:.4g}", flush=True)


for pas in (1, 2):
    print(f"pass {pas}:", flush=True)
    timed("fbp_convert_fast B=3 rebin=XLA   ", f_off)
    timed("fbp_convert_fast B=3 rebin=Pallas", f_on)
    if f_all is not None:
        timed("fbp_convert_fast B=3 rebin+prep  ", f_all)

# --- isolate the BP prep (fine resample + offsets) cost ------------------
from ipdm_tpu.recon.fbp_fast import _plan_for, _prep_group  # noqa: E402

p = ff._plan_for(SIEMENS_FBP)
Mf = SIEMENS_FBP.M // 2
xdm = p.group_xdrive[:Mf]
xd, yd = np.nonzero(xdm)[0], np.nonzero(~xdm)[0]
Pf0 = jnp.asarray(host.random((3, Mf, p.Nt), np.float32))
prep = jax.jit(lambda Pf: jax.tree_util.tree_leaves(
    (_prep_group(Pf, p, xd, True), _prep_group(Pf, p, yd, False)))[0])
out = prep(Pf0)
t0 = time.time()
x = Pf0
for _ in range(6):
    x = Pf0 + out[0, 0, 0] * 1e-12
    out = prep(x)
_ = float(out[0, 0, 0])
print(f"  bp prep (resample+offsets, both drives): "
      f"{(time.time()-t0)/6*1e3:.0f} ms", flush=True)

# --- BP kernel row-unroll A/B (loop-overhead vs VMEM-op bound?) ----------
from ipdm_tpu.ops.pallas.shift import bp_shift_accumulate_batched  # noqa

n, V, B2, Lpad = 512, 1000, 3, 3072
sb = jnp.asarray((host.random((V, n)) * (Lpad - n - 256)).astype(np.int32))
fr = jnp.asarray(host.random((V, n)).astype(np.float32))
Qb = jnp.asarray(host.random((V, B2, Lpad)).astype(np.float32))


def bp_timed(ru, reps=4):
    fn = lambda q: bp_shift_accumulate_batched(
        q, sb, jnp.minimum(sb + 1, Lpad - n - 256), fr, n, row_unroll=ru)
    out = fn(Qb)
    t0 = time.time()
    q = Qb
    for _ in range(reps):
        q = Qb + out[0, 0, 0] * 1e-12
        out = fn(q)
    _ = float(out[0, 0, 0])
    print(f"  bp_batched V={V} B={B2} row_unroll={ru}: "
          f"{(time.time()-t0)/reps*1e3:.0f} ms", flush=True)


for pas in (1, 2):
    print(f"bp pass {pas}:", flush=True)
    for ru in (1, 4, 8):
        bp_timed(ru)
