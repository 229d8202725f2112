"""A/B probe: FP kernel variants (v1 roll-deposit, v2 plane-deposit,
v3 batched roll-deposit) + BP at folded/full view counts, production
shapes. Timing is dependency-chained (each rep's input depends on the
previous output, one scalar readback per measurement) and the whole suite
runs TWICE so relay drift is visible. Run alone:
  timeout 3000 python scripts/probe_fp_ab.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from ipdm_tpu.utils.comp_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402
from ipdm_tpu.ops.pallas.shift import (bp_shift_accumulate_batched,  # noqa
                                       fp_plane_deposit, fp_shift_deposit,
                                       fp_shift_deposit_batched)

print("device:", jax.devices()[0], flush=True)
host = np.random.default_rng(0)
n = 512
Kf = 2


def timed(name, fn, x0, reps=4):
    t0 = time.time()
    out = fn(x0)
    s = float(jnp.asarray(out).sum())
    print(f"  {name}: compile {time.time()-t0:.1f}s sum={s:.4g}", flush=True)
    t0 = time.time()
    for _ in range(reps):
        x = x0 + out.reshape(-1)[0] * 1e-12   # chain: input <- prev output
        out = fn(x)
    _ = float(out.reshape(-1)[0])
    print(f"  {name}: {(time.time()-t0)/reps*1e3:.0f} ms (n={reps}, chained)",
          flush=True)


# ---- shared flat-layout tables (v2/v3 contract), V=1000 -----------------
V = 1000
Lq = 1234
Lfp = ((Kf * Lq + 384) // 128 + 1) * 128
o_int = np.clip((host.random((V, n)) * (Lq - n - 4) * Kf).astype(np.int64),
                0, None)
s0f = jnp.asarray(((o_int % Kf) * Lq + o_int // Kf).astype(np.int32))
o1 = o_int + 1
s1f = jnp.asarray(((o1 % Kf) * Lq + o1 // Kf).astype(np.int32))
w0j = jnp.asarray(host.random((V, n)).astype(np.float32))
w1j = jnp.asarray(host.random((V, n)).astype(np.float32))

# ---- v1 stuffed-row tables (production project_fast config) -------------
W1 = n * Kf
Lf_old = ((int(o_int.max()) + W1 + 2 + 256) // 128 + 1) * 128
s0o = jnp.asarray(np.minimum(o_int, Lf_old - W1 - 129).astype(np.int32))
s1o = jnp.asarray(np.minimum(o_int + 1, Lf_old - W1 - 129).astype(np.int32))
rows_st = jnp.asarray(host.random((n, W1)).astype(np.float32))

# ---- BP tables ----------------------------------------------------------
Lpad = 3072
bp_in = {}
for Vb in (1000, 2000):
    sb = jnp.asarray((host.random((Vb, n)) * (Lpad - n - 256)).astype(
        np.int32))
    fr = jnp.asarray(host.random((Vb, n)).astype(np.float32))
    Q = jnp.asarray(host.random((Vb, 3, Lpad)).astype(np.float32))
    bp_in[Vb] = (Q, sb, fr)

for pas in (1, 2):
    print(f"pass {pas}:", flush=True)
    for B in (1, 3):
        rows = jnp.asarray(host.random((n, B, n)).astype(np.float32))
        timed(f"fp_v3_batched V={V} B={B}",
              lambda x: fp_shift_deposit_batched(x, s0f, s1f, w0j, w1j, Lfp),
              rows)
        timed(f"fp_v2_plane   V={V} B={B}",
              lambda x: fp_plane_deposit(x, s0f, s1f, w0j, w1j, Lfp),
              rows)
    timed(f"fp_v1_stuffed V={V} B=1",
          lambda x: fp_shift_deposit(x, s0o, s1o, w0j, w1j, Lf_old),
          rows_st)
    for Vb in (1000, 2000):
        Q, sb, fr = bp_in[Vb]
        timed(f"bp_batched V={Vb} B=3",
              lambda x, sb=sb, fr=fr: bp_shift_accumulate_batched(
                  x, sb, jnp.minimum(sb + 1, Lpad - n - 256), fr, n),
              Q)
