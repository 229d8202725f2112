"""A/B the v2 (unrolled, register-acc, single-row-halo) planar_unit
kernel against v1 on the real proj-UNet unit shapes, with an ht sweep.
One jitted scan per variant (8 chained kernel calls, scalar feedback) —
eager chaining drowns ms-scale kernels in dispatch overhead."""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ipdm_tpu.utils.comp_cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from ipdm_tpu.ops.pallas.planar import planar_unit

# (C, O, H, W, act, skip, per-eval count) — from the proj UNet trace
SHAPES = [
    (8, 8, 2000, 912, True, True, 5),
    (8, 8, 2000, 912, True, False, 1),
    (16, 8, 2000, 912, True, False, 1),
    (12, 8, 2000, 912, True, False, 1),
    (4, 8, 2000, 912, True, False, 1),
    (8, 16, 1000, 456, True, False, 1),
    (8, 1, 2000, 912, True, False, 1),
    (1, 4, 2000, 912, False, False, 1),
]

REPS = 8
rng = np.random.default_rng(0)
hts = [int(h) for h in (sys.argv[1:] or ["64"])]
tot = {}
for C, O, H, W, act, skip, n in SHAPES:
    x = jnp.asarray(rng.normal(0, 1, (1, C, H, W)).astype(np.float32),
                    jnp.bfloat16)
    a = jnp.asarray(rng.normal(1, .2, (1, C)).astype(np.float32))
    bb = jnp.asarray(rng.normal(0, .2, (1, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, .3, (3, 3, C, O)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, .2, (1, O)).astype(np.float32))
    sk = (jnp.asarray(rng.normal(0, 1, (1, O, H, W)).astype(np.float32),
                      jnp.bfloat16) if skip else None)
    gfma = C * O * 9 * H * W / 1e9
    line = f"C{C:2d}->O{O:2d} {H}x{W} act={int(act)} sk={int(skip)} " \
           f"({gfma:.2f} GFMA):"
    best = None
    for v2 in (False, True):
        for ht in (hts if v2 else [64]):
            def prog_fn(xx, v2=v2, ht=ht):
                def body(c, _):
                    y = planar_unit(c, a, bb, w, bias, sk, act=act,
                                    ht=ht, v2=v2)
                    s = jnp.asarray(y, jnp.float32).mean() * 1e-6
                    return jnp.asarray(
                        c * 0.999 + jnp.asarray(s, c.dtype), c.dtype), ()
                out, _ = jax.lax.scan(body, xx, None, length=REPS)
                return out
            prog = jax.jit(prog_fn)
            y = prog(x); _ = float(y.astype(jnp.float32).sum())
            t0 = time.time()
            calls = 3
            for _ in range(calls):
                y = prog(y)
            _ = float(y.astype(jnp.float32).sum())
            dt = (time.time() - t0) / calls / REPS * 1e3
            tag = f"v2/ht{ht}" if v2 else "v1"
            line += f"  {tag} {dt:6.2f}ms"
            if v2 and (best is None or dt < best):
                best = dt
    print(line, flush=True)
    tot.setdefault("v2best", 0.0)
    tot["v2best"] += best * n
print(f"per-eval total over counted units, v2 best-ht: "
      f"{tot['v2best']:.2f} ms", flush=True)
