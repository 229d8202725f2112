"""Round-5 TPU A/B: planar_unit v1 (fori_loop + VMEM acc RMW) vs v2
(fully unrolled, SSA/vreg accumulators, 8-row halo blocks) on the EXACT
fused-unit shapes of the flagship proj UNet (traced via eval_shape spy:
stem 1->4, 4->8, 8->8 [+skip], 8->16 @1000x456, 16->8, 12->8, 8->1, all
2000x912 unless noted). The round-4 trace at HEAD puts the planar_unit
custom calls at 12.8 ms/eval — the #1 band of the 56 ms proj eval — at
~8x the HBM bandwidth floor, so the kernel body (not DMA) is the cost.

Run on TPU, alone on the box:
    python scripts/probe_planar_v2r5.py [ht...]
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

from ipdm_tpu.ops.pallas.planar import planar_unit

SHAPES = [  # (C, O, H, W, act, skip)
    (1, 4, 2000, 912, False, False),
    (4, 8, 2000, 912, True, False),
    (8, 8, 2000, 912, True, True),
    (8, 8, 2000, 912, True, False),
    (8, 16, 1000, 456, True, False),
    (16, 8, 2000, 912, True, False),
    (12, 8, 2000, 912, True, False),
    (8, 1, 2000, 912, True, False),
]

REPS = 10


def time_unit(C, O, H, W, act, has_skip, v2, ht, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, C, H, W), np.float32), dtype)
    a = jnp.asarray(rng.random((1, C), np.float32) * 0.1 + 1)
    bb = jnp.asarray(rng.random((1, C), np.float32) * 0.1)
    w = jnp.asarray(rng.random((3, 3, C, O), np.float32) * 0.1)
    bias = jnp.asarray(rng.random((1, O), np.float32) * 0.1)
    skip = (jnp.asarray(rng.random((1, O, H, W), np.float32), dtype)
            if has_skip else None)

    def f(x):
        def body(c, _):
            y = planar_unit(c, a, bb, w, bias, skip, act=act, ht=ht, v2=v2)
            # scalar coupling: forces sequential execution across reps
            # without requiring C == O
            s = jnp.mean(y.astype(jnp.float32)) * 1e-6
            return (c * (1 + s.astype(c.dtype))).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    g = jax.jit(f)
    y = g(x); _ = float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    y = g(y); _ = float(jnp.asarray(y, jnp.float32).sum())
    dt = (time.time() - t0) / REPS * 1e3
    gb = ((C + O * (2 if has_skip else 1)) * H * W
          * jnp.dtype(dtype).itemsize) / 1e9
    print(f"  C{C:>2}->O{O:<2} {H}x{W} act={int(act)} skip="
          f"{int(has_skip)} v2={int(v2)} ht={ht}: {dt:7.3f} ms "
          f"({gb / dt * 1e3:5.0f} GB/s min-traffic)", flush=True)
    return dt


def main():
    hts = [int(a) for a in sys.argv[1:]] or [64]
    total = {}
    for v2 in (False, True):
        for ht in hts:
            key = (v2, ht)
            tot = 0.0
            print(f"--- v2={v2} ht={ht}", flush=True)
            for C, O, H, W, act, sk in SHAPES:
                # weight by per-eval occurrence: 8->8+skip appears 5x
                mult = 5 if (C, O, sk) == (8, 8, True) else 1
                tot += mult * time_unit(C, O, H, W, act, sk, v2, ht)
            total[key] = tot
            print(f"  TOTAL (occurrence-weighted): {tot:.2f} ms/eval",
                  flush=True)
    best = min(total, key=total.get)
    print(f"best: v2={best[0]} ht={best[1]} -> {total[best]:.2f} ms/eval "
          f"(v1 ht=64 baseline {total.get((False, 64), float('nan')):.2f})",
          flush=True)


if __name__ == "__main__":
    main()
