"""Space-to-depth lowering probe for the shallow planar conv units: fold
2x2 spatial blocks into channels so the 3x3 small-C conv becomes a dense
4Cx4O conv at half resolution on the MXU (1.78x the FLOPs, ~20x the
utilization), vs the planar_unit VPU kernel (at its ~1 FMA-issue/cycle
floor) . Includes the planar<->s2d transposes in the timing. Parity
checked against planar_unit per shape."""
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


def build_w2(w):
    """[3,3,C,O] -> s2d-domain [3,3,4C,4O]; in-ch (a*2+b)*C+c, out-ch
    (p*2+q)*O+o."""
    C, O = w.shape[2], w.shape[3]
    W2 = jnp.zeros((3, 3, 4 * C, 4 * O), w.dtype)
    for p in range(2):
        for q in range(2):
            for dh in range(3):
                for dw in range(3):
                    t, u = p + dh - 1, q + dw - 1
                    R, a = 1 + t // 2, t % 2
                    S, b = 1 + u // 2, u % 2
                    bi, bo = a * 2 + b, p * 2 + q
                    W2 = W2.at[R, S, bi * C:(bi + 1) * C,
                               bo * O:(bo + 1) * O].set(w[dh, dw])
    return W2


def s2d_unit(x, a, bb, w, bias, skip=None, act=True):
    B, C, H, W = x.shape
    O = w.shape[3]
    xs = x.reshape(B, C, H // 2, 2, W // 2, 2)
    xs = xs.transpose(0, 2, 4, 3, 5, 1).reshape(B, H // 2, W // 2, 4 * C)
    a4 = jnp.tile(a, (1, 4))[:, None, None, :]
    b4 = jnp.tile(bb, (1, 4))[:, None, None, :]
    xh = xs.astype(jnp.float32) * a4 + b4
    if act:
        xh = jax.nn.silu(xh)
    xh = xh.astype(x.dtype)
    W2 = build_w2(w).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xh, W2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.tile(bias, (1, 4))[:, None, None, :].astype(y.dtype)
    y = y.reshape(B, H // 2, W // 2, 2, 2, O)
    y = y.transpose(0, 5, 1, 3, 2, 4).reshape(B, O, H, W)
    if skip is not None:
        y = y + skip
    return y


SHAPES = [
    (8, 8, 2000, 912, True, True, 5),
    (8, 8, 2000, 912, True, False, 1),
    (16, 8, 2000, 912, True, False, 1),
    (12, 8, 2000, 912, True, False, 1),
    (4, 8, 2000, 912, True, False, 1),
    (8, 16, 1000, 456, True, False, 1),
    (8, 1, 2000, 912, True, False, 1),
    (16, 16, 500, 228, True, False, 2),   # currently einsum (CO=256)
]

REPS = 8
rng = np.random.default_rng(0)
tot = {"v2": 0.0, "s2d": 0.0}
for C, O, H, W, act, skip, n in SHAPES:
    x = jnp.asarray(rng.normal(0, 1, (1, C, H, W)).astype(np.float32),
                    jnp.bfloat16)
    a = jnp.asarray(rng.normal(1, .2, (1, C)).astype(np.float32))
    bb = jnp.asarray(rng.normal(0, .2, (1, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, .3, (3, 3, C, O)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, .2, (1, O)).astype(np.float32))
    sk = (jnp.asarray(rng.normal(0, 1, (1, O, H, W)).astype(np.float32),
                      jnp.bfloat16) if skip else None)
    line = f"C{C:2d}->O{O:2d} {H}x{W} sk={int(skip)}:"

    def mk(fn):
        def prog_fn(xx):
            def body(c, _):
                y = fn(c)
                s = jnp.asarray(y, jnp.float32).mean() * 1e-6
                return jnp.asarray(c * 0.999 + jnp.asarray(s, c.dtype),
                                   c.dtype), ()
            out, _ = jax.lax.scan(body, xx, None, length=REPS)
            return out
        return jax.jit(prog_fn)

    variants = {
        "v2": mk(lambda c: planar_unit(c, a, bb, w, bias, sk, act=act,
                                       ht=64, v2=True)),
        "s2d": mk(lambda c: s2d_unit(c, a, bb, w, bias, sk, act=act)),
    }
    outs = {}
    for tag, prog in variants.items():
        y = prog(x); _ = float(y.astype(jnp.float32).sum())
        t0 = time.time()
        calls = 3
        for _ in range(calls):
            y = prog(y)
        _ = float(y.astype(jnp.float32).sum())
        dt = (time.time() - t0) / calls / REPS * 1e3
        outs[tag] = np.asarray(jnp.asarray(y, jnp.float32))
        line += f"  {tag} {dt:6.2f}ms"
        tot[tag] += dt * n
    d = np.abs(outs["v2"] - outs["s2d"]).max()
    line += f"  chain|d| {d:.2e}"
    print(line, flush=True)
print(f"totals over counted units: v2 {tot['v2']:.2f} ms, "
      f"s2d {tot['s2d']:.2f} ms", flush=True)
