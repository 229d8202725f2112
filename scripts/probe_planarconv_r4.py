"""A/B the full-res planar small-C conv lowerings at proj shapes
([1,8,2000,912] 8->8, [1,4,2000,912] 4->8): the round-4 HLO dump showed the
per-channel scalar form compiles to one fusion per output channel (input
re-read x8 + DUS stitching, ~20 ms/eval total); the one-pass broadcast
rewrite measured WORSE in the full eval (85.5 -> 135 ms). Candidates here:
  scalar-stack   — per-channel scalar FMA chains + jnp.stack (round-3 form)
  broadcast-sum  — one [B,O,H,W] sum, kvec broadcast over O
  tap-einsum     — 9 x einsum('bchw,co->bohw') (the >64 planar path)
  patch-einsum   — concat 9 taps on C then ONE einsum (K=9*cin)
Chained timing, same process."""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp

B, H, W = 1, 2000, 912
DT = jnp.bfloat16

def shifts(x, s=1):
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    return [xp[:, :, dh:dh + H, dw:dw + W] for dh in range(3)
            for dw in range(3)]

def scalar_stack(x, k, b):
    cin, O = k.shape[2], k.shape[3]
    sh = shifts(x)
    outs = []
    for o in range(O):
        acc = None
        for t9 in range(9):
            dh, dw = divmod(t9, 3)
            for c in range(cin):
                t = k[dh, dw, c, o] * sh[t9][:, c]
                acc = t if acc is None else acc + t
        outs.append(acc + b[o])
    return jnp.stack(outs, axis=1)

def broadcast_sum(x, k, b):
    cin, O = k.shape[2], k.shape[3]
    sh = shifts(x)
    acc = None
    for t9 in range(9):
        dh, dw = divmod(t9, 3)
        for c in range(cin):
            t = k[dh, dw, c][None, :, None, None] * sh[t9][:, c:c + 1]
            acc = t if acc is None else acc + t
    return acc + b[None, :, None, None]

def tap_einsum(x, k, b):
    sh = shifts(x)
    y = None
    for t9 in range(9):
        dh, dw = divmod(t9, 3)
        r = jnp.einsum("bchw,co->bohw", sh[t9], k[dh, dw],
                       preferred_element_type=DT)
        y = r if y is None else y + r
    return y + b[None, :, None, None]

def patch_einsum(x, k, b):
    cin, O = k.shape[2], k.shape[3]
    sh = shifts(x)
    patches = jnp.concatenate(sh, axis=1)          # [B, 9C, H, W]
    y = jnp.einsum("bkhw,ko->bohw", patches, k.reshape(9 * cin, O),
                   preferred_element_type=DT)
    return y + b[None, :, None, None]

rng = np.random.default_rng(0)
for cin, cout in ((8, 8), (4, 8)):
    x = jnp.asarray(rng.random((B, cin, H, W), np.float32), DT)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout), np.float32), DT)
    b = jnp.asarray(rng.standard_normal((cout,), np.float32), DT)
    ref = None
    for name, fn in (("scalar-stack", scalar_stack),
                     ("broadcast-sum", broadcast_sum),
                     ("tap-einsum", tap_einsum),
                     ("patch-einsum", patch_einsum)):
        f = jax.jit(lambda x, fn=fn: fn(x, k, b))
        y = f(x); _ = float(jnp.asarray(y, jnp.float32).sum())
        xq = x
        t0 = time.time()
        for i in range(20):
            y = f(xq)
            xq = x + 1e-6 * jnp.asarray(y[:, :cin], x.dtype)
        _ = float(jnp.asarray(xq, jnp.float32).sum())
        dt = (time.time() - t0) / 20 * 1e3
        if ref is None:
            ref = y
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(jnp.asarray(y, jnp.float32)
                                        - jnp.asarray(ref, jnp.float32))))
        print(f"{cin}->{cout} {name}: {dt:.2f} ms  max|d|={err:.2e}",
              flush=True)
