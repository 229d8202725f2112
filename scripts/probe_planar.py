"""TPU probe #12: shallow level in W-minor (NCHW) layout, pure XLA.

The HLO census (probe #11) shows the shallow-level cost is C-minor
lane-padded materialization (C=8 padded toward 128 between fusions). Here a
hand-rolled L1-only graph (stem -> 2 res down -> 3 res(2C->C) up w/ concat
-> out conv) runs entirely in [B,C,H,W]:

  b. convs via lax.conv NCHW dimension numbers
  c. convs via 9-tap shift + einsum over C (never leaves W-minor layout)

vs the NHWC flax baseline measured at 31.7 ms. If either lands near the
~4 ms bandwidth bound, the UNet gets a planar shallow mode with no Pallas.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_planar.py
"""

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    H, W, C = 2000, 912, 8
    dtype = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape).astype(np.float32)
                           ).astype(dtype)

    # weights for: stem 1->C, res(C,C) x2, res(2C,C) x3, out C->1
    def res_weights(ci, co):
        return dict(g1=mk(ci), b1=mk(ci), w1=mk(3, 3, ci, co), bb1=mk(co),
                    te=mk(co), g2=mk(co), b2=mk(co), w2=mk(3, 3, co, co),
                    bb2=mk(co), ws=(mk(1, 1, ci, co) if ci != co else None),
                    bs=(mk(co) if ci != co else None))

    Wstem, bstem = mk(3, 3, 1, C), mk(C)
    blocks = [res_weights(C, C), res_weights(C, C),
              res_weights(2 * C, C), res_weights(2 * C, C),
              res_weights(2 * C, C)]
    Wout, bout = mk(3, 3, C, 1), mk(1)

    def gn_nchw(x, g, b):
        # per-channel stats (group_count(C)=C for C<32)
        m = jnp.mean(x.astype(jnp.float32), axis=(2, 3), keepdims=True)
        v = jnp.var(x.astype(jnp.float32), axis=(2, 3), keepdims=True)
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        y = y * g[None, :, None, None] + b[None, :, None, None]
        return y.astype(x.dtype)

    def silu(x):
        return x * jax.nn.sigmoid(x)

    def conv_lax(x, w, b, k=3):
        # x [B,C,H,W]; w HWIO
        wo = jnp.transpose(w, (3, 2, 0, 1))  # OIHW
        pad = ((1, 1), (1, 1)) if k == 3 else ((0, 0), (0, 0))
        y = jax.lax.conv_general_dilated(
            x, wo, (1, 1), pad, dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    def conv_shift(x, w, b, k=3):
        if k == 1:
            y = jnp.einsum("bchw,co->bohw", x, w[0, 0],
                           preferred_element_type=dtype)
            return y + b[None, :, None, None]
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        y = None
        for dh in range(3):
            for dw in range(3):
                sh = xp[:, :, dh:dh + H, dw:dw + W]
                r = jnp.einsum("bchw,co->bohw", sh, w[dh, dw],
                               preferred_element_type=dtype)
                y = r if y is None else y + r
        return y + b[None, :, None, None]

    def make_level1(conv):
        def res(x, p, temb_on=True):
            h = silu(gn_nchw(x, p["g1"], p["b1"]))
            h = conv(h, p["w1"], p["bb1"])
            if temb_on:
                h = h + p["te"][None, :, None, None]
            h = silu(gn_nchw(h, p["g2"], p["b2"]))
            h = conv(h, p["w2"], p["bb2"])
            if p["ws"] is not None:
                x = conv(x, p["ws"], p["bs"], k=1)
            return h + x

        def fwd(x):  # x [1,1,H,W]
            s = conv(x, Wstem, bstem)
            a = res(s, blocks[0])
            bb = res(a, blocks[1])
            deep = bb[:, :, ::2, ::2]
            u = jnp.repeat(jnp.repeat(deep, 2, axis=2), 2, axis=3)
            h = res(jnp.concatenate([u, bb], 1), blocks[2])
            h = res(jnp.concatenate([h, a], 1), blocks[3])
            h = res(jnp.concatenate([h, s], 1), blocks[4])
            return conv(h, Wout, bout)
        return fwd

    x = jnp.asarray(rng.normal(0, 1, (1, 1, H, W)).astype(np.float32)
                    ).astype(dtype)

    for name, conv in [("b NCHW lax.conv  ", conv_lax),
                       ("c NCHW shift-ein ", conv_shift)]:
        fwd = make_level1(conv)

        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(
                0, 10, lambda i, h: fwd(h) * 0.5 + x * 0.5, x)
        y = prog(x)
        float(jnp.sum(y))
        t0 = time.time()
        z = x
        for _ in range(3):
            z = prog(z)
        float(jnp.sum(z))
        log(f"{name}: {(time.time()-t0)/30*1e3:7.1f} ms per L1-pass")

    log("done")


if __name__ == "__main__":
    main()
