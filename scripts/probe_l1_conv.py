"""Probe: strategies for the img UNet's L1 3x3 conv (C=64 @ 512^2, bf16).

L1 is ~15 of the 18.4 ms img eval (docs/PERF.md). Hypothesis: N=64 output
channels fill only half the MXU's 128 lanes. Candidates:
  a) lax.conv NHWC (baseline)
  b) im2col + einsum
  c) block-diagonal N=128: stack two image ROW-HALVES channel-wise
     ([B, H/2, W, 2C]) and convolve with blockdiag(W, W) so the MXU sees
     128 output lanes; halo row exchanged explicitly.
  d) two independent convs over the halves (sanity: should equal a)

Timing: dependency-chained, one scalar readback (docs/PERF.md method).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    H = W = 512
    C = 64
    B = 1
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)

    dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_a(x):
        return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn)

    @jax.jit
    def conv_b(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, i:i + H, j:j + W, :] for i in range(3)
                for j in range(3)]
        patches = jnp.concatenate(cols, axis=-1)          # [B,H,W,9C]
        kf = k.transpose(0, 1, 2, 3).reshape(9 * C, C)
        return jnp.einsum("bhwk,kc->bhwc", patches, kf)

    kd = jnp.zeros((3, 3, 2 * C, 2 * C), dt)
    kd = kd.at[:, :, :C, :C].set(k).at[:, :, C:, C:].set(k)
    Hh = H // 2

    @jax.jit
    def conv_c(x):
        # halves with 1-row halo on the seam side
        top = x[:, :Hh + 1]                               # [B, Hh+1, W, C]
        bot = x[:, Hh - 1:]
        both = jnp.concatenate([top, bot], axis=-1)       # [B, Hh+1, W, 2C]
        dn2 = lax.conv_dimension_numbers(both.shape, kd.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        # pad W fully, H only 1 at each end; the halo row supplies the seam
        y = lax.conv_general_dilated(both, kd, (1, 1),
                                     ((1, 1), (1, 1)),
                                     dimension_numbers=dn2)
        # y: [B, Hh+3-2=Hh+1, W, 2C]; valid rows: top y[:,:Hh,: , :C],
        # bottom y[:, 1:Hh+1, :, C:]
        return jnp.concatenate([y[:, :Hh, :, :C], y[:, 1:, :, C:]], axis=1)

    a = conv_a(x)
    c = conv_c(x)
    err = float(jnp.abs(a.astype(jnp.float32)
                        - c.astype(jnp.float32)).max())
    print("blockdiag err", err, flush=True)

    for name, fn in [("lax.conv", conv_a), ("im2col", conv_b),
                     ("blockdiag128", conv_c)]:
        y = fn(x)
        _ = float(y.astype(jnp.float32).sum())
        reps = 30
        t0 = time.time()
        z = x
        for _ in range(reps):
            z = fn(z)
        _ = float(z.astype(jnp.float32).sum())
        ms = (time.time() - t0) / reps * 1e3
        gf = 2 * 9 * C * C * H * W / 1e9
        print(f"{name}: {ms:.3f} ms  ({gf/ms*1000:.0f} GF/s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
