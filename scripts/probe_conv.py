"""TPU probe: 3×3 conv strategies for the sinogram UNet's shallow levels.

The proj UNet spends ~111 ms/eval (88%) in C∈{4,8,16} convs at 2000×912-ish
shapes — ~40× off the HBM roofline (~0.07 ms for a 4→4 conv at 2000×912).
This probe times candidate implementations on the real chip so the winner
backs Conv3x3. Timing per docs/PERF.md: dependency-chained executions ended
by one scalar readback (the axon relay dedupes identical executions and
block_until_ready doesn't fence every buffer type).

Run: timeout 1800 python scripts/probe_conv.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SHAPES = [  # (H, W, C) — the proj UNet's shallow pyramid
    (2000, 912, 4),
    (1000, 456, 8),
    (500, 228, 16),
]


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)

    def timeit(fn, x, iters=30):
        """fn must map x -> same-shape y; chain iters executions."""
        f = jax.jit(fn)
        y = f(x)
        float(jnp.sum(y))  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            x = f(x)
        float(jnp.sum(x))
        return (time.time() - t0) / iters * 1e3  # ms

    for H, W, C in SHAPES:
        log(f"--- {H}x{W} C={C} ---")
        x_nhwc = jnp.asarray(rng.normal(0, 1, (1, H, W, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32))

        # A: plain XLA conv, NHWC
        def conv_nhwc(x):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        log(f"A xla NHWC      : {timeit(conv_nhwc, x_nhwc):8.2f} ms")

        # B: plain XLA conv, NCHW in/out
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        k_oihw = jnp.transpose(k, (3, 2, 0, 1))
        def conv_nchw(x):
            return jax.lax.conv_general_dilated(
                x, k_oihw, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        log(f"B xla NCHW      : {timeit(conv_nchw, x_nchw):8.2f} ms")

        # C: im2col einsum (current Conv3x3 path), NHWC
        def conv_im2col(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [xp[:, dh:dh + H, dw:dw + W, :]
                    for dh in range(3) for dw in range(3)]
            patches = jnp.concatenate(cols, axis=-1)
            return jnp.einsum("bhwk,kc->bhwc", patches,
                              k.reshape(9 * C, C),
                              preferred_element_type=jnp.float32)
        log(f"C im2col NHWC   : {timeit(conv_im2col, x_nhwc):8.2f} ms")

        # D: shift-and-matmul planes, NCHW (W-minor layout; contraction on C)
        def conv_planes(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
            out = None
            for dh in range(3):
                for dw in range(3):
                    sh = xp[:, :, dh:dh + H, dw:dw + W]
                    r = jnp.einsum("bchw,co->bohw", sh, k[dh, dw],
                                   preferred_element_type=jnp.float32)
                    out = r if out is None else out + r
            return out
        log(f"D planes NCHW   : {timeit(conv_planes, x_nchw):8.2f} ms")

        # E: space-to-depth(2) + 2x2 conv (1.78x FLOPs, 4x channels)
        Hh, Wh = H // 2, W // 2
        x_s2d = x_nhwc.reshape(1, Hh, 2, Wh, 2, C).transpose(
            0, 1, 3, 2, 4, 5).reshape(1, Hh, Wh, 4 * C)
        k2 = jnp.asarray(rng.normal(0, 0.1, (2, 2, 4 * C, 4 * C))
                         .astype(np.float32))
        def conv_s2d(x):
            return jax.lax.conv_general_dilated(
                x, k2, (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        log(f"E s2d conv core : {timeit(conv_s2d, x_s2d):8.2f} ms"
            " (excl. pack/unpack)")

        # F: bf16 variants of A and C
        xb = x_nhwc.astype(jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)
        def conv_nhwc_bf16(x):
            return jax.lax.conv_general_dilated(
                x, kb, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
        log(f"F xla NHWC bf16 : {timeit(conv_nhwc_bf16, xb):8.2f} ms")

        # G: HBM roofline reference — elementwise traversal of same bytes
        def ew(x):
            return x * 1.000001 + 0.000001
        log(f"G elementwise   : {timeit(ew, x_nhwc):8.2f} ms"
            f"  ({2 * x_nhwc.nbytes / 1e9:.3f} GB moved)")

    log("done")


if __name__ == "__main__":
    main()
