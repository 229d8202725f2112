"""TPU probe #6: deep-level conv throughput (the real FLOP sink).

cost_analysis: the proj UNet is 1044 GFLOP/eval, dominated by C=128/256
convs at 500x228 and below. f32 eval (110 ms) is ~close to v5e's weak f32
matmul rate; bf16 should be ~4x but measures only 1.15x. Find out why:
time lax.conv vs explicit im2col-matmul at the deep shapes in f32/bf16,
against a pure matmul roofline of the same contraction size.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/probe_deep_conv.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)

    def timeit_rep(step, x, n_calls=3, reps=20):
        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(0, reps, lambda i, h: step(h), x)
        y = prog(x)
        float(jnp.sum(y))
        t0 = time.time()
        for _ in range(n_calls):
            x = prog(x)
        float(jnp.sum(x))
        return (time.time() - t0) / n_calls / reps * 1e3

    SHAPES = [  # (H, W, Cin, Cout) — deep levels, down and up (cat) variants
        (500, 228, 128, 128),
        (500, 228, 256, 128),
        (250, 114, 128, 128),
        (125, 57, 256, 256),
        (63, 29, 512, 256),
    ]
    for H, W, Ci, Co in SHAPES:
        gf = 2 * 9 * Ci * Co * H * W / 1e9
        log(f"--- {H}x{W} {Ci}->{Co}  ({gf:.1f} GFLOP) ---")
        for dtype, dn in [(jnp.float32, "f32 "), (jnp.bfloat16, "bf16")]:
            x = jnp.asarray(rng.normal(0, 1, (1, H, W, Ci))
                            .astype(np.float32)).astype(dtype)
            k = jnp.asarray(rng.normal(0, 0.05, (3, 3, Ci, Co))
                            .astype(np.float32)).astype(dtype)
            # make step shape-preserving: conv then 1x1 back to Cin
            k2 = jnp.asarray(rng.normal(0, 0.05, (1, 1, Co, Ci))
                             .astype(np.float32)).astype(dtype)

            def conv_xla(h):
                y = jax.lax.conv_general_dilated(
                    h, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jax.lax.conv_general_dilated(
                    y, k2, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            def conv_im2col(h):
                xp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = [xp[:, dh:dh + H, dw:dw + W, :]
                        for dh in range(3) for dw in range(3)]
                patches = jnp.concatenate(cols, axis=-1)
                y = jnp.einsum("bhwk,kc->bhwc", patches,
                               k.reshape(9 * Ci, Co),
                               preferred_element_type=dtype)
                return jnp.einsum("bhwc,cd->bhwd", y, k2[0, 0],
                                  preferred_element_type=dtype)

            t_xla = timeit_rep(conv_xla, x)
            t_col = timeit_rep(conv_im2col, x)
            # subtract nothing; report with effective TFLOP/s of 3x3 conv
            g1 = gf + 2 * Ci * Co * H * W / 1e9
            log(f"  {dn} xla   : {t_xla:7.3f} ms ({g1/t_xla:6.1f} TF/s eff)")
            log(f"  {dn} im2col: {t_col:7.3f} ms ({g1/t_col:6.1f} TF/s eff)")

        # pure matmul roofline, same contraction as the 3x3 conv
        M, K, N = H * W, 9 * Ci, Co
        for dtype, dn in [(jnp.float32, "f32 "), (jnp.bfloat16, "bf16")]:
            a = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32)
                            ).astype(dtype)
            b = jnp.asarray(rng.normal(0, 0.05, (K, N)).astype(np.float32)
                            ).astype(dtype)
            c = jnp.asarray(rng.normal(0, 0.05, (N, K)).astype(np.float32)
                            ).astype(dtype)

            def mm(h):
                return jnp.dot(jnp.dot(h, b, preferred_element_type=dtype),
                               c, preferred_element_type=dtype)
            t = timeit_rep(mm, a)
            g = 2 * M * K * N * 2 / 1e9
            log(f"  {dn} pure matmul [{M}x{K}]@[{K}x{N}]: {t:7.3f} ms "
                f"({g/t:6.1f} TF/s)")

    log("done")


if __name__ == "__main__":
    main()
