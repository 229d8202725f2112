"""Probe: naive T×S attention vs the Pallas flash path at the flagship
preset's attention shapes (img ds=8 → T=4096, proj ds=16 → T=7125,
proj ds=32 → T=1827; heads=4, hd=64, bf16).

Timing methodology per docs/PERF.md: dependency-chained repeats ended by a
scalar readback, same-process A/B. Run with NO other python processes.
"""

import math
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.models.unet import _flash_attention

    dev = jax.devices()[0]
    print(f"device: {dev.platform}", flush=True)

    def naive(q, k, v, scale):
        attn = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        return jnp.einsum("bhts,bshd->bthd", attn, v)

    for T, C in [(1827, 256), (4096, 128), (7125, 256)]:
        nh, B = 4, 1
        hd = C // nh
        scale = 1.0 / math.sqrt(math.sqrt(hd))
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, T, nh, hd)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, T, nh, hd)),
                        jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, T, nh, hd)),
                        jnp.bfloat16)

        f_naive = jax.jit(lambda q, k, v: naive(q, k, v, scale))
        f_flash = jax.jit(
            lambda q, k, v: _flash_attention(q, k, v, scale * scale))

        a = np.asarray(f_naive(q, k, v), np.float32)
        b = np.asarray(f_flash(q, k, v), np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        print(f"T={T} C={C}: rel max err {err:.2e}", flush=True)

        for name, fn in [("naive", f_naive), ("flash", f_flash)]:
            # dependency chain: out feeds back into q
            out = fn(q, k, v)
            _ = float(out.sum())            # warm
            reps = 10
            t0 = time.time()
            x = q
            for _ in range(reps):
                x = fn(x, k, v)
            _ = float(x.sum())
            dt = (time.time() - t0) / reps * 1e3
            print(f"  {name}: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
