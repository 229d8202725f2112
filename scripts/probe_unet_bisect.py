"""TPU probe #4: bisect the proj UNet's unexplained ~65 ms.

Parts sum to ~45 ms (probe #2/#3) but the whole f32 eval is ~110 ms.
Variants here:
  1. full proj UNet (with im2col stem + repeat-resize) — new baseline
  2. no-attention variant (attention_resolutions=())
  3. shallow-only UNet: channel_mult=(0.0625, 0.125, 0.25) at 2000×912
  4. deep-only UNet: channel_mult=(2, 2, 4, 4)·mc/4 at 250×114
  5. hand-composed level-1 slice (stem → 2×res → [up] 3×(cat→res) →
     resize → out conv) at 2000×912 — composition == sum-of-parts check

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/probe_unet_bisect.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.models.unet import (Conv3x3, ResidualBlock, UNetModel,
                                      nearest_resize)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)

    def timeit_rep(step, x, n_calls=3, reps=10):
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

    x1 = jnp.asarray(rng.normal(0, 1, (1, 2000, 912, 1)).astype(np.float32))
    tvec = jnp.zeros((1,), jnp.int32)

    def unet_time(name, cm, attn, x):
        m = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=attn,
                      channel_mult=cm)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x, tvec)
        def ev(h):
            return m.apply(p, h, tvec)
        log(f"{name}: {timeit_rep(ev, x):7.1f} ms")

    unet_time("1 full proj UNet        ",
              (0.0625, 0.125, 0.25, 2, 2, 4, 4), (32,), x1)
    unet_time("2 no-attention          ",
              (0.0625, 0.125, 0.25, 2, 2, 4, 4), (), x1)
    unet_time("3 shallow-only (3 lvls) ",
              (0.0625, 0.125, 0.25), (), x1)
    x4 = jnp.asarray(rng.normal(0, 1, (1, 250, 114, 1)).astype(np.float32))
    unet_time("4 deep-only @250x114    ", (2, 2, 4, 4), (8,), x4)

    # 5: hand-composed level-1 slice
    stem = Conv3x3(4, name="stem")
    res_a = ResidualBlock(4, 4)
    res_b = ResidualBlock(4, 4)
    up1 = ResidualBlock(8, 4)
    up2 = ResidualBlock(8, 4)
    up3 = ResidualBlock(8, 4)
    outc = Conv3x3(1)
    temb = jnp.asarray(rng.normal(0, 1, (1, 256)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    xs4 = jnp.zeros((1, 2000, 912, 4), jnp.float32)
    xs8 = jnp.zeros((1, 2000, 912, 8), jnp.float32)
    p_stem = stem.init(key, x1)
    p_a = res_a.init(key, xs4, temb)
    p_b = res_b.init(key, xs4, temb)
    p_u1 = up1.init(key, xs8, temb)
    p_u2 = up2.init(key, xs8, temb)
    p_u3 = up3.init(key, xs8, temb)
    p_out = outc.init(key, xs4)

    def level1(h):
        s = stem.apply(p_stem, h)                       # 1 -> 4
        a = res_a.apply(p_a, s, temb)                   # 4 -> 4
        b = res_b.apply(p_b, a, temb)                   # 4 -> 4
        # pretend deep result: half-res 4-ch map from b (cheap strided view)
        deep = b[:, ::2, ::2, :]
        u = nearest_resize(deep, (2000, 912))
        h = up1.apply(p_u1, jnp.concatenate([u, b], -1), temb)
        h = up2.apply(p_u2, jnp.concatenate([h, a], -1), temb)
        h = up3.apply(p_u3, jnp.concatenate([h, s], -1), temb)
        return outc.apply(p_out, h)                     # 4 -> 1

    log(f"5 level-1 slice composed: {timeit_rep(level1, x1):7.1f} ms"
        " (parts predict ~13 ms)")

    log("done")


if __name__ == "__main__":
    main()
