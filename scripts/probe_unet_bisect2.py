"""TPU probe #5: level-1 slice composition, deep-only, cost analysis.

(probe #4's "shallow-only" truncation was invalid: UNetModel always builds a
middle attention block, which at 1000x456 means 456k tokens.)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/probe_unet_bisect2.py
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

    # --- hand-composed level-1 slice --------------------------------------
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
        deep = b[:, ::2, ::2, :]
        u = nearest_resize(deep, (2000, 912))
        h2 = up1.apply(p_u1, jnp.concatenate([u, b], -1), temb)
        h2 = up2.apply(p_u2, jnp.concatenate([h2, a], -1), temb)
        h2 = up3.apply(p_u3, jnp.concatenate([h2, s], -1), temb)
        return outc.apply(p_out, h2)                    # 4 -> 1

    log(f"level-1 slice composed : {timeit_rep(level1, x1):7.1f} ms"
        " (parts predict ~13 ms)")

    # --- deep-only model at 250x114 (middle attn at 32x15 — valid) --------
    x4 = jnp.asarray(rng.normal(0, 1, (1, 250, 114, 1)).astype(np.float32))
    m4 = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                   num_res_blocks=2, attention_resolutions=(8,),
                   channel_mult=(2, 2, 4, 4))
    p4 = jax.jit(m4.init)(jax.random.PRNGKey(0), x4, tvec)
    log(f"deep-only @250x114      : "
        f"{timeit_rep(lambda h: m4.apply(p4, h, tvec), x4):7.1f} ms")

    # --- full model: cost analysis + no-loop timing cross-check ------------
    m = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                  num_res_blocks=2, attention_resolutions=(32,),
                  channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4))
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x1, tvec)
    f = jax.jit(lambda h: m.apply(p, h, tvec))
    try:
        comp = f.lower(x1).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        log(f"full UNet cost_analysis: {flops/1e9:.1f} GFLOP, "
            f"{bytes_/1e9:.2f} GB accessed")
        for k, v in sorted(ca.items()):
            if isinstance(v, float) and v > 1e6:
                log(f"   {k}: {v:.3e}")
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")

    y = f(x1)
    float(jnp.sum(y))
    t0 = time.time()
    h = x1
    for _ in range(10):
        h = f(h)
    float(jnp.sum(h))
    log(f"full UNet, plain chained dispatch x10: {(time.time()-t0)/10*1e3:.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
