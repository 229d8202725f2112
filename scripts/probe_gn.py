"""TPU probe #8: GroupNorm / SiLU / res-block / attention cost at deep shapes.

Batching anti-scales (probe #7) → per-op times are intrinsic. The proj UNet
has ~50 GroupNorms + ~50 SiLUs; if each costs ~0.15 ms regardless of size,
that's ~15 ms/eval of glue — the next fusion target. Measure at the deep
pyramid shapes, bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/probe_gn.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ipdm_tpu.models.unet import GN, AttentionBlock, ResidualBlock

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)

    def timeit_rep(step, x, n_calls=3, reps=30):
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

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    temb = jnp.asarray(rng.normal(0, 1, (1, 256)).astype(np.float32))

    for H, W, C in [(500, 228, 128), (250, 114, 128),
                    (125, 57, 256), (63, 29, 256)]:
        x = jnp.asarray(rng.normal(0, 1, (1, H, W, C))
                        .astype(np.float32)).astype(dtype)
        mb = 1 * H * W * C * 2 / 1e6

        gn = GN(C, dtype)
        gnp = gn.init(key, x)
        res = ResidualBlock(C, C, dtype)
        resp = res.init(key, x, temb)

        t_gn = timeit_rep(lambda h: gn.apply(gnp, h), x)
        t_silu = timeit_rep(lambda h: nn.silu(h), x)
        t_gnsilu = timeit_rep(lambda h: nn.silu(gn.apply(gnp, h)), x)
        t_res = timeit_rep(lambda h: res.apply(resp, h, temb), x)
        # attention exists only at ds∈{16,32} (tiny spatial) in the model
        if H * W <= 4000:
            attn = AttentionBlock(C, 4, dtype)
            attnp = attn.init(key, x)
            t_attn = timeit_rep(lambda h: attn.apply(attnp, h), x)
        else:
            t_attn = float("nan")
        log(f"{H}x{W} C={C} ({mb:.1f} MB bf16): gn {t_gn:6.3f}  "
            f"silu {t_silu:6.3f}  gn+silu {t_gnsilu:6.3f}  "
            f"res {t_res:6.3f}  attn {t_attn:6.3f} ms")

    log("done")


if __name__ == "__main__":
    main()
