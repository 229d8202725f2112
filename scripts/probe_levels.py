"""TPU probe #10: per-level-group cost via model surgery.

Differencing (probe #9) cleared GN/silu/conv-lowering. FLOP math: level ds4
(C=128 @ 500x228) is ~450 GFLOP = half the model; at the isolated conv rate
(~50 TF/s bf16) the whole net would be ~21 ms — it measures 93. Which level
group hides the other ~70 ms?

AttentionBlock is monkeypatched to identity everywhere (measured ~0 cost in
the full model) so truncated models don't blow up on middle attention at
large spatial sizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_levels.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import ipdm_tpu.models.unet as U

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    tvec = jnp.zeros((1,), jnp.int32)

    # attention -> identity (timing only)
    U.AttentionBlock.__call__ = lambda self, x: x

    def run(name, cm, H, W, reps=10):
        x1 = jnp.asarray(rng.normal(0, 1, (1, H, W, 1)).astype(np.float32))
        m = U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                        num_res_blocks=2, attention_resolutions=(32,),
                        channel_mult=cm, dtype=jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x1, tvec)

        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(
                0, reps, lambda i, h: m.apply(p, h, tvec), x)
        y = prog(x1)
        float(jnp.sum(y))
        t0 = time.time()
        x = x1
        for _ in range(3):
            x = prog(x)
        float(jnp.sum(x))
        log(f"{name}: {(time.time()-t0)/3/reps*1e3:7.1f} ms/eval")

    run("full (attn=id)              ",
        (0.0625, 0.125, 0.25, 2, 2, 4, 4), 2000, 912)
    run("deep-only (2,2,4,4) @500x228",
        (0.0625, 2, 2, 4, 4), 500, 228)
    run("L1-only (1/16,1/8) @2000x912",
        (0.0625, 0.125), 2000, 912)
    run("L1-3 (...,1/4,2) @2000x912  ",
        (0.0625, 0.125, 0.25, 2), 2000, 912)

    log("done")


if __name__ == "__main__":
    main()
