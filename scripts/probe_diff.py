"""TPU probe #9: full-program differencing of proj-UNet component costs.

Sub-ms op probes are floored by ~0.4 ms/iteration of loop/relay overhead
(probe #8), so instead: compile the FULL proj UNet with one component
no-op'd per variant and difference the eval times. (Monkeypatching is
timing-only — params/numerics are irrelevant here.)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python scripts/probe_diff.py
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

    import ipdm_tpu.models.unet as U

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(0, 1, (1, 2000, 912, 1)).astype(np.float32))
    tvec = jnp.zeros((1,), jnp.int32)

    gn_call = U.GN.__call__
    silu = nn.silu

    def run(name):
        m = U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                        num_res_blocks=2, attention_resolutions=(32,),
                        channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                        dtype=jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x1, tvec)

        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(
                0, 10, lambda i, h: m.apply(p, h, tvec), x)
        y = prog(x1)
        float(jnp.sum(y))
        t0 = time.time()
        x = x1
        for _ in range(3):
            x = prog(x)
        float(jnp.sum(x))
        log(f"{name}: {(time.time()-t0)/30*1e3:7.1f} ms/eval")

    run("baseline bf16          ")

    # GN -> affine-only (keep params so init works; skip the reduction)
    def gn_identity(self, x):
        return x
    U.GN.__call__ = gn_identity
    run("GN = identity          ")
    U.GN.__call__ = gn_call

    # silu -> identity inside unet module only
    U.nn.silu = lambda x: x
    run("silu = identity        ")

    U.GN.__call__ = gn_identity
    run("GN + silu = identity   ")
    U.GN.__call__ = gn_call
    U.nn.silu = silu

    # all convs via lax.conv (disable im2col)
    U.Conv3x3.im2col_max_cin = 0
    run("conv: all lax.conv     ")
    # all convs via im2col
    U.Conv3x3.im2col_max_cin = 10 ** 9
    run("conv: all im2col       ")
    U.Conv3x3.im2col_max_cin = 32

    log("done")


if __name__ == "__main__":
    main()
