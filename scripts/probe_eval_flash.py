"""Probe: full UNet eval time with the flagship preset architectures
([8,16] img / [16,32] proj attention), flash vs naive long-seq attention.

Same-process A/B (docs/PERF.md methodology): chained evals, one readback.
"""

import sys
import time

import numpy as np


def main():
    from ipdm_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import ipdm_tpu.models.unet as unet_mod
    from ipdm_tpu.models.unet import UNetModel

    print("device:", jax.devices()[0].platform, flush=True)

    specs = {
        "img": dict(shape=(1, 512, 512, 1),
                    kw=dict(in_channels=1, model_channels=64, out_channels=1,
                            num_res_blocks=2, attention_resolutions=(8, 16),
                            channel_mult=(1, 1, 2, 2, 4, 4),
                            dtype=jnp.bfloat16)),
        "proj": dict(shape=(1, 2000, 912, 1),
                     kw=dict(in_channels=1, model_channels=64, out_channels=1,
                             num_res_blocks=2, attention_resolutions=(16, 32),
                             channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                             dtype=jnp.bfloat16)),
    }

    for name, spec in specs.items():
        model = UNetModel(**spec["kw"])
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros(spec["shape"], jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        params = jax.jit(model.init)(rng, x, t)
        jax.block_until_ready(params)

        combos = [("flash+vpu", 4096, 64), ("flash", 4096, 0),
                  ("naive-attn", 1 << 30, 64)]
        for mode, minseq, vmax in combos:
            unet_mod.FLASH_MIN_SEQ = minseq
            unet_mod.VPU_UNROLL_MAX = vmax

            @jax.jit
            def ev(x):
                return model.apply(params, x, t)

            y = ev(x)
            _ = float(y.sum())
            reps = 10
            t0 = time.time()
            z = x
            for _ in range(reps):
                z = ev(z)
            _ = float(z.sum())
            ms = (time.time() - t0) / reps * 1e3
            print(f"{name} [{mode}]: {ms:.1f} ms/eval", flush=True)
        unet_mod.FLASH_MIN_SEQ = 4096
        unet_mod.VPU_UNROLL_MAX = 64


if __name__ == "__main__":
    sys.exit(main())
