"""TPU probe #7: UNet eval vs batch size (amortizing per-op fixed cost).

probe #6: deep convs at small spatial shapes carry ~0.5 ms fixed cost each
(~100 ops/eval ≈ 50 ms of overhead — half the proj eval). If eval time grows
sublinearly in batch, batched-slice inference collapses per-slice cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/probe_batch.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.models.unet import UNetModel

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    tvec1 = jnp.zeros((1,), jnp.int32)

    CONFIGS = [
        ("proj", (2000, 912), dict(
            in_channels=1, model_channels=64, out_channels=1,
            num_res_blocks=2, attention_resolutions=(32,),
            channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4))),
        ("img", (512, 512), dict(
            in_channels=1, model_channels=64, out_channels=1,
            num_res_blocks=2, attention_resolutions=(16,),
            channel_mult=(1, 1, 2, 2, 4, 4))),
    ]

    for name, (H, W), kw in CONFIGS:
        for dtype, dn in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
            m = UNetModel(dtype=dtype, **kw)
            x1 = jnp.asarray(rng.normal(0, 1, (1, H, W, 1))
                             .astype(np.float32))
            p = jax.jit(m.init)(jax.random.PRNGKey(0), x1, tvec1)
            for B in (1, 2, 4, 8):
                if name == "proj" and B == 8 and dtype == jnp.float32:
                    continue  # HBM
                x = jnp.asarray(rng.normal(0, 1, (B, H, W, 1))
                                .astype(np.float32))
                tv = jnp.zeros((B,), jnp.int32)

                def ev(h):
                    return m.apply(p, h, tv)

                reps = max(2, 10 // B)
                @jax.jit
                def prog(x):
                    return jax.lax.fori_loop(0, reps, lambda i, h: ev(h), x)
                try:
                    y = prog(x)
                    float(jnp.sum(y))
                    t0 = time.time()
                    n_calls = 3
                    for _ in range(n_calls):
                        x = prog(x)
                    float(jnp.sum(x))
                    dt = (time.time() - t0) / n_calls / reps * 1e3
                    log(f"{name} {dn} B={B}: {dt:8.1f} ms/eval  "
                        f"{dt/B:7.1f} ms/slice-eval")
                except Exception as e:
                    log(f"{name} {dn} B={B}: failed: {str(e)[:120]}")

    log("done")


if __name__ == "__main__":
    main()
