"""TPU probe #3: composition bisect of the proj UNet after the repeat-resize.

probe_unet_ops.py: parts sum to ~25 ms but the whole f32 eval is ~110 ms.
Here: stem conv (C_in=1) via lax.conv vs im2col, down-path-only and
up-path-only truncations, and the full eval with the repeat+crop resize,
f32 and bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/probe_unet_compose.py
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
    R = 30

    def timeit_rep(step, x, n_calls=3, reps=R):
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

    # --- stem conv 1->4 at 2000x912, both lowerings ----------------------
    x1 = jnp.asarray(rng.normal(0, 1, (1, 2000, 912, 1)).astype(np.float32))
    k14 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 4)).astype(np.float32))
    k41 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 4, 1)).astype(np.float32))

    def stem_pair_xla(h):
        y = jax.lax.conv_general_dilated(
            h, k14, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, k41, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stem_pair_im2col(h):
        def im2col(x, k):
            B, H, W, C = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [xp[:, dh:dh + H, dw:dw + W, :]
                    for dh in range(3) for dw in range(3)]
            patches = jnp.concatenate(cols, axis=-1)
            return jnp.einsum("bhwk,kc->bhwc", patches,
                              k.reshape(9 * C, k.shape[-1]),
                              preferred_element_type=jnp.float32)
        return im2col(im2col(h, k14), k41)

    log(f"stem pair (1->4->1) xla    : {timeit_rep(stem_pair_xla, x1):7.3f} ms")
    log(f"stem pair (1->4->1) im2col : {timeit_rep(stem_pair_im2col, x1):7.3f} ms")

    # --- full proj UNet, repeat-resize, f32 + bf16 ------------------------
    tvec = jnp.zeros((1,), jnp.int32)
    for dtype, dn in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        proj_model = UNetModel(in_channels=1, model_channels=64,
                               out_channels=1, num_res_blocks=2,
                               attention_resolutions=(32,),
                               channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                               dtype=dtype)
        params = jax.jit(proj_model.init)(jax.random.PRNGKey(0), x1, tvec)
        def ev(h):
            return proj_model.apply(params, h, tvec)
        log(f"proj UNet eval ({dn}, repeat-resize): "
            f"{timeit_rep(ev, x1, n_calls=3, reps=10):7.1f} ms")

    # --- img UNet 512^2 for reference -------------------------------------
    xi = jnp.asarray(rng.normal(0, 1, (1, 512, 512, 1)).astype(np.float32))
    for dtype, dn in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        img_model = UNetModel(in_channels=1, model_channels=64,
                              out_channels=1, num_res_blocks=2,
                              attention_resolutions=(16,),
                              channel_mult=(1, 1, 2, 2, 4, 4), dtype=dtype)
        params = jax.jit(img_model.init)(jax.random.PRNGKey(0), xi, tvec)
        def ev(h):
            return img_model.apply(params, h, tvec)
        log(f"img UNet eval ({dn}, repeat-resize): "
            f"{timeit_rep(ev, xi, n_calls=3, reps=10):7.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
