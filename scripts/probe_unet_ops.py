"""TPU probe #2: where do the proj UNet's 126 ms/eval actually go?

probe_conv.py showed isolated-dispatch timings are floored at ~1.5 ms of
relay/dispatch overhead — useless below that. Here every candidate op is
repeated R times *inside one jitted program* (lax.fori_loop with the
activation as carry), so per-op cost = (t_call − dispatch_floor) / R.

Covers: conv variants at each shallow pyramid level, GroupNorm, SiLU,
a whole ResidualBlock, nearest_resize (the one-hot matmul upsample),
concatenate+conv (the up-path skip join), and the full proj UNet as a
cross-check, in f32 and bf16.

Run: timeout 1800 python scripts/probe_unet_ops.py
"""

import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ipdm_tpu.models.unet import (GN, Conv3x3, ResidualBlock, UNetModel,
                                      nearest_resize)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    R = 50

    def timeit_rep(step, x, n_calls=4):
        """step: x -> x (same shape). Repeat R× inside one program."""
        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(0, R, lambda i, h: step(h), x)
        y = prog(x)
        float(jnp.sum(y))  # compile+warm
        t0 = time.time()
        for _ in range(n_calls):
            x = prog(x)
        float(jnp.sum(x))
        return (time.time() - t0) / n_calls / R * 1e3  # ms per op

    # ------------------------------------------------------------------
    # per-level ops
    # ------------------------------------------------------------------
    for H, W, C in [(2000, 912, 4), (1000, 456, 8), (500, 228, 16)]:
        for dtype in (jnp.float32, jnp.bfloat16):
            dn = "f32 " if dtype == jnp.float32 else "bf16"
            x = jnp.asarray(rng.normal(0, 1, (1, H, W, C))
                            .astype(np.float32)).astype(dtype)
            k = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C))
                            .astype(np.float32)).astype(dtype)

            def conv_xla(h):
                return jax.lax.conv_general_dilated(
                    h, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            def conv_im2col(h):
                xp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = [xp[:, dh:dh + H, dw:dw + W, :]
                        for dh in range(3) for dw in range(3)]
                patches = jnp.concatenate(cols, axis=-1)
                return jnp.einsum("bhwk,kc->bhwc", patches,
                                  k.reshape(9 * C, C),
                                  preferred_element_type=dtype)

            gn = GN(C, dtype)
            gnp = gn.init(jax.random.PRNGKey(0), x)
            def gn_op(h):
                return gn.apply(gnp, h)

            def silu_op(h):
                return nn.silu(h)

            res = ResidualBlock(C, C, dtype)
            temb = jnp.asarray(rng.normal(0, 1, (1, 256)).astype(np.float32))
            resp = res.init(jax.random.PRNGKey(0), x, temb)
            def res_op(h):
                return res.apply(resp, h, temb)

            log(f"--- {H}x{W} C={C} {dn} ---")
            log(f"  conv xla    : {timeit_rep(conv_xla, x):7.3f} ms")
            log(f"  conv im2col : {timeit_rep(conv_im2col, x):7.3f} ms")
            log(f"  groupnorm   : {timeit_rep(gn_op, x):7.3f} ms")
            log(f"  silu        : {timeit_rep(silu_op, x):7.3f} ms")
            log(f"  res block   : {timeit_rep(res_op, x):7.3f} ms")

    # ------------------------------------------------------------------
    # upsample resize (one-hot matmul) at the odd sinogram shapes
    # ------------------------------------------------------------------
    for (h0, w0, h1, w1, C) in [(1000, 456, 2000, 912, 4),
                                (500, 228, 1000, 456, 8),
                                (250, 114, 500, 228, 16)]:
        x = jnp.asarray(rng.normal(0, 1, (1, h0, w0, C)).astype(np.float32))
        def up_down(h):
            u = nearest_resize(h, (h1, w1))
            return u[:, ::2, ::2, :][:, :h0, :w0, :]
        log(f"resize {h0}x{w0}->{h1}x{w1} C={C}: "
            f"{timeit_rep(up_down, x):7.3f} ms (up + strided down)")

    # ------------------------------------------------------------------
    # full proj UNet, f32 vs bf16 (cross-check: 126 / 90 ms)
    # ------------------------------------------------------------------
    for dtype, dn in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        proj_model = UNetModel(in_channels=1, model_channels=64,
                               out_channels=1, num_res_blocks=2,
                               attention_resolutions=(32,),
                               channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                               dtype=dtype)
        xs = jnp.asarray(rng.normal(0, 1, (1, 2000, 912, 1))
                         .astype(np.float32))
        tvec = jnp.zeros((1,), jnp.int32)
        params = jax.jit(proj_model.init)(jax.random.PRNGKey(0), xs, tvec)

        @jax.jit
        def eval10(x):
            def body(i, h):
                return proj_model.apply(params, h, tvec)
            return jax.lax.fori_loop(0, 10, body, x)

        y = eval10(xs)
        float(jnp.sum(y))
        t0 = time.time()
        for _ in range(3):
            xs = eval10(xs)
        float(jnp.sum(xs))
        log(f"proj UNet eval ({dn}): {(time.time()-t0)/3/10*1e3:.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
