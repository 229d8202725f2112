"""Isolated variants of the proj UNet's worst op (fusion.3325): the up12
level-transition conv 144->16 at 1000x456 (7.4 ms at 2.5 TF/s in-context —
N=16 output lanes starve the MXU). Chained timing on TPU.
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ipdm_tpu.utils.comp_cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

H, W, C, O = 1000, 456, 144, 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (1, H, W, C)).astype(np.float32),
                jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, O)).astype(np.float32),
                jnp.bfloat16)


def time_fn(tag, f, *args):
    g = jax.jit(f)
    y = g(*args)
    jax.block_until_ready(y)
    outs = None
    t0 = time.time()
    n = 30

    @jax.jit
    def chain(x0):
        def body(c, _):
            y = f(c, *args[1:])
            # fold output back into the input's first O channels
            upd = jnp.zeros_like(c)
            if y.shape[-1] == C:
                upd = jnp.asarray(y, c.dtype)
            else:
                yo = y if y.shape[-1] == O else jnp.moveaxis(y, 1, -1)
                upd = upd.at[..., :O].set(jnp.asarray(yo, c.dtype))
            return c + 0.001 * upd, ()
        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    y = chain(x)
    _ = float(jnp.asarray(y, jnp.float32).sum())
    t0 = time.time()
    y = chain(y)
    _ = float(jnp.asarray(y, jnp.float32).sum())
    print(f"{tag}: {(time.time()-t0)/n*1e3:.2f} ms", flush=True)


def conv_nhwc(h, k):
    return jax.lax.conv_general_dilated(
        h, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(h, k):
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [hp[:, dh:dh + H, dw:dw + W, :]
            for dh in range(3) for dw in range(3)]
    patches = jnp.concatenate(cols, axis=-1)
    return jnp.einsum("bhwk,kc->bhwc", patches, k.reshape(9 * C, O),
                      preferred_element_type=jnp.bfloat16)


def conv_planar_out(h, k):
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [hp[:, dh:dh + H, dw:dw + W, :]
            for dh in range(3) for dw in range(3)]
    patches = jnp.concatenate(cols, axis=-1)
    return jnp.einsum("bhwk,ko->bohw", patches, k.reshape(9 * C, O),
                      preferred_element_type=jnp.bfloat16)


def conv_split(h, k):
    a = jax.lax.conv_general_dilated(
        h[..., :128], k[:, :, :128], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = jax.lax.conv_general_dilated(
        h[..., 128:], k[:, :, 128:], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return a + b


def conv_pad_out(h, k):
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 112)))
    y = jax.lax.conv_general_dilated(
        h, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[..., :O]


for tag, f in [("nhwc lax.conv (incumbent)", conv_nhwc),
               ("im2col einsum nhwc-out", conv_im2col),
               ("im2col einsum planar-out", conv_planar_out),
               ("split 128+16", conv_split),
               ("pad-out-to-128", conv_pad_out)]:
    try:
        time_fn(tag, f, x, k)
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:100]}", flush=True)
print("done", flush=True)
