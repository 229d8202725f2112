"""Per-pixel guidance-decay λ map — pure-XLA replacement for the reference's
numba CUDA kernel `condition_lambda_ratio_cuda` (Model/model.py:328-351).

The reference shuttles host numpy arrays into a CUDA kernel on *every reverse
step*; here the map is a handful of fused elementwise ops that stay on device
inside the sampler's lax.scan.

Math (per pixel, with per-pixel exponent λp = delt[k,0,i,j]):
    a(x)  = cos(((x/ts)+s)/(1+s)·π/2)²
    I     = 1 − (a(i+1)^λp / a(i)^λp)        # the a(0)^λp factors cancel
then clip to [0.05, 0.99] (train_test_utils.py applies the clip at the call
site, model.py:558) and nearest-upsample from the pooled grid to full
resolution (model.py:559-560).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def condition_lambda_map(delt: jnp.ndarray, i, timesteps: int,
                         s: float = 0.008) -> jnp.ndarray:
    """λ map at reverse step i. delt: pooled per-pixel exponent [B,h,w,1]
    (or any shape); i may be a traced scalar. Returns same shape as delt."""
    half_pi_over = math.pi * 0.5 / (1 + s)

    def a(x):
        return jnp.cos((x / timesteps + s) * half_pi_over) ** 2

    ratio = a(i + 1.0) / a(i * 1.0)
    lam = 1.0 - ratio ** delt
    return jnp.clip(lam, 0.05, 0.99)


def nearest_upsample(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbour upsample of NHWC x to spatial `size`, matching
    torch F.interpolate(mode='nearest') floor-index convention
    (reference model.py:559-560). When size is an exact multiple this is a
    pure repeat, which XLA lowers to a broadcast."""
    H, W = x.shape[1], x.shape[2]
    if size[0] % H == 0 and size[1] % W == 0:
        x = jnp.repeat(x, size[0] // H, axis=1)
        return jnp.repeat(x, size[1] // W, axis=2)
    # non-multiple sizes: constant one-hot matmuls (MXU) — arbitrary-index
    # gathers take TPU's scalar path and this runs inside the reverse scan
    import numpy as np
    hi = (np.arange(size[0]) * H // size[0]).astype(np.int64)
    wi = (np.arange(size[1]) * W // size[1]).astype(np.int64)
    mh = np.zeros((size[0], H), np.float32)
    mh[np.arange(size[0]), hi] = 1.0
    mw = np.zeros((size[1], W), np.float32)
    mw[np.arange(size[1]), wi] = 1.0
    x = jnp.einsum("dh,bhwc->bdwc", jnp.asarray(mh, x.dtype), x)
    return jnp.einsum("ew,bdwc->bdec", jnp.asarray(mw, x.dtype), x)


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping k×k average pool on NHWC (≡ F.avg_pool2d(x, k) for the
    divisible shapes used here; trailing remainder is dropped as torch does)."""
    B, H, W, C = x.shape
    Hk, Wk = H // k, W // k
    x = x[:, :Hk * k, :Wk * k]
    x = x.reshape(B, Hk, k, Wk, k, C)
    return x.mean(axis=(2, 4))
