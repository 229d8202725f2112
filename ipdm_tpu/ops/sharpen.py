"""3×3 high-pass sharpen applied to FBP output before image-domain diffusion
(reference tensor_sharpen, Utils/train_test_utils.py:868-878)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def tensor_sharpen(img: jnp.ndarray, N: int = 60) -> jnp.ndarray:
    """img: NHWC. Kernel [[-2,-2,-2],[-2,N,-2],[-2,-2,-2]]/(N-16), pad 1.
    N == -1 disables sharpening (identity)."""
    if N == -1:
        return img
    k = jnp.full((3, 3), -2.0, dtype=img.dtype).at[1, 1].set(float(N))
    k = k / (N - 16.0)
    kernel = k[:, :, None, None]  # HWIO, depthwise over 1 channel
    C = img.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, C))
    return lax.conv_general_dilated(
        img, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
