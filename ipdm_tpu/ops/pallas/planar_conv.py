"""Pallas TPU kernel: single-pass planar 3×3 convolution.

The planar (W-minor, [B, C, H, W]) conv lowering in models/unet.py issues
nine shifted channel-contraction einsums; each reads the full input and
writes a partial accumulation — ~10 passes of HBM traffic per conv, plus
nine small-K MXU dispatches. This kernel computes all nine taps in one
pass: the grid tiles (batch, 8-row blocks); each step reads one 8-row
block from three H-shifted copies of the padded input (halo-free block
indexing), forms the W-shifts with lane rolls in VMEM, and accumulates
nine MXU contractions (K=C, M=C_out, N=8·Wp) into the output block.

Used for the sinogram UNet's shallow levels (C ∈ {4, 8, 16}); exactness
vs the einsum lowering is pinned in tests/test_unet.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pconv_kernel(k_ref, x0_ref, x1_ref, x2_ref, out_ref):
    """x{dh}_ref: [1, C, 8, Wp] H-shifted input blocks (dh = tap row);
    k_ref: [3, 3, C, O]; out: [1, O, 8, Wp]."""
    _, C, R, Wp = x0_ref.shape
    O = out_ref.shape[1]
    acc = None
    for dh, ref in enumerate((x0_ref, x1_ref, x2_ref)):
        arr = ref[0]                                     # [C, 8, Wp]
        for dw in range(3):
            # tap column dw reads padded col w+dw for out col w: left-roll
            # by dw; the wrap only touches cols ≥ Wp−2 (zero pad, unused)
            sh = pltpu.roll(arr, shift=Wp - dw, axis=2) if dw else arr
            kv = k_ref[dh, dw]                           # [C, O]
            # contract C: [O, C] × [C, 8, Wp] → [O, 8, Wp]
            term = jax.lax.dot_general(
                kv, sh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [O, 8, Wp]
            acc = term if acc is None else acc + term
    out_ref[...] = acc[None].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def planar_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray, interpret: bool = False
                   ) -> jnp.ndarray:
    """3×3 stride-1 same-padding conv on planar input.

    x: [B, C, H, W]; kernel: [3, 3, C, O] (HWIO); bias: [O].
    Returns [B, O, H, W] in x.dtype (f32 accumulation)."""
    B, C, H, W = x.shape
    O = kernel.shape[-1]
    Wp = -(-(W + 2) // 128) * 128
    Hp = -(-H // 8) * 8
    # pad: 1 zero col left + zeros to Wp; 1 zero row top/bottom + to Hp+2
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + Hp - H), (1, Wp - W - 1)))
    # three H-shifted copies so an 8-row output block reads block-aligned
    # 8-row slices (no halo): tap row dh of out rows [r, r+8) = rows
    # [r+dh, r+8+dh) of xp = rows [r, r+8) of xp[:, :, dh:]
    x0 = xp[:, :, 0:Hp, :]
    x1 = xp[:, :, 1:Hp + 1, :]
    x2 = xp[:, :, 2:Hp + 2, :]
    kern = kernel.astype(x.dtype)
    spec = pl.BlockSpec((1, C, 8, Wp), lambda b, h: (b, 0, h, 0))
    out = pl.pallas_call(
        _pconv_kernel,
        grid=(B, Hp // 8),
        in_specs=[
            pl.BlockSpec((3, 3, C, O), lambda b, h: (0, 0, 0, 0)),
            spec, spec, spec,
        ],
        out_specs=pl.BlockSpec((1, O, 8, Wp), lambda b, h: (b, 0, h, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O, Hp, Wp), x.dtype),
        interpret=interpret or not _on_tpu(),
    )(kern, x0, x1, x2)
    return out[:, :, :H, :W] + bias.astype(x.dtype)[None, :, None, None]
