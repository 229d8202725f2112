"""Pallas TPU kernel: one-pass planar (W-minor) 3x3 convolution for tiny
channel counts.

The proj UNet's full-resolution levels run planar [B, C, H, W] with
C in {4, 8} (models/unet.py module docstring). XLA lowers the unrolled
scalar-FMA form to ONE loop fusion PER OUTPUT CHANNEL: each fusion re-reads
the whole padded input and dynamic-update-slices its channel into an
AllocateBuffer — measured ~20 ms/eval of constant_dynamic-update-slice
fusions + ~5 ms of 8-tuple tap materializations in the round-4 device
trace (jax.profiler through the relay), ~40% of the whole 2000x912 eval.
Every algebraic rewrite tried (one-pass broadcast-sum, tap-einsum,
patch-einsum) loses in context (scripts/probe_eval_r4.py).

Here: grid over (batch, H blocks); each step reads the three H-shifted
views of its block ONCE, builds the three W-taps as lane rolls (the W pad
margin is zeroed so wrap-around is exact), and accumulates all O output
channels in f32 on the VPU — 9*C*O FMAs per pixel, one write. The halo is
expressed as three disjointly-blocked H-shifted views (XLA materializes
them as cheap slices of one pad) because Pallas BlockSpecs cannot overlap.

TPU-only in production (models/unet.py gates on platform; off-TPU the
scalar-stack path keeps the CPU test suite's exact numerics); interpret
mode is used by the semantics unit test.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_hb(H: int) -> int:
    for hb in (40, 32, 24, 16, 8):
        if H % hb == 0:
            return hb
    for hb in range(min(H, 40), 0, -1):
        if H % hb == 0:
            return hb
    return H


def _pconv_kernel(k_ref, b_ref, x0_ref, x1_ref, x2_ref, out_ref, *,
                  C: int, O: int):
    xs = (x0_ref, x1_ref, x2_ref)
    acc = [None] * O
    for dh in range(3):
        for c in range(C):
            row = xs[dh][0, c].astype(jnp.float32)        # [hb, Wp]
            for dw in range(3):
                sh = row if dw == 1 else pltpu.roll(row, 1 - dw, axis=1)
                for o in range(O):
                    t = k_ref[dh, dw, c, o] * sh
                    acc[o] = t if acc[o] is None else acc[o] + t
    for o in range(O):
        out_ref[0, o] = (acc[o] + b_ref[o]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def planar_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """x: [B, C, H, W] planar; kernel: [3, 3, C, O]; bias: [O].
    Stride-1 SAME 3x3 conv -> [B, O, H, W]; f32 accumulation, output in
    x.dtype."""
    B, C, H, W = x.shape
    O = kernel.shape[-1]
    Wp = _round_up(W + 2, 128)
    hb = _pick_hb(H)
    # data sits in columns [1, W]; every margin column is zero so the
    # lane rolls' wrap-around lands only on zeros
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, Wp - W - 1)))
    views = [jax.lax.slice_in_dim(xp, dh, dh + H, axis=2) for dh in range(3)]
    vspec = pl.BlockSpec((1, C, hb, Wp), lambda b, i: (b, 0, i, 0))
    out = pl.pallas_call(
        functools.partial(_pconv_kernel, C=C, O=O),
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((3, 3, C, O), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((O,), lambda b, i: (0,),
                         memory_space=pltpu.SMEM),
            vspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((1, O, hb, Wp), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O, H, Wp), x.dtype),
        interpret=interpret or not _on_tpu(),
    )(kernel.astype(jnp.float32), bias.astype(jnp.float32), *views)
    return jax.lax.slice_in_dim(out, 1, W + 1, axis=3)
