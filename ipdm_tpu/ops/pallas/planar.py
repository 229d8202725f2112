"""Fused planar-level UNet unit: conv3x3(silu(a*x + b)) + bias [+ skip].

The shallow UNet levels (C = 4..16 at 2000x912 / 1000x456) run in planar
[B, C, H, W] layout. XLA's best lowering for their 3x3 convs (the
``PLANAR_SMALLC = "stack"`` path, models/unet.py) emits one fusion PER
OUTPUT CHANNEL, each re-deriving the nine shifted tap views of the full
input — measured ~30 ms of 486 GB/s loop fusions per 2000x912 UNet eval
(~46% of the eval; docs/PERF.md round-4 trace). Every single-pass XLA
rewrite loses in context because the per-channel fusions absorb the
pad + GN/silu producer for free.

This kernel is the structurally different design: ONE pass per
GN->silu->conv unit that applies the (precomputed) GroupNorm affine and
SiLU inline, reads each input block once (3x for the row halo), and
accumulates all output channels in a VMEM f32 scratch. The GN statistics
stay outside (a single cheap fused reduction); what the kernel needs are
the per-(batch, channel) affine coefficients

    a[b, c] = rstd[b, g(c)] * scale[c]
    b[b, c] = bias[c] - mean[b, g(c)] * rstd[b, g(c)] * scale[c]

so `silu(a*x + b)` == `silu(GN(x))` exactly.

Replaces the per-channel-fusion lowering of the reference's shallow
float32 NCHW convs (reference model.py:95-130 ResBlock at
channel_mult <= 0.25 levels); parity vs the unfused path is tested in
interpret mode (tests/test_planar_fused.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tree_sum(terms):
    """Pairwise-balanced sum — shortens the FMA dependency chain vs a
    linear fold (Mosaic schedules the independent adds in parallel)."""
    terms = list(terms)
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _unit_kernel_v2(a_ref, bb_ref, w_ref, bias_ref, xm_ref, x0_ref, xp_ref,
                    *rest, Wreal, H, Ht, act, has_skip):
    """Fully-unrolled unit body (C, O are static): the nine shifted tap
    tiles are materialized ONCE per input channel (the v1 fori_loop body
    re-derived the sublane-unaligned slices on every output-channel
    iteration) and the O accumulators live as SSA values — Mosaic keeps
    them in vregs and spills to VMEM only under pressure, replacing v1's
    unconditional per-(c,o) scratch read-modify-write. Halo rows arrive
    as single-row blocks (v1 fetched two full Ht-row blocks per step and
    used one row of each: 3x input DMA)."""
    if has_skip:
        skip_ref, out_ref = rest
    else:
        (out_ref,) = rest
    C = x0_ref.shape[1]
    O = out_ref.shape[1]
    Wp = x0_ref.shape[3]
    b = pl.program_id(0)
    v = pl.program_id(1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, Wp), 0) + v * Ht - 1
    coli = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, Wp), 1)
    mask = ((rowi >= 0) & (rowi < H) & (coli < Wreal)).astype(jnp.float32)

    acc = [None] * O
    for c in range(C):
        xc = jnp.concatenate([xm_ref[0, c, 7:8, :], x0_ref[0, c],
                              xp_ref[0, c, 0:1, :]],
                             axis=0).astype(jnp.float32)
        xh = xc * a_ref[b, c] + bb_ref[b, c]
        if act:
            xh = xh * jax.nn.sigmoid(xh)
        xh = xh * mask
        left = pltpu.roll(xh, shift=1, axis=1)
        right = pltpu.roll(xh, shift=Wp - 1, axis=1)
        if Wp == Wreal:
            # no padding lane: the roll wraps REAL data into the conv's
            # zero-pad columns — mask it (when Wp > Wreal the wrapped
            # value is already a masked padding zero)
            left = left * (coli >= 1).astype(jnp.float32)
            right = right * (coli <= Wp - 2).astype(jnp.float32)
        shifted = (left, xh, right)
        taps = [shifted[dw][dh:dh + Ht]
                for dh in range(3) for dw in range(3)]
        for o in range(O):
            t = _tree_sum([w_ref[(dh * 3 + dw) * C + c, o]
                           * taps[dh * 3 + dw]
                           for dh in range(3) for dw in range(3)])
            acc[o] = t if acc[o] is None else acc[o] + t
    # NOTE (wide mode): output pad lanes carry bias/skip junk — by
    # design. Consumers handle it: this kernel masks its INPUT
    # (coli < Wreal above), GN stats mask inside their fused reduction
    # (models/unet.py), the einsum-path convs pre-mask, and the
    # planar->NHWC boundary slices to the real width. Zeroing pads here
    # (an output mask) was tried and reverted: the extra live array blew
    # Mosaic's 16M stack context-dependently (r5 session log).
    for o in range(O):
        r = acc[o] + bias_ref[b, o]
        if has_skip:
            r = r + skip_ref[0, o].astype(jnp.float32)
        out_ref[0, o] = r.astype(out_ref.dtype)


def _unit_kernel(a_ref, bb_ref, w_ref, bias_ref, xm_ref, x0_ref, xp_ref,
                 *rest, Wreal, H, Ht, act, has_skip):
    if has_skip:
        skip_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    C = x0_ref.shape[1]
    O = out_ref.shape[1]
    Wp = x0_ref.shape[3]
    b = pl.program_id(0)
    v = pl.program_id(1)
    # xc row i is global row v*Ht - 1 + i; mask kills halo rows fetched
    # via the clamped index maps at the edges, rows past H, and lane
    # padding past the real width (the conv's zero padding).
    rowi = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, Wp), 0) + v * Ht - 1
    coli = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, Wp), 1)
    mask = ((rowi >= 0) & (rowi < H) & (coli < Wreal)).astype(jnp.float32)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def c_body(c, _):
        top = xm_ref[0, c, Ht - 1:Ht, :]
        bot = xp_ref[0, c, 0:1, :]
        xc = jnp.concatenate([top, x0_ref[0, c], bot],
                             axis=0).astype(jnp.float32)
        xh = xc * a_ref[b, c] + bb_ref[b, c]
        if act:
            xh = xh * jax.nn.sigmoid(xh)
        xh = xh * mask
        # cols[dw][i, w] = xh[i, w + dw - 1]; lane wrap lands only in the
        # masked pad region (col 0 pulls col Wp-1 == 0; col Wp-1 garbage
        # stays in padding, which every consumer masks)
        cols = (pltpu.roll(xh, shift=1, axis=1), xh,
                pltpu.roll(xh, shift=Wp - 1, axis=1))
        if Wp == Wreal:
            # no padding lane: the lane wrap lands on REAL data (see v2)
            cols = (cols[0] * (coli >= 1).astype(jnp.float32), cols[1],
                    cols[2] * (coli <= Wp - 2).astype(jnp.float32))

        def o_body(o, _):
            t = None
            for dh in range(3):
                for dw in range(3):
                    wsc = w_ref[(dh * 3 + dw) * C + c, o]
                    term = wsc * cols[dw][dh:dh + Ht]
                    t = term if t is None else t + term
            acc_ref[pl.ds(o, 1)] += t[None]
            return 0

        jax.lax.fori_loop(0, O, o_body, 0)
        return 0

    jax.lax.fori_loop(0, C, c_body, 0)

    def w_body(o, _):
        r = acc_ref[pl.ds(o, 1)] + bias_ref[b, o]
        if has_skip:
            r = r + skip_ref[0, pl.ds(o, 1)].astype(jnp.float32)
        out_ref[0, pl.ds(o, 1)] = r.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, O, w_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("act", "ht", "interpret", "v2",
                                    "wreal"))
def planar_unit(x: jnp.ndarray, a: jnp.ndarray, bb: jnp.ndarray,
                w: jnp.ndarray, bias: jnp.ndarray, skip=None, *,
                act: bool = True, ht: int = 64,
                interpret: bool = False, v2: bool = False,
                wreal: int | None = None) -> jnp.ndarray:
    """conv3x3_pad1(silu(a*x + bb)) + bias [+ skip] over planar tensors.

    x: [B, C, H, W]; a, bb: [B, C] f32 (identity: a=1, bb=0); w: [3, 3, C,
    O] f32 (HWIO, matching Conv3x3 params); bias: [B, O] f32 (conv bias
    plus any per-channel additive term, e.g. the time embedding); skip:
    optional [B, O, H, W] added to the output. act=False skips the SiLU
    (plain affine+conv, e.g. stem/upsample convs). Returns [B, O, H, W]
    in x.dtype; f32 accumulation.

    Wide mode (wreal given, x already lane-padded: W % 128 == 0,
    W >= wreal): x's last wreal..W lanes are padding that persists
    ACROSS units (models/unet.py PLANAR_WIDE) — the kernel skips the
    entry pad and the exit W-slice and masks its input with wreal, so
    chains of units at the same resolution never re-materialize
    pad/slice copies. The OUTPUT's pad lanes carry bias/skip junk;
    every wide consumer masks or slices (see _unit_kernel_v2 note).
    """
    B, C, H, W = x.shape
    O = w.shape[3]
    wide = (wreal is not None and W % 128 == 0 and W >= wreal)
    if wreal is not None and not wide:
        wreal_i = int(wreal)
        assert wreal_i == W, (wreal, x.shape)
        wreal = None
    if v2 and C >= 16 and C % 8 == 0:
        # Split wide-C units into 8-channel kernels chained via skip: the
        # v2 body's cost grows superlinearly in C (Ht shrinks with the
        # VMEM fit, halo/fixed overheads multiply) — the r5 trace has the
        # C=16 up-concat unit at 2.28 ms vs 0.89 for C=8 units; two
        # chained C=8 kernels + the extra out roundtrip are ~1.85 ms.
        # Exact up to one bf16 round of the intermediate (f32 accumulate
        # per chunk). C=12 measured NOT worth splitting (1.31 vs ~1.45).
        out = skip
        zero_bias = jnp.zeros_like(bias)
        for i in range(0, C, 8):
            out = planar_unit(x[:, i:i + 8], a[:, i:i + 8],
                              bb[:, i:i + 8], w[:, :, i:i + 8],
                              bias if i == 0 else zero_bias, out,
                              act=act, ht=ht, interpret=interpret,
                              v2=True, wreal=wreal)
        return out
    # v2 emits C*O*9 straight-line multiply-adds (_unit_kernel_v2 unrolls
    # both channel loops); compile time and code size balloon past the
    # fused-unit gate's C*O<=160 regime, so refuse silently-pathological
    # shapes rather than compile them.
    if v2 and C * O > 256:
        raise ValueError(
            f"planar_unit v2 is fully unrolled (C*O*9 terms); C*O="
            f"{C * O} > 256 would compile pathologically — use v2=False")
    Wp = _round_up(W, 128)
    # fit the per-step VMEM footprint (3 double-buffered input blocks +
    # f32 acc scratch + double-buffered out block [+ skip]) in ~10 MB of
    # the 16 MB budget; the C=32 up-blocks at Wp=512 otherwise stack-OOM
    ib = jnp.dtype(x.dtype).itemsize
    per_row = (3 * C * ib * 2 + O * 4 + O * ib * 2
               + (O * ib * 2 if skip is not None else 0)) * Wp
    if v2:
        # v2 keeps O f32 accumulators + 9 materialized f32 tap tiles on
        # the Mosaic stack (scoped vmem, 16 MB hard limit) in addition
        # to the blocked operands. The blocked operands (main input
        # block, out, skip) are still pipelined by Pallas, so they count
        # x2 for double buffering; the two 8-row halo blocks are
        # Ht-independent and budgeted as a fixed cost.
        per_row = (2 * C * ib + 2 * O * ib + O * 4 + 9 * 4 + 4 * 4
                   + (2 * O * ib if skip is not None else 0)) * Wp
        halo_bytes = 2 * 2 * C * 8 * Wp * ib  # 2 blocks, double-buffered
        fit = max(8, int((11e6 - halo_bytes) / max(per_row, 1)) // 8 * 8)
        Ht = max(8, min(ht, fit, _round_up(H, 8)) // 8 * 8)
    else:
        fit = max(8, int(10e6 / max(per_row, 1)) // 8 * 8)
        Ht = min(ht, fit, _round_up(H, 8))
    Hp = _round_up(H, Ht)
    nb = Hp // Ht
    xpad = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
    wr = int(wreal) if wide else W
    w2 = w.astype(jnp.float32).reshape(9 * C, O)
    has_skip = skip is not None
    args = [a.astype(jnp.float32), bb.astype(jnp.float32), w2,
            bias.astype(jnp.float32), xpad, xpad, xpad]
    in_specs = [
        pl.BlockSpec((B, C), lambda b, v: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((B, C), lambda b, v: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((9 * C, O), lambda b, v: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((B, O), lambda b, v: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    if v2:
        # 8-row halo blocks (Mosaic requires sublane blocks % 8): row
        # v*Ht-1 is row 7 of 8-row block v*Ht/8 - 1, row v*Ht+Ht is row
        # 0 of block (v+1)*Ht/8 — edge-clamped (the clamped duplicate
        # row is masked off in-kernel). 16 halo rows DMA'd per step vs
        # v1's 2*Ht.
        assert Ht % 8 == 0, Ht
        h8 = Ht // 8
        n8 = Hp // 8
        in_specs += [
            pl.BlockSpec((1, C, 8, Wp),
                         lambda b, v: (b, 0, jnp.maximum(v * h8 - 1, 0),
                                       0)),
            pl.BlockSpec((1, C, Ht, Wp), lambda b, v: (b, 0, v, 0)),
            pl.BlockSpec((1, C, 8, Wp),
                         lambda b, v: (b, 0,
                                       jnp.minimum((v + 1) * h8, n8 - 1),
                                       0)),
        ]
    else:
        in_specs += [
            pl.BlockSpec((1, C, Ht, Wp),
                         lambda b, v: (b, 0, jnp.maximum(v - 1, 0), 0)),
            pl.BlockSpec((1, C, Ht, Wp), lambda b, v: (b, 0, v, 0)),
            pl.BlockSpec((1, C, Ht, Wp),
                         lambda b, v: (b, 0, jnp.minimum(v + 1, nb - 1),
                                       0)),
        ]
    if has_skip:
        args.append(jnp.pad(skip, ((0, 0), (0, 0), (0, Hp - H),
                                   (0, Wp - W))))
        in_specs.append(pl.BlockSpec((1, O, Ht, Wp),
                                     lambda b, v: (b, 0, v, 0)))
    kern = _unit_kernel_v2 if v2 else _unit_kernel
    out = pl.pallas_call(
        functools.partial(kern, Wreal=wr, H=H, Ht=Ht, act=act,
                          has_skip=has_skip),
        grid=(B, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, O, Ht, Wp), lambda b, v: (b, 0, v, 0)),
        out_shape=jax.ShapeDtypeStruct((B, O, Hp, Wp), x.dtype),
        scratch_shapes=(
            [] if v2 else [pltpu.VMEM((O, Ht, Wp), jnp.float32)]),
        interpret=interpret or not _on_tpu(),
    )(*args)
    return out[:, :, :H, :W]
