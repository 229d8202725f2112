"""Pallas TPU kernels: per-row dynamic-slice shift/accumulate primitives.

These are the hot inner kernels of the fast CT reconstructors
(recon.fbp_fast backprojection, recon.sart_fast FP/BP). The access pattern —
for every image row, read/write a contiguous window of a per-view resampled
signal at a *data-dependent per-row offset* — cannot be expressed as an XLA
gather without falling onto the TPU's scalar gather path (~10 ns/element,
measured); in Pallas it is exactly `ref[pl.ds(start, n)]` with the starts
staged through SMEM.

Each grid step processes a block of VB=8 views (TPU block shapes need the
second-to-last dim divisible by 8); callers pad the view count to 8·k.

`bp_shift_accumulate(Q2, s0, s1, frac, n)`:
    out[y, j] = Σ_v (1−frac[v,y])·Q2[v, s0[v,y]+j] + frac[v,y]·Q2[v, s1[v,y]+j]
    — the backprojection accumulate over a group of views. Grid over view
    blocks, output block revisited (accumulated) every step.

`fp_shift_deposit(rows, s0, s1, w0, w1, L)`:
    out[v, s0[v,y]+j] += w0[v,y]·rows[y,j]  (and the s1/w1 tap) for every row
    y — the forward-projection shear deposit; per-view independent outputs.

Both fall back to interpreter mode off-TPU (used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VB = 8  # views per grid step


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pad_views(*arrays, axis: int = 0):
    """Pad the view axis of each array up to a multiple of VB (zeros)."""
    V = arrays[0].shape[axis]
    rem = (-V) % VB
    if rem == 0:
        return arrays
    out = []
    for a in arrays:
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, rem)
        out.append(jnp.pad(a, pads))
    return tuple(out)


# ---------------------------------------------------------------------------
# BP v2: batched, roll-table variant
# ---------------------------------------------------------------------------
#
# The v1 kernel (below) pays one dynamic lane-roll per (view, row, tap) —
# 2000·512·2 sequential [1, n+128] rolls dominate the fast-FBP runtime
# (~280 ms per batch item on v5e). v2 restructures:
#   * the batch dim B rides along inside one kernel call (window starts are
#     B-independent), so cost is ~B-independent;
#   * per view, ALL 128 lane-rotations of the [B, L] signal are precomputed
#     once into a VMEM table (128 rolls instead of 2·n), after which every
#     window read is a fast 128-aligned dynamic slice T2R[rem, :, base:base+n].


def _bp2_kernel(s0_ref, s1_ref, frac_ref, q_ref, out_ref, t2r, *,
                row_unroll=1):
    blk = pl.program_id(0)
    # zero derived from a (finite) SMEM read: stays traced even under
    # jax.ensure_compile_time_eval (a literal jnp.zeros would evaluate
    # eagerly there and become an illegal captured constant)
    zf = frac_ref[0, 0] * 0.0

    @pl.when(blk == 0)
    def _():
        out_ref[...] = jnp.broadcast_to(zf, out_ref.shape).astype(
            out_ref.dtype)

    VB, B, L = q_ref.shape
    n = out_ref.shape[-1]
    R = row_unroll if n % row_unroll == 0 else 1

    for vi in range(VB):  # static unroll over the view block
        sig = q_ref[vi]                                    # [B, L]

        def roll_body(k, _):
            t2r[pl.ds(k, 1)] = pltpu.roll(sig, shift=L - k, axis=1)[None]
            return 0

        jax.lax.fori_loop(0, 128, roll_body, 0)

        def row_body(yb, _):
            for r in range(R):  # static unroll: amortize loop overhead
                y = yb * R + r
                s0 = s0_ref[vi, y]
                s1 = s1_ref[vi, y]
                f = frac_ref[vi, y]
                a0 = pl.multiple_of((s0 // 128) * 128, 128)
                a1 = pl.multiple_of((s1 // 128) * 128, 128)
                w0 = t2r[pl.ds(s0 - a0, 1), :, pl.ds(a0, n)]  # [1, B, n]
                w1 = t2r[pl.ds(s1 - a1, 1), :, pl.ds(a1, n)]
                cur = out_ref[:, pl.ds(y, 1), :]              # [B, 1, n]
                acc = (1.0 - f) * w0[0] + f * w1[0]           # [B, n]
                out_ref[:, pl.ds(y, 1), :] = cur + acc[:, None, :]
            return 0

        jax.lax.fori_loop(0, n // R, row_body, 0)


@functools.partial(jax.jit, static_argnames=("n", "vb", "interpret",
                                              "row_unroll"))
def bp_shift_accumulate_batched(Q: jnp.ndarray, s0: jnp.ndarray,
                                s1: jnp.ndarray, frac: jnp.ndarray, n: int,
                                vb: int = 8,
                                interpret: bool = False,
                                row_unroll: int = 1) -> jnp.ndarray:
    """Q: [V, B, L] (L a 128-multiple, windows clamped to L−n−128 by the
    caller); s0, s1: [V, n] int32; frac: [V, n] (0 on padded views).
    Returns [B, n, n] = Σ_v two-tap row shifts, all batch items in one pass."""
    V, B, L = Q.shape
    assert L % 128 == 0
    rem = (-V) % vb
    if rem:
        Q = jnp.pad(Q, ((0, rem), (0, 0), (0, 0)))
        s0 = jnp.pad(s0, ((0, rem), (0, 0)))
        s1 = jnp.pad(s1, ((0, rem), (0, 0)))
        frac = jnp.pad(frac, ((0, rem), (0, 0)))
        V += rem
    return pl.pallas_call(
        functools.partial(_bp2_kernel, row_unroll=row_unroll),
        grid=(V // vb,),
        in_specs=[
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, B, L), lambda v: (v, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, n, n), lambda v: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n, n), Q.dtype),
        scratch_shapes=[pltpu.VMEM((128, B, L), Q.dtype)],
        interpret=interpret or not _on_tpu(),
    )(s0, s1, frac, Q)


# ---------------------------------------------------------------------------
# BP: shift rows out of per-view signals, accumulate over views
# ---------------------------------------------------------------------------


def _shifted_window(q_ref, v, start, n):
    """Read q_ref[v, start : start+n] where start is unaligned: aligned
    128-base dynamic slice + dynamic lane roll (Mosaic requires lane-dim
    dynamic slice offsets to be 128-aligned)."""
    a_al = (start // 128) * 128
    rem = start - a_al
    r = q_ref[pl.ds(v, 1), pl.ds(a_al, n + 128)]          # [1, n+128]
    r = pltpu.roll(r, shift=(n + 128) - rem, axis=1)      # left-shift by rem
    return r[0, :n]


def _bp_kernel(s0_ref, s1_ref, frac_ref, q_ref, out_ref):
    blk = pl.program_id(0)
    zf = frac_ref[0, 0] * 0.0  # traced zero (see _bp2_kernel)

    @pl.when(blk == 0)
    def _():
        out_ref[...] = jnp.broadcast_to(zf, out_ref.shape).astype(
            out_ref.dtype)

    n = out_ref.shape[0]

    def body(i, _):
        v = i // n
        y = i % n
        f = frac_ref[v, y]
        r0 = _shifted_window(q_ref, v, s0_ref[v, y], n)
        r1 = _shifted_window(q_ref, v, s1_ref[v, y], n)
        cur = out_ref[pl.ds(y, 1), :]
        out_ref[pl.ds(y, 1), :] = cur + ((1.0 - f) * r0 + f * r1)[None, :]
        return 0

    jax.lax.fori_loop(0, VB * n, body, 0)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def bp_shift_accumulate(Q2: jnp.ndarray, s0: jnp.ndarray, s1: jnp.ndarray,
                        frac: jnp.ndarray, n: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Q2: [V, L]; s0, s1: [V, n] int32 in [0, L−n]; frac: [V, n] (set
    frac=0 on padded views). V must be a multiple of VB (see pad_views).
    Returns [n, n] = Σ_v two-tap row shifts."""
    V, L = Q2.shape
    assert V % VB == 0
    return pl.pallas_call(
        _bp_kernel,
        grid=(V // VB,),
        in_specs=[
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, L), lambda v: (v, 0)),
        ],
        out_specs=pl.BlockSpec((n, n), lambda v: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n), Q2.dtype),
        interpret=interpret or not _on_tpu(),
    )(s0, s1, frac, Q2)


# ---------------------------------------------------------------------------
# FP v2: plane-deposit variant (batched, roll-free row loop)
# ---------------------------------------------------------------------------
#
# The v1 deposit kernel (below) pays, per (view, row, tap): one dynamic lane
# roll of the [1, W+128] row plus an unaligned read-modify-write — 2·n
# sequential roll+RMW pairs per view dominate the fast-SART runtime. v2 is
# the write-side mirror of the BP v2 roll-table idea:
#   * deposits land UNROLLED in a [128, B, L] plane scratch indexed by the
#     offset residue (rem = start % 128) at the 128-aligned base — no
#     per-row roll at all;
#   * after the row loop, the 128 planes are combined with 128 rolls per
#     view (amortized over the 2·n row deposits), accumulated into the
#     output signal;
#   * rows are UNSTUFFED (width n, not n·Kf): the caller passes flat starts
#     into the (k, r)-transposed fine layout T[k·Lq + r] = fine[r·Kf + k],
#     where a stuffed-row deposit becomes a contiguous width-n deposit
#     inside one k-plane — half the VMEM/bandwidth of stuffed rows;
#   * the batch dim B rides inside the call (starts are B-independent).


def _fp2_kernel(s0_ref, s1_ref, w0_ref, w1_ref, rows_ref, out_ref, planes):
    VBk, B, L = out_ref.shape
    n = rows_ref.shape[0]
    W = rows_ref.shape[2]
    zf = w0_ref[0, 0] * 0.0    # traced zero (see _bp2_kernel)

    for vi in range(VBk):      # static unroll over the view block
        planes[...] = jnp.broadcast_to(zf, planes.shape).astype(planes.dtype)

        def row_body(y, _):
            row = rows_ref[pl.ds(y, 1)]                        # [1, B, W]

            def tap(s_ref_, w_ref_):
                start = s_ref_[vi, y]
                base = pl.multiple_of((start // 128) * 128, 128)
                rem = start - base
                cur = planes[pl.ds(rem, 1), :, pl.ds(base, W)]
                planes[pl.ds(rem, 1), :, pl.ds(base, W)] = (
                    cur + w_ref_[vi, y] * row)

            tap(s0_ref, w0_ref)
            tap(s1_ref, w1_ref)
            return 0

        jax.lax.fori_loop(0, n, row_body, 0)

        def comb_body(k, acc):
            # plane k holds deposits whose true start ≡ k (mod 128), written
            # at their aligned base: shift right by k to realign. Tail
            # headroom (L ≥ max start + W + 128) keeps the wrap zero-only.
            pk = planes[pl.ds(k, 1)][0]                        # [B, L]
            return acc + pltpu.roll(pk, shift=k, axis=1)

        z0 = jnp.broadcast_to(zf, (B, L)).astype(out_ref.dtype)
        out_ref[pl.ds(vi, 1)] = jax.lax.fori_loop(
            0, 128, comb_body, z0)[None]


@functools.partial(jax.jit, static_argnames=("L", "vb", "interpret"))
def fp_plane_deposit(rows: jnp.ndarray, s0: jnp.ndarray, s1: jnp.ndarray,
                     w0: jnp.ndarray, w1: jnp.ndarray, L: int, vb: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """rows: [n, B, W] (W a 128-multiple, zero-padded past the data);
    s0, s1: [V, n] int32 flat starts in [0, L−W−128]; w0, w1: [V, n] tap
    weights (zero on padded views). Returns [V, B, L] with
    out[v, :, s{t}[v,y]+j] += w{t}[v,y]·rows[y,:,j] for both taps t."""
    V = s0.shape[0]
    n, B, W = rows.shape
    assert L % 128 == 0 and W % 128 == 0
    rem = (-V) % vb
    if rem:
        s0 = jnp.pad(s0, ((0, rem), (0, 0)))
        s1 = jnp.pad(s1, ((0, rem), (0, 0)))
        w0 = jnp.pad(w0, ((0, rem), (0, 0)))
        w1 = jnp.pad(w1, ((0, rem), (0, 0)))
        V += rem
    return pl.pallas_call(
        _fp2_kernel,
        grid=(V // vb,),
        in_specs=[
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, B, W), lambda v: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((vb, B, L), lambda v: (v, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, B, L), rows.dtype),
        scratch_shapes=[pltpu.VMEM((128, B, L), rows.dtype)],
        interpret=interpret or not _on_tpu(),
    )(s0, s1, w0, w1, rows)


# ---------------------------------------------------------------------------
# FP v3: batched roll-deposit (the v1 access pattern + in-call batch)
# ---------------------------------------------------------------------------
#
# Measured on v5e, the v2 plane scratch (zero [128,B,L] + 128-roll combine
# per view) costs far more than it saves; the v1 roll-per-deposit pattern is
# the fastest known. v3 keeps v1's per-(row,tap) roll+RMW but:
#   * the batch dim B rides inside the call (the roll shift is B-independent,
#     so the [B, W+128] roll costs ~the same as v1's [1, W+128]);
#   * rows are UNSTUFFED (width n, not n·Kf) via the (k, r)-transposed flat
#     layout of fp_plane_deposit — half the roll/RMW bandwidth.


def _fp3_kernel(s0_ref, s1_ref, w0_ref, w1_ref, rows_ref, out_ref):
    n, B, W = rows_ref.shape
    zf = w0_ref[0, 0] * 0.0    # traced zero (see _bp2_kernel)
    out_ref[...] = jnp.broadcast_to(zf, out_ref.shape).astype(out_ref.dtype)

    def deposit(v, start, vals):
        # vals: [B, W+128] with data in [:, :W]; write at unaligned start
        # via aligned base + right roll (tail zeros rotate into the gap)
        a_al = (start // 128) * 128
        rem = start - a_al
        rolled = pltpu.roll(vals, shift=rem, axis=1)
        cur = out_ref[pl.ds(v, 1), :, pl.ds(a_al, W + 128)]   # [1, B, W+128]
        out_ref[pl.ds(v, 1), :, pl.ds(a_al, W + 128)] = cur + rolled[None]

    def body(i, _):
        v = i // n
        y = i % n
        row = rows_ref[pl.ds(y, 1)][0]                        # [B, W]
        z = jnp.broadcast_to(zf, (B, 128)).astype(row.dtype)
        padded = jnp.concatenate([row, z], axis=1)            # [B, W+128]
        deposit(v, s0_ref[v, y], w0_ref[v, y] * padded)
        deposit(v, s1_ref[v, y], w1_ref[v, y] * padded)
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0] * n, body, 0)


@functools.partial(jax.jit, static_argnames=("L", "vb", "interpret"))
def fp_shift_deposit_batched(rows: jnp.ndarray, s0: jnp.ndarray,
                             s1: jnp.ndarray, w0: jnp.ndarray,
                             w1: jnp.ndarray, L: int, vb: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """rows: [n, B, W] (W a 128-multiple); s0, s1: [V, n] int32 flat starts
    in [0, L−W−128]; w0, w1: [V, n] tap weights (zero on padded views).
    Returns [V, B, L] with out[v, :, s{t}[v,y]+j] += w{t}[v,y]·rows[y,:,j].
    Same contract as fp_plane_deposit; different (faster) inner pattern."""
    V = s0.shape[0]
    n, B, W = rows.shape
    assert L % 128 == 0 and W % 128 == 0
    rem = (-V) % vb
    if rem:
        s0 = jnp.pad(s0, ((0, rem), (0, 0)))
        s1 = jnp.pad(s1, ((0, rem), (0, 0)))
        w0 = jnp.pad(w0, ((0, rem), (0, 0)))
        w1 = jnp.pad(w1, ((0, rem), (0, 0)))
        V += rem
    return pl.pallas_call(
        _fp3_kernel,
        grid=(V // vb,),
        in_specs=[
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((vb, n), lambda v: (v, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, B, W), lambda v: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((vb, B, L), lambda v: (v, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, B, L), rows.dtype),
        interpret=interpret or not _on_tpu(),
    )(s0, s1, w0, w1, rows)


# ---------------------------------------------------------------------------
# Fused OS-SART sweep (MXU tap-matrix variant)
# ---------------------------------------------------------------------------
#
# The per-subset FP -> correction -> BP -> update chain, fused into a single
# pallas_call with grid over the drive's subsets and the image persisting in
# the revisited output block (vs the unfused loop's ~4 device thunks per
# (subset, branch) at the ~0.5 ms/thunk sequencing floor). Requires
# drive-pure subsets; the caller runs x-drive subsets, transposes, runs
# y-drive subsets, transposes back (OS update order is a free choice; the
# reference's is 2000 single-view subsets).
#
# A first fused variant (os_sart_sweep: per-row two-tap VPU deposits,
# optional roll-table FP) was pruned after the round-4 host A/B measured it
# 2.5x slower than this MXU form (331 vs 130 ms/sinogram, docs/PERF.md);
# git history at the round-4 commits holds the kernel and its tests.
#
# ---------------------------------------------------------------------------
# Fused OS-SART sweep, MXU variant: per-block tap matrices
# ---------------------------------------------------------------------------
#
# Per-row two-tap VPU deposits would issue ~2 sequential VPU ops per (view,
# image row, tap) — ~2M ops/sweep at the ~100 ns op-sequencing floor (the
# pruned os_sart_sweep kernel did exactly that). This variant
# exploits the AFFINE structure of the offsets: on a Kf=1 fine grid (ray
# spacing = the view's per-row t advance) the deposit/read start s(y) is
# monotone with |Δs| ≤ 1 per row, so any 128-row block spans ≤ 128 fine bins.
# Both projector halves then become dense matmuls against a per-(view, block)
# two-hot tap matrix O[y, k] = (1−f_y)·δ(k = s_y − base) + f_y·δ(k+1 = ...):
#
#   FP  : M = Oᵀ @ x_rows   ([256, R] @ [R, n]) deposited at the aligned
#         base into the 128-residue plane scratch (k < 128 → plane k at
#         base; k ≥ 128 → plane k−128 at base+128), realigned by the
#         standard 128-roll combine;
#   BP  : Y = O @ [table[base : base+n]; table[base+128 : base+128+n]]
#         ([R, 256] @ [256, n]) accumulated into the image rows.
#
# The O matrices are built in-kernel from [R]-vector slices of VMEM tables
# (iota compares — no SMEM scalar loops); roll tables/combines stack G views
# per op to amortize the sequencing floor. The dense matmul pays a ~256×
# FLOP inflation over the two real taps, but rides the MXU instead of the
# VPU sequencing floor — measured net win (docs/PERF.md).


def _oss_mm_kernel(s0_ref, lam_ref, ov_ref, fv_ref, rf_ref, inv2_ref,
                   nrmi_ref, x0_ref, x_ref, T, planes, *, G=2, bf16=False):
    Vp, B, L = T.shape
    n = x_ref.shape[-1]
    R = 128 if n % 128 == 0 else (64 if n % 64 == 0 else n)
    nblk = n // R
    ngrp = Vp // G
    lam = lam_ref[0, 0]
    zf = lam * 0.0  # traced zero (see _bp2_kernel)
    mdt = jnp.bfloat16 if bf16 else jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        x_ref[...] = x0_ref[...]

    def block_O(vi, blk):
        """Transposed two-hot tap matrix Oᵀ[k, y] ([256, R]) for (view vi,
        row block blk), plus the 128-aligned window base and row start.
        Views sit on the SUBLANE dim of the [1, Vp, n] VMEM tables (dynamic
        sublane offsets are legal; lane-dim starts carry a multiple_of
        proof). All loops around this are lax.fori_loops — the Mosaic
        program contains each block body once (the fully unrolled form
        took >20 min to compile)."""
        y0 = pl.multiple_of(blk * R, R)
        sa = s0_ref[0, vi, y0]
        sb = s0_ref[0, vi, y0 + R - 1]
        base = pl.multiple_of((jnp.minimum(sa, sb) // 128) * 128, 128)
        # the start table rides in VMEM as f32 [S, Vp, 1, n] (no dynamic
        # int32 vector loads in Mosaic, and the view index must sit on an
        # UNTILED leading dim — dynamic sublane offsets are unsupported);
        # starts ≤ L ≲ 2¹² are exact in f32, so float equality is safe
        ov = ov_ref[0, pl.ds(vi, 1), 0, pl.ds(y0, R)]       # [1, R] f32
        fv = fv_ref[0, pl.ds(vi, 1), 0, pl.ds(y0, R)]       # [1, R] f32
        rem = ov - base.astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (256, R), 0).astype(jnp.float32)
        OT = (jnp.where(iota == rem, 1.0 - fv, 0.0)
              + jnp.where(iota == rem + 1.0, fv, 0.0))
        return OT.astype(mdt), base, y0

    # ---- FP: per G-view group, block matmuls into the residue planes ----
    def fp_group(gidx, _):
        planes[...] = jnp.broadcast_to(zf, planes.shape).astype(planes.dtype)

        def fp_block(i, _):
            gi = i // nblk
            OT, base, y0 = block_O(gidx * G + gi, i % nblk)
            for b in range(B):  # static unroll (small)
                Xb = x_ref[b, pl.ds(y0, R), :].astype(mdt)       # [R, n]
                M = jax.lax.dot_general(
                    OT, Xb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [256, n]
                cur = planes[:, pl.ds(gi, 1), b, pl.ds(base, n)]
                planes[:, pl.ds(gi, 1), b, pl.ds(base, n)] = (
                    cur + M[:128][:, None, :])
                cur = planes[:, pl.ds(gi, 1), b, pl.ds(base + 128, n)]
                planes[:, pl.ds(gi, 1), b, pl.ds(base + 128, n)] = (
                    cur + M[128:][:, None, :])
            return 0

        jax.lax.fori_loop(0, G * nblk, fp_block, 0)

        def comb_body(k, acc):
            pk = planes[pl.ds(k, 1)][0]                          # [G, B, L]
            return acc + pltpu.roll(pk, shift=k, axis=2)

        z0 = jnp.broadcast_to(zf, (G, B, L)).astype(T.dtype)
        T[pl.ds(gidx * G, G)] = jax.lax.fori_loop(0, 128, comb_body, z0)
        return 0

    jax.lax.fori_loop(0, ngrp, fp_group, 0)

    # ---- correction (elementwise, pre-masked tables) --------------------
    T[...] = rf_ref[0] - T[...] * inv2_ref[0][:, None, :]

    # ---- BP: G-view roll tables, block matmuls into the image rows ------
    def bp_group(gidx, _):
        sigG = T[pl.ds(gidx * G, G)]                             # [G, B, L]

        def roll_body(k, _):
            planes[pl.ds(k, 1)] = pltpu.roll(
                sigG, shift=L - k, axis=2)[None]
            return 0

        jax.lax.fori_loop(0, 128, roll_body, 0)

        def bp_block(i, _):
            gi = i // nblk
            OT, base, y0 = block_O(gidx * G + gi, i % nblk)
            W1 = planes[:, pl.ds(gi, 1), :, pl.ds(base, n)][:, 0]
            W2 = planes[:, pl.ds(gi, 1), :, pl.ds(base + 128, n)][:, 0]
            g = lam * nrmi_ref[0, pl.ds(y0, R), :]               # [R, n]
            for b in range(B):  # static unroll (small)
                Win = jnp.concatenate([W1[:, b, :], W2[:, b, :]],
                                      axis=0).astype(mdt)        # [256, n]
                Y = jax.lax.dot_general(
                    OT, Win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [R, n]
                cur = x_ref[b, pl.ds(y0, R), :]
                x_ref[b, pl.ds(y0, R), :] = cur + g * Y
            return 0

        jax.lax.fori_loop(0, G * nblk, bp_block, 0)
        return 0

    jax.lax.fori_loop(0, ngrp, bp_group, 0)

    # ---- nonnegativity clamp (reference update_kernel) ------------------
    x_ref[...] = jnp.maximum(x_ref[...], zf)


@functools.partial(jax.jit, static_argnames=("interpret", "G", "bf16"))
def os_sart_sweep_mm(x: jnp.ndarray, rf: jnp.ndarray, inv2: jnp.ndarray,
                     frac: jnp.ndarray, s0: jnp.ndarray,
                     nrmi: jnp.ndarray, lam: jnp.ndarray,
                     interpret: bool = False, G: int = 2,
                     bf16: bool = False) -> jnp.ndarray:
    """One OS-SART sweep over a drive's subsets — MXU tap-matrix variant.

    x: [B, n, n] drive-frame image (rows are deposit rows). rf:
    [S, Vp, B, L] pre-masked measured ratios on the flat fine grid; inv2:
    [S, Vp, L] pre-masked scale·(1/n_fine); frac: [S, Vp, n] tap
    fractions; nrmi: [S, n, n] per-subset 1/bp_norm (0 where dead); lam:
    scalar relaxation. Returns the updated [B, n, n] image. REQUIRES a
    plan built on a Kf=1 fine grid (per-view flat starts monotone,
    |Δs| ≤ 1 per image row — any R-row block spans ≤ R ≤ 128 bins past
    its aligned base). s0: [S, Vp, n] int32 flat window starts (rides in
    BOTH SMEM — scalar base reads — and VMEM — vector tap-matrix builds).
    The s1 table is implicit (s0 + 1).
    """
    S, Vp, B, L = rf.shape
    n = x.shape[-1]
    assert L % 128 == 0
    while Vp % G:
        G -= 1
    lam2 = jnp.reshape(jnp.asarray(lam, x.dtype), (1, 1))
    return pl.pallas_call(
        functools.partial(_oss_mm_kernel, G=G, bf16=bf16),
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, Vp, n), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Vp, 1, n), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, Vp, 1, n), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, Vp, B, L), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, Vp, L), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, n, n), lambda s: (s, 0, 0)),
            pl.BlockSpec((B, n, n), lambda s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, n, n), lambda s: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((Vp, B, L), x.dtype),
                        pltpu.VMEM((128, G, B, L), x.dtype)],
        interpret=interpret or not _on_tpu(),
    )(s0, lam2, s0.astype(jnp.float32)[:, :, None, :],
      frac[:, :, None, :], rf, inv2, nrmi, x)


# ---------------------------------------------------------------------------
# FP: deposit rows into per-view signals at per-row offsets
# ---------------------------------------------------------------------------


def _fp_kernel(s0_ref, s1_ref, w0_ref, w1_ref, rows_ref, out_ref):
    n, W = rows_ref.shape
    zf = w0_ref[0, 0] * 0.0    # traced zero (see _bp2_kernel)
    out_ref[...] = jnp.broadcast_to(zf, out_ref.shape).astype(out_ref.dtype)

    def deposit(v, start, vals):
        # vals: [1, W+128] with data in [:W]; write at unaligned start via
        # aligned base + right roll (tail zeros rotate into the gap)
        a_al = (start // 128) * 128
        rem = start - a_al
        rolled = pltpu.roll(vals, shift=rem, axis=1)
        cur = out_ref[pl.ds(v, 1), pl.ds(a_al, W + 128)]
        out_ref[pl.ds(v, 1), pl.ds(a_al, W + 128)] = cur + rolled

    def body(i, _):
        v = i // n
        y = i % n
        row = rows_ref[pl.ds(y, 1), :]                    # [1, W]
        z = jnp.broadcast_to(zf, (1, 128)).astype(row.dtype)
        padded = jnp.concatenate([row, z], axis=1)        # [1, W+128]
        deposit(v, s0_ref[v, y], w0_ref[v, y] * padded)
        deposit(v, s1_ref[v, y], w1_ref[v, y] * padded)
        return 0

    jax.lax.fori_loop(0, VB * n, body, 0)


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def fp_shift_deposit(rows: jnp.ndarray, s0: jnp.ndarray, s1: jnp.ndarray,
                     w0: jnp.ndarray, w1: jnp.ndarray, L: int,
                     interpret: bool = False) -> jnp.ndarray:
    """rows: [n, W] (driven orientation; W = deposit width, e.g. n·Kf for
    zero-stuffed rows); s0, s1: [V, n] int32 in [0, L−W]; w0, w1: [V, n]
    (zero weights on padded views). Returns [V, L] per-view signals."""
    V = s0.shape[0]
    n, W = rows.shape
    assert V % VB == 0
    return pl.pallas_call(
        _fp_kernel,
        grid=(V // VB,),
        in_specs=[
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, n), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, W), lambda v: (0, 0)),
        ],
        out_specs=pl.BlockSpec((VB, L), lambda v: (v, 0)),
        out_shape=jax.ShapeDtypeStruct((V, L), rows.dtype),
        interpret=interpret or not _on_tpu(),
    )(s0, s1, w0, w1, rows)




# ---------------------------------------------------------------------------
# Windowed multi-tap anterpolation (project_fast's fine→t-bin resample)
#
# _fp_group anterpolates each view's fine-grid ray sums T[v, :, m] onto the
# t bins: out[v, :, d] = Σ_k w_k(v,d) · T[v, :, m0(v,d) + k], with m0 an
# affine-monotone (per view, either direction) index table and Wt = 2·Kf+2
# static taps. XLA lowers the data-dependent gather on the TPU scalar path
# (~10 ns/element; measured 1.06 s for the 512² LDCT-sim projection). Here
# the monotone structure turns each 128-output block into one aligned
# window read + roll, Wt iota-compares building a banded [D, 128] tap
# matrix, and a single MXU contraction — the same trick as the BP roll
# table (docs/PERF.md), generalized to Wt weighted taps.

_WTR_D = 288    # per-block source span bound: 128/step + taps; the Siemens
#   rebinned geometry's min step is ≈0.49 (span ≈265), so D=288 covers
#   every step ≥ 0.456
_WTR_WIN = 512  # aligned window read size: 127 (max rem) + _WTR_D + slack


def _wtr_kernel(qis_ref, qi_ref, w_ref, p_ref, out_ref, *, Wt):
    _, B, Ntp = p_ref.shape
    Lp = out_ref.shape[-1]
    D = _WTR_D
    for v in range(VB):
        for j in range(Lp // 128):
            first = qis_ref[v, j * 128]
            last = qis_ref[v, j * 128 + 127]
            base = jnp.minimum(first, last)  # monotone either direction
            a = pl.multiple_of((base // 128) * 128, 128)
            rem = base - a
            w = p_ref[v, :, pl.ds(a, _WTR_WIN)]              # [B, WIN]
            w2 = pltpu.roll(w, shift=_WTR_WIN - rem, axis=1)  # [:,i]=w[rem+i]
            qi2 = qi_ref[v, pl.ds(j * 128, 128)] - base      # [128] in [0,D)
            iota = jax.lax.broadcasted_iota(jnp.int32, (D, 128), 0)
            Wm = jnp.zeros((D, 128), jnp.float32)
            for k in range(Wt):
                ck = (iota == qi2[None, :] + k).astype(jnp.float32)
                Wm = Wm + ck * w_ref[v, k * Lp + j * 128:
                                     k * Lp + (j + 1) * 128][None]
            blk = jax.lax.dot_general(
                w2[:, :D].astype(jnp.float32), Wm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [B, 128]
            out_ref[v, :, pl.ds(j * 128, 128)] = blk.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def anterp_taps(P: jnp.ndarray, qi0: jnp.ndarray, W: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """out[v, :, d] = Σ_k W[v, k, d] · P[v, :, qi0[v, d] + k].

    P: [V, B, Ntp] source rows, zero-padded so Ntp % 128 == 0 and
    Ntp ≥ max(qi0) + _WTR_WIN (window headroom). qi0: [V, Lp] int32 ≥ 0,
    MONOTONE per view (either direction) with within-128-block span
    < _WTR_D − Wt (callers check; step ≥ 0.456 guarantees it). W:
    [V, Wt, Lp] f32 tap weights (zero where the tap is out of range).
    Lp % 128 == 0. The view axis is padded to VB=8 internally (Mosaic
    needs the SMEM block's second-minor dim divisible by 8)."""
    V, B, Ntp = P.shape
    Wt = W.shape[1]
    Lp = qi0.shape[-1]
    assert Ntp % 128 == 0 and Lp % 128 == 0
    P, qi0, W = pad_views(P, qi0, W)
    Vp = P.shape[0]
    out = pl.pallas_call(
        functools.partial(_wtr_kernel, Wt=Wt),
        grid=(Vp // VB,),
        in_specs=[
            pl.BlockSpec((VB, Lp), lambda v: (v, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((VB, Lp), lambda v: (v, 0)),
            pl.BlockSpec((VB, Wt * Lp), lambda v: (v, 0)),
            pl.BlockSpec((VB, B, Ntp), lambda v: (v, 0, 0)),
        ],
        out_specs=pl.BlockSpec((VB, B, Lp), lambda v: (v, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Vp, B, Lp), P.dtype),
        interpret=interpret or not _on_tpu(),
    )(qi0, qi0, W.reshape(Vp, Wt * Lp), P)
    return out[:V]
