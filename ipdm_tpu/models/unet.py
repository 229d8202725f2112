"""DDPM ε-prediction UNet, TPU-native (Flax linen, NHWC + planar shallow mode).

Architecturally equivalent to the reference UNetModel (Model/model.py:190-310):
same channel_mult semantics (channel_mult[0] scales the stem conv;
downsampling after every level except the last), same GroupNorm group-count
rule (model.py:69-90), attention inserted where the downsample factor `ds` is
in attention_resolutions, explicit-size nearest upsampling so the odd-shaped
2000×912 sinogram pyramid (2000→1000→500→250→125→63) round-trips exactly, and
the same 4×-wide sinusoidal timestep MLP.

TPU-first choices:

* **Planar shallow mode** (the big one): blocks whose output channel count is
  ≤ `planar_max_c` run in W-minor [B, C, H, W] layout with convs expressed as
  nine shifted channel-contraction einsums. In NHWC, XLA materializes the
  shallow sinogram levels' C∈{4,8,16} tensors in C-minor lane tiles padded
  toward 128 — up to 16× the bytes — between fusions; measured on a v5e, the
  whole C=8 level at 2000×912 drops 31.7 → 13.0 ms when run planar
  (scripts/probe_planar.py; lax.conv with NCHW dimension numbers is *worse*,
  57.7 ms, because the conv op itself forces C-minor relayouts). Deep levels
  (C ≥ 128) stay NHWC where XLA's conv emitter is near its practical peak
  (~50 TF/s bf16 measured). Layouts convert only at the shallow↔deep
  boundary, where channel counts make the transpose cheap.
* bf16 activations with f32 params option; f32 GroupNorm statistics.
* Nearest-resize as repeat(2×)+crop for the dst ∈ {2s, 2s−1} sizes every UNet
  upsample produces (provably identical to torch's floor(i·src/dst) rule:
  the gap i/(2(2s−1)) < 1/2 never crosses frac(i/2) ∈ {0, ½}); one-hot
  matmul resize for general sizes (arbitrary gathers take the TPU scalar
  path, ~10 ns/element).
* im2col-einsum for small-C NHWC convs, fused einsum attention, no
  data-dependent Python control flow — the module jits once per input shape.
"""

from __future__ import annotations

import math
import os as _os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ipdm_tpu.ops.pallas.planar import planar_unit


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period=10000,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-then-sin ordering (reference model.py:14-32)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half).astype(dtype)
    args = timesteps.astype(dtype)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def group_count(channels: int) -> int:
    """GroupNorm group-count rule of the reference (model.py:69-90):
    32 if divisible; C if C<32; else the divisor of C nearest to 32."""
    if channels % 32 == 0:
        return 32
    if channels < 32:
        return channels
    divs = np.array([d for d in range(1, channels + 1) if channels % d == 0])
    return int(divs[np.argmin((divs - 32) ** 2)])


def to_planar(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC → [B, C, H, W]."""
    return jnp.transpose(x, (0, 3, 1, 2))


def from_planar(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] → NHWC."""
    return jnp.transpose(x, (0, 2, 3, 1))


class GN(nn.Module):
    """GroupNorm with the reference group rule; f32 statistics; works on
    NHWC or planar [B,C,H,W] input."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    # PLANAR_WIDE: real width of a lane-padded planar input (attribute,
    # not call arg, so it stays static under nn.remat)
    wreal: int | None = None

    @nn.compact
    def __call__(self, x, planar: bool = False, coeffs_only: bool = False):
        wreal = self.wreal
        C = self.channels
        g = group_count(C)
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        wide = (planar and wreal is not None and x.shape[3] > wreal)
        if coeffs_only:
            # per-(batch, channel) affine (a, b) with a*x + b == GN(x) in
            # f32 — consumed by the fused planar unit kernel
            # (ops/pallas/planar.py); same E[x²]−E[x]² stats as below.
            # Wide mode: pad lanes carry junk (planar_unit output
            # contract), so mask them INSIDE the fused reduction (the
            # elementwise mask fuses into the one-pass sum for free) and
            # divide by the real count.
            assert planar
            B = x.shape[0]
            xf = x.astype(jnp.float32)
            if wide:
                xf = xf * (jnp.arange(x.shape[3]) < wreal)
            xg = xf.reshape(B, g, C // g, *x.shape[2:])
            if wide:
                cnt = (C // g) * x.shape[2] * int(wreal)
                mean = xg.sum(axis=(2, 3, 4)) / cnt
                m2 = (xg * xg).sum(axis=(2, 3, 4)) / cnt
            else:
                mean = xg.mean(axis=(2, 3, 4))             # [B, g]
                m2 = (xg * xg).mean(axis=(2, 3, 4))
            var = jnp.maximum(m2 - mean * mean, 0.0)
            rstd = jax.lax.rsqrt(var + 1e-5)
            mean_c = jnp.repeat(mean, C // g, axis=1)      # [B, C]
            a = jnp.repeat(rstd, C // g, axis=1) * scale[None]
            return a, bias[None] - mean_c * a
        # E[x²]−E[x]² so both reductions fuse into ONE pass over the input
        # (the (x−mean)² form forces a second read after the mean; measured
        # bandwidth matters at the full-res sinogram levels). f32 stats keep
        # the cancellation benign for O(1-10) activations.
        xf = x.astype(jnp.float32)
        if planar:
            B, _, H, W = x.shape
            xg = xf.reshape(B, g, C // g, H, W)
            mean = xg.mean(axis=(2, 3, 4), keepdims=True)
            m2 = (xg * xg).mean(axis=(2, 3, 4), keepdims=True)
            var = jnp.maximum(m2 - mean * mean, 0.0)
            y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(xf.shape)
            y = y * scale[None, :, None, None] + bias[None, :, None, None]
        else:
            B, H, W, _ = x.shape
            xg = xf.reshape(B, H, W, g, C // g)
            mean = xg.mean(axis=(1, 2, 4), keepdims=True)
            m2 = (xg * xg).mean(axis=(1, 2, 4), keepdims=True)
            var = jnp.maximum(m2 - mean * mean, 0.0)
            y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(xf.shape)
            y = y * scale + bias
        return y.astype(x.dtype)


def _onehot_resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] one-hot selecting floor(d·src/dst) — torch
    F.interpolate(mode='nearest') index convention."""
    idx = (np.arange(dst) * src // dst).astype(np.int64)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), idx] = 1.0
    return m


def nearest_resize(x: jnp.ndarray, size: Tuple[int, int],
                   planar: bool = False) -> jnp.ndarray:
    """Nearest-neighbour resize to spatial `size`, torch F.interpolate
    index convention (floor(i·src/dst), reference Upsample model.py:160-171).

    Fast path: dst ∈ {2s, 2s−1} (every UNet upsample) → repeat(2×)+crop,
    provably identical (see module docstring). General sizes → two constant
    one-hot matmuls."""
    if planar:
        H, W = x.shape[2], x.shape[3]
    else:
        H, W = x.shape[1], x.shape[2]
    dh, dw = int(size[0]), int(size[1])
    ha, wa = (2, 3) if planar else (1, 2)
    if dh in (2 * H, 2 * H - 1) and dw in (2 * W, 2 * W - 1):
        x = jnp.repeat(x, 2, axis=ha)
        x = jax.lax.slice_in_dim(x, 0, dh, axis=ha)
        x = jnp.repeat(x, 2, axis=wa)
        return jax.lax.slice_in_dim(x, 0, dw, axis=wa)
    mh = jnp.asarray(_onehot_resize_matrix(H, dh), dtype=x.dtype)
    mw = jnp.asarray(_onehot_resize_matrix(W, dw), dtype=x.dtype)
    if planar:
        x = jnp.einsum("dh,bchw->bcdw", mh, x)
        return jnp.einsum("ew,bcdw->bcde", mw, x)
    x = jnp.einsum("dh,bhwc->bdwc", mh, x)
    return jnp.einsum("ew,bdwc->bdec", mw, x)


def _up2_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
              dtype) -> jnp.ndarray:
    """Fused nearest-2× upsample + 3×3 conv (NHWC), exact subposition
    reparametrization: y[2i+a, 2j+b] touches only a 2×2 block of the
    low-res image with per-(a,b) merged kernels (adjacent taps hit
    duplicated pixels and their weights sum). 16 low-res GEMM taps replace
    9 taps at 4× the pixels — 2.25× fewer MACs, and the GEMMs contract
    K=4·Ci instead of three C-thin ops at high res. Valid for even output
    sizes (= 2·src, every expensive UNet upsample; odd sizes fall back)."""
    B, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # row merges: a=0 → u rows (2i−1, 2i, 2i+1) = x[i−1], x[i], x[i] ;
    #             a=1 → x[i], x[i], x[i+1]
    kr = [jnp.stack([kernel[0], kernel[1] + kernel[2]]),
          jnp.stack([kernel[0] + kernel[1], kernel[2]])]  # each [2,3,Ci,Co]

    def colmerge(t, b):
        if b == 0:
            return jnp.stack([t[:, 0], t[:, 1] + t[:, 2]], axis=1)
        return jnp.stack([t[:, 0] + t[:, 1], t[:, 2]], axis=1)  # [2,2,Ci,Co]

    ys = [[None, None], [None, None]]
    for a in range(2):
        for b in range(2):
            K = colmerge(kr[a], b)
            taps = [xp[:, a + p:a + p + H, b + q:b + q + W, :]
                    for p in range(2) for q in range(2)]
            patches = jnp.concatenate(taps, axis=-1)        # [B,H,W,4Ci]
            ys[a][b] = jnp.einsum("bhwk,kc->bhwc", patches,
                                  K.reshape(4 * Ci, Co),
                                  preferred_element_type=dtype)
    z0 = jnp.stack([ys[0][0], ys[1][0]], axis=2).reshape(B, 2 * H, W, Co)
    z1 = jnp.stack([ys[0][1], ys[1][1]], axis=2).reshape(B, 2 * H, W, Co)
    y = jnp.stack([z0, z1], axis=3).reshape(B, 2 * H, 2 * W, Co)
    return y + bias


# cin·cout bound for the scalar-FMA (VPU) planar conv path: covers the
# full-resolution proj levels (1→4 stem, 4→8, 8→8) where the einsum
# lowering is MXU M-stream-bound; 16-channel levels and up keep the einsum
# (VPU term count grows ∝ cin·cout while the M-stream cost shrinks with
# the downsampled resolution). Set to 0 to disable.
# (Measured-loser variants — W-packed convs, VPU_UNROLL_MAX=256, a
# single-pass Pallas planar conv — were removed after hardware A/Bs; see
# docs/PERF.md "Optimization backlog" for the numbers and git history for
# the code.)
VPU_UNROLL_MAX = 64
# small-C planar lowering selector (trace-time): "stack" = per-channel
# scalar-FMA chains + jnp.stack; "stackbar" = stack + an optimization
# barrier materializing the W-shifted tap views once per conv; "einsum" =
# route small-C convs onto the 9-tap einsum path. In-context A/B on the
# round-4 host (scripts/probe_eval_r4.py, proj eval ms): stack 65.1 /
# einsum 86.2 / one-pass broadcast-sum 137 / one-pass Pallas VPU kernel
# 98.9 (the last two removed — git history at the round-4 commits).
PLANAR_SMALLC = "stack"
# Fused planar GN→SiLU→conv Pallas unit (ops/pallas/planar.py): one pass
# per unit instead of one loop fusion per output channel. "auto" = on when
# running on TPU (off-TPU the kernel would run in slow interpret mode);
# IPDM_PLANAR_FUSED=0/1 forces. Read at trace time.
PLANAR_FUSED = _os.environ.get("IPDM_PLANAR_FUSED", "auto")
PLANAR_FUSED_HT = 64   # kernel H-block rows (tuning knob)
# The fused unit runs on the VPU (~9·C·O/1024 cycles/pixel), so for large
# C·O the MXU einsum lowering wins. Round-4 host sweep of the gate on the
# full proj eval (scripts/probe_planar_fused.py co): incumbent 64.9,
# all-fused 66.7, gate@160 **59.8**, gate@112 100.1, gate@64 103.4
# ms/eval — the fused kernel is a big win exactly on the mid-CO (96-128)
# full-res units where einsum is pathological, and a loss on the
# 192-512-CO units where einsum's M-stream matmul wins. Units above the
# gate use the einsum lowering with the GN affine+SiLU composed in XLA.
PLANAR_FUSED_MAX_CO = 160
# Kernel body variant: v2 unrolls the (c, o) loops into straight-line SSA
# code with vreg accumulators and 8-row halo blocks (planar.py
# _unit_kernel_v2). Round-5 in-context TPU A/B (probe_planar_fused.py
# proj): v2 57.2 vs v1 59.3 vs unfused 64.5 ms/eval, and v2 compiles
# faster (70 vs 140 s cold). Default ON; IPDM_PLANAR_V2=0 forces v1.
# Read at trace time.
PLANAR_FUSED_V2 = _os.environ.get("IPDM_PLANAR_V2", "1") not in (
    "0", "off", "False")


def _planar_fused_on() -> bool:
    if PLANAR_FUSED == "auto":
        try:
            return jax.devices()[0].platform == "tpu"
        except Exception:
            return False
    return PLANAR_FUSED not in ("0", "off", "False")


# PLANAR_WIDE: persist the 128-lane W padding (912 → 1024) through the
# whole shallow planar stack — one pad at the NHWC→planar boundary, one
# slice on the way out, and NO per-unit pad/slice/realign copies in
# between (the r5 proj trace shows ~13 ms/eval of layout copies + 1.7 ms
# of pads around the planar units). Invariant: pad lanes are EXACT zeros
# at every materialized boundary (planar_unit masks its output; the
# einsum/stack fallbacks mask after bias), so GN statistics divide by the
# real count and lane shifts read correct conv zero-padding. Requires the
# fused units (trace-time gate, like PLANAR_FUSED). Round-5 in-context
# TPU A/B (probe_planar_fused.py proj): wide 55.1 vs narrow-v2 57.2 vs
# unfused 66.1 ms/eval. Default ON; IPDM_PLANAR_WIDE=0 forces off.
PLANAR_WIDE = _os.environ.get("IPDM_PLANAR_WIDE", "1") not in (
    "0", "off", "False")


def _planar_wide_on() -> bool:
    return PLANAR_WIDE and _planar_fused_on()


class Conv3x3(nn.Module):
    """3×3 conv with 'kernel' (HWIO) / 'bias' params, three lowerings:

    * planar [B,C,H,W] input: nine shifted channel-contraction einsums —
      never leaves the W-minor layout (the shallow-level path).
    * NHWC, small C_in: explicit im2col + einsum (measured faster than
      XLA's conv lowering at C≤32).
    * NHWC, large C_in: lax.conv (near peak for C≥128).
    * upsample2=True: fused nearest-2× upsample + conv (see _up2_conv).

    Param structure matches nn.Conv, so checkpoints are interchangeable."""
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32
    im2col_max_cin: int = 32
    # PLANAR_WIDE: real width of a lane-padded planar input (attribute,
    # not call arg, so it stays static under nn.remat)
    wreal: int | None = None

    @nn.compact
    def __call__(self, x, planar: bool = False, upsample2: bool = False,
                 gn_affine=None, extra_bias=None, skip_add=None):
        wreal = self.wreal
        """gn_affine: optional ([B,Cin],[B,Cin]) f32 GN affine — the conv
        consumes silu(a*x+b) instead of x (planar only; see GN
        coeffs_only). extra_bias: optional [B,features] added per channel
        (time embedding). skip_add: optional [B,features,H,W] residual
        added to the output. On TPU these fuse into one Pallas pass per
        unit (planar_unit); off-TPU the pieces compose in XLA with the
        incumbent lowering.

        wreal (PLANAR_WIDE mode): the input's real width — x's last
        W - wreal lanes are persistent zero padding (W % 128 == 0). The
        output keeps the wide form (real width ceil(wreal/s), same lane
        count scaled by the stride) with its pad lanes exactly zero."""
        cin = x.shape[1] if planar else x.shape[-1]
        s = self.strides
        wide = (planar and wreal is not None
                and x.shape[3] % 128 == 0 and x.shape[3] > wreal)
        if wide and s > 1 and (x.shape[3] // s) % 128:
            # striding would lose the 128-lane alignment (tiny widths,
            # e.g. the engine's 4x4 param-init trace) — de-widen instead
            wide = False
        if wreal is not None and not wide:
            if planar and x.shape[3] != int(wreal):
                # de-widen: drop the stale pad lanes and run narrow
                x = jax.lax.slice_in_dim(x, 0, int(wreal), axis=3)
                if skip_add is not None:
                    skip_add = jax.lax.slice_in_dim(
                        skip_add, 0, int(wreal), axis=3)
            wreal = None
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin,
                                                       self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel_f32, bias_f32 = kernel, bias
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if upsample2:
            assert not planar
            return _up2_conv(x, kernel, bias, self.dtype)
        if (planar and s == 1 and _planar_fused_on()
                and cin * self.features <= PLANAR_FUSED_MAX_CO):
            B = x.shape[0]
            if gn_affine is None:
                af = jnp.ones((B, cin), jnp.float32)
                bf = jnp.zeros((B, cin), jnp.float32)
            else:
                af, bf = gn_affine
            btot = jnp.broadcast_to(bias_f32[None], (B, self.features))
            if extra_bias is not None:
                btot = btot + extra_bias.astype(jnp.float32)
            return planar_unit(x, af, bf, kernel_f32, btot, skip_add,
                               act=gn_affine is not None,
                               ht=PLANAR_FUSED_HT, v2=PLANAR_FUSED_V2,
                               wreal=wreal)
        if planar and gn_affine is not None:
            af, bf = gn_affine
            xh = (x.astype(jnp.float32) * af[:, :, None, None]
                  + bf[:, :, None, None]).astype(x.dtype)
            x = nn.silu(xh)
        if planar and wide:
            # zero the pad lanes first: the conv taps below read them,
            # and upstream wide producers (planar_unit outputs, the
            # affine+silu above) leave junk there. One fused multiply.
            x = x * (jnp.arange(x.shape[3]) < wreal).astype(x.dtype)
            # wide tap construction: after the mask the ±1 column shifts
            # pull in zeros at both the w=0 edge (shift-in) and the
            # real-width edge (pad lanes) — the conv's zero padding
            # without the narrow path's pad+unaligned-slice.
            B, _, H, Wl = x.shape
            Ho = -(-H // s)
            xh = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
            cols = [
                jnp.pad(xh[:, :, :, :Wl - 1],
                        ((0, 0), (0, 0), (0, 0), (1, 0))),
                xh,
                jnp.pad(xh[:, :, :, 1:],
                        ((0, 0), (0, 0), (0, 0), (0, 1))),
            ]
            if s > 1:
                cols = [c[:, :, :, ::s] for c in cols]
            if PLANAR_SMALLC == "stackbar":
                cols = list(jax.lax.optimization_barrier(tuple(cols)))
            shifted = [cols[dw][:, :, dh:dh + (Ho - 1) * s + 1:s, :]
                       for dh in range(3) for dw in range(3)]
            if (cin * self.features <= VPU_UNROLL_MAX
                    and PLANAR_SMALLC in ("stack", "stackbar")):
                outs = []
                for o in range(self.features):
                    acc = None
                    for t9 in range(9):
                        dh, dw = divmod(t9, 3)
                        for c in range(cin):
                            term = kernel[dh, dw, c, o] * shifted[t9][:, c]
                            acc = term if acc is None else acc + term
                    outs.append(acc + bias[o])
                y = jnp.stack(outs, axis=1)
            else:
                y = None
                for t9 in range(9):
                    dh, dw = divmod(t9, 3)
                    r = jnp.einsum("bchw,co->bohw", shifted[t9],
                                   kernel[dh, dw],
                                   preferred_element_type=self.dtype)
                    y = r if y is None else y + r
                y = y + bias[None, :, None, None]
            if extra_bias is not None:
                y = y + extra_bias.astype(y.dtype)[:, :, None, None]
            if skip_add is not None:
                y = y + skip_add
            # output pad lanes carry bias junk — consumers mask/slice
            # (same contract as planar_unit's wide output)
            return y
        if planar:
            B, _, H, W = x.shape
            Ho = -(-H // s)
            Wo = -(-W // s)
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
            # For strides, deinterleave W once per tap column (3 lane-strided
            # slices) and stride H on sublanes afterwards: a single fused
            # 9-way lane-strided gather measures 29.6 ms at [8,2000,912] on
            # v5e vs 1.1 ms this way (scripts/probe output in docs/PERF.md)
            cols = [xp[:, :, :, dw:dw + (Wo - 1) * s + 1:s]
                    for dw in range(3)]
            if PLANAR_SMALLC == "stackbar":
                # materialize the three W-shifted copies ONCE per conv:
                # without the barrier XLA re-derives the lane-UNALIGNED
                # ±1-offset views inside every consumer fusion (one per
                # output channel on the stack path), paying the cross-lane
                # realign 8x per conv
                cols = list(jax.lax.optimization_barrier(tuple(cols)))
            shifted = [cols[dw][:, :, dh:dh + (Ho - 1) * s + 1:s, :]
                       for dh in range(3) for dw in range(3)]
            if (cin * self.features <= VPU_UNROLL_MAX
                    and PLANAR_SMALLC in ("stack", "stackbar")):
                # Tiny-C planar convs are MXU M-stream-bound: a matmul over
                # M = B·H·W pixel rows advances ~1 row/cycle no matter how
                # skinny K = 9·cin, N = cout are (full-res proj level:
                # 1.8M rows ≈ 1.9 ms/conv). Unrolled scalar-broadcast FMAs
                # run on the VPU instead, one accumulation per output
                # channel + jnp.stack. (One-pass rewrites measured
                # PATHOLOGICAL in context despite winning in isolation —
                # see the PLANAR_SMALLC table above.)
                outs = []
                for o in range(self.features):
                    acc = None
                    for t9 in range(9):
                        dh, dw = divmod(t9, 3)
                        for c in range(cin):
                            term = kernel[dh, dw, c, o] * shifted[t9][:, c]
                            acc = term if acc is None else acc + term
                    outs.append(acc + bias[o])
                y = jnp.stack(outs, axis=1)
            else:
                y = None
                for t9 in range(9):
                    dh, dw = divmod(t9, 3)
                    r = jnp.einsum("bchw,co->bohw", shifted[t9],
                                   kernel[dh, dw],
                                   preferred_element_type=self.dtype)
                    y = r if y is None else y + r
                y = y + bias[None, :, None, None]
            if extra_bias is not None:
                y = y + extra_bias.astype(y.dtype)[:, :, None, None]
            if skip_add is not None:
                y = y + skip_add
            return y
        if cin > self.im2col_max_cin:
            y = jax.lax.conv_general_dilated(
                x, kernel, (s, s), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias
        B, H, W, _ = x.shape
        Ho = -(-H // s)
        Wo = -(-W // s)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dh:dh + (Ho - 1) * s + 1:s,
                   dw:dw + (Wo - 1) * s + 1:s, :]
                for dh in range(3) for dw in range(3)]
        patches = jnp.concatenate(cols, axis=-1)          # [B,Ho,Wo,9C]
        y = jnp.einsum("bhwk,kc->bhwc", patches,
                       kernel.reshape(9 * cin, self.features),
                       preferred_element_type=self.dtype)
        return y + bias


class Conv1x1(nn.Module):
    """1×1 conv ('kernel' [1,1,Ci,Co] / 'bias', nn.Conv-compatible) with
    NHWC and planar paths."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, planar: bool = False):
        cin = x.shape[1] if planar else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if planar:
            y = jnp.einsum("bchw,co->bohw", x, kernel[0, 0],
                           preferred_element_type=self.dtype)
            return y + bias[None, :, None, None]
        y = jnp.einsum("bhwc,co->bhwo", x, kernel[0, 0],
                       preferred_element_type=self.dtype)
        return y + bias


class ResidualBlock(nn.Module):
    """GN→SiLU→3×3 conv ×2 with additive time embedding and 1×1 shortcut
    (reference model.py:95-130). Runs in NHWC or planar layout."""
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    planar: bool = False
    wreal: int | None = None  # PLANAR_WIDE real width (static attribute)

    @nn.compact
    def __call__(self, x, temb):
        wreal = self.wreal
        p = self.planar
        if p and _planar_fused_on():
            # fused-unit path: each GN→SiLU→conv (+time-emb bias / +skip)
            # lowers to ONE Pallas pass (ops/pallas/planar.py); GN stats
            # stay in XLA as coeffs. Same math as the branch below.
            # wreal: PLANAR_WIDE real width (lane-padded tensors flow
            # through unchanged; the shortcut's polluted pad lanes are
            # re-zeroed by the consuming unit's output mask).
            a1, b1 = GN(self.in_channels, self.dtype,
                        wreal=wreal)(x, planar=True, coeffs_only=True)
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name="time_emb")(nn.silu(temb))
            h = Conv3x3(self.out_channels, dtype=self.dtype, wreal=wreal,
                        name="conv1")(x, planar=True, gn_affine=(a1, b1),
                                      extra_bias=t)
            a2, b2 = GN(self.out_channels, self.dtype,
                        wreal=wreal)(h, planar=True, coeffs_only=True)
            if self.in_channels != self.out_channels:
                sc = Conv1x1(self.out_channels, dtype=self.dtype,
                             name="shortcut")(x, planar=True)
            else:
                sc = x
            return Conv3x3(self.out_channels, dtype=self.dtype,
                           wreal=wreal, name="conv2")(
                h, planar=True, gn_affine=(a2, b2), skip_add=sc)
        h = GN(self.in_channels, self.dtype)(x, planar=p)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(
            h, planar=p)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     name="time_emb")(nn.silu(temb))
        h = h + (t[:, :, None, None] if p else t[:, None, None, :])
        h = GN(self.out_channels, self.dtype)(h, planar=p)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(
            h, planar=p)
        if self.in_channels != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype,
                        name="shortcut")(x, planar=p)
        return h + x


# Sequence length above which self-attention runs as a Pallas flash kernel
# instead of the naive T×S matrix: the flagship preset's extra attention
# levels (img ds=8 → 4096 tokens, proj ds=16 → 7125 tokens) would otherwise
# materialize 268-812 MB float32 score matrices per block in HBM. Below the
# threshold the naive path's matrices are small (≤ ~53 MB) and measured fine.
FLASH_MIN_SEQ = 4096
_FLASH_BLOCK = 512


def _flash_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _flash_attention(q, k, v, sm_scale: float):
    """q, k, v: [B, T, heads, hd]. Exact softmax attention via the Pallas
    TPU flash kernel (online-softmax tiling; the T×S score matrix never
    leaves VMEM). Same math as the naive einsum path up to fp reassociation.
    T is padded to a block multiple; padded queries attend only padded
    (zero) keys via segment ids, so real rows are unaffected."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, T, nh, hd = q.shape
    Tp = -(-T // _FLASH_BLOCK) * _FLASH_BLOCK
    # Explicit block sizes: this jax version's defaults pick tiny blocks at
    # these shapes — measured 52.2 ms vs 2.26 ms with 1024³ blocks for the
    # proj ds16 attention [1,4,7168,64] (scripts/probe_attn.py, v5e).
    blk = 1024 if Tp % 1024 == 0 else _FLASH_BLOCK
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk)
    qt = jnp.transpose(q, (0, 2, 1, 3))          # [B, heads, T, hd]
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    seg = None
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        qt, kt, vt = jnp.pad(qt, pad), jnp.pad(kt, pad), jnp.pad(vt, pad)
        ids = (jnp.arange(Tp, dtype=jnp.int32) >= T).astype(jnp.int32)
        ids = jnp.broadcast_to(ids[None], (B, Tp))
        seg = SegmentIds(q=ids, kv=ids)
    out = flash_attention(qt, kt, vt, segment_ids=seg, causal=False,
                          sm_scale=sm_scale, block_sizes=block_sizes)
    return jnp.transpose(out[:, :, :T], (0, 2, 1, 3))


class AttentionBlock(nn.Module):
    """Self-attention over H·W tokens with residual (reference model.py:135-155).
    Scale 1/√√(C/heads) applied to both q and k; softmax in float32.
    NHWC only — attention sits at deep levels. Long sequences run the
    Pallas flash kernel (see FLASH_MIN_SEQ)."""
    channels: int
    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = C // self.num_heads
        h = GN(C, self.dtype)(x)
        qkv = nn.Conv(3 * C, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="qkv")(h)
        qkv = qkv.reshape(B, H * W, self.num_heads, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(hd))
        if H * W >= FLASH_MIN_SEQ and _flash_available():
            # (q·s)·(k·s) == (q·k)/√hd: the kernel applies sm_scale = s²
            out = _flash_attention(q, k, v, scale * scale)
        else:
            attn = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhts,bshd->bthd", attn, v)
        out = out.reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="proj")(out)
        return out + x


class Downsample(nn.Module):
    """3×3 stride-2 conv, pad 1 → ceil(n/2) (reference model.py:175-185)."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    planar: bool = False
    wreal: int | None = None  # PLANAR_WIDE real width (static attribute)

    @nn.compact
    def __call__(self, x):
        return Conv3x3(self.channels, strides=2, dtype=self.dtype,
                       wreal=self.wreal, name="op")(x, planar=self.planar)


class Upsample(nn.Module):
    """Nearest resize to explicit size + 3×3 conv (reference model.py:160-171).

    NHWC even-size (dst = 2·src) upsamples run the fused subposition
    lowering (_up2_conv, exact and ~2.25× fewer MACs); odd/planar sizes
    fall back to resize-then-conv. Same 'conv' param scope either way."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    planar: bool = False
    wreal: int | None = None  # PLANAR_WIDE real width (static attribute)

    @nn.compact
    def __call__(self, x, size):
        wreal = self.wreal
        dh, dw = int(size[0]), int(size[1])
        if (UP2_FUSED and not self.planar and dh == 2 * x.shape[1]
                and dw == 2 * x.shape[2]):
            return Conv3x3(self.channels, dtype=self.dtype, name="conv")(
                x, upsample2=True)
        wide = (self.planar and wreal is not None
                and x.shape[3] > wreal)
        if wide and dh in (2 * x.shape[2], 2 * x.shape[2] - 1) \
                and dw == 2 * wreal:
            # wide 2× resize: sublane repeat(+crop) on H; lane repeat on
            # W maps [real | pad] to [2·real | repeated pad] — still
            # contiguous wide form (pad lanes carry junk; consumers mask,
            # per the planar_unit wide contract). Trim lanes if 2·lanes
            # overshoots the minimal wide width.
            x = jnp.repeat(x, 2, axis=2)
            x = jax.lax.slice_in_dim(x, 0, dh, axis=2)
            x = jnp.repeat(x, 2, axis=3)
            wl = -(-dw // 128) * 128
            if x.shape[3] > wl:
                x = jax.lax.slice_in_dim(x, 0, wl, axis=3)
            return Conv3x3(self.channels, dtype=self.dtype, wreal=dw,
                           name="conv")(x, planar=True)
        if wide:
            # general sizes: drop to narrow, resize, let the caller repad
            x = jax.lax.slice_in_dim(x, 0, int(wreal), axis=3)
        x = nearest_resize(x, size, planar=self.planar)
        return Conv3x3(self.channels, dtype=self.dtype, name="conv")(
            x, planar=self.planar)


# perf A/B switches (module-level, read at trace time; probes flip them)
UP2_FUSED = True        # fused subposition upsample+conv on even sizes
UP_GATE_IN_LIMIT = True  # up-path planar gate also bounds concat in_ch


class UNetModel(nn.Module):
    """Full UNet (reference model.py:190-310). NHWC in/out.

    channel_mult[0] scales the stem conv; remaining entries define levels,
    each with num_res_blocks residual blocks, optional attention at
    ds ∈ attention_resolutions, and a downsample between levels (not after
    the last). Up path consumes skips in reverse with channel concat.

    Blocks with output channels ≤ planar_max_c execute in planar [B,C,H,W]
    layout (see module docstring); set planar_max_c=0 to force NHWC
    everywhere (numerics are identical — covered by tests).
    """
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    channel_mult: Sequence[float] = (1, 2, 2, 2)
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    planar_max_c: int = 32
    remat: bool = False  # jax.checkpoint each res/attn block: trades one
    #   extra forward in backprop for O(depth) less activation memory —
    #   enables batch>1 training of the 512²/2000×912 UNets in 16G HBM

    def plan(self):
        """Static block plan: (down_plan, middle_ch, up_plan, final_ch).

        down_plan: list of entries; each entry is ('stem', ch) or
        ('res', in_ch, out_ch, attn: bool) or ('down', ch).
        up_plan: list of ('res', in_ch, out_ch, attn, upsample: bool).
        Mirrors the constructor loops of reference model.py:224-275."""
        mc = self.model_channels
        stem_ch = int(self.channel_mult[0] * mc)
        level_mults = list(self.channel_mult[1:])
        down = [("stem", stem_ch)]
        ch = stem_ch
        chans = [ch]
        ds = 1
        for level, mult in enumerate(level_mults):
            for _ in range(self.num_res_blocks):
                out_ch = int(mult * mc)
                down.append(("res", ch, out_ch,
                             ds in self.attention_resolutions))
                ch = out_ch
                chans.append(ch)
            if level != len(level_mults) - 1:
                down.append(("down", ch))
                chans.append(ch)
                ds *= 2
        middle_ch = ch
        up = []
        for level, mult in list(enumerate(level_mults))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = chans.pop()
                out_ch = int(mult * mc)
                attn = ds in self.attention_resolutions
                upsample = bool(level and i == self.num_res_blocks)
                up.append(("res", ch + skip, out_ch, attn, upsample))
                ch = out_ch
                if upsample:
                    ds //= 2
        return down, middle_ch, up, ch

    def _planar(self, ch: int, attn: bool = False) -> bool:
        return (not attn) and ch <= self.planar_max_c

    @nn.compact
    def __call__(self, x, timesteps):
        """x: [B,H,W,C_in] NHWC; timesteps: [B]. Returns [B,H,W,C_out]."""
        Res = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        Attn = nn.remat(AttentionBlock) if self.remat else AttentionBlock
        down_plan, middle_ch, up_plan, final_ch = self.plan()
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels,
                                 dtype=jnp.float32)
        emb = nn.Dense(time_embed_dim, param_dtype=jnp.float32,
                       name="time_dense1")(emb)
        emb = nn.Dense(time_embed_dim, param_dtype=jnp.float32,
                       name="time_dense2")(nn.silu(emb))
        emb = emb.astype(self.dtype)

        wide_on = _planar_wide_on()

        def fit(h, h_planar, want, wr):
            """Layout conversion; returns (h, wr). wr is the REAL width of
            a planar tensor (PLANAR_WIDE keeps W lane-padded with exact
            zero pads; narrow mode has wr == shape[3], so every wide guard
            degenerates and the traced HLO is the incumbent one)."""
            if h_planar and not want:
                if h.shape[3] > wr:
                    h = jax.lax.slice_in_dim(h, 0, wr, axis=3)
                return from_planar(h), None
            # widen only when the lane padding at most doubles the width
            # (wr >= 64): below that the pad overhead dwarfs the saved
            # copies (and 32x-inflates interpret-mode tests)
            widen = lambda w: wide_on and w % 128 and w >= 64
            if want and not h_planar:
                wr = h.shape[2]
                h = to_planar(h)
                if widen(wr):
                    h = jnp.pad(h, ((0, 0), (0, 0), (0, 0),
                                    (0, -(-wr // 128) * 128 - wr)))
                return h, wr
            if h_planar and want and widen(wr) and h.shape[3] == wr:
                # normalize a narrow tensor (e.g. an odd-size Upsample
                # fallback) back to the wide form so concats line up
                h = jnp.pad(h, ((0, 0), (0, 0), (0, 0),
                                (0, -(-wr // 128) * 128 - wr)))
            return h, wr

        def spatial(h, h_planar, wr):
            return (h.shape[2], wr) if h_planar else \
                (h.shape[1], h.shape[2])

        h = x.astype(self.dtype)
        hp = False  # h currently planar?
        wr = None   # real width when planar (see fit)
        hs = []     # (tensor, is_planar, real_width)
        di = 0
        for entry in down_plan:
            if entry[0] == "stem":
                want = self._planar(entry[1])
                h, wr = fit(h, hp, want, wr)
                hp = want
                h = Conv3x3(entry[1], dtype=self.dtype, wreal=wr,
                            name=f"down{di}_stem")(h, planar=hp)
            elif entry[0] == "res":
                _, in_ch, out_ch, attn = entry
                want = self._planar(max(in_ch, out_ch), attn)
                h, wr = fit(h, hp, want, wr)
                hp = want
                h = Res(in_ch, out_ch, self.dtype, planar=hp, wreal=wr,
                        name=f"down{di}_res")(h, emb)
                if attn:
                    h = Attn(out_ch, self.num_heads, self.dtype,
                             name=f"down{di}_attn")(h)
            else:  # down
                want = self._planar(entry[1])
                h, wr = fit(h, hp, want, wr)
                hp = want
                h = Downsample(entry[1], self.dtype, planar=hp, wreal=wr,
                               name=f"down{di}_ds")(h)
                if hp:
                    wr = -(-wr // 2)
            hs.append((h, hp, wr))
            di += 1

        want = self._planar(middle_ch)
        h, wr = fit(h, hp, want, wr)
        hp = want
        h = Res(middle_ch, middle_ch, self.dtype, planar=hp, wreal=wr,
                name="mid_res1")(h, emb)
        if not hp:
            h = Attn(middle_ch, self.num_heads, self.dtype,
                     name="mid_attn")(h)
        else:
            # middle attention only exists at deep (NHWC) channel counts in
            # real configs; planar middles (tiny truncated configs) convert
            hn, _ = fit(h, True, False, wr)
            hn = Attn(middle_ch, self.num_heads, self.dtype,
                      name="mid_attn")(hn)
            h, wr = fit(hn, False, True, None)
        h = Res(middle_ch, middle_ch, self.dtype, planar=hp, wreal=wr,
                name="mid_res2")(h, emb)

        h_, h_p, w_r = hs.pop()
        for ui, entry in enumerate(up_plan):
            _, in_ch, out_ch, attn, upsample = entry
            # Up blocks always concat a skip, so in_ch = out_ch + skip_ch:
            # gating on max(in,out) like the down path would force every
            # shallow up block NHWC. Instead allow planar for the routine
            # within-level concat (in ≤ 2·planar_max_c) but keep the
            # deep-skip level transitions (in ≫ planar_max_c) in NHWC,
            # where GN/conv1/shortcut at large C are faster.
            want = (self._planar(out_ch, attn)
                    and (not UP_GATE_IN_LIMIT
                         or in_ch <= 2 * self.planar_max_c))
            h, wr = fit(h, hp, want, wr)
            skip, _ = fit(h_, h_p, want, w_r)
            hp = want
            cat_axis = 1 if hp else -1
            cat_in = jnp.concatenate([h, skip], axis=cat_axis)
            if hs:
                h_, h_p, w_r = hs.pop()
            size = spatial(h_, h_p, w_r)
            h = Res(in_ch, out_ch, self.dtype, planar=hp, wreal=wr,
                    name=f"up{ui}_res")(cat_in, emb)
            if attn:
                h = Attn(out_ch, self.num_heads, self.dtype,
                         name=f"up{ui}_attn")(h)
            if upsample:
                h = Upsample(out_ch, self.dtype, planar=hp, wreal=wr,
                             name=f"up{ui}_us")(h, size)
                if hp:
                    wr = int(size[1])

        want = self._planar(final_ch)
        h, wr = fit(h, hp, want, wr)
        hp = want
        if hp and _planar_fused_on():
            af, bf = GN(final_ch, self.dtype, wreal=wr)(
                h, planar=True, coeffs_only=True)
            h = Conv3x3(self.out_channels, dtype=self.dtype, wreal=wr,
                        name="out_conv")(h, planar=True,
                                         gn_affine=(af, bf))
        else:
            h = GN(final_ch, self.dtype)(h, planar=hp)
            h = nn.silu(h)
            h = Conv3x3(self.out_channels, dtype=self.dtype,
                        name="out_conv")(h, planar=hp)
        if hp:
            h, _ = fit(h, True, False, wr)
        return h.astype(jnp.float32)


def build_unet(opt, domain: str, remat: bool = False) -> UNetModel:
    """Construct the img- or proj-domain UNet from an IPDMConfig
    (mirrors reference init_img_model/init_proj_model,
    Utils/train_test_utils.py:213-245)."""
    assert domain in ("img", "proj")
    g = lambda name: getattr(opt, f"{name}_{domain}")
    dtype = jnp.bfloat16 if opt.compute_dtype == "bfloat16" else jnp.float32
    return UNetModel(
        remat=remat,
        in_channels=g("in_channels"),
        model_channels=g("model_channels"),
        out_channels=g("out_channels"),
        attention_resolutions=tuple(int(a) for a in g("attention_resolutions")),
        channel_mult=tuple(g("channel_mult")),
        dtype=dtype,
    )
