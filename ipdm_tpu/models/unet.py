"""DDPM ε-prediction UNet, TPU-native (Flax linen, NHWC).

Architecturally equivalent to the reference UNetModel (Model/model.py:190-310):
same channel_mult semantics (channel_mult[0] scales the stem conv;
downsampling after every level except the last), same GroupNorm group-count
rule (model.py:69-90), attention inserted where the downsample factor `ds` is
in attention_resolutions, explicit-size nearest upsampling so the odd-shaped
2000×912 sinogram pyramid (2000→1000→500→250→125→63) round-trips exactly, and
the same 4×-wide sinusoidal timestep MLP.

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), fused
dot_product_attention-style einsum attention, optional bfloat16 activations
with float32 params, and no data-dependent Python control flow — the module
jits once per input shape.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


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


class GN(nn.Module):
    """GroupNorm with the reference group rule; f32 statistics."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=group_count(self.channels),
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


def _onehot_resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] one-hot selecting floor(d·src/dst) — torch
    F.interpolate(mode='nearest') index convention."""
    idx = (np.arange(dst) * src // dst).astype(np.int64)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), idx] = 1.0
    return m


def nearest_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of NHWC x to spatial `size` using the
    floor(dst·in/out) index convention of torch F.interpolate(mode='nearest')
    (used by reference Upsample, model.py:160-171), so the up path matches the
    reference exactly even at odd sinogram shapes.

    Fast path — every UNet upsample targets dst ∈ {2s, 2s−1} of its source
    (the down path halves with ceil, so the sinogram pyramid is
    2000→1000→500→250→125→63 and each upsample exactly doubles-or-doubles
    -minus-one). For dst = 2s−1, floor(i·s/dst) == i//2 for all i < dst:
    the difference i·s/(2s−1) − i/2 = i/(2(2s−1)) < 1/2, and frac(i/2) ∈
    {0, 1/2} can only cross the next integer when i ≥ 2s−1 — never in range
    (trivially equal for dst = 2s). So nearest-resize degenerates to
    repeat(2×)+crop: pure VPU data movement (measured 3.7 ms → ~0.1 ms for
    the 1000×456→2000×912 C=4 upsample).

    General sizes fall back to two constant one-hot matmuls instead of
    gathers: arbitrary-index gathers take the TPU's scalar path
    (~10 ns/element — measured to dominate the whole sinogram UNet), while
    the one-hot contraction runs on the MXU."""
    H, W = x.shape[1], x.shape[2]
    dh, dw = int(size[0]), int(size[1])
    if dh in (2 * H, 2 * H - 1) and dw in (2 * W, 2 * W - 1):
        x = jnp.repeat(x, 2, axis=1)[:, :dh]
        return jnp.repeat(x, 2, axis=2)[:, :, :dw]
    mh = jnp.asarray(_onehot_resize_matrix(H, dh), dtype=x.dtype)
    mw = jnp.asarray(_onehot_resize_matrix(W, dw), dtype=x.dtype)
    x = jnp.einsum("dh,bhwc->bdwc", mh, x)
    return jnp.einsum("ew,bdwc->bdec", mw, x)


class Conv3x3(nn.Module):
    """3×3 conv, drop-in for nn.Conv(features, (3,3), padding=1[, strides]).

    For small input-channel counts (the sinogram UNet's shallow levels run
    at C∈{4,8,16} over 2000×912), XLA's conv lowering on TPU is ~40× off
    roofline; an explicit im2col + einsum is ~2.5× faster (measured). Param
    structure matches nn.Conv ('kernel' HWIO, 'bias'), so checkpoints are
    interchangeable; large-C inputs fall through to lax.conv."""
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32
    im2col_max_cin: int = 32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin,
                                                       self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if cin > self.im2col_max_cin:
            y = jax.lax.conv_general_dilated(
                x, kernel, (self.strides, self.strides), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias
        B, H, W, _ = x.shape
        s = self.strides
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


class ResidualBlock(nn.Module):
    """GN→SiLU→3×3 conv ×2 with additive time embedding and 1×1 shortcut
    (reference model.py:95-130)."""
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GN(self.in_channels, self.dtype)(x)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     name="time_emb")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GN(self.out_channels, self.dtype)(h)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="shortcut")(x)
        return h + x


class AttentionBlock(nn.Module):
    """Self-attention over H·W tokens with residual (reference model.py:135-155).
    Scale 1/√√(C/heads) applied to both q and k; softmax in float32."""
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

    @nn.compact
    def __call__(self, x):
        return Conv3x3(self.channels, strides=2, dtype=self.dtype,
                       name="op")(x)


class Upsample(nn.Module):
    """Nearest resize to explicit size + 3×3 conv (reference model.py:160-171)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size):
        x = nearest_resize(x, size)
        return Conv3x3(self.channels, dtype=self.dtype, name="conv")(x)


class UNetModel(nn.Module):
    """Full UNet (reference model.py:190-310). NHWC in/out.

    channel_mult[0] scales the stem conv; remaining entries define levels,
    each with num_res_blocks residual blocks, optional attention at
    ds ∈ attention_resolutions, and a downsample between levels (not after
    the last). Up path consumes skips in reverse with channel concat.
    """
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    channel_mult: Sequence[float] = (1, 2, 2, 2)
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # jax.checkpoint each res/attn block: trades one
    #   extra forward in backprop for O(depth) less activation memory —
    #   enables batch>1 training of the 512²/2000×912 UNets in 16G HBM

    def plan(self):
        """Static block plan: (down_plan, middle_ch, up_plan).

        down_plan: list of entries; each entry is ('stem', ch) or
        ('res', in_ch, out_ch, attn: bool) or ('down', ch).
        up_plan: list of ('res', in_ch, out_ch, attn, upsample_to_level|None).
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

        h = x.astype(self.dtype)
        hs = []
        di = 0
        for entry in down_plan:
            if entry[0] == "stem":
                h = Conv3x3(entry[1], dtype=self.dtype,
                            name=f"down{di}_stem")(h)
            elif entry[0] == "res":
                _, in_ch, out_ch, attn = entry
                h = Res(in_ch, out_ch, self.dtype,
                        name=f"down{di}_res")(h, emb)
                if attn:
                    h = Attn(out_ch, self.num_heads, self.dtype,
                             name=f"down{di}_attn")(h)
            else:  # down
                h = Downsample(entry[1], self.dtype,
                               name=f"down{di}_ds")(h)
            hs.append(h)
            di += 1

        h = Res(middle_ch, middle_ch, self.dtype,
                name="mid_res1")(h, emb)
        h = Attn(middle_ch, self.num_heads, self.dtype,
                 name="mid_attn")(h)
        h = Res(middle_ch, middle_ch, self.dtype,
                name="mid_res2")(h, emb)

        h_ = hs.pop()
        for ui, entry in enumerate(up_plan):
            _, in_ch, out_ch, attn, upsample = entry
            cat_in = jnp.concatenate([h, h_], axis=-1)
            if hs:
                h_ = hs.pop()
            size = (h_.shape[1], h_.shape[2])
            h = Res(in_ch, out_ch, self.dtype,
                    name=f"up{ui}_res")(cat_in, emb)
            if attn:
                h = Attn(out_ch, self.num_heads, self.dtype,
                         name=f"up{ui}_attn")(h)
            if upsample:
                h = Upsample(out_ch, self.dtype, name=f"up{ui}_us")(h, size)

        h = GN(final_ch, self.dtype)(h)
        h = nn.silu(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype,
                    name="out_conv")(h)
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
