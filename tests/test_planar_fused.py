"""Parity tests for the fused planar GN->SiLU->conv unit
(ipdm_tpu/ops/pallas/planar.py + the Conv3x3/ResidualBlock wiring).

The kernel replaces the per-output-channel loop-fusion lowering of the
shallow planar UNet levels (reference model.py:95-130 ResBlock at the
fractional channel_mult levels); off-TPU it runs in pallas interpret
mode, which is what these tests exercise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ipdm_tpu.models.unet as U
from ipdm_tpu.ops.pallas.planar import planar_unit


def _ref_unit(x, a, bb, w, bias, skip=None, act=True):
    xh = x * a[:, :, None, None] + bb[:, :, None, None]
    if act:
        xh = xh / (1 + np.exp(-xh))
    xp = np.pad(xh, ((0, 0), (0, 0), (1, 1), (1, 1)))
    B, C, H, W = x.shape
    O = w.shape[3]
    out = np.zeros((B, O, H, W), np.float32)
    for dh in range(3):
        for dw in range(3):
            out += np.einsum("bchw,co->bohw",
                             xp[:, :, dh:dh + H, dw:dw + W], w[dh, dw])
    out += bias[:, :, None, None]
    if skip is not None:
        out += skip
    return out


@pytest.mark.parametrize("v2", [False, True])
@pytest.mark.parametrize("act,with_skip,ht", [(True, True, 16),
                                              (True, False, 8),
                                              (False, False, 16)])
def test_planar_unit_semantics(act, with_skip, ht, v2):
    rng = np.random.default_rng(0)
    B, C, O, H, W = 2, 3, 5, 37, 150
    x = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)
    a = rng.normal(1, 0.2, (B, C)).astype(np.float32)
    bb = rng.normal(0, 0.2, (B, C)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, C, O)).astype(np.float32)
    bias = rng.normal(0, 0.2, (B, O)).astype(np.float32)
    skip = (rng.normal(0, 1, (B, O, H, W)).astype(np.float32)
            if with_skip else None)
    ref = _ref_unit(x, a, bb, w, bias, skip, act=act)
    got = np.asarray(planar_unit(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(bb), jnp.asarray(w),
        jnp.asarray(bias), None if skip is None else jnp.asarray(skip),
        act=act, ht=ht, interpret=True, v2=v2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("v2", [False, True])
def test_planar_unit_lane_multiple_width(v2):
    """W an exact multiple of 128 leaves no padding lane, so the kernel's
    lane-roll wraps REAL data into the conv's zero-pad columns unless the
    edge taps are masked (regression: the wrap polluted cols 0 and W-1)."""
    rng = np.random.default_rng(7)
    B, C, O, H, W = 1, 4, 4, 24, 128
    x = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)
    a = rng.normal(1, 0.2, (B, C)).astype(np.float32)
    bb = rng.normal(0, 0.2, (B, C)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, C, O)).astype(np.float32)
    bias = rng.normal(0, 0.2, (B, O)).astype(np.float32)
    ref = _ref_unit(x, a, bb, w, bias, None, act=True)
    got = np.asarray(planar_unit(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(bb), jnp.asarray(w),
        jnp.asarray(bias), None, act=True, ht=8, interpret=True, v2=v2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _toy_unet(dtype=jnp.float32):
    return U.UNetModel(in_channels=1, model_channels=8, out_channels=1,
                       num_res_blocks=2, attention_resolutions=(64,),
                       channel_mult=(0.5, 1, 2), planar_max_c=32,
                       dtype=dtype)


def test_unet_fused_matches_incumbent_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 24, 20, 1), np.float32))
    tv = jnp.zeros((2,), jnp.int32)
    m = _toy_unet()
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x, tv)
    old = U.PLANAR_FUSED
    try:
        U.PLANAR_FUSED = "0"
        y0 = np.asarray(m.apply(p, x, tv))
        U.PLANAR_FUSED = "1"
        y1 = np.asarray(m.apply(p, x, tv))
    finally:
        U.PLANAR_FUSED = old
    np.testing.assert_allclose(y1, y0, rtol=1e-4, atol=1e-5)


def test_unet_fused_bf16_at_least_as_close_to_f32():
    """The fused unit accumulates in f32; its bf16-model output must sit
    at least as close to the f32-model truth as the incumbent lowering."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 24, 20, 1), np.float32))
    tv = jnp.zeros((2,), jnp.int32)
    mf = _toy_unet()
    mb = _toy_unet(jnp.bfloat16)
    p = jax.jit(mf.init)(jax.random.PRNGKey(0), x, tv)
    old = U.PLANAR_FUSED
    try:
        U.PLANAR_FUSED = "0"
        ref = np.asarray(mf.apply(p, x, tv))
        d_inc = np.abs(np.asarray(mb.apply(p, x, tv)) - ref).max()
        U.PLANAR_FUSED = "1"
        d_fus = np.abs(np.asarray(mb.apply(p, x, tv)) - ref).max()
    finally:
        U.PLANAR_FUSED = old
    assert d_fus <= d_inc * 1.5, (d_fus, d_inc)


def test_conv3x3_gn_affine_fallback_composition():
    """With the kernel OFF, Conv3x3(gn_affine=..., extra_bias=...,
    skip_add=...) must equal the explicit silu(a*x+b) -> conv -> adds
    composition on the incumbent planar lowering."""
    rng = np.random.default_rng(3)
    B, C, O, H, W = 2, 4, 4, 12, 17
    x = jnp.asarray(rng.normal(0, 1, (B, C, H, W)).astype(np.float32))
    a = jnp.asarray(rng.normal(1, 0.2, (B, C)).astype(np.float32))
    bb = jnp.asarray(rng.normal(0, 0.2, (B, C)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 0.2, (B, O)).astype(np.float32))
    sk = jnp.asarray(rng.normal(0, 1, (B, O, H, W)).astype(np.float32))
    conv = U.Conv3x3(O)
    p = conv.init(jax.random.PRNGKey(0), x, planar=True)
    old = U.PLANAR_FUSED
    try:
        U.PLANAR_FUSED = "0"
        got = conv.apply(p, x, planar=True, gn_affine=(a, bb),
                         extra_bias=t, skip_add=sk)
        xh = x * a[:, :, None, None] + bb[:, :, None, None]
        want = (conv.apply(p, jax.nn.silu(xh), planar=True)
                + t[:, :, None, None] + sk)
    finally:
        U.PLANAR_FUSED = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hw", [(40, 140), (37, 141)])
def test_unet_wide_matches_narrow(hw):
    """PLANAR_WIDE (persistent 128-lane W padding through the shallow
    stack — one pad in, one slice out, exact-zero pad lanes, masked GN
    counts) must match the narrow layout to f32 fusion-reordering noise.
    The even case exercises the wide 2x upsample; the odd case exercises
    the narrow fallback + re-widening normalization at the concat."""
    H, W = hw
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, H, W, 1), np.float32))
    tv = jnp.full((1,), 3, jnp.int32)
    m = U.UNetModel(in_channels=1, model_channels=8, out_channels=1,
                    num_res_blocks=2, attention_resolutions=(4,),
                    channel_mult=(0.5, 1, 2, 4), dtype=jnp.float32,
                    planar_max_c=32)
    p = m.init(jax.random.PRNGKey(0), x, tv)
    old_f, old_w = U.PLANAR_FUSED, U.PLANAR_WIDE
    try:
        U.PLANAR_FUSED = "1"
        U.PLANAR_WIDE = False
        y0 = np.asarray(m.apply(p, x, tv))
        U.PLANAR_WIDE = True
        y1 = np.asarray(m.apply(p, x, tv))
    finally:
        U.PLANAR_FUSED, U.PLANAR_WIDE = old_f, old_w
    assert y1.shape == y0.shape
    np.testing.assert_allclose(y1, y0, rtol=1e-4, atol=2e-5)


def test_planar_unit_wide_semantics():
    """planar_unit wide mode (wreal < W, lane-padded input): real region
    matches the narrow call even when the INPUT pad lanes carry junk
    (the in-kernel coli<wreal mask kills it). Output pad lanes are
    unspecified by contract — consumers mask or slice."""
    rng = np.random.default_rng(4)
    C, O, H, W, WP = 3, 4, 12, 20, 128
    x = rng.random((1, C, H, W)).astype(np.float32)
    xw = rng.random((1, C, H, WP)).astype(np.float32) * 7.0  # junk pads
    xw[..., :W] = x
    a = rng.random((1, C)).astype(np.float32) + 0.5
    bb = rng.random((1, C)).astype(np.float32)
    w = rng.random((3, 3, C, O)).astype(np.float32)
    bias = rng.random((1, O)).astype(np.float32)
    skip = rng.random((1, O, H, W)).astype(np.float32)
    skipw = np.zeros((1, O, H, WP), np.float32)
    skipw[..., :W] = skip
    for v2 in (False, True):
        y = np.asarray(planar_unit(
            jnp.asarray(x), jnp.asarray(a), jnp.asarray(bb),
            jnp.asarray(w), jnp.asarray(bias), jnp.asarray(skip),
            act=True, ht=8, interpret=True, v2=v2))
        yw = np.asarray(planar_unit(
            jnp.asarray(xw), jnp.asarray(a), jnp.asarray(bb),
            jnp.asarray(w), jnp.asarray(bias), jnp.asarray(skipw),
            act=True, ht=8, interpret=True, v2=v2, wreal=W))
        assert yw.shape == (1, O, H, WP)
        np.testing.assert_allclose(yw[..., :W], y, rtol=1e-5, atol=1e-5)
