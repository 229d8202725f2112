"""UNet structural tests: shapes (incl. odd sinogram pyramid), GroupNorm group
rule, timestep embedding, analytic parameter count."""

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.models.unet import (UNetModel, group_count, nearest_resize,
                                  timestep_embedding)


def test_group_count_rule():
    assert group_count(64) == 32
    assert group_count(4) == 4
    assert group_count(8) == 8
    assert group_count(48) == 24  # divisors of 48 nearest 32 → 24
    assert group_count(33) == 33  # divisors {1,3,11,33} → 33


def test_timestep_embedding_cos_sin_order():
    t = jnp.asarray([3.0])
    emb = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = 3.0 * freqs
    np.testing.assert_allclose(emb[0, :half], np.cos(args), rtol=1e-5)
    np.testing.assert_allclose(emb[0, half:], np.sin(args), rtol=1e-5)


def test_nearest_resize_matches_torch_convention():
    """Both the repeat+crop fast path (dst ∈ {2s, 2s−1} — every UNet
    upsample) and the one-hot-matmul general path match
    F.interpolate(mode='nearest')."""
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(0)
    cases = [
        ((13, 7), (25, 13)),    # fast: (2s−1, 2s−1)
        ((13, 7), (26, 14)),    # fast: (2s, 2s)
        ((63, 57), (125, 114)),  # fast: sinogram pyramid tail
        ((13, 7), (25, 14)),    # fast: mixed
        ((13, 7), (30, 10)),    # general fallback
        ((13, 7), (13, 21)),    # general fallback (non-integer ratio)
    ]
    for src, dst in cases:
        x = rs.rand(1, src[0], src[1], 2).astype(np.float32)
        out = np.asarray(nearest_resize(jnp.asarray(x), dst))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = F.interpolate(xt, size=dst, mode="nearest").numpy()
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), want,
                                   atol=1e-6, err_msg=f"{src}->{dst}")


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


def _expected_params(model, in_ch):
    """Independent analytic parameter count from the block plan."""
    down, mid_ch, up, final_ch = model.plan()
    mc = model.model_channels
    ted = mc * 4
    n = mc * ted + ted + ted * ted + ted  # time MLP

    def gn(c):
        return 2 * c

    def conv(cin, cout, k=3):
        return cin * cout * k * k + cout

    def res(cin, cout):
        p = gn(cin) + conv(cin, cout) + (ted * cout + cout) + gn(cout) \
            + conv(cout, cout)
        if cin != cout:
            p += conv(cin, cout, 1)
        return p

    def attn(c):
        return gn(c) + c * 3 * c + conv(c, c, 1)

    for e in down:
        if e[0] == "stem":
            n += conv(in_ch, e[1])
        elif e[0] == "res":
            n += res(e[1], e[2]) + (attn(e[2]) if e[3] else 0)
        else:
            n += conv(e[1], e[1])
    n += res(mid_ch, mid_ch) + attn(mid_ch) + res(mid_ch, mid_ch)
    for (_, cin, cout, a, ups) in up:
        n += res(cin, cout) + (attn(cout) if a else 0) \
            + (conv(cout, cout) if ups else 0)
    n += gn(final_ch) + conv(final_ch, model.out_channels)
    return n


def _init(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    t = jnp.zeros((shape[0],), jnp.int32)
    return model.init(jax.random.PRNGKey(0), x, t), x, t


def test_img_unet_shape_and_params():
    m = UNetModel(in_channels=1, out_channels=1, model_channels=8,
                  attention_resolutions=(2,), channel_mult=(1, 1, 2, 2),
                  num_heads=4)
    params, x, t = _init(m, (1, 16, 16, 1))
    out = m.apply(params, x, t)
    assert out.shape == (1, 16, 16, 1)
    assert _param_count(params) == _expected_params(m, 1)


def test_proj_unet_odd_shapes():
    """Fractional stem multiplier + odd-size down/up path, like the sinogram
    model (2000×912 pyramid scaled down)."""
    m = UNetModel(in_channels=1, out_channels=1, model_channels=8,
                  attention_resolutions=(4,),
                  channel_mult=(0.5, 1, 2, 2), num_heads=2)
    params, x, t = _init(m, (1, 50, 23, 1))
    out = m.apply(params, x, t)
    assert out.shape == (1, 50, 23, 1)
    assert _param_count(params) == _expected_params(m, 1)


def test_unet_jit_and_grad():
    # smallest net that still exercises down/up/skip grads: XLA:CPU's
    # conv-grad compile is minutes per extra level on this 1-core box
    m = UNetModel(in_channels=1, out_channels=1, model_channels=8,
                  attention_resolutions=(), channel_mult=(1, 2),
                  num_heads=1)
    params, x, t = _init(m, (2, 8, 8, 1))

    @jax.jit
    def loss_fn(p, x, t):
        return jnp.mean(m.apply(p, x, t) ** 2)

    g = jax.grad(loss_fn)(params, x + 1.0, t + 3)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_bfloat16_forward():
    m = UNetModel(in_channels=1, out_channels=1, model_channels=8,
                  attention_resolutions=(2,), channel_mult=(1, 2),
                  num_heads=2, dtype=jnp.bfloat16)
    params, x, t = _init(m, (1, 8, 8, 1))
    out = m.apply(params, x, t)
    assert out.dtype == jnp.float32  # cast back at the head
    assert np.all(np.isfinite(np.asarray(out)))


def test_remat_param_tree_and_output_match():
    """nn.remat twin has the identical parameter tree and forward output."""
    import jax
    import jax.numpy as jnp
    from ipdm_tpu.models.unet import UNetModel
    kw = dict(in_channels=1, model_channels=8, out_channels=1,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2))
    m0 = UNetModel(**kw)
    m1 = UNetModel(remat=True, **kw)
    x = jnp.ones((1, 8, 8, 1))
    t = jnp.zeros((1,), jnp.int32)
    p0 = m0.init(jax.random.PRNGKey(0), x, t)
    p1 = m1.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    import numpy as np
    np.testing.assert_allclose(np.asarray(m0.apply(p0, x, t)),
                               np.asarray(m1.apply(p0, x, t)), atol=1e-6)
    # gradients flow through the remat version
    loss = lambda p: jnp.sum(m1.apply(p, x, t) ** 2)
    g = jax.grad(loss)(p0)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_bf16_guided_sampling_close_to_f32():
    """bf16-activation UNet inside the guided sampler: finite and close to
    the f32 result over a short reverse process (same params/rng)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion.guided import guided_reverse_process
    from ipdm_tpu.models.unet import UNetModel
    kw = dict(in_channels=1, model_channels=8, out_channels=1,
              num_res_blocks=1, attention_resolutions=(4,),
              channel_mult=(1, 2))
    m32 = UNetModel(**kw)
    m16 = UNetModel(dtype=jnp.bfloat16, **kw)
    x = jnp.ones((1, 16, 16, 1)) * 0.3
    t = jnp.zeros((1,), jnp.int32)
    p = m32.init(jax.random.PRNGKey(0), x, t)
    gd = GaussianDiffusion(50, "cosine")
    rng = jax.random.PRNGKey(1)
    o32, _, _ = guided_reverse_process(
        lambda a, tt: m32.apply(p, a, tt), gd, x, rng, t_start=[3, 2],
        mode="img", constant_guidance=0.45, clip=True)
    o16, _, _ = guided_reverse_process(
        lambda a, tt: m16.apply(p, a, tt), gd, x, rng, t_start=[3, 2],
        mode="img", constant_guidance=0.45, clip=True)
    a, b = np.asarray(o32[-1]), np.asarray(o16[-1])
    assert np.all(np.isfinite(b))
    assert np.mean(np.abs(a - b)) < 0.05


def test_up2_conv_matches_resize_then_conv():
    """The fused subposition upsample+conv (_up2_conv) is an exact
    reparametrization of nearest-2× resize followed by the 3×3 conv."""
    import jax
    from ipdm_tpu.models.unet import Conv3x3, nearest_resize
    rng = np.random.RandomState(0)
    for Ci, Co, H, W in ((8, 16, 7, 9), (16, 16, 12, 10), (3, 5, 5, 5)):
        x = jnp.asarray(rng.rand(2, H, W, Ci).astype(np.float32))
        conv = Conv3x3(Co)
        params = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(params, nearest_resize(x, (2 * H, 2 * W)))
        fused = conv.apply(params, x, upsample2=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_planar_mode_matches_nhwc():
    """Planar shallow execution (W-minor layout + shift-einsum convs) is a
    pure layout/lowering change: outputs must match NHWC execution."""
    import jax
    cfg = dict(in_channels=1, model_channels=16, out_channels=1,
               num_res_blocks=2, attention_resolutions=(4,),
               channel_mult=(0.25, 0.5, 1, 2), num_heads=2)
    planar = UNetModel(planar_max_c=32, **cfg)
    nhwc = UNetModel(planar_max_c=0, **cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 25, 22, 1)
                    .astype(np.float32))
    t = jnp.asarray(np.array([3, 40], np.int32))
    params = planar.init(jax.random.PRNGKey(0), x, t)
    # identical param tree
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(nhwc.init(jax.random.PRNGKey(0), x, t))
    assert s1 == s2
    y_p = np.asarray(planar.apply(params, x, t))
    y_n = np.asarray(nhwc.apply(params, x, t))
    np.testing.assert_allclose(y_p, y_n, atol=2e-5, rtol=1e-4)


def test_flash_attention_matches_naive():
    """The Pallas flash-attention path (used for long sequences on TPU) ==
    the naive T×S einsum path, including the segment-id masking of the
    padded tail (T=600 pads to 1024)."""
    import math
    from jax.experimental.pallas import tpu as pltpu
    from ipdm_tpu.models.unet import _flash_attention

    rng = np.random.default_rng(0)
    B, T, nh, hd = 1, 600, 4, 64
    q = jnp.asarray(rng.standard_normal((B, T, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, nh, hd)), jnp.float32)
    scale = 1.0 / math.sqrt(math.sqrt(hd))
    attn = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    want = jnp.einsum("bhts,bshd->bthd", attn, v)
    with pltpu.force_tpu_interpret_mode():
        got = _flash_attention(q, k, v, scale * scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_gradients_match_naive():
    """Flash attention's custom VJP == autodiff through the naive path
    (training uses the same kernel at the preset's 512² attention level)."""
    import math
    from jax.experimental.pallas import tpu as pltpu
    from ipdm_tpu.models.unet import _flash_attention

    rng = np.random.default_rng(1)
    B, T, nh, hd = 1, 300, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, nh, hd)), jnp.float32)
    s = 1.0 / math.sqrt(math.sqrt(hd))

    def naive(q, k, v):
        a = jnp.einsum("bthd,bshd->bhts", q * s, k * s,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, axis=-1)
        return (jnp.einsum("bhts,bshd->bthd", a, v) ** 2).sum()

    def flash(q, k, v):
        return (_flash_attention(q, k, v, s * s) ** 2).sum()

    g1 = jax.grad(naive, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_vpu_unroll_planar_conv_matches_einsum():
    """The scalar-FMA planar conv path (tiny-C levels) == the einsum
    lowering, including strides and the 1-channel stem."""
    import ipdm_tpu.models.unet as um
    from ipdm_tpu.models.unet import Conv3x3

    rng = jax.random.PRNGKey(0)
    old = um.VPU_UNROLL_MAX
    try:
        for cin, cout, s in [(1, 4, 1), (4, 8, 1), (8, 8, 1), (8, 8, 2)]:
            x = jnp.asarray(np.random.default_rng(0).standard_normal(
                (2, cin, 20, 28)), jnp.float32)
            m = Conv3x3(cout, strides=s)
            p = m.init(rng, x, planar=True)
            um.VPU_UNROLL_MAX = 64
            a = m.apply(p, x, planar=True)
            um.VPU_UNROLL_MAX = 0
            b = m.apply(p, x, planar=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    finally:
        um.VPU_UNROLL_MAX = old


def test_param_pack_roundtrip_and_apply():
    """pack_params/unpack_params is the identity, and a jitted apply on
    the packed single-buffer argument matches the pytree apply."""
    from ipdm_tpu.utils.param_pack import pack_params, unpack_params

    m = UNetModel(in_channels=1, out_channels=1, model_channels=8,
                  attention_resolutions=(2,), channel_mult=(1, 2),
                  num_heads=2)
    params, x, t = _init(m, (1, 8, 8, 1))
    packed, spec = pack_params(params)
    assert len(jax.tree_util.tree_leaves(packed)) <= 2  # one per dtype
    rebuilt = unpack_params(packed, spec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype and a.shape == b.shape

    want = np.asarray(m.apply(params, x, t))

    @jax.jit
    def packed_apply(pk, x, t):
        return m.apply(unpack_params(pk, spec), x, t)

    got = np.asarray(packed_apply(packed, x, t))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
