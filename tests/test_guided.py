"""Guided sampler unit tests (reference Model/model.py:518-759 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
from ipdm_tpu.diffusion.guided import (guided_reverse_process,
                                       sparse_guided_reverse_process,
                                       _torch_median)
from ipdm_tpu.ops.lambda_curve import curve_init, proj_curve_init
from ipdm_tpu.ops.lambda_map import condition_lambda_map


def _zero_model(x, t):
    """ε̂ = 0 surrogate model (spatially flat predictions are degenerate for
    the std-normalised blend, so tests use structured inputs)."""
    return jnp.zeros_like(x)


def _identity_noise_model(x, t):
    return x * 0.1 + jnp.sin(jnp.arange(x.shape[2], dtype=jnp.float32))[
        None, None, :, None]


@pytest.fixture(scope="module")
def gd():
    return GaussianDiffusion(timesteps=50, beta_schedule="cosine")


def test_only_convertor_short_circuits(gd):
    x = jnp.ones((1, 8, 8, 1))
    out, states, ns = guided_reverse_process(
        _zero_model, gd, x, jax.random.PRNGKey(0), t_start=[3],
        only_convertor=True)
    assert len(out) == 1 and out[0] is x and ns is None


def test_dense_constant_guidance_iters_and_ensemble(gd):
    """3 t_start entries → 3 iters + final 2-tap ensemble = 4 results."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 16, 16, 1))
    out, _, ns = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=[3, 2, 2], mode="img",
        constant_guidance=0.45, clip=True)
    assert len(out) == 4
    np.testing.assert_allclose(np.asarray(out[3]),
                               (np.asarray(out[2]) + np.asarray(out[1])) / 2,
                               rtol=1e-6)
    for o in out:
        a = np.asarray(o)
        assert a.min() >= 0.0 and a.max() <= 1.0  # img post-clamp


def test_proj_mode_clamps_nonnegative(gd):
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (1, 16, 16, 1)) * 4
    out, _, _ = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=[3, 2], mode="proj",
        constant_guidance=0.5, clip=True)
    # proj clamp is min=0 only
    assert np.asarray(out[0]).min() >= 0.0


def test_adaptive_proj_classes_and_probe_drop(gd):
    """Adaptive proj mode: probe iteration dropped, noise class returned,
    result count = len(sched) + ensemble."""
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (1, 32, 32, 1)) * 2
    out, _, ns = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=None, mode="proj",
        lambda_curve=proj_curve_init(), kernel_size=4, amplitude=5,
        clip=True)
    assert ns in ("high", "mid", "low")
    assert len(out) == 4  # 3 sched iters + ensemble (probe dropped)


def test_adaptive_img_uses_noise_strength(gd):
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (1, 32, 32, 1)) * 0.05
    out, _, _ = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=None, mode="img",
        lambda_curve=curve_init(), kernel_size=4, amplitude=20,
        noise_strength="high", ldct=x, clip=True)
    assert len(out) == 4  # [15,15,15] + ensemble


def test_sparse_ddim_runs_and_counts(gd):
    rng = jax.random.PRNGKey(4)
    x = jax.random.uniform(rng, (1, 16, 16, 1))
    out = sparse_guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=[3, 2, 2],
        ddim_timesteps=[1, 2, 2], eta=0.5, clip_denoised=True)
    assert len(out) == 3
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))


def test_torch_median_lower_order_stat():
    x = jnp.asarray([3.0, 1.0, 2.0, 4.0])
    # torch.median of even n takes the lower middle: sorted [1,2,3,4] → 2
    assert float(_torch_median(x)) == 2.0
    x = jnp.asarray([3.0, 1.0, 2.0])
    assert float(_torch_median(x)) == 2.0


def test_condition_lambda_map_matches_reference_formula():
    """Mirror of the numba kernel math (model.py:346-351) with clip."""
    s = 0.008
    ts = 15
    delt = jnp.asarray(np.random.default_rng(0).uniform(0.05, 20, (1, 4, 4, 1))
                       .astype(np.float32))
    i = 7
    got = np.asarray(condition_lambda_map(delt, i, ts, s))

    def a(x):
        return np.cos((x / ts + s) / (1 + s) * np.pi / 2) ** 2

    lam = np.asarray(delt, np.float64)
    expect = 1.0 - (a(i + 1) ** lam) / (a(i) ** lam)
    expect = np.clip(expect, 0.05, 0.99)
    np.testing.assert_allclose(got, expect, rtol=2e-5)


def test_guidance_update_blend(gd):
    """Constant-guidance: imgs ← η·x̂ + (1−η)·x₀ each iteration (proj)."""
    # with a fixed model the second iteration must differ from re-running
    # iteration 1 (guidance moved); smoke-check determinism per rng too
    rng = jax.random.PRNGKey(5)
    x = jax.random.uniform(rng, (1, 16, 16, 1))
    out1, _, _ = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=[3, 3], mode="proj",
        constant_guidance=0.5, eta=0.4, clip=False)
    out2, _, _ = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=[3, 3], mode="proj",
        constant_guidance=0.5, eta=0.4, clip=False)
    np.testing.assert_allclose(np.asarray(out1[-1]), np.asarray(out2[-1]))


def test_save_states_returns_trajectory(gd):
    rng = jax.random.PRNGKey(6)
    x = jax.random.uniform(rng, (1, 16, 16, 1))
    out, states, _ = guided_reverse_process(
        _identity_noise_model, gd, x, rng, t_start=[3, 2], mode="img",
        constant_guidance=0.45, clip=True, save_states=True)
    assert states is not None and len(states) == 2
    assert states[0].shape == (3, 1, 16, 16, 1)
    assert states[1].shape == (2, 1, 16, 16, 1)


def test_merged_probe_scan_matches_split(gd):
    """The single-scan lowering of fused_probe_and_iters (uniform ts — the
    flagship preset's static schedule) must match the split probe +
    unrolled-iterations path: same rng split order, same λ sources, same
    probe-restart semantics."""
    from ipdm_tpu.diffusion import guided
    from ipdm_tpu.diffusion.guided import (ProbeSpec, RestSpec,
                                           fused_probe_and_iters)

    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 1)) * 4
    ldct = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 1))
    for mode, clip, curve in (("proj", False, proj_curve_init()),
                              ("img", True, curve_init())):
        pspec = ProbeSpec(ts=3, mode=mode, clip=clip, lambda_ratio=1.0,
                          kernel_size=4, amplitude=7.0, curve=curve)
        rspec = RestSpec(ts_list=(3, 3), mode=mode, clip=clip, eta=0.5,
                         lambda_kind="map", has_ldct=mode == "img")
        raw = fused_probe_and_iters.__wrapped__
        apply_fn, params = guided._split_model_fn(_identity_noise_model)
        old = guided._ITER_SCAN
        try:
            guided._ITER_SCAN = True
            pa, resta = raw(apply_fn, gd, pspec, rspec, params, x,
                            ldct, jax.random.PRNGKey(7))
            guided._ITER_SCAN = False
            pb, restb = raw(apply_fn, gd, pspec, rspec, params, x,
                            ldct, jax.random.PRNGKey(7))
        finally:
            guided._ITER_SCAN = old
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
        assert len(resta) == len(restb) == 2
        for ai, bi in zip(resta, restb):
            np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                       rtol=1e-5, atol=1e-6)


def test_iter_scan_matches_unrolled(gd):
    """The scan-over-iterations lowering of fused_iters (uniform ts_list)
    must be bit-identical to the unrolled path, both λ kinds."""
    from ipdm_tpu.diffusion import guided
    from ipdm_tpu.diffusion.guided import RestSpec, fused_iters

    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (1, 16, 16, 1))
    ldct = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 1))
    delt = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (1, 4, 4, 1)),
                    0.3, 0.99)
    specs = [
        RestSpec(ts_list=(3, 3, 3), mode="img", clip=True, eta=0.7,
                 lambda_kind="constant", constant_guidance=0.45,
                 has_ldct=True),
        RestSpec(ts_list=(3, 3), mode="proj", clip=False, eta=0.5,
                 lambda_kind="map"),
    ]
    # use the unjitted function: the jit cache keys on (model_fn, gd, spec)
    # only, so flipping the module flag would otherwise hit the cached trace
    raw = fused_iters.__wrapped__
    apply_fn, params = guided._split_model_fn(_identity_noise_model)
    for spec in specs:
        old = guided._ITER_SCAN
        try:
            guided._ITER_SCAN = True
            a = raw(apply_fn, gd, spec, params, x, x, x,
                    delt, ldct, jax.random.PRNGKey(7))
            guided._ITER_SCAN = False
            b = raw(apply_fn, gd, spec, params, x, x, x,
                    delt, ldct, jax.random.PRNGKey(7))
        finally:
            guided._ITER_SCAN = old
        assert len(a) == len(b) == len(spec.ts_list)
        for ai, bi in zip(a, b):
            np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                       rtol=1e-5, atol=1e-6)
