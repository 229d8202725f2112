"""Closed-form DDPM identities on the diffusion core
(reference algebra: Model/model.py:376-515)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipdm_tpu.diffusion.diffusion import (GaussianDiffusion, extract,
                                          make_tables, std_normalize)
from ipdm_tpu.diffusion.schedules import (condition_lambda_ratio,
                                          cosine_beta_schedule,
                                          linear_beta_schedule)


def test_cosine_schedule_properties():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas.min() >= 0 and betas.max() <= 0.999
    # ᾱ decreasing
    ac = np.cumprod(1 - betas)
    assert np.all(np.diff(ac) < 0)


def test_cosine_schedule_power():
    # power>1 raises ᾱ to the power → different betas
    b1 = cosine_beta_schedule(100, schedule_power=1)
    b5 = cosine_beta_schedule(100, schedule_power=5)
    assert not np.allclose(b1, b5)
    # both valid
    assert b5.max() <= 0.999


def test_linear_schedule_endpoints():
    b = linear_beta_schedule(1000)
    np.testing.assert_allclose(b[0], 1e-4, rtol=1e-12)
    np.testing.assert_allclose(b[-1], 0.02, rtol=1e-12)


def test_tables_identities():
    tb = make_tables(1000, "cosine", 1)
    # sqrt tables consistent
    np.testing.assert_allclose(tb.sqrt_alphas_cumprod ** 2, tb.alphas_cumprod,
                               rtol=1e-5)
    np.testing.assert_allclose(
        tb.sqrt_one_minus_alphas_cumprod ** 2 + tb.alphas_cumprod,
        np.ones(1000), rtol=1e-5, atol=1e-6)
    # posterior variance formula holds
    np.testing.assert_allclose(
        tb.posterior_variance,
        tb.betas * (1 - tb.alphas_cumprod_prev) / (1 - tb.alphas_cumprod),
        rtol=2e-4, atol=1e-7)


def test_q_sample_inverse_recovers_noise():
    gd = GaussianDiffusion(100, "cosine")
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([5, 50])
    xt = gd.q_sample(x0, t, noise)
    rec = gd.q_sample_inverse(xt, x0, t)
    np.testing.assert_allclose(rec, noise, rtol=1e-3, atol=1e-4)


def test_predict_start_inverts_q_sample():
    gd = GaussianDiffusion(100, "cosine")
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 1))
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([30])
    xt = gd.q_sample(x0, t, noise)
    rec = gd.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(rec, x0, rtol=1e-3, atol=1e-4)


def test_posterior_at_t0_returns_x0():
    gd = GaussianDiffusion(100, "cosine")
    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 1))
    xt = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    mean, var, _ = gd.q_posterior_mean_variance(x0, xt, jnp.array([0]))
    # at t=0: ᾱ_prev=1, coef1=β·1/(1−ᾱ)=... for t=0, 1−ᾱ_0=β_0 ⇒ coef1=1, coef2=0
    np.testing.assert_allclose(mean, x0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(var, 0.0, atol=1e-7)


def test_std_normalize_matches_torch_bessel():
    import torch
    x = np.random.RandomState(0).randn(3, 5, 7).astype(np.float32)
    want = ((torch.from_numpy(x) - torch.from_numpy(x).mean())
            / torch.std(torch.from_numpy(x))).numpy()
    got = np.asarray(std_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_train_loss_is_finite_and_decreasable():
    gd = GaussianDiffusion(100, "cosine")
    x0 = jnp.ones((2, 8, 8, 1))
    model_fn = lambda x, t: jnp.zeros_like(x)
    loss = gd.train_loss(model_fn, x0, jnp.array([10, 20]),
                         jax.random.PRNGKey(0))
    assert jnp.isfinite(loss)
    # predicting zeros → loss ≈ E[ε²] = 1
    assert 0.5 < float(loss) < 2.0


def test_condition_lambda_ratio_clipping():
    v = condition_lambda_ratio(0, 15)
    assert 0.3 <= v <= 0.999


def test_extract_broadcast_shape():
    a = jnp.arange(10.0)
    t = jnp.array([1, 2, 3])
    out = extract(a, t, 4)
    assert out.shape == (3, 1, 1, 1)
