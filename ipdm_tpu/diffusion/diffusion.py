"""Gaussian diffusion core: closed-form q/p distributions on precomputed
tables.

Functional JAX port of the algebra in the reference GaussianDiffusion
(Model/model.py:376-515,645-652). All tables are precomputed in float64
(reference uses torch.float64) and stored as float32 device constants; the
model is passed in as a pure function `model_fn(x, t) -> eps`, so every method
here is jit/vmap/scan-friendly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.diffusion.schedules import make_betas


class DiffusionTables(NamedTuple):
    """Precomputed schedule tables (all shape [T])."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray


def make_tables(timesteps: int, beta_schedule: str, schedule_power: float = 1,
                dtype=jnp.float32) -> DiffusionTables:
    """Build tables with the exact algebra of reference model.py:385-421."""
    betas = make_betas(timesteps, beta_schedule, schedule_power)  # float64
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = (betas * (1.0 - alphas_cumprod_prev)
                          / (1.0 - alphas_cumprod))
    tables = DiffusionTables(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=np.log(np.clip(posterior_variance,
                                                      1e-20, None)),
        posterior_mean_coef1=(betas * np.sqrt(alphas_cumprod_prev)
                              / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=((1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
                              / (1.0 - alphas_cumprod)),
    )
    return DiffusionTables(*(jnp.asarray(t, dtype=dtype) for t in tables))


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """a[t] reshaped to broadcast against an ndim-dimensional batch tensor
    (reference _extract, model.py:424-428)."""
    out = a[t]
    return out.reshape(out.shape[:1] + (1,) * (ndim - 1))


def std_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - mean)/std over the whole tensor. The reference uses torch.std
    which applies Bessel's correction (model.py:489-490), reproduced here."""
    n = x.size
    mean = jnp.mean(x)
    var = jnp.sum((x - mean) ** 2) / jnp.maximum(n - 1, 1)
    return (x - mean) / jnp.sqrt(var)


class GaussianDiffusion:
    """Thin object wrapper over DiffusionTables + pure methods.

    Mirrors the reference surface (q_sample, q_sample_inverse,
    q_mean_variance, q_posterior_mean_variance, predict_start_from_noise,
    p_mean_variance[_condition], p_sample_condition, train_losses); the
    iterative samplers live in ipdm_tpu.diffusion.guided.
    """

    def __init__(self, timesteps: int = 1000, beta_schedule: str = "linear",
                 schedule_power: float = 1):
        self.timesteps = timesteps
        self.beta_schedule = beta_schedule
        self.schedule_power = schedule_power
        self.tables = make_tables(timesteps, beta_schedule, schedule_power)

    # Structural equality/hash: GaussianDiffusion rides the guided samplers
    # as a STATIC jit argument. With the default identity hash every engine
    # (or test) instance would key its own trace of every sampler program;
    # value-hashing lets instances with identical schedules share traces —
    # same reason flax Modules compare structurally.
    def _key(self):
        return (type(self), self.timesteps, self.beta_schedule,
                self.schedule_power)

    def __eq__(self, other):
        return (isinstance(other, GaussianDiffusion)
                and self._key() == other._key())

    def __hash__(self):
        return hash(self._key())

    # -- forward process ----------------------------------------------------

    def q_sample(self, x_start, t, noise):
        tb = self.tables
        nd = x_start.ndim
        return (extract(tb.sqrt_alphas_cumprod, t, nd) * x_start
                + extract(tb.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_sample_inverse(self, x_t, x_start, t):
        """The implied noise that would map x_start to x_t — the guidance
        'condition noise' (reference model.py:447-450)."""
        tb = self.tables
        nd = x_start.ndim
        return ((x_t - extract(tb.sqrt_alphas_cumprod, t, nd) * x_start)
                / extract(tb.sqrt_one_minus_alphas_cumprod, t, nd))

    def q_mean_variance(self, x_start, t):
        tb = self.tables
        nd = x_start.ndim
        mean = extract(tb.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - tb.alphas_cumprod, t, nd)
        log_variance = extract(tb.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    # -- posterior -----------------------------------------------------------

    def q_posterior_mean_variance(self, x_start, x_t, t):
        tb = self.tables
        nd = x_t.ndim
        posterior_mean = (extract(tb.posterior_mean_coef1, t, nd) * x_start
                          + extract(tb.posterior_mean_coef2, t, nd) * x_t)
        posterior_variance = extract(tb.posterior_variance, t, nd)
        posterior_log_variance = extract(tb.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    def predict_start_from_noise(self, x_t, t, noise):
        tb = self.tables
        nd = x_t.ndim
        return (extract(tb.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - extract(tb.sqrt_recipm1_alphas_cumprod, t, nd) * noise)

    # -- reverse steps -------------------------------------------------------

    def p_mean_variance(self, model_fn, x_t, t, clip_denoised=False):
        pred_noise = model_fn(x_t, t)
        x_recon = self.predict_start_from_noise(x_t, t, pred_noise)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return self.q_posterior_mean_variance(x_recon, x_t, t)

    def p_mean_variance_condition(self, model_fn, x_t, x_0, t, lambda_,
                                  clip_denoised=False):
        """Guided mean/variance: ε ← std((1-λ)·std(ε̂) + λ·std(ε_cond))
        (reference model.py:492-502)."""
        pred_noise = model_fn(x_t, t)
        condition_noise = self.q_sample_inverse(x_t, x_0, t).astype(
            pred_noise.dtype)
        pred_noise = std_normalize((1.0 - lambda_) * std_normalize(pred_noise)
                                   + lambda_ * std_normalize(condition_noise))
        x_recon = self.predict_start_from_noise(x_t, t, pred_noise)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return self.q_posterior_mean_variance(x_recon, x_t, t)

    def p_sample_condition(self, model_fn, x_t, x_0, t, rng,
                           clip_denoised=True, lambda_=1.0):
        """One guided ancestral step x_t → x_{t-1} (reference model.py:505-515)."""
        model_mean, _, model_log_variance = self.p_mean_variance_condition(
            model_fn, x_t, x_0, t, lambda_, clip_denoised=clip_denoised)
        noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        nonzero = (t != 0).astype(x_t.dtype).reshape(
            (-1,) + (1,) * (x_t.ndim - 1))
        return model_mean + nonzero * jnp.exp(0.5 * model_log_variance) * noise

    # -- training ------------------------------------------------------------

    def train_loss(self, model_fn: Callable, x_start: jnp.ndarray,
                   t: jnp.ndarray, rng) -> jnp.ndarray:
        """MSE(ε, ε̂) at random t (reference train_losses, model.py:645-652)."""
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)
        predicted = model_fn(x_noisy, t)
        return jnp.mean((noise - predicted) ** 2)

    def lambda_t_calculate(self, eta: float = 0.9) -> jnp.ndarray:
        """Unused-by-main-path helper kept for parity (model.py:430-435)."""
        tb = self.tables
        lambda_t = jnp.abs((1 - eta + eta * tb.alphas - tb.alphas_cumprod)
                           * jnp.sqrt(tb.alphas_cumprod_prev)
                           / (1 - tb.alphas_cumprod))
        return jnp.cumprod(lambda_t, axis=0)
