"""Training-step throughput on the current device.

Measures the jitted DDPM train step (q_sample → UNet fwd+bwd → Adam) for the
image-domain model at 512² and the projection-domain model at 2000×912 —
the reference's training configuration (batch 1; plus batch 4 for the
TPU-friendly batched variant). Honest timing: dependency-chained steps ended
by a scalar loss readback.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
from ipdm_tpu.engine.trainer import (init_train_state, make_optimizer,
                                     make_train_step)
from ipdm_tpu.models.unet import UNetModel


def bench(name, model, shape, n=8):
    gd = GaussianDiffusion(1000, "cosine")
    tx = make_optimizer(2e-4)
    rng = jax.random.PRNGKey(0)
    state, _ = init_train_state(model, rng, shape, 2e-4)
    step = make_train_step(model, gd, tx, partial_timesteps=50)
    images = jnp.asarray(np.random.default_rng(0).random(shape, np.float32))
    state, loss = step(state, images, jax.random.PRNGKey(1))
    _ = float(loss)   # compile + drain
    t0 = time.time()
    for i in range(n):
        state, loss = step(state, images, jax.random.PRNGKey(2 + i))
    lv = float(loss)  # drain
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.1f} ms/step "
          f"({shape[0]/dt:.2f} samples/s), loss={lv:.4f}", flush=True)


if __name__ == "__main__":
    from ipdm_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()
    img = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                    num_res_blocks=2, attention_resolutions=(16,),
                    channel_mult=(1, 1, 2, 2, 4, 4), remat=True)
    bench("img train(remat) B=1 512^2", img, (1, 512, 512, 1))
    bench("img train(remat) B=4 512^2", img, (4, 512, 512, 1))
    proj = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                     num_res_blocks=2, attention_resolutions=(32,),
                     channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                     remat=True)
    bench("proj train(remat) B=1 2000x912", proj, (1, 2000, 912, 1))
