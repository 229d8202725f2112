"""Diagnose cross-process compilation-cache misses for the bench tail.

Lowers (no compile) the bench's heavy programs on the CPU backend and
prints stable hashes of their StableHLO text. Run TWICE in separate
processes and diff: identical hashes -> HLO is deterministic and the miss
is in the backend-compile key (compile options / Mosaic payload);
different hashes -> the tracing itself is nondeterministic, diff the
dumped files under /tmp/hlo_<run>.

Usage: python scripts/probe_cachekey.py <tag>
(CPU env: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
"""

import hashlib
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "x"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ipdm_tpu.diffusion.diffusion import GaussianDiffusion  # noqa: E402
from ipdm_tpu.diffusion.guided import guided_reverse_process  # noqa: E402
from ipdm_tpu.models.unet import UNetModel  # noqa: E402
from ipdm_tpu.recon.fbp import SIEMENS_FBP  # noqa: E402
from ipdm_tpu.recon.sart_fast import sart_fast_convert  # noqa: E402

host = np.random.default_rng(0)


def fp(name, lowered):
    txt = lowered.as_text()
    # strip location/metadata lines that never enter the cache key
    txt = re.sub(r'loc\([^)]*\)', '', txt)
    h = hashlib.sha256(txt.encode()).hexdigest()[:16]
    path = f"/tmp/hlo_{name}_{tag}.mlir"
    with open(path, "w") as f:
        f.write(txt)
    print(f"{name}: {h}  ({len(txt)} B) -> {path}", flush=True)


# 1. SART convert program (the dominant compile)
pj3 = jnp.zeros((3, 2000, 912), jnp.float32)
low = jax.jit(lambda p: sart_fast_convert(p, SIEMENS_FBP, nstart=10,
                                          ntv=0, nsubsets=40)).lower(pj3)
fp("sart", low)

# 2. img-stage guided reverse (UNet scan)
img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(16,),
                      channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)
x = jnp.zeros((1, 512, 512, 1), jnp.float32)
tvec = jnp.zeros((1,), jnp.int32)
params = jax.eval_shape(img_model.init, jax.random.PRNGKey(0), x, tvec)
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
gd = GaussianDiffusion(1000, "cosine")


def img_stage(p, xx, rng):
    fn = lambda a, t: img_model.apply(p, a, t)
    iters, _, _ = guided_reverse_process(
        fn, gd, xx, rng, t_start=[15, 15, 15], clip=True, eta=0.7,
        mode="img", constant_guidance=0.45, ldct=xx)
    return iters[-1]


low2 = jax.jit(img_stage).lower(params, x, jax.random.PRNGKey(1))
fp("imgstage", low2)
