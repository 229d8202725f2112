import time, sys, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
from ipdm_tpu.diffusion.guided import guided_reverse_process
from ipdm_tpu.models.unet import UNetModel

img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(8, 16),
                      channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)
k1, _ = jax.random.split(jax.random.PRNGKey(0))
tvec = jnp.zeros((1,), jnp.int32)
img_x = jnp.asarray(np.random.default_rng(0).random((1,512,512,1), np.float32))
ld = jnp.asarray(np.random.default_rng(2).random((1,512,512,1), np.float32)*0.3)
img_p = jax.jit(img_model.init)(k1, img_x, tvec)
jax.block_until_ready(img_p)
gd = GaussianDiffusion(1000, "cosine")

def stage(ts):
    def f(p, r, x):
        fn = lambda a, t: img_model.apply(p, a, t)
        it, _, _ = guided_reverse_process(fn, gd, x, r, t_start=ts,
            clip=True, eta=0.7, mode="img", constant_guidance=0.45, ldct=ld)
        return it[-1]
    return jax.jit(f)

for ts in ([15], [15, 15, 15], [5, 5, 5]):
    f = stage(ts)
    y = f(img_p, jax.random.PRNGKey(1), img_x); _ = float(y.sum())
    t0 = time.time()
    n = 3
    for i in range(n):
        y = f(img_p, jax.random.fold_in(jax.random.PRNGKey(2), i), y)
    _ = float(y.sum())
    dt = (time.time()-t0)/n
    print(f"img stage t_start={ts}: {dt*1e3:.0f} ms total, {dt*1e3/sum(ts):.1f} ms/eval", flush=True)
