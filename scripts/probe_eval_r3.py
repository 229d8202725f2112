import time, sys, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ipdm_tpu.models.unet import UNetModel

img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(8, 16),
                      channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)
proj_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                       num_res_blocks=2, attention_resolutions=(16, 32),
                       channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                       dtype=jnp.bfloat16)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
tvec = jnp.zeros((1,), jnp.int32)
img_x = jnp.asarray(np.random.default_rng(0).random((1,512,512,1), np.float32))
proj_x = jnp.asarray(np.random.default_rng(1).random((1,2000,912,1), np.float32))
img_p = jax.jit(img_model.init)(k1, img_x, tvec)
proj_p = jax.jit(proj_model.init)(k2, proj_x, tvec)
jax.block_until_ready((img_p, proj_p))

# chained: 20 sequential evals INSIDE one jit (like the sampler scan) vs
# 20 dispatched evals — separates device work from dispatch overhead
def loop(model):
    def f(p, x):
        def body(c, _):
            y = model.apply(p, c, tvec)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype), c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=20)
        return out
    return jax.jit(f)

for name, model, p, x in (("img", img_model, img_p, img_x),
                          ("proj", proj_model, proj_p, proj_x)):
    f = loop(model)
    y = f(p, x); _ = float(y.sum())
    t0 = time.time(); y = f(p, y); _ = float(y.sum())
    dt = (time.time()-t0)/20
    print(f"{name} scan-eval: {dt*1e3:.1f} ms/eval", flush=True)

    g = jax.jit(lambda p, x: model.apply(p, x, tvec))
    y = g(p, x); _ = float(jnp.asarray(y).sum())
    t0 = time.time()
    x2 = x
    for i in range(10):
        x2 = jnp.asarray(x2 + 0.001 * jnp.asarray(g(p, x2), x2.dtype), x2.dtype)
    _ = float(x2.sum())
    print(f"{name} dispatched-eval: {(time.time()-t0)/10*1e3:.1f} ms/eval", flush=True)
