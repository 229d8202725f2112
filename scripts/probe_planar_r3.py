import time, sys, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ipdm_tpu.models.unet import UNetModel

tvec = jnp.zeros((1,), jnp.int32)
proj_x = jnp.asarray(np.random.default_rng(1).random((1,2000,912,1), np.float32))

for pmc in (32, 0):
    model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(16, 32),
                      channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                      dtype=jnp.bfloat16, planar_max_c=pmc)
    p = jax.jit(model.init)(jax.random.PRNGKey(0), proj_x, tvec)
    jax.block_until_ready(p)
    def f(pp, x):
        def body(c, _):
            y = model.apply(pp, c, tvec)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype), c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=10)
        return out
    g = jax.jit(f)
    y = g(p, proj_x); _ = float(y.sum())
    t0 = time.time(); y = g(p, y); _ = float(y.sum())
    print(f"proj eval planar_max_c={pmc}: {(time.time()-t0)/10*1e3:.1f} ms", flush=True)
