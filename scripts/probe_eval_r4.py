"""Round-4 in-context A/B of the small-C planar conv lowering inside the
FULL proj UNet eval (the isolated probe_planarconv_r4 numbers invert in
context — producer-fusion duplication): VPU_UNROLL_MAX=64 (broadcast-sum)
vs 0 (tap-einsum for every planar conv). Also reports the img eval.
Chained scan-eval timing."""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ipdm_tpu.models import unet as U

k1 = jax.random.PRNGKey(0)
tvec = jnp.zeros((1,), jnp.int32)
proj_x = jnp.asarray(np.random.default_rng(1).random((1, 2000, 912, 1),
                                                     np.float32))

def build_and_time(smallc, label):
    U.PLANAR_SMALLC = smallc
    model = U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                        num_res_blocks=2, attention_resolutions=(16, 32),
                        channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                        dtype=jnp.bfloat16)
    p = jax.jit(model.init)(k1, proj_x, tvec)
    jax.block_until_ready(p)

    def f(p, x):
        def body(c, _):
            y = model.apply(p, c, tvec)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                               c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=8)
        return out
    g = jax.jit(f)
    y = g(p, proj_x); _ = float(y.sum())
    t0 = time.time(); y = g(p, y); _ = float(y.sum())
    print(f"proj scan-eval [{label}]: {(time.time()-t0)/8*1e3:.1f} ms/eval",
          flush=True)
    return np.asarray(jnp.asarray(y, jnp.float32))

y64 = build_and_time("stackbar", "smallC=stackbar")
y0 = build_and_time("stack", "smallC=stack")
print("context max|d| (8 chained evals, bf16):",
      float(np.max(np.abs(y64 - y0))), flush=True)
