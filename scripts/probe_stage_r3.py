"""Per-stage timing on the current host: proj_stage / sart / img+ultra.
Dependency-chained, scalar readback (axon-relay honest-timing rules)."""
import time, sys, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
from ipdm_tpu.diffusion.guided import guided_reverse_process
from ipdm_tpu.models.unet import UNetModel
from ipdm_tpu.ops.lambda_curve import proj_curve_init
from ipdm_tpu.recon.fbp import SIEMENS_FBP
from ipdm_tpu.recon.sart_fast import sart_fast_convert

img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(8, 16),
                      channel_mult=(1, 1, 2, 2, 4, 4), dtype=jnp.bfloat16)
proj_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                       num_res_blocks=2, attention_resolutions=(16, 32),
                       channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                       dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
k1, k2, rng = jax.random.split(rng, 3)
img_x = jnp.zeros((1, 512, 512, 1), jnp.float32)
proj_x = jnp.zeros((1, 2000, 912, 1), jnp.float32)
tvec = jnp.zeros((1,), jnp.int32)
img_p = jax.jit(img_model.init)(k1, img_x, tvec)
proj_p = jax.jit(proj_model.init)(k2, proj_x, tvec)
jax.block_until_ready((img_p, proj_p))
gd = GaussianDiffusion(1000, "cosine")
curve = proj_curve_init()
host = np.random.default_rng(0)
ld_proj = jnp.asarray(host.random((1, 2000, 912, 1), np.float32) * 4.0)
ld_img = jnp.asarray(host.random((1, 512, 512, 1), np.float32) * 0.3)
stk = jnp.asarray(host.random((3, 2000, 912), np.float32) * 4.0)

def proj_stage(pp, r, x):
    fn = lambda a, t: proj_model.apply(pp, a, t)
    it, _, _ = guided_reverse_process(fn, gd, x, r, t_start=[15,15,15],
        clip=False, eta=0.5, mode="proj", constant_guidance=None,
        lambda_ratio=1, lambda_curve=curve, kernel_size=4, amplitude=7)
    return it[-1]

def img_stage(ip, r, x, ld):
    fn = lambda a, t: img_model.apply(ip, a, t)
    it, _, _ = guided_reverse_process(fn, gd, x, r, t_start=[15,15,15],
        clip=True, eta=0.7, mode="img", constant_guidance=0.45, ldct=ld)
    r2 = jax.random.fold_in(r, 1)
    u, _, _ = guided_reverse_process(fn, gd, it[-1], r2, t_start=[5,5,5],
        clip=True, eta=0.6, mode="img", constant_guidance=0.6, ldct=ld)
    return u[-1]

p_jit = jax.jit(proj_stage)
i_jit = jax.jit(img_stage)
s_jit = jax.jit(lambda s: sart_fast_convert(s, SIEMENS_FBP, nstart=10, ntv=0, nsubsets=40))

def timeit(name, f, x0, n=4):
    x = x0
    y = f(x)          # warm
    _ = float(jnp.asarray(y).sum())
    t0 = time.time()
    for i in range(n):
        x = x + jnp.float32(1e-6) * i if x.dtype != jnp.float32 else x * jnp.float32(1.0 + 1e-7*i)
        y = f(x)
        x = x0 * jnp.float32(1.0) + jnp.asarray(y, x0.dtype).sum() * 0  # chain dep
    _ = float(jnp.asarray(y).sum())
    dt = (time.time()-t0)/n
    print(f"{name}: {dt*1e3:.0f} ms", flush=True)
    return dt

t0=time.time()
timeit("proj_stage(45 evals)", lambda x: p_jit(proj_p, jax.random.PRNGKey(1), x), ld_proj)
timeit("sart B=3 nstart10", lambda s: s_jit(s), stk)
timeit("img+ultra(60 evals)", lambda x: i_jit(img_p, jax.random.PRNGKey(2), x, ld_img), ld_img)
print("total probe", time.time()-t0)
