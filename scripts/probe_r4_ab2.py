"""Round-4 consolidated same-process A/Bs on the driver host (VERDICT #6/#8):

1. host character: device kind + tiny-op chained dispatch
2. re-baseline proj/img eval (chained scan, bf16, current defaults)
3. batch anomaly: UNet eval B in {1,2,4} bf16 (per-slice cost)
4. SART sweep: fused MXU tap-matrix vs unfused per-subset chain, B=3
5. sampler lowering: fused_iters scan vs unrolled (guided._ITER_SCAN),
   img-stage spec (3x15 steps, constant lambda), 512^2

Honest relay timing: dependency-chained calls ended by a scalar readback
(block_until_ready does not fence all buffer types through the relay).
Run alone on the box (1 CPU core).
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ipdm_tpu.utils.comp_cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from ipdm_tpu.models import unet as U


def log(*a):
    print(*a, flush=True)


def section_host():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda h: h * 1.0000001 + 0.0)
    x = f(x); _ = float(x.sum())
    t0 = time.time()
    n = 50
    for _ in range(n):
        x = f(x)
    _ = float(x.sum())
    log(f"tiny-op chained dispatch: {(time.time()-t0)/n*1e3:.2f} ms/call")


def _net(kind):
    if kind == "proj":
        return U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(16, 32),
                           channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                           dtype=jnp.bfloat16), (2000, 912)
    return U.UNetModel(in_channels=1, model_channels=64, out_channels=1,
                       num_res_blocks=2, attention_resolutions=(16,),
                       channel_mult=(1, 1, 2, 2, 4, 4),
                       dtype=jnp.bfloat16), (512, 512)


def section_eval_and_batch():
    rng = np.random.default_rng(1)
    for kind in ("proj", "img"):
        model, (H, W) = _net(kind)
        x1 = jnp.asarray(rng.random((1, H, W, 1), np.float32))
        p = jax.jit(model.init)(jax.random.PRNGKey(0), x1,
                                jnp.zeros((1,), jnp.int32))
        jax.block_until_ready(p)
        for B in (1, 2, 4):
            x = jnp.asarray(rng.random((B, H, W, 1), np.float32))
            tv = jnp.zeros((B,), jnp.int32)
            reps = 8

            @jax.jit
            def prog(p, h):
                def body(c, _):
                    y = model.apply(p, c, tv)
                    return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                                       c.dtype), ()
                out, _ = jax.lax.scan(body, h, None, length=reps)
                return out
            t0 = time.time()
            x = prog(p, x); _ = float(x.sum())
            log(f"{kind} B={B}: compile+first {time.time()-t0:.1f}s")
            t0 = time.time()
            calls = 3
            for _ in range(calls):
                x = prog(p, x)
            _ = float(x.sum())
            dt = (time.time() - t0) / calls / reps * 1e3
            log(f"{kind} bf16 B={B}: {dt:8.2f} ms/eval  "
                f"{dt/B:7.2f} ms/slice-eval")


def section_sart_mm():
    from ipdm_tpu.recon.fbp import SIEMENS_FBP
    from ipdm_tpu.recon.sart_fast import sart_fast_convert
    host = np.random.default_rng(0)
    pj = jnp.asarray(host.random((3, 2000, 912), np.float32) * 4.0)

    def run(tag, **kw):
        def convert(x, s):
            out = sart_fast_convert(x * s, SIEMENS_FBP, nstart=10, ntv=0,
                                    nsubsets=40, **kw)
            return 1.0 + out.mean() * 1e-6
        t0 = time.time()
        s = convert(pj, jnp.float32(1.0))
        _ = float(s)
        log(f"sart {tag}: compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        n = 5
        for _ in range(n):
            s = convert(pj, s)
        _ = float(s)
        dt = (time.time() - t0) / n
        log(f"sart {tag}: {dt*1e3:.0f} ms/convert(B=3), "
            f"{dt/3*1e3:.0f} ms/sinogram")

    # round-4 A/B record: mm=1 130 / mm=0 331 ms/sinogram -> the
    # per-row VPU sweep kernel was pruned; unfused chain kept as the
    # cross-validation fallback
    run("fused (MXU tap-matrix)", fused=True)
    run("unfused per-subset chain", fused=False)


def section_iter_scan():
    from ipdm_tpu.diffusion import guided as G
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion.guided import ModelApply, RestSpec, fused_iters

    model, (H, W) = _net("img")
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.random((1, H, W, 1), np.float32))
    p = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                            jnp.zeros((1,), jnp.int32))
    jax.block_until_ready(p)
    gd = GaussianDiffusion(timesteps=1000, beta_schedule="cosine")
    spec = RestSpec(ts_list=(15, 15, 15), mode="img", clip=True,
                    eta=0.7, lambda_kind="constant",
                    constant_guidance=0.45)
    mf = ModelApply(model)
    key = jax.random.PRNGKey(3)

    def run(tag):
        def call(x):
            out = fused_iters(mf, gd, spec, p, x, x0, x0,
                              jnp.zeros((1, H // 4, W // 4, 1)), x0, key)
            return x0 + out[-1] * 1e-6
        t0 = time.time()
        x = call(x0); _ = float(x.sum())
        log(f"iters {tag}: compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        n = 3
        for _ in range(n):
            x = call(x)
        _ = float(x.sum())
        log(f"iters {tag}: {(time.time()-t0)/n*1e3:.0f} ms/stage "
            f"(45 evals)")
        return np.asarray(jnp.asarray(x, jnp.float32))

    y_scan = run("scan (default)")
    G._ITER_SCAN = False
    fused_iters.clear_cache()
    y_unroll = run("unrolled (_ITER_SCAN=False)")
    G._ITER_SCAN = True
    fused_iters.clear_cache()
    log(f"iters lowering max|d|: {np.max(np.abs(y_scan - y_unroll)):.2e}")


if __name__ == "__main__":
    for name in sys.argv[1:] or ["host", "eval_and_batch", "sart_mm",
                                 "iter_scan"]:
        log(f"--- {name} ---")
        globals()[f"section_{name}"]()
    log("done")
