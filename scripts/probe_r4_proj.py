"""Round-4 TPU probe: (1) project_fast with the anterp_taps Pallas kernel
vs the take_along_axis fallback; (2) a jax.profiler device trace of the
proj UNet eval to get PER-FUSION timings (the round-3 verdict's ask — the
whole-program differencing probes bounded every named suspect to a few ms
and left the 4-5x rate gap unattributed).

Run on TPU (default env). One process; chained-call timing with scalar
readbacks per docs/PERF.md methodology.
"""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "fp"):
    from ipdm_tpu.recon.geometry import FanBeamGeometry
    from ipdm_tpu.recon.convertor import fbp_geom_from_fan
    from ipdm_tpu.recon.phantom import shepp_logan
    from ipdm_tpu.recon import sart_fast

    fan = FanBeamGeometry(nx=512, ny=512, dx=42 / 512, dy=42 / 512, nr=912,
                          dr=0.0010125, na=2000, ta_dimx=1501, ta_dimy=181)
    g = fbp_geom_from_fan(fan)
    ph = jnp.asarray(np.asarray(shepp_logan(512), np.float32) * 0.03)[None]

    def run_fp(label):
        y = sart_fast.project_fast(ph, g, fan.nr, float(g.nda[0]),
                                   float(g.da))
        _ = float(y.sum())
        t0 = time.time()
        x = ph
        for i in range(3):
            y = sart_fast.project_fast(x, g, fan.nr, float(g.nda[0]),
                                       float(g.da))
            x = ph + 1e-6 * jnp.abs(y[:, :512, :512])
        _ = float(x.sum())
        print(f"project_fast[{label}]: {(time.time()-t0)/3*1e3:.0f} ms",
              flush=True)
        return y

    y_new = run_fp("anterp_taps")

if which in ("all", "prof"):
    from ipdm_tpu.models.unet import UNetModel
    proj_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(16, 32),
                           channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                           dtype=jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    tvec = jnp.zeros((1,), jnp.int32)
    x = jnp.asarray(np.random.default_rng(1).random((1, 2000, 912, 1),
                                                    np.float32))
    p = jax.jit(proj_model.init)(k, x, tvec)
    jax.block_until_ready(p)

    def f(p, x):
        def body(c, _):
            y = proj_model.apply(p, c, tvec)
            return jnp.asarray(c + 0.001 * jnp.asarray(y, c.dtype),
                               c.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=8)
        return out

    g2 = jax.jit(f)
    y = g2(p, x); _ = float(y.sum())
    t0 = time.time(); y = g2(p, y); _ = float(y.sum())
    print(f"proj scan-eval: {(time.time()-t0)/8*1e3:.1f} ms/eval", flush=True)
    try:
        with jax.profiler.trace("/tmp/jxtrace"):
            y = g2(p, y)
            _ = float(y.sum())
        print("profiler trace written to /tmp/jxtrace", flush=True)
    except Exception as e:
        print(f"profiler trace FAILED: {type(e).__name__}: {e}", flush=True)
