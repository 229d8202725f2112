"""Same-process A/B: incumbent fused OS-SART sweep vs the MXU tap-matrix
sweep (os_sart_sweep_mm), full Siemens geometry, B=3 (the flagship batch).

Honest relay timing: dependency-chained converts (output feeds the next
input's scale) ended by a scalar readback. Run alone on the box (1 core).
"""
import os.path as osp
import sys, time
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
from ipdm_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from ipdm_tpu.recon.fbp import SIEMENS_FBP
from ipdm_tpu.recon.sart_fast import sart_fast_convert

B = 3
host = np.random.default_rng(0)
pj = jnp.asarray(host.random((B, 2000, 912), np.float32) * 4.0)

def run(tag, **kw):
    def convert(x, s):
        out = sart_fast_convert(x * s, SIEMENS_FBP, nstart=10, ntv=0,
                                nsubsets=40, **kw)
        return 1.0 + out.mean() * 1e-6
    t0 = time.time()
    s = convert(pj, jnp.float32(1.0))
    _ = float(s)
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    n = 5
    for i in range(n):
        s = convert(pj, s)
    _ = float(s)
    dt = (time.time() - t0) / n
    print(f"{tag}: {dt*1e3:.0f} ms/convert (B={B}), "
          f"{dt/B*1e3:.0f} ms/sinogram", flush=True)

def check():
    """Numerical cross-check old-vs-mm ON HARDWARE (the kernels lower
    differently on TPU vs interpret mode) with a structured sinogram."""
    from ipdm_tpu.recon.fbp_fast import fbp_convert_fast
    # smooth structured input: FBP of it is a real-ish image
    t = np.linspace(0, 1, 912, dtype=np.float32)
    a = np.linspace(0, 2 * np.pi, 2000, dtype=np.float32)
    base = (np.exp(-((t - 0.5) ** 2) / 0.02)[None, :]
            * (2 + np.sin(3 * a))[:, None]).astype(np.float32)
    pjc = jnp.asarray(np.stack([base, base * 0.7, base * 1.2]))
    old = np.asarray(sart_fast_convert(pjc, SIEMENS_FBP, nstart=10,
                                       nsubsets=40, fused=False))
    new = np.asarray(sart_fast_convert(pjc, SIEMENS_FBP, nstart=10,
                                       nsubsets=40, fused=True))
    assert np.all(np.isfinite(new)), "mm output not finite"
    for b in range(3):
        r = np.corrcoef(old[b].ravel(), new[b].ravel())[0, 1]
        scale = float(np.sum(new[b] * old[b]) / np.sum(old[b] ** 2))
        err = float(np.abs(new[b] - old[b]).max() / max(old[b].max(), 1e-9))
        print(f"check b={b}: corr {r:.5f} scale {scale:.4f} "
              f"relmax {err:.4f}", flush=True)


for arg in sys.argv[1:]:
    # ("old" — the per-row VPU sweep kernel — was pruned in round 4 after
    # losing the host A/B 331 vs 130 ms/sinogram; git history has it)
    if arg == "unfused":
        run("unfused", fused=False)
    elif arg == "mm":
        run("mm", fused=True)
    elif arg == "mmbf16":
        run("mm_bf16", fused=True, mm_bf16=True)
    elif arg == "check":
        check()
