"""Probe: which stage of the flagship program owns the 832 MB executable?

The full ART-flagship `run_one` compiles to an 832 MB serialized executable
(persistent-cache entry, 2026-08-19 host) while its StableHLO input is only
~10 MB — an ~80x backend blowup. This AOT-compiles each stage separately on
the real TPU and reports the per-stage cache entry sizes:

  img    — fused_iters, t_start=[15,15,15], constant λ (iter-scan form)
  ultra  — fused_iters, t_start=[5,5,5]
  proj   — fused_probe_and_iters, adaptive per-pixel λ
  sart   — batched(3) OS-SART convert
  imgU   — not an argv stage: rerun `img` in a fresh process with
           guided._ITER_SCAN=False (monkeypatch; the env gate was removed in round 4) to measure the unrolled lowering

Run ON TPU (no other python processes): python scripts/probe_exec_size.py
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

CACHE = os.path.expanduser("~/.cache/jax_comp_cache")


def entries():
    out = {}
    for root, _, fs in os.walk(CACHE):
        for f in fs:
            p = os.path.join(root, f)
            out[p] = os.path.getsize(p)
    return out


def report(tag, before, t0):
    after = entries()
    new = {p: s for p, s in after.items() if p not in before}
    tot = sum(new.values())
    print(f"[{tag}] compile {time.time()-t0:.1f}s, new entries "
          f"{len(new)}, {tot/1e6:.1f} MB", flush=True)
    for p, s in sorted(new.items(), key=lambda kv: -kv[1])[:3]:
        print(f"    {s/1e6:10.1f} MB  {os.path.basename(p)[:60]}", flush=True)
    return after


def main():
    from ipdm_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion import guided
    from ipdm_tpu.models.unet import UNetModel
    from ipdm_tpu.ops.lambda_curve import proj_curve_init
    from ipdm_tpu.recon.fbp import SIEMENS_FBP

    print("device:", jax.devices()[0].platform, "iter_scan:",
          guided._ITER_SCAN, flush=True)

    img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                          num_res_blocks=2, attention_resolutions=(8, 16),
                          channel_mult=(1, 1, 2, 2, 4, 4),
                          dtype=jnp.bfloat16)
    proj_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(16, 32),
                           channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                           dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    img_x = jax.ShapeDtypeStruct((1, 512, 512, 1), jnp.float32)
    proj_x = jax.ShapeDtypeStruct((1, 2000, 912, 1), jnp.float32)
    tvec = jax.ShapeDtypeStruct((1,), jnp.int32)
    img_params = jax.eval_shape(img_model.init, k1, img_x, tvec)
    proj_params = jax.eval_shape(proj_model.init, k2, proj_x, tvec)
    gd = GaussianDiffusion(1000, "cosine")
    proj_curve = proj_curve_init()
    rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)

    known = ("img", "ultra", "proj", "sart")
    which = sys.argv[1:] or list(known)
    bad = [w for w in which if w not in known]
    if bad:
        # 'imgU' from the docstring means: re-run the img stage in a fresh
        # process with guided._ITER_SCAN monkeypatched False — not a stage.
        sys.exit(f"unknown stage(s) {bad}; choose from {list(known)} "
                 "(imgU = rerun 'img' with guided._ITER_SCAN=False)")
    before = entries()

    if "img" in which:
        def img_stage(params, x, ldct, rng):
            fn = lambda xx, tt: img_model.apply(params, xx, tt)
            out, _, _ = guided.guided_reverse_process(
                fn, gd, x, rng, t_start=[15, 15, 15], clip=True, eta=0.7,
                mode="img", constant_guidance=0.45, ldct=ldct)
            return out[-1]
        t0 = time.time()
        jax.jit(img_stage).lower(img_params, img_x, img_x, rng_s).compile()
        before = report("img t=[15,15,15] iter_scan=%s" % guided._ITER_SCAN,
                        before, t0)

    if "ultra" in which:
        def ultra_stage(params, x, ldct, rng):
            fn = lambda xx, tt: img_model.apply(params, xx, tt)
            out, _, _ = guided.guided_reverse_process(
                fn, gd, x, rng, t_start=[5, 5, 5], clip=True, eta=0.6,
                mode="img", constant_guidance=0.6, ldct=ldct)
            return out[-1]
        t0 = time.time()
        jax.jit(ultra_stage).lower(img_params, img_x, img_x, rng_s).compile()
        before = report("ultra t=[5,5,5]", before, t0)

    if "proj" in which:
        def proj_stage(params, x, rng):
            fn = lambda xx, tt: proj_model.apply(params, xx, tt)
            out, _, _ = guided.guided_reverse_process(
                fn, gd, x, rng, t_start=[15, 15, 15], clip=False, eta=0.5,
                mode="proj", constant_guidance=None, lambda_ratio=1,
                lambda_curve=proj_curve, kernel_size=4, amplitude=7)
            return out[-1]
        t0 = time.time()
        jax.jit(proj_stage).lower(proj_params, proj_x, rng_s).compile()
        before = report("proj adaptive t=[15,15,15]", before, t0)

    if "sart" in which:
        from ipdm_tpu.recon.sart_fast import sart_fast_convert
        def sart_stage(stacked):
            return sart_fast_convert(stacked, SIEMENS_FBP, nstart=10,
                                     ntv=0, nsubsets=40)
        t0 = time.time()
        jax.jit(sart_stage).lower(
            jax.ShapeDtypeStruct((3, 2000, 912), jnp.float32)).compile()
        before = report("sart B=3 nstart=10", before, t0)


if __name__ == "__main__":
    main()
