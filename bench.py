"""Headline benchmark: full IPDM progressive dual-domain denoise throughput.

Measures end-to-end 512² CT slices/sec/chip for the complete IPDM inference
pipeline (BASELINE.json config #2): projection-domain guided partial diffusion
(t_start_proj=[15,15,15], 2000×912 sinogram UNet) → FBP conversion per
iteration → sharpen → image-domain guided partial diffusion
(t_start_img=[15,15,15], 512² UNet) — 90 UNet evals + 3 FBP per slice, all
on-device.

Weights are randomly initialised (throughput is weight-independent); shapes,
architectures and NFE counts are the reference's test_prog configuration
(Config/Mayo-Config/test_progressive_option.json in /root/reference).

vs_baseline: the reference publishes no throughput numbers (BASELINE.json
"published" == {}). The denominator used here is an ESTIMATE of the reference
pipeline on its stated RTX 4090: ~90 UNet evals (45 on the 2000×912 sinogram,
45 on 512²) plus 3 domain conversions, conservatively ≈ 0.05 slices/sec
(≈ 20 s/slice) based on the per-eval FLOP count at the reference's fp32
single-stream execution. Treat vs_baseline as indicative until a measured
reference number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_SLICES_PER_SEC_EST = 0.05  # estimated RTX4090 reference (see docstring)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from ipdm_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion.guided import guided_reverse_process
    from ipdm_tpu.models.unet import UNetModel
    from ipdm_tpu.ops.sharpen import tensor_sharpen
    from ipdm_tpu.recon.fbp import SIEMENS_FBP
    from ipdm_tpu.recon.fbp_fast import fbp_convert_fast as fbp_convert

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = jax.random.PRNGKey(0)

    # --- models (reference test_prog architectures) ----------------------
    # bf16 activations (f32 params/accumulation): measured metric parity with
    # f32 on the full progressive pipeline to 3-4 decimals (docs/PERF.md) —
    # the std-normalised guidance blend re-normalises activation noise away
    img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                          num_res_blocks=2, attention_resolutions=(16,),
                          channel_mult=(1, 1, 2, 2, 4, 4),
                          dtype=jnp.bfloat16)
    proj_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(32,),
                           channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                           dtype=jnp.bfloat16)
    t0 = time.time()
    k1, k2, rng = jax.random.split(rng, 3)
    img_x = jnp.zeros((1, 512, 512, 1), jnp.float32)
    proj_x = jnp.zeros((1, 2000, 912, 1), jnp.float32)
    tvec = jnp.zeros((1,), jnp.int32)
    # jit the inits: eager init dispatches every op individually — painful
    # over a tunneled device; one compiled executable instead
    img_params = jax.jit(img_model.init)(k1, img_x, tvec)
    proj_params = jax.jit(proj_model.init)(k2, proj_x, tvec)
    jax.block_until_ready((img_params, proj_params))
    log(f"init: {time.time()-t0:.1f}s")

    gd_img = GaussianDiffusion(1000, "cosine")
    gd_proj = GaussianDiffusion(1000, "cosine")
    img_fn = lambda x, t: img_model.apply(img_params, x, t)
    proj_fn = lambda x, t: proj_model.apply(proj_params, x, t)

    # --- synthetic inputs -------------------------------------------------
    host = np.random.default_rng(0)
    ld_proj = jnp.asarray(host.random((1, 2000, 912, 1), np.float32) * 4.0)
    ld_img = jnp.asarray(host.random((1, 512, 512, 1), np.float32) * 0.3)

    # the ENTIRE slice is one jitted program (proj stage → 3 batched FBP
    # converts → sharpen → img stage): inner jits inline under the outer
    # trace, so the ~7 per-slice relay dispatches (~60 ms latency each)
    # collapse to one. Identical math/work to the dispatch-per-phase path.
    @jax.jit
    def one_slice(rng, ld_proj, ld_img):
        # projection stage: 3 × 15 reverse steps, constant guidance
        rng, k = jax.random.split(rng)
        proj_iters, _, _ = guided_reverse_process(
            proj_fn, gd_proj, ld_proj, k, t_start=[15, 15, 15],
            clip=False, eta=0.4, mode="proj", constant_guidance=0.5)
        # convert each kept iteration (reference proj_denoiser :465) —
        # batched into one FBP call (per-item op, exact)
        stacked = jnp.concatenate([p[..., 0] for p in proj_iters], axis=0)
        imgs = fbp_convert(stacked, SIEMENS_FBP)
        x = imgs[-1:][..., None]
        x = tensor_sharpen(x, 70)
        # image stage: 3 × 15 reverse steps
        rng, k = jax.random.split(rng)
        img_iters, _, _ = guided_reverse_process(
            img_fn, gd_img, x, k, t_start=[15, 15, 15],
            clip=True, eta=0.7, mode="img", constant_guidance=0.45,
            ldct=ld_img)
        return img_iters[-1]

    # --- warmup (compile) -------------------------------------------------
    t0 = time.time()
    out = one_slice(jax.random.PRNGKey(1), ld_proj, ld_img)
    _ = float(out.sum())   # full drain: block_until_ready is not reliable
    #                        for every buffer type through the axon relay
    log(f"warmup (compile): {time.time()-t0:.1f}s")

    # --- timed ------------------------------------------------------------
    # One scalar readback after ALL slices: each slice is a distinct
    # execution (fresh rng), the final sum depends on every output, and
    # in-flight slices pipeline across the relay instead of paying a
    # serialization round-trip per slice. (Per-slice fencing measured
    # ~0.15 s/slice of pure relay latency.)
    n = 6
    t0 = time.time()
    outs = []
    for i in range(n):
        outs.append(one_slice(jax.random.PRNGKey(2 + i), ld_proj, ld_img))
    _ = float(jnp.stack(outs).sum())   # full drain
    dt = (time.time() - t0) / n
    slices_per_sec = 1.0 / dt
    log(f"{dt:.2f} s/slice, {slices_per_sec:.3f} slices/sec/chip")

    print(json.dumps({
        "metric": "ipdm_progressive_512px_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 4),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / REF_SLICES_PER_SEC_EST, 2),
    }))


if __name__ == "__main__":
    main()
