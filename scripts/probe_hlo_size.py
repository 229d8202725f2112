"""Probe: what dominates the flagship bench program's HLO size?

Warmup on a comp-cache HIT is still ~348 s of executable fetch through the
relay (docs/PERF.md), so program size is a first-class cost. This lowers
bench.py's `run_one` (ART flagship, full shapes) on CPU — lowering only, no
compile — and reports total StableHLO text size plus a per-function
breakdown, to find dedup/CSE opportunities (e.g. the img-stage and
ultra-pass scan bodies differ only in baked-in λ/η constants).

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_hlo_size.py
"""

import collections
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.diffusion.guided import guided_reverse_process
    from ipdm_tpu.models.unet import UNetModel
    from ipdm_tpu.ops.lambda_curve import proj_curve_init
    from ipdm_tpu.recon.fbp import SIEMENS_FBP
    from ipdm_tpu.recon.sart_fast import sart_fast_convert

    img_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                          num_res_blocks=2, attention_resolutions=(8, 16),
                          channel_mult=(1, 1, 2, 2, 4, 4),
                          dtype=jnp.bfloat16)
    proj_model = UNetModel(in_channels=1, model_channels=64, out_channels=1,
                           num_res_blocks=2, attention_resolutions=(16, 32),
                           channel_mult=(0.0625, 0.125, 0.25, 2, 2, 4, 4),
                           dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2, rng = jax.random.split(rng, 3)
    img_x = jnp.zeros((1, 512, 512, 1), jnp.float32)
    proj_x = jnp.zeros((1, 2000, 912, 1), jnp.float32)
    tvec = jnp.zeros((1,), jnp.int32)
    t0 = time.time()
    img_params = jax.eval_shape(img_model.init, k1, img_x, tvec)
    proj_params = jax.eval_shape(proj_model.init, k2, proj_x, tvec)
    img_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), img_params)
    proj_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), proj_params)
    print(f"param build: {time.time()-t0:.1f}s", file=sys.stderr)

    gd = GaussianDiffusion(1000, "cosine")
    img_fn = lambda x, t: img_model.apply(img_params, x, t)
    proj_fn = lambda x, t: proj_model.apply(proj_params, x, t)
    proj_curve = proj_curve_init()

    def run_one(rng, ld_proj, ld_img):
        rng, k = jax.random.split(rng)
        iters, _, _ = guided_reverse_process(
            proj_fn, gd, ld_proj, k, t_start=[15, 15, 15],
            clip=False, eta=0.5, mode="proj", constant_guidance=None,
            lambda_ratio=1, lambda_curve=proj_curve, kernel_size=4,
            amplitude=7)
        stacked = jnp.concatenate([p[..., 0] for p in iters], axis=0)
        imgs = sart_fast_convert(stacked, SIEMENS_FBP, nstart=10, ntv=0,
                                 nsubsets=40)
        x = imgs[-1:][..., None]
        rng, k = jax.random.split(rng)
        img_iters, _, _ = guided_reverse_process(
            img_fn, gd, x, k, t_start=[15, 15, 15], clip=True, eta=0.7,
            mode="img", constant_guidance=0.45, ldct=ld_img)
        rng, k = jax.random.split(rng)
        ultra, _, _ = guided_reverse_process(
            img_fn, gd, img_iters[-1], k, t_start=[5, 5, 5], clip=True,
            eta=0.6, mode="img", constant_guidance=0.6, ldct=ld_img)
        return ultra[-1]

    t0 = time.time()
    lowered = jax.jit(run_one).lower(
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((1, 2000, 912, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 512, 512, 1), jnp.float32))
    print(f"lower: {time.time()-t0:.1f}s", file=sys.stderr)
    txt = lowered.as_text()
    print(f"total StableHLO text: {len(txt)/1e6:.2f} MB, "
          f"{txt.count(chr(10))} lines")

    # per-function breakdown
    sizes = collections.Counter()
    cur = None
    for line in txt.splitlines():
        m = re.match(r"\s*func\.func\s+(?:private\s+)?@([\w.]+)", line)
        if m:
            cur = m.group(1)
        if cur:
            sizes[cur] += len(line) + 1
        if line == "}":        # top-level close: module text that follows
            cur = None         # belongs to no function
    for name, sz in sizes.most_common(25):
        print(f"{sz/1e3:10.1f} kB  {name}")


if __name__ == "__main__":
    main()
