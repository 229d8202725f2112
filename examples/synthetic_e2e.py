"""End-to-end IPDM workflow on a synthetic corpus — the repo's equivalent of
the reference's `test_sample.ipynb` demo plus its (unshipped) data pipeline.

Steps (sizes configurable; defaults are CPU-runnable minutes-scale):
  1. synthesise random-ellipse μ phantoms (recon.phantom);
  2. forward-project them (fast parallel FP) and run the LDCT simulator
     (recon.simulate — exact reference noise model) to build the four-stream
     dataset layout Siemens_dataset_npz expects;
  3. train the image-domain and projection-domain DDPMs briefly
     (ProgressiveDomainDenoiser, modes train_img / train_proj);
  4. run the full progressive dual-domain test (mode test_prog) with the
     trained checkpoints, writing the reference's artifact layout;
  5. print the aggregate metrics (LDCT baseline vs deProj vs deProg).

Usage:
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
        python examples/synthetic_e2e.py --out /tmp/ipdm_synth --n 16 \\
        --size 64 --iters 200
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def make_geom(size: int):
    from ipdm_tpu.recon.geometry import SIEMENS, FanBeamGeometry
    if size == 512:
        return SIEMENS   # the true scanner geometry (2000×912)
    return FanBeamGeometry(nx=size, ny=size, dx=42 / size, dy=42 / size,
                           nr=2 * size, dr=0.0010125 * 912 / (2 * size),
                           na=360, ta_dimx=401, ta_dimy=91)


def build_dataset(out: str, n_slices: int, size: int, dose: float, seed=0,
                  recon="SART"):
    import jax
    import jax.numpy as jnp
    from ipdm_tpu.recon.convertor import fbp_geom_from_fan
    from ipdm_tpu.recon.phantom import random_ellipse_phantom
    from ipdm_tpu.recon.sart_fast import project_fast, sart_fast_convert
    from ipdm_tpu.recon.fbp_fast import fbp_convert_fast
    from ipdm_tpu.recon.simulate import add_noise

    geom = make_geom(size)
    g = fbp_geom_from_fan(geom)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    streams = ["fd_img", "ld_img", "fd_proj", "ld_proj"]
    for s in streams:
        os.makedirs(osp.join(out, s, "P001"), exist_ok=True)
    for i in range(n_slices):
        ph = random_ellipse_phantom(size, rng)
        vol = jnp.asarray(ph[None])
        fd_proj = project_fast(vol, g, geom.nr, float(g.nda[0]),
                               float(g.da))
        key, k = jax.random.split(key)
        ld_proj = add_noise(fd_proj, k, dose)
        if recon == "SART":
            ld_img = sart_fast_convert(ld_proj, g, nstart=4,
                                       nsubsets=min(18, geom.na))
        else:
            ld_img = fbp_convert_fast(ld_proj, g)
        fd_img = jnp.asarray(ph.T[None])  # recon orientation
        for s, arr in zip(streams, (fd_img, ld_img, fd_proj, ld_proj)):
            np.save(osp.join(out, s, "P001", f"{i:04d}.npy"),
                    np.asarray(arr)[0])
    return geom


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ipdm_synth")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--dose", type=float, default=0.25)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--recon", default="SART", choices=["SART", "FBP"])
    ap.add_argument("--full-arch", action="store_true",
                    help="use the reference model sizes (ch=64)")
    ap.add_argument("--test-slices", type=int, default=4)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args(argv)

    from ipdm_tpu.config.config import IPDMConfig
    from ipdm_tpu.engine.denoiser import ProgressiveDomainDenoiser

    size = args.size
    if not args.skip_build:
        print("[1/4] building synthetic dataset...", flush=True)
        build_dataset(args.out, args.n, size, args.dose, recon=args.recon)

    gm = make_geom(size)
    geo = None if size == 512 else dict(
        nx=gm.nx, ny=gm.ny, dx=gm.dx, dy=gm.dy, nr=gm.nr, dr=gm.dr,
        na=gm.na, ta_dimx=gm.ta_dimx, ta_dimy=gm.ta_dimy)
    paths = {f"{m}_dataset_path_{k}": osp.join(args.out, s)
             for m in ("train", "test")
             for k, s in (("FD_img", "fd_img"), ("LD_img", "ld_img"),
                          ("FD_proj", "fd_proj"), ("LD_proj", "ld_proj"))}

    if args.full_arch:
        arch = dict(model_channels_img=64,
                    channel_mult_img=[1, 1, 2, 2, 4, 4],
                    attention_resolutions_img=[16],
                    model_channels_proj=64,
                    channel_mult_proj=[0.0625, 0.125, 0.25, 2, 2, 4, 4],
                    attention_resolutions_proj=[32])
    else:
        arch = dict(model_channels_img=16, channel_mult_img=[1, 1, 2, 2],
                    attention_resolutions_img=[8],
                    model_channels_proj=16, channel_mult_proj=[1, 1, 2, 2],
                    attention_resolutions_proj=[8])
    common = dict(batch_size=1, save_freq=args.iters, test_numbers=0,
                  init_lr=2e-4, geometry=geo, metrics=["psnr", "ssim"],
                  patch=None, patch_per_image=None,
                  timesteps_img=1000, partial_timesteps_img=50,
                  timesteps_proj=1000, partial_timesteps_proj=50,
                  max_epochs=max(1, args.iters * 1 // args.n), **arch,
                  **paths)

    print("[2/4] training img model...")
    opt = IPDMConfig(mode="train_img", run_name="synth_img", **common)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=args.out)
    eng.fit()
    eng.checkpoints(1)
    img_dir = eng.logger.models_save_dir

    print("[3/4] training proj model...")
    opt = IPDMConfig(mode="train_proj", run_name="synth_proj", **common)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=args.out)
    eng.fit()
    eng.checkpoints(1)
    proj_dir = eng.logger.models_save_dir

    print("[4/4] progressive test...")
    opt = IPDMConfig(mode="test_prog", run_name="synth_prog",
                     convertor="FBP", fbp_sharpen=False,
                     ultra_img_denoise=False,
                     t_start_img=[10, 10], constant_guidance_img=0.45,
                     t_start_proj=[10, 10], constant_guidance_proj=0.5,
                     resume_epochs_img=1, resume_epochs_proj=1,
                     load_img_model_path=img_dir,
                     load_proj_model_path=proj_dir, **common)
    opt.test_numbers = min(args.test_slices, args.n)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=args.out)
    eng.test(0)
    agg = osp.join(eng.save_root_path, "Save_Iter_0", "metric.json")
    with open(agg) as f:
        m = json.load(f)
    print(json.dumps(m, indent=2))
    ldct = m["LDCT"].get("psnr_iter_0")
    prog = {k: v for k, v in m["deProg"].items()
            if k.startswith("psnr") and not k.endswith("_std")}
    print(f"LDCT PSNR {ldct:.2f} → deProg {max(prog.values()):.2f}")
    return float(ldct), float(max(prog.values())), m


if __name__ == "__main__":
    from ipdm_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()
    main()
