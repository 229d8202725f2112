"""Multi-chip scaling bench: dp-sharded training + view-sharded FBP.

Accumulates SURVEY §7 step-8 scaling evidence: per-mesh-size throughput of
(a) the data-parallel training step (psum'd grads over the 'data' axis) and
(b) the view-sharded FBP (each device backprojects its view wedge, psum the
image over 'view').

On a host with fewer real chips than requested, a virtual CPU mesh is
provisioned (same sharded programs, XLA collectives included — numbers
then validate the harness and collective correctness, not real ICI
bandwidth; rerun unchanged on a real slice for true scaling curves).

Usage: python scripts/bench_multichip.py [max_devices=8]
Prints one JSON line per (bench, n_devices).
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np  # noqa: E402

from __graft_entry__ import _provision_devices  # noqa: E402


def main(max_devices: int = 8):
    devices = _provision_devices(max_devices)
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
    from ipdm_tpu.engine.trainer import init_train_state, make_optimizer
    from ipdm_tpu.models.unet import UNetModel
    from ipdm_tpu.parallel import (make_mesh, make_sharded_train_step,
                                   make_view_sharded_fbp, shard_batch)
    from ipdm_tpu.recon.fbp import FBPGeometry

    sizes = [n for n in (1, 2, 4, 8) if n <= max_devices]
    model = UNetModel(in_channels=1, model_channels=16, out_channels=1,
                      num_res_blocks=2, attention_resolutions=(8,),
                      channel_mult=(1, 1, 2, 2))
    gd = GaussianDiffusion(timesteps=100, beta_schedule="cosine")
    results = []
    for n in sizes:
        mesh = make_mesh([n, 1], ("data", "view"), devices=devices[:n])
        tx = make_optimizer(2e-4)
        state, _ = init_train_state(model, jax.random.PRNGKey(0),
                                    (1, 64, 64, 1), 2e-4)
        step = make_sharded_train_step(model, gd, tx, partial_timesteps=50,
                                       mesh=mesh)
        B = 2 * n  # fixed per-device batch of 2 → weak scaling
        imgs = shard_batch(np.random.default_rng(0).random(
            (B, 64, 64, 1), np.float32), mesh)
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        state, loss = step(state, imgs, jax.random.PRNGKey(1))  # compile
        float(loss)
        t0 = time.time()
        iters = 8
        for i in range(iters):
            state, loss = step(state, imgs, jax.random.PRNGKey(2 + i))
        float(loss)
        dt = (time.time() - t0) / iters
        results.append({"bench": "dp_train_step", "n_devices": n,
                        "global_batch": B, "ms_per_step": round(dt * 1e3, 2),
                        "samples_per_sec": round(B / dt, 2)})

        # view-sharded FBP over the 'view' axis
        vmesh = make_mesh([1, n], ("data", "view"), devices=devices[:n])
        g = FBPGeometry(n_det=64, n_views=32 * n, grid_n=64, grid_l=21.0)
        fbp = make_view_sharded_fbp(vmesh, g, view_block=8)
        pj = jnp.ones((1, g.M, g.N), jnp.float32)
        float(fbp(pj).sum())  # compile
        t0 = time.time()
        for _ in range(4):
            out = fbp(pj)
        float(out.sum())
        dt = (time.time() - t0) / 4
        results.append({"bench": "view_sharded_fbp", "n_devices": n,
                        "n_views": g.M, "ms_per_call": round(dt * 1e3, 2)})

        # spatially-partitioned UNet eval (per-slice latency axis)
        from ipdm_tpu.parallel import make_spatial_sharded_apply
        smesh = make_mesh([n, 1], ("data", "view"), devices=devices[:n])
        sx = jnp.ones((1, 64, 64, 1), jnp.float32)
        st = jnp.zeros((1,), jnp.int32)
        sp_ = model.init(jax.random.PRNGKey(0), sx, st)
        sfn = make_spatial_sharded_apply(model, smesh)
        float(sfn(sp_, sx, st).sum())  # compile
        t0 = time.time()
        for _ in range(4):
            out = sfn(sp_, sx, st)
        float(out.sum())
        dt = (time.time() - t0) / 4
        results.append({"bench": "spatial_sharded_eval", "n_devices": n,
                        "ms_per_eval": round(dt * 1e3, 2)})

    platform = jax.devices()[0].platform
    for r in results:
        r["platform"] = platform
        r["virtual"] = platform == "cpu"
        print(json.dumps(r))


def engine(n_devices: int = 8):
    """Round-5 VERDICT #5: per-slice cost of the SHARDED flagship
    inference vs unsharded, through the real engine path (test_prog,
    guided proj+img stages + ART convert) on a tiny geometry. On the
    virtual CPU mesh all devices share one core, so absolute wall-clock
    is not ICI-representative — the number documents that the sharded
    program runs, its compile/fusion structure, and the relative phase
    split; the PLANAR_FUSED trade a sharded trace pays on TPU is
    measured separately (docs/MULTICHIP.md)."""
    devices = _provision_devices(n_devices)
    import jax
    import jax.numpy as jnp

    from ipdm_tpu.config.config import IPDMConfig
    from ipdm_tpu.engine.denoiser import ProgressiveDomainDenoiser
    from ipdm_tpu.recon.geometry import FanBeamGeometry, area_lut, \
        default_betas
    from ipdm_tpu.recon.phantom import shepp_logan
    from ipdm_tpu.recon.projector import forward_project
    import numpy as np
    import os
    import tempfile

    GEO = dict(nx=32, ny=32, dx=42 / 32, dy=42 / 32, nr=64,
               dr=0.0010125 * 912 / 64, na=60, ta_dimx=401, ta_dimy=91)
    g = FanBeamGeometry(**GEO)
    root = tempfile.mkdtemp(prefix="eng_bench_")
    lut = jnp.asarray(area_lut(g))
    betas = jnp.asarray(default_betas(g))
    ph = np.asarray(shepp_logan(32), np.float32) * 0.36
    proj = np.asarray(forward_project(jnp.asarray(ph), g, lut, betas))
    rng = np.random.default_rng(0)
    ld = proj + rng.normal(0, 0.02 * proj.max(), proj.shape).astype(
        np.float32)
    for kind, arr in (("fd_img", ph.T), ("ld_img", ph.T),
                      ("fd_proj", proj), ("ld_proj", ld)):
        d = os.path.join(root, kind, "L001")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "000.npy"), arr)

    def run(mesh_shape):
        opt = IPDMConfig(
            mode="test_prog", run_name="mb", test_numbers=1,
            convertor="ART", sart_nstart=2, sart_subsets=6,
            ultra_img_denoise=True, mesh_shape=mesh_shape,
            model_channels_img=8, channel_mult_img=[1, 1, 2],
            attention_resolutions_img=[4], timesteps_img=50,
            t_start_img=[3, 2], constant_guidance_img=0.45,
            model_channels_proj=8, channel_mult_proj=[1, 1, 2],
            attention_resolutions_proj=[4], timesteps_proj=50,
            t_start_proj=[3, 2], constant_guidance_proj=0.5,
            metrics=["psnr"], geometry=GEO,
            **{f"test_dataset_path_{k}": os.path.join(root, v)
               for k, v in (("LD_img", "ld_img"), ("FD_img", "fd_img"),
                            ("LD_proj", "ld_proj"),
                            ("FD_proj", "fd_proj"))})
        eng = ProgressiveDomainDenoiser(
            opt, result_save_path=os.path.join(root, "out"))
        t0 = time.time()
        eng.test(0)
        wall = time.time() - t0
        phases = {k: round(v, 2)
                  for k, v in getattr(eng.timer, "totals", {}).items()} \
            if hasattr(eng, "timer") else {}
        return wall, phases

    w0, p0 = run(None)
    w1, p1 = run([n_devices, 1])
    platform = jax.devices()[0].platform
    for tag, w, ph_ in (("unsharded", w0, p0),
                        (f"sharded[{n_devices},1]", w1, p1)):
        print(json.dumps({"bench": "engine_test_prog_slice", "mode": tag,
                          "wall_s_incl_compile": round(w, 1),
                          "phases_s": ph_, "platform": platform,
                          "virtual": platform == "cpu"}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "engine":
        engine(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
