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


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
