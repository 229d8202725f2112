"""Device-mesh parallelism for the IPDM framework.

The reference ships only dormant torch.distributed hooks (rank sharding in
Utils/sampler.py:10-16, an all_reduce helper in Utils/loggerx.py:143-151 —
never initialised; see SURVEY.md §5.8). The TPU framework makes scale-out a
first-class subsystem instead, built on `jax.sharding.Mesh` + jit shardings:

  * **data axis** — batch-parallel training: images sharded over 'data',
    params/opt-state replicated; jit inserts the gradient psum over ICI
    automatically (the TPU-native equivalent of DDP+NCCL).
  * **view axis** — the reference's closest thing to sequence parallelism is
    the 2000-view sinogram processed as one huge image (SURVEY.md §5.7); here
    the *view* axis of the fan-beam projectors/FBP shards across devices via
    `shard_map`: each device filters+backprojects its wedge of views, then one
    `psum` over ICI reduces the partial images. FP is the transpose: the image
    is replicated and each device computes its wedge of the sinogram.

Multi-host pods extend the same meshes via jax.distributed.initialize (the
caller's responsibility; nothing here assumes single-host).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ipdm_tpu.recon.fbp import FBPGeometry, SIEMENS_FBP, ramp_filter
from ipdm_tpu.recon.geometry import FanBeamGeometry


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("data", "view"),
              devices=None) -> Mesh:
    """Create an N-D mesh over the available devices.

    shape=None → all devices on the first axis (pure data parallel),
    remaining axes size 1. shape entries may include a single -1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, (
        f"mesh shape {shape} != device count {n}")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data"
                   ) -> NamedSharding:
    """Shard dim 0 over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with dim 0 sharded over `axis`."""
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis))


def make_sharded_train_step(model, gd, tx, partial_timesteps: int,
                            mesh: Mesh, axis: str = "data"):
    """Batch-sharded version of engine.trainer.make_train_step.

    State replicated, images sharded over `axis`; the per-shard gradient
    all-reduce is inserted by XLA from the sharding constraints (no explicit
    collective — this is the pjit form of the scaling-book data-parallel
    recipe). Returns (state, loss) with loss replicated."""

    def loss_fn(params, images, t, rng):
        model_fn = lambda x, tt: model.apply(params, x, tt)
        return gd.train_loss(model_fn, images, t, rng)

    rep = replicated(mesh)

    def _step(state, images, rng):
        rng_t, rng_n = jax.random.split(rng)
        images = jnp.maximum(images, 0.0)
        B = images.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, partial_timesteps)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, t,
                                                  rng_n)
        import optax
        from ipdm_tpu.engine.trainer import TrainState
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    in_img = batch_sharding(mesh, 4, axis)
    return jax.jit(_step,
                   in_shardings=(rep, in_img, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))


# ---------------------------------------------------------------------------
# View-sharded FBP (shard_map over the 'view' mesh axis)
# ---------------------------------------------------------------------------


def make_view_sharded_fbp(mesh: Mesh, g: FBPGeometry = SIEMENS_FBP,
                          axis: str = "view", view_block: int = 50):
    """FBP with the 2000-view axis sharded over `axis`.

    Each device cosine-weights + ramp-filters + backprojects its contiguous
    wedge of views locally (the ramp filter acts per view, so filtering
    commutes with the view split), then a single `psum` over ICI accumulates
    the image. Input [B, M, N] replicated or view-sharded; output [B, n, n]
    replicated."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    nv = mesh.shape[axis]
    assert g.M % nv == 0
    views_per = g.M // nv

    r = jnp.asarray(g.r)
    phi = jnp.asarray(g.phi)
    nda0 = np.float32(g.nda[0])
    da = np.float32(g.da)
    D = np.float32(g.D)
    w = jnp.asarray((g.D * np.cos(g.nda)).astype(np.float32))
    dtheta = np.float32(g.theta[1] - g.theta[0])
    theta_all = jnp.asarray(g.theta, dtype=jnp.float32)
    h_RL = jnp.asarray(g.h_RL)

    def local_fbp(pj_local, theta_local):
        # pj_local: [B, views_per, N] (already detector-flipped by caller
        # convention of fbp_convert: we flip here to keep the public API)
        pj_local = pj_local[:, :, ::-1] * w[None, None, :] * dtheta
        pj_local = ramp_filter(pj_local, h_RL, g.N)
        beta = theta_local - np.float32(np.pi / 2)

        def one_view(pj_v, beta_v):
            th = np.float32(np.pi / 2) + beta_v + phi
            denom = D + r * jnp.cos(th)
            alpha = jnp.arctan(r * jnp.sin(th) / denom)
            pos = (alpha - nda0) / da + 0.5
            curdet = jnp.floor(pos)
            lam = pos - curdet
            Lw = r * jnp.sin(th) / jnp.sin(alpha)
            ci = curdet.astype(jnp.int32)
            valid = (ci > 0) & (ci < g.N)
            c0 = jnp.clip(ci - 1, 0, g.N - 1)
            c1 = jnp.clip(ci, 0, g.N - 1)
            v = ((1 - lam) * pj_v[:, c0] + lam * pj_v[:, c1]) / (Lw * Lw)
            return jnp.where(valid[None], v, 0.0)

        nb = max(1, views_per // view_block)
        vb = views_per // nb
        pj_b = pj_local.reshape(pj_local.shape[0], nb, vb, g.N
                                ).transpose(1, 0, 2, 3)
        th_b = beta.reshape(nb, vb)

        def blk(args):
            pj_blk, th_blk = args
            return jax.vmap(one_view, in_axes=(1, 0))(pj_blk, th_blk
                                                      ).sum(axis=0)

        img = jax.lax.map(blk, (pj_b, th_b)).sum(axis=0)
        img = jax.lax.psum(img, axis)
        return img[:, :, ::-1]

    other_axes = [a for a in mesh.axis_names if a != axis]
    in_spec = (P(None, axis, None), P(axis))
    out_spec = P(None, None, None)
    fn = shard_map(local_fbp, mesh=mesh, in_specs=in_spec,
                   out_specs=out_spec)

    @jax.jit
    def fbp(pj):
        return fn(pj, theta_all)

    return fbp


def make_view_sharded_fp(mesh: Mesh, geom: FanBeamGeometry,
                         lut, betas, axis: str = "view", block: int = 20):
    """Forward projection with views sharded: image replicated, each device
    computes its wedge [na/nv, nr]; output sinogram view-sharded then
    all-gathered to replicated."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from ipdm_tpu.recon.projector import forward_project

    nv = mesh.shape[axis]
    assert geom.na % nv == 0
    na_local = geom.na // nv
    geom_local = geom.replace(na=na_local)
    b = block
    while na_local % b:
        b -= 1

    def local_fp(x, betas_local):
        return forward_project(x[0], geom_local, lut, betas_local,
                               block=b)[None]

    fn = shard_map(local_fp, mesh=mesh,
                   in_specs=(P(), P(axis)),
                   out_specs=P(None, axis, None))

    @jax.jit
    def fp(x):
        return fn(x[None], jnp.asarray(betas))[0]

    return fp


def make_spatial_sharded_apply(model, mesh: Mesh, axis: str = "data"):
    """Spatially-partitioned UNet evaluation: the H (row) axis of the
    input shards over `axis`, parameters replicate, and XLA's SPMD
    partitioner inserts the conv halo exchanges, the GroupNorm psums and
    the attention all-gathers over ICI automatically.

    This is the latency-scaling complement to batch parallelism: one
    512²/2000×912 slice's UNet eval spreads across the mesh axis, so the
    guided reverse process (inherently sequential over timesteps) speeds
    up per-slice instead of only per-batch. The reference has no
    counterpart (single-GPU; SURVEY.md §5.8).

    Returns fn(params, x, t) -> NHWC output sharded like the input."""
    rep = replicated(mesh)
    in_x = NamedSharding(mesh, P(None, axis, None, None))

    def _apply(params, x, t):
        # trace with the fused planar pallas unit off: GSPMD cannot
        # partition custom calls, and the per-channel XLA lowering gets
        # its halo exchanges inserted automatically
        from ipdm_tpu.models import unet as _unet
        old = _unet.PLANAR_FUSED
        _unet.PLANAR_FUSED = "0"
        try:
            return model.apply(params, x, t)
        finally:
            _unet.PLANAR_FUSED = old

    return jax.jit(_apply,
                   in_shardings=(rep, in_x, rep),
                   out_shardings=in_x)
