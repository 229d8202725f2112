"""Mesh parallelism tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
from ipdm_tpu.engine.trainer import (init_train_state, make_optimizer,
                                     make_train_step)
from ipdm_tpu.models.unet import UNetModel
from ipdm_tpu.parallel import (make_mesh, make_sharded_train_step,
                               make_view_sharded_fbp, shard_batch)
from ipdm_tpu.recon.fbp import FBPGeometry, fbp_convert


@pytest.fixture(scope="module")
def small_model():
    model = UNetModel(in_channels=1, model_channels=8, out_channels=1,
                      num_res_blocks=1, attention_resolutions=(4,),
                      channel_mult=(1, 1, 2))
    gd = GaussianDiffusion(timesteps=100, beta_schedule="cosine")
    return model, gd


def test_make_mesh_shapes():
    m = make_mesh()
    assert int(np.prod(list(m.shape.values()))) == jax.device_count()
    m2 = make_mesh([2, -1], ("data", "view"))
    assert m2.shape["data"] == 2
    assert m2.shape["view"] == jax.device_count() // 2


def test_sharded_train_step_matches_single_device(small_model):
    """DP-sharded step computes the same update as the unsharded step."""
    model, gd = small_model
    tx = make_optimizer(1e-3)
    rng = jax.random.PRNGKey(0)
    state, _ = init_train_state(model, rng, (1, 16, 16, 1), 1e-3)
    state2, _ = init_train_state(model, rng, (1, 16, 16, 1), 1e-3)
    images = np.random.default_rng(0).random((8, 16, 16, 1), np.float32)
    k = jax.random.PRNGKey(1)

    plain = make_train_step(model, gd, tx, partial_timesteps=50)
    s1, l1 = plain(state, jnp.asarray(images), k)

    mesh = make_mesh([jax.device_count(), 1], ("data", "view"))
    sharded = make_sharded_train_step(model, gd, tx, 50, mesh)
    st = jax.device_put(state2, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    s2, l2 = sharded(st, shard_batch(images, mesh), k)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    a = jax.tree_util.tree_leaves(s1.params)[0]
    b = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_view_sharded_fbp_matches_unsharded():
    g = FBPGeometry(n_det=32, n_views=40, grid_n=16, grid_l=21.0)
    mesh = make_mesh([1, jax.device_count()], ("data", "view"))
    fbp = make_view_sharded_fbp(mesh, g, view_block=5)
    pj = jnp.asarray(np.random.default_rng(0).random(
        (1, g.M, g.N), np.float32))
    out = np.asarray(fbp(pj))
    ref = np.asarray(fbp_convert(pj, g, view_block=5))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


def test_spatial_sharded_apply_matches_single_device():
    """H-axis spatially-partitioned UNet eval == the unsharded eval
    (XLA inserts conv halos / GN psums / attention all-gathers)."""
    import jax
    import jax.numpy as jnp
    from ipdm_tpu.models.unet import UNetModel
    from ipdm_tpu.parallel import make_mesh, make_spatial_sharded_apply

    mesh = make_mesh([8, 1], ("data", "view"))
    m = UNetModel(in_channels=1, model_channels=8, out_channels=1,
                  num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_heads=2)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 48, 16, 1)), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, t)
    want = np.asarray(m.apply(p, x, t))
    fn = make_spatial_sharded_apply(m, mesh)
    got = np.asarray(fn(p, x, t))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
