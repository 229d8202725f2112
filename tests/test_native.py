"""Native C++ library tests: npy IO, prefetch loader, and the CPU reference
projector/SART cross-checked against the JAX implementations."""

import os
import subprocess

import numpy as np
import pytest

from ipdm_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libipdm_native.so not built")


def test_npy_read_dtypes(tmp_path):
    for arr in (np.arange(12, dtype=np.float32).reshape(3, 4),
                np.arange(12, dtype=np.float64).reshape(3, 4) * 0.5,
                np.arange(12, dtype=np.int16).reshape(3, 4),
                np.arange(12, dtype=np.uint16).reshape(3, 4)):
        p = str(tmp_path / "a.npy")
        np.save(p, arr)
        out = native.npy_read(p, arr.shape)
        np.testing.assert_allclose(out, arr.astype(np.float32))


def test_npy_read_fortran_order(tmp_path):
    arr = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    out = native.npy_read(p, (3, 4))
    np.testing.assert_array_equal(out, arr)


def test_native_loader_order_and_content(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    arrays = []
    for i in range(6):
        a = rng.random((8, 8)).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    indices = [3, 1, 4, 0, 5, 2]
    loader = native.NativeLoader(paths, 8, 8, indices, batch=2, n_threads=3)
    got = list(loader)
    loader.close()
    assert len(got) == 3
    flat = np.concatenate(got, axis=0)
    for k, idx in enumerate(indices):
        np.testing.assert_array_equal(flat[k], arrays[idx])


@pytest.fixture(scope="module")
def small_geom():
    from ipdm_tpu.recon.geometry import FanBeamGeometry
    return FanBeamGeometry(nx=32, ny=32, dx=42 / 32, dy=42 / 32, nr=64,
                           dr=0.0010125 * 912 / 64, na=60,
                           ta_dimx=201, ta_dimy=91)


def test_native_lut_matches_python(small_geom):
    from ipdm_tpu.recon.geometry import area_lut
    ref = area_lut(small_geom)
    got = native.area_lut_native(small_geom)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.slow
def test_native_fp_matches_jax(small_geom):
    import jax.numpy as jnp
    from ipdm_tpu.recon.geometry import area_lut, default_betas
    from ipdm_tpu.recon.phantom import shepp_logan
    from ipdm_tpu.recon.projector import forward_project
    g = small_geom
    lut = area_lut(g)
    betas = default_betas(g)
    x = np.asarray(shepp_logan(g.nx), np.float32)
    ref = np.asarray(forward_project(jnp.asarray(x), g, jnp.asarray(lut),
                                     jnp.asarray(betas)))
    got = native.fp_project_native(x, g, lut, betas)
    scale = max(1e-6, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-4)


@pytest.mark.slow
def test_native_sart_matches_jax(small_geom):
    import jax.numpy as jnp
    from ipdm_tpu.recon.geometry import area_lut, default_betas
    from ipdm_tpu.recon.phantom import shepp_logan
    from ipdm_tpu.recon.projector import forward_project
    from ipdm_tpu.recon.sart import sart_reconstruct
    g = small_geom
    lut = area_lut(g)
    betas = default_betas(g)
    x = np.asarray(shepp_logan(g.nx), np.float32) * 0.03
    proj = np.asarray(forward_project(jnp.asarray(x), g, jnp.asarray(lut),
                                      jnp.asarray(betas)))
    ref = np.asarray(sart_reconstruct(jnp.asarray(proj), g, jnp.asarray(lut),
                                      jnp.asarray(betas), nstart=2, ntv=0,
                                      nsubsets=10))
    got = native.sart_reconstruct_native(proj, g, lut, betas, nstart=2,
                                         ntv=0, nsubsets=10)
    scale = max(1e-6, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-3)
