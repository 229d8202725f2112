"""Unit-conversion identities (reference Dataset/npz_data_loader.py:9-52)."""

import jax.numpy as jnp
import numpy as np

from ipdm_tpu.data import units


def test_hu_miu_roundtrip():
    hu = jnp.linspace(-1000.0, 3000.0, 101)
    np.testing.assert_allclose(units.miu2HU(units.HU2miu(hu)), hu,
                               rtol=0, atol=1e-3)


def test_pixel_hu_roundtrip_inside_window():
    pix = jnp.linspace(0.0, 1.0, 101)
    np.testing.assert_allclose(units.HU2pixel(units.pixel2HU(pix)), pix,
                               rtol=0, atol=1e-6)


def test_water_maps_to_expected_pixel():
    # μ_water = 0.183 → HU = -24 → pixel = (−24 + 1024)/4096
    pix = units.miu2pixel(jnp.asarray(0.183))
    np.testing.assert_allclose(pix, (-24.0 + 1024.0) / 4096.0, atol=1e-6)


def test_window_clipping():
    assert float(units.HU2pixel(jnp.asarray(-2000.0))) == 0.0
    assert float(units.HU2pixel(jnp.asarray(5000.0))) == 1.0


def test_reset_window_centre():
    img = jnp.asarray([0.25, 0.5])
    out = units.reset_window_centre(img, new_window=[-1024, 3072],
                                    origin_window=[-1024, 3072])
    np.testing.assert_allclose(out, img, atol=1e-6)
