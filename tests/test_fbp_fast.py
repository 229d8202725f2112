"""fbp_convert_fast vs the direct fan-beam FBP: same reconstruction."""

import jax.numpy as jnp
import numpy as np
import pytest

from ipdm_tpu.recon.fbp import FBPGeometry, fbp_convert
from ipdm_tpu.recon.fbp_fast import fbp_convert_fast
from ipdm_tpu.recon.geometry import FanBeamGeometry, area_lut, default_betas
from ipdm_tpu.recon.phantom import shepp_logan
from ipdm_tpu.recon.projector import forward_project


@pytest.fixture(scope="module")
def setup():
    fan = FanBeamGeometry(nx=64, ny=64, dx=42 / 64, dy=42 / 64, nr=128,
                          dr=0.0010125 * 912 / 128, na=360,
                          ta_dimx=401, ta_dimy=91)
    g = FBPGeometry(n_det=128, n_views=360, grid_n=64, grid_l=21.0,
                    da=fan.dr, det_offset=-fan.offset_r,
                    view_step_deg=1.0)
    ph = np.asarray(shepp_logan(64), np.float32) * 0.03
    proj = np.asarray(forward_project(
        jnp.asarray(ph), fan, jnp.asarray(area_lut(fan)),
        jnp.asarray(default_betas(fan))))
    return g, ph, proj


def _psnr(a, b):
    err = np.mean((a - b) ** 2)
    rng = max(a.max() - a.min(), 1e-9)
    return 10 * np.log10(rng ** 2 / err)


@pytest.mark.slow
def test_fast_matches_direct_fbp(setup):
    g, ph, proj = setup
    direct = np.asarray(fbp_convert(jnp.asarray(proj[None]), g))[0]
    fast = np.asarray(fbp_convert_fast(jnp.asarray(proj[None]), g))[0]
    # interior comparison (edge pixels differ by boundary handling)
    c = 4
    d_i = direct[c:-c, c:-c]
    f_i = fast[c:-c, c:-c]
    assert _psnr(d_i, f_i) > 30.0, f"fast vs direct PSNR {_psnr(d_i, f_i)}"
    # consistent scale (no global gain error)
    scale = np.sum(f_i * d_i) / np.sum(d_i * d_i)
    assert abs(scale - 1.0) < 0.05, f"scale {scale}"


@pytest.mark.slow
def test_fast_reconstructs_phantom(setup):
    g, ph, proj = setup
    fast = np.asarray(fbp_convert_fast(jnp.asarray(proj[None]), g))[0]
    # recons convention: output transposed wrt raw phantom (see SKILL.md)
    c = 4
    p = _psnr(ph.T[c:-c, c:-c], fast[c:-c, c:-c])
    assert p > 18.0, f"phantom PSNR {p}"


@pytest.mark.slow
def test_fast_batch_shapes(setup):
    g, _, proj = setup
    out = fbp_convert_fast(jnp.asarray(np.stack([proj, proj * 2])), g)
    assert out.shape == (2, 64, 64)
    np.testing.assert_allclose(np.asarray(out[1]), 2 * np.asarray(out[0]),
                               rtol=1e-4, atol=1e-6)


def test_bp_kernel_batched_matches_v1():
    """The batched roll-table BP kernel (v2) reproduces the per-item v1
    kernel exactly (interpret mode on CPU)."""
    import jax.numpy as jnp
    from ipdm_tpu.ops.pallas.shift import (bp_shift_accumulate,
                                           bp_shift_accumulate_batched)
    rng = np.random.RandomState(0)
    V, B, L, n = 16, 3, 512, 128
    Q = jnp.asarray(rng.rand(V, B, L).astype(np.float32))
    s0 = jnp.asarray(rng.randint(0, L - n - 128, (V, n)).astype(np.int32))
    s1 = jnp.minimum(s0 + 1, L - n - 128)
    fr = jnp.asarray(rng.rand(V, n).astype(np.float32))
    got = np.asarray(bp_shift_accumulate_batched(Q, s0, s1, fr, n,
                                                 interpret=True))
    for b in range(B):
        want = np.asarray(bp_shift_accumulate(Q[:, b, :], s0, s1, fr, n,
                                              interpret=True))
        np.testing.assert_allclose(got[b], want, rtol=1e-6, atol=1e-6)
    got4 = np.asarray(bp_shift_accumulate_batched(Q, s0, s1, fr, n,
                                                  interpret=True,
                                                  row_unroll=4))
    np.testing.assert_allclose(got4, got, rtol=1e-6, atol=1e-6)

