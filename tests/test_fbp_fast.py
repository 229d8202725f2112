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


def test_rebin_pallas_branch_matches_gather_branch(setup, monkeypatch):
    """_rebin's Pallas wiring (pad/transpose around rebin_view_lerp) ==
    the XLA flat-gather branch on the small geometry (interpret mode)."""
    import ipdm_tpu.recon.fbp_fast as ff

    g, _, proj = setup
    p = ff._plan_for(g)
    pj = jnp.asarray(np.stack([proj, proj * 0.5]))[:, :, ::-1]
    want = np.asarray(ff._rebin(pj, p))
    monkeypatch.setattr(ff, "_use_pallas", lambda n: True)
    got = np.asarray(ff._rebin(pj, p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rebin_view_lerp_kernel_matches_gather():
    """The Pallas circular view-shift lerp == the flat-gather formula
    (interpret mode), including the wrap via the doubled view axis."""
    from ipdm_tpu.ops.pallas.shift import rebin_view_lerp

    rng = np.random.RandomState(0)
    Nt, B, M = 13, 2, 96
    W2 = -(-(2 * M + 1) // 128) * 128
    G = rng.rand(B, Nt, M).astype(np.float32)
    vi = rng.randint(0, M, Nt).astype(np.int32)
    vf = rng.rand(Nt).astype(np.float32)

    Gpad = np.concatenate([G, G], axis=2)                   # [B, Nt, 2M]
    want = np.empty((B, Nt, M), np.float32)
    for j in range(Nt):
        for k in range(M):
            a = Gpad[:, j, vi[j] + k]
            b = Gpad[:, j, vi[j] + k + 1]
            want[:, j, k] = (1 - vf[j]) * a + vf[j] * b

    G2 = np.pad(np.swapaxes(Gpad, 0, 1), ((0, 0), (0, 0), (0, W2 - 2 * M)))
    got = np.asarray(rebin_view_lerp(jnp.asarray(G2), jnp.asarray(vi),
                                     jnp.asarray(vf), M, interpret=True))
    np.testing.assert_allclose(np.swapaxes(got, 0, 1), want,
                               rtol=1e-6, atol=1e-6)


def test_affine_resample_lerp_matches_gather():
    """The banded one-hot-matmul resample kernel == the two-tap gather
    formula (interpret mode), ascending and descending monotone indices,
    including edge-clipped runs."""
    from ipdm_tpu.ops.pallas.shift import affine_resample_lerp

    rng = np.random.RandomState(2)
    V, B, Nt, Lp = 5, 3, 200, 256
    Ntp = -(-(Nt + 384) // 128) * 128
    P = np.zeros((V, B, Ntp), np.float32)
    P[:, :, :Nt + 1] = rng.rand(V, B, Nt + 1)   # qi0+1 may reach Nt
    qi0 = np.empty((V, Lp), np.int64)
    qf = rng.rand(V, Lp).astype(np.float32)
    for v in range(V):
        step = rng.uniform(0.5, 1.0)
        sgn = 1 if v % 2 == 0 else -1
        start = rng.uniform(-20, 40)
        pos = start + sgn * step * np.arange(Lp)
        qi0[v] = np.clip(np.floor(pos).astype(np.int64), 0, Nt - 1)
    want = np.empty((V, B, Lp), np.float32)
    for v in range(V):
        want[v] = ((1 - qf[v]) * P[v][:, qi0[v]]
                   + qf[v] * P[v][:, qi0[v] + 1])
    got = np.asarray(affine_resample_lerp(
        jnp.asarray(P), jnp.asarray(qi0.astype(np.int32)),
        jnp.asarray(qf), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_prep_pallas_branch_matches_gather_branch(setup, monkeypatch):
    """_prep_group's Pallas resample branch == the XLA gather branch on
    the small geometry (interpret mode), plus full-convert parity."""
    import ipdm_tpu.recon.fbp_fast as ff

    g, _, proj = setup
    p = ff._plan_for(g)
    Mf = g.M // 2
    xd = np.nonzero(p.group_xdrive[:Mf])[0]
    rng = np.random.RandomState(3)
    Pf = jnp.asarray(rng.rand(2, Mf, p.Nt).astype(np.float32))
    want = [np.asarray(a) for a in ff._prep_group(Pf, p, xd, True)]
    monkeypatch.setattr(ff, "_PREP_PALLAS", True)
    got = [np.asarray(a) for a in ff._prep_group(Pf, p, xd, True)]
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
