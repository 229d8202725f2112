"""Fast rebinned-parallel OS-SART vs the exact fan-beam footprint SART."""

import jax.numpy as jnp
import numpy as np
import pytest

from ipdm_tpu.recon.convertor import fbp_geom_from_fan, recons
from ipdm_tpu.recon.geometry import FanBeamGeometry, area_lut, default_betas
from ipdm_tpu.recon.phantom import shepp_logan
from ipdm_tpu.recon.projector import forward_project
from ipdm_tpu.recon.sart_fast import sart_fast_convert


@pytest.fixture(scope="module")
def setup():
    fan = FanBeamGeometry(nx=64, ny=64, dx=42 / 64, dy=42 / 64, nr=128,
                          dr=0.0010125 * 912 / 128, na=180,
                          ta_dimx=401, ta_dimy=91)
    g = fbp_geom_from_fan(fan)
    ph = np.asarray(shepp_logan(64), np.float32) * 0.03
    proj = np.asarray(forward_project(
        jnp.asarray(ph), fan, jnp.asarray(area_lut(fan)),
        jnp.asarray(default_betas(fan))))
    return fan, g, ph, proj


def _psnr(a, b):
    err = np.mean((a - b) ** 2)
    rng = max(a.max() - a.min(), 1e-9)
    return 10 * np.log10(rng ** 2 / err)


@pytest.mark.slow
def test_fast_sart_recovers_phantom(setup):
    fan, g, ph, proj = setup
    out = np.asarray(sart_fast_convert(jnp.asarray(proj[None]), g,
                                       nstart=8, nsubsets=18))[0]
    c = 4
    p = _psnr(ph.T[c:-c, c:-c], out[c:-c, c:-c])
    # the exact fan SART reaches ≈17.2 dB at nstart=4 on this setup; the
    # fast path converges at the same rate (16.6 @ 4, 17.6 @ 8)
    assert p > 17.0, f"phantom PSNR {p}"


@pytest.mark.slow
def test_fast_sart_matches_exact(setup):
    fan, g, ph, proj = setup
    exact = np.asarray(recons(jnp.asarray(proj[None]), fan, nstart=4,
                              nsubsets=18, permute=True))[0]
    fast = np.asarray(sart_fast_convert(jnp.asarray(proj[None]), g,
                                        nstart=4, nsubsets=18))[0]
    c = 4
    p = _psnr(exact[c:-c, c:-c], fast[c:-c, c:-c])
    assert p > 20.0, f"fast-vs-exact PSNR {p}"
    scale = np.sum(fast[c:-c, c:-c] * exact[c:-c, c:-c]) / \
        np.sum(exact[c:-c, c:-c] ** 2)
    assert abs(scale - 1.0) < 0.1, f"scale {scale}"


@pytest.mark.slow
def test_fast_sart_tv_smooths(setup):
    fan, g, ph, proj = setup
    rng = np.random.default_rng(0)
    noisy = proj + rng.normal(0, 0.02 * proj.max(),
                              proj.shape).astype(np.float32)
    plain = np.asarray(sart_fast_convert(jnp.asarray(noisy[None]), g,
                                         nstart=3, ntv=0, nsubsets=18))[0]
    tv = np.asarray(sart_fast_convert(jnp.asarray(noisy[None]), g,
                                      nstart=3, ntv=10, nsubsets=18))[0]

    def roughness(x):
        return float(np.mean(np.abs(np.diff(x, axis=0))) +
                     np.mean(np.abs(np.diff(x, axis=1))))

    assert roughness(tv) < roughness(plain)


@pytest.mark.slow
def test_project_fast_matches_exact(setup):
    from ipdm_tpu.recon.convertor import project
    from ipdm_tpu.recon.sart_fast import project_fast
    fan, g, ph, proj = setup
    exact = np.asarray(project(jnp.asarray(ph[None]), fan))[0]
    fast = np.asarray(project_fast(jnp.asarray(ph[None]), g, fan.nr,
                                   float(g.nda[0]), float(g.da)))[0]
    r = np.corrcoef(exact.ravel(), fast.ravel())[0, 1]
    scale = np.sum(fast * exact) / np.sum(exact ** 2)
    assert r > 0.99, f"corr {r}"
    assert abs(scale - 1.0) < 0.02, f"scale {scale}"


@pytest.mark.slow
def test_simulate_ldct_fast_path(setup):
    import jax
    from ipdm_tpu.recon.simulate import simulate_ldct_batch
    fan, g, ph, proj = setup
    noisy, ld = simulate_ldct_batch(jnp.asarray(proj[None]),
                                    jax.random.PRNGKey(0), dose=0.25,
                                    geom=fan, nstart=8, nsubsets=18)
    assert noisy.shape == proj[None].shape
    assert ld.shape == (1, fan.ny, fan.nx)
    assert np.all(np.isfinite(np.asarray(ld)))
    # reconstruction resembles the phantom (transposed recon convention)
    c = 4
    r = np.corrcoef(np.asarray(ld)[0, c:-c, c:-c].ravel(),
                    ph.T[c:-c, c:-c].ravel())[0, 1]
    assert r > 0.75, f"corr {r}"


def test_anterp_taps_semantics():
    """The windowed multi-tap resample kernel == the direct per-element
    gather sum out[v,:,d] = Σ_k W[v,k,d]·P[v,:,qi0[v,d]+k], on monotone
    index tables honouring its span contract (both directions)."""
    from ipdm_tpu.ops.pallas.shift import _WTR_WIN, anterp_taps
    rng = np.random.RandomState(3)
    V, B, Wt, Lp, M = 6, 2, 4, 256, 640
    P = rng.rand(V, B, M + _WTR_WIN).astype(np.float32)
    P[:, :, M:] = 0.0
    qi0 = np.zeros((V, Lp), np.int32)
    for v in range(V):
        step = rng.uniform(0.9, 1.4)
        base = rng.randint(0, 40)
        seq = np.clip((base + np.arange(Lp) * step).astype(np.int64),
                      0, M - 1)
        qi0[v] = seq[::-1] if v % 2 else seq  # either monotone direction
    W = rng.rand(V, Wt, Lp).astype(np.float32)
    got = np.asarray(anterp_taps(jnp.asarray(P), jnp.asarray(qi0),
                                 jnp.asarray(W), interpret=True))
    want = np.zeros((V, B, Lp), np.float32)
    for k in range(Wt):
        idx = qi0 + k
        for v in range(V):
            want[v] += W[v, k][None, :] * P[v][:, idx[v]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("G", [2, 4, 8])
def test_os_sart_sweep_mm_semantics(G):
    """The MXU tap-matrix sweep kernel == the naive two-tap FP→corr→BP→
    update loop (interpret mode on CPU), on tables honouring its contract
    (per-view monotone starts, |Δs| ≤ 1 per row — the Kf=1 fine grid).
    G sweeps the view-stacking factor: 4 is the shipped production default
    (sart_fast._MM_G), 2/8 the legal neighbours (Vp=8 divides all three)."""
    from ipdm_tpu.ops.pallas.shift import os_sart_sweep_mm
    rng = np.random.RandomState(0)
    S, Vp, B, n, L = 3, 8, 2, 64, 512
    lam = 0.3
    x0 = rng.rand(B, n, n).astype(np.float32)
    rf = rng.rand(S, Vp, B, L).astype(np.float32)
    inv2 = rng.rand(S, Vp, L).astype(np.float32)
    s0 = np.zeros((S, Vp, n), np.int32)
    frac = rng.rand(S, Vp, n).astype(np.float32)
    for s in range(S):
        for v in range(Vp):
            start = rng.randint(0, L - n - 130)
            sgn = 1 if rng.rand() > 0.5 else -1
            steps = (rng.rand(n - 1) < rng.rand()).astype(np.int64) * sgn
            seq = np.clip(start + np.concatenate([[0], np.cumsum(steps)]),
                          0, L - n - 130)
            s0[s, v] = seq
    nrmi = rng.rand(S, n, n).astype(np.float32)
    got = np.asarray(os_sart_sweep_mm(
        jnp.asarray(x0), jnp.asarray(rf), jnp.asarray(inv2),
        jnp.asarray(frac), jnp.asarray(s0),
        jnp.asarray(nrmi), jnp.float32(lam), interpret=True, G=G))
    x = x0.copy()
    for s in range(S):
        T = np.zeros((Vp, B, L), np.float32)
        for v in range(Vp):
            for y in range(n):
                row = x[:, y, :]
                a = s0[s, v, y]
                T[v, :, a:a + n] += (1 - frac[s, v, y]) * row
                T[v, :, a + 1:a + 1 + n] += frac[s, v, y] * row
        corr = rf[s] - T * inv2[s][:, None, :]
        for v in range(Vp):
            for y in range(n):
                a = s0[s, v, y]
                acc = ((1 - frac[s, v, y]) * corr[v, :, a:a + n]
                       + frac[s, v, y] * corr[v, :, a + 1:a + 1 + n])
                x[:, y, :] += lam * nrmi[s, y, :][None] * acc
        x = np.maximum(x, 0.0)
    np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_mm_sweep_matches_unfused(setup):
    """The MXU tap-matrix sweep (Kf=1 fine grid, drive-pure OS ordering)
    reconstructs the same image as the unfused per-subset kernel chain (a
    different but equivalent subset schedule on the natural-Kf grid), and
    still recovers the phantom at the exact path's convergence rate.
    (The intermediate per-row VPU sweep kernel this used to A/B against
    was pruned in round 4 — docs/PERF.md.)"""
    fan, g, ph, proj = setup
    pj = jnp.asarray(proj[None])
    old = np.asarray(sart_fast_convert(pj, g, nstart=8, nsubsets=18,
                                       fused=False))[0]
    new = np.asarray(sart_fast_convert(pj, g, nstart=8, nsubsets=18,
                                       fused=True))[0]
    c = 4
    assert _psnr(old[c:-c, c:-c], new[c:-c, c:-c]) > 25.0
    p = _psnr(ph.T[c:-c, c:-c], new[c:-c, c:-c])
    assert p > 17.0, f"mm phantom PSNR {p}"
    scale = np.sum(new[c:-c, c:-c] * old[c:-c, c:-c]) / \
        np.sum(old[c:-c, c:-c] ** 2)
    assert abs(scale - 1.0) < 0.05, f"scale {scale}"


def test_fp_plane_deposit_semantics():
    """The plane-deposit FP kernel (v2) == the naive two-tap deposit loop
    (interpret mode on CPU), including the batch dim riding inside."""
    from ipdm_tpu.ops.pallas.shift import fp_plane_deposit
    rng = np.random.RandomState(1)
    n, B, W, V, L = 32, 2, 128, 16, 768
    rows = rng.rand(n, B, W).astype(np.float32)
    s0 = rng.randint(0, L - W - 128, (V, n)).astype(np.int32)
    s1 = np.minimum(s0 + 1, L - W - 129).astype(np.int32)
    w0 = rng.rand(V, n).astype(np.float32)
    w1 = rng.rand(V, n).astype(np.float32)
    got = np.asarray(fp_plane_deposit(jnp.asarray(rows), jnp.asarray(s0),
                                      jnp.asarray(s1), jnp.asarray(w0),
                                      jnp.asarray(w1), L, interpret=True))
    want = np.zeros((V, B, L), np.float32)
    for v in range(V):
        for y in range(n):
            want[v, :, s0[v, y]:s0[v, y] + W] += w0[v, y] * rows[y]
            want[v, :, s1[v, y]:s1[v, y] + W] += w1[v, y] * rows[y]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_batched_convert_matches_single(setup):
    """The B-batched SART scan is item-wise identical to per-item runs."""
    fan, g, ph, proj = setup
    pj2 = np.stack([proj, proj * 0.7 + 0.01])
    both = np.asarray(sart_fast_convert(jnp.asarray(pj2), g,
                                        nstart=2, nsubsets=6))
    for b in range(2):
        one = np.asarray(sart_fast_convert(jnp.asarray(pj2[b][None]), g,
                                           nstart=2, nsubsets=6))[0]
        np.testing.assert_allclose(both[b], one, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fold_matches_unfolded(setup):
    """Half-turn folding (φ/φ+π redundancy) reconstructs the same image."""
    fan, g, ph, proj = setup
    pj = jnp.asarray(proj[None])
    folded = np.asarray(sart_fast_convert(pj, g, nstart=4, nsubsets=18,
                                          fold=True))[0]
    unfolded = np.asarray(sart_fast_convert(pj, g, nstart=4, nsubsets=18,
                                            fold=False))[0]
    c = 4
    p = _psnr(unfolded[c:-c, c:-c], folded[c:-c, c:-c])
    assert p > 30.0, f"fold-vs-unfold PSNR {p}"


@pytest.mark.slow
def test_sample_rate_sparse_views(setup):
    """sample_rate=k keeps every k-th view (recons_torch sparse-view mode,
    TASART2DNSL0_PyAPI.cpp:37): still reconstructs, differs from dense,
    and agrees with the exact SART's subsampling."""
    fan, g, ph, proj = setup
    pj = jnp.asarray(proj[None])
    dense = np.asarray(sart_fast_convert(pj, g, nstart=4, nsubsets=18))[0]
    sparse = np.asarray(sart_fast_convert(pj, g, nstart=4, nsubsets=18,
                                          sample_rate=2))[0]
    assert np.abs(sparse - dense).max() > 1e-6  # actually subsampled
    c = 4
    p = _psnr(ph.T[c:-c, c:-c], sparse[c:-c, c:-c])
    assert p > 14.0, f"sparse-view phantom PSNR {p}"
    exact_sparse = np.asarray(recons(pj, fan, nstart=4, nsubsets=18,
                                     sample_rate=2, permute=True))[0]
    r = np.corrcoef(exact_sparse[c:-c, c:-c].ravel(),
                    sparse[c:-c, c:-c].ravel())[0, 1]
    assert r > 0.95, f"sparse fast-vs-exact corr {r}"


@pytest.mark.slow
def test_sart_convert_under_outer_jit(setup):
    """sart_fast_convert must be callable from inside a user jit: the norm
    cache used to capture tracers on first traced call (leak)."""
    import jax
    import jax.numpy as jnp
    from ipdm_tpu.recon.sart_fast import sart_fast_convert, _SPLANS
    fan, g, ph, proj = setup
    _SPLANS.clear()  # force first norms computation to happen inside the jit
    pj = jnp.asarray(proj)[None]

    @jax.jit
    def f(x):
        return sart_fast_convert(x, g, nstart=2, nsubsets=6)

    y1 = np.asarray(f(pj))
    y2 = np.asarray(f(pj))  # second call reuses the (now concrete) plan
    assert np.isfinite(y1).all()
    np.testing.assert_allclose(y1, y2, rtol=1e-6)
    # eager call agrees with the jitted call
    y3 = np.asarray(sart_fast_convert(pj, g, nstart=2, nsubsets=6))
    np.testing.assert_allclose(y1, y3, rtol=1e-5, atol=1e-6)



def test_resample_to_fine_anterp_matches_gather():
    """The r5 anterp_taps lowering of _resample_to_fine must match the
    take_along_axis fallback exactly on the LIVE flat-layout region
    (f < K*Lq; the dead tail beyond the planes is masked by the caller's
    qvalid — fine_tables live_f). Uses flagship-like dx/dt so the anterp
    path actually engages (slope*127+2 < the window bound)."""
    import jax.numpy as jnp

    from ipdm_tpu.recon import sart_fast as sf
    from ipdm_tpu.recon.fbp import FBPGeometry

    g = FBPGeometry(n_det=912, n_views=40, grid_n=512, grid_l=21.0)
    sp = sf._splan_for(g, 4)
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.random((2, len(sp.view_ids), sp.p.Nt), np.float32))
    engaged = 0
    for grp in (sp.gx_all, sp.gy_all):
        if grp.V == 0:
            continue
        amax = float(np.max(grp.step)) * grp.K
        if amax * 127 + 2 < 284:
            engaged += 1
        new = np.asarray(sp._resample_to_fine(R, grp))
        rv = jnp.swapaxes(R[:, jnp.asarray(grp.local_ids)], 0, 1)
        if grp.Vpad > grp.V:
            rv = jnp.pad(rv, ((0, grp.Vpad - grp.V), (0, 0), (0, 0)))
        old = np.asarray(sp._resample_to_fine_gather(rv, grp, 2))
        live = grp.K * grp.Lq
        np.testing.assert_allclose(new[:, :, :live], old[:, :, :live],
                                   rtol=0, atol=1e-6)
    assert engaged, "anterp path did not engage — geometry slope too steep"
