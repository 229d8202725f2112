"""Dataset, sampler, Yeo-Johnson, LDCT-sim and metric tests."""

import os

import numpy as np
import pytest

from ipdm_tpu.data.dataset import SiemensDatasetNpz
from ipdm_tpu.data.sampler import DataLoader, RandomSampler
from ipdm_tpu.diffusion.normalize import (YeoJohnsonTransformer,
                                          yeo_johnson_inverse_transform,
                                          yeo_johnson_transform)
from ipdm_tpu.metrics import fsim, nqm, psnr, ssim, vif_p


# ---------------------------------------------------------------- dataset --

def _mk(root, kind, patient, names, shape, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, kind, patient)
    os.makedirs(base, exist_ok=True)
    for n in names:
        np.save(os.path.join(base, n + ".npy"),
                rng.random(shape, np.float32))
    return os.path.join(root, kind)


def test_dataset_streams_and_patches(tmp_path):
    root = str(tmp_path)
    ld = _mk(root, "ld", "L001", ["001", "002"], (32, 32))
    fd = _mk(root, "fd", "L001", ["001", "002"], (32, 32), seed=1)
    ds = SiemensDatasetNpz(ldimg_path=ld, fdimg_path=fd, patch=[16, 16],
                           patch_per_image=3)
    assert len(ds) == 2
    ld_img, fd_proj, fd_img, ld_proj = ds[0]
    assert ld_img.shape == (3, 16, 16, 1)
    assert fd_img.shape == (3, 16, 16, 1)
    assert fd_proj is None and ld_proj is None
    batch = ds.collate([ds[0], ds[1]])
    assert batch[0].shape == (2, 3, 16, 16, 1)
    assert batch[1] is None


def test_dataset_proj_scaling_and_names(tmp_path):
    root = str(tmp_path)
    lp = _mk(root, "lp", "L001", ["007"], (20, 12))
    ds = SiemensDatasetNpz(ldproj_path=lp, proj_clip=True)
    raw = np.load(os.path.join(lp, "L001", "007.npy"))
    out = ds[0][3]
    np.testing.assert_allclose(out[..., 0], raw / 10.0, rtol=1e-6)
    assert ds.patient_name == ["L001"] and ds.slice_name == ["007"]


def test_dataset_name_lookup(tmp_path):
    root = str(tmp_path)
    fd = _mk(root, "fd", "L009", ["042", "043"], (8, 8))
    ds = SiemensDatasetNpz(fdimg_path=fd)
    item = ds.get_data_from_name("L009", "043")
    assert item[2].shape == (8, 8, 1)


# ---------------------------------------------------------------- sampler --

def test_sampler_resume_reproduces_order():
    full = list(RandomSampler(dataset_len=20, batch_size=4, num_iter=10,
                              restore_iter=0, seed=3))
    resumed = list(RandomSampler(dataset_len=20, batch_size=4, num_iter=10,
                                 restore_iter=4, seed=3))
    assert full[16:] == resumed
    assert len(full) == 40


def test_sampler_rank_sharding_partitions():
    """Two ranks interleave-partition the global stream: per-rank batch 2 ×
    2 replicas = global batch 4 (sampler.py:11-16,45 semantics)."""
    kw = dict(dataset_len=16, batch_size=2, num_iter=8, restore_iter=0,
              seed=0, num_replicas=2)
    r0 = list(RandomSampler(rank=0, **kw))
    r1 = list(RandomSampler(rank=1, **kw))
    assert len(r0) == len(r1) == 16  # 8 iters × per-rank batch 2
    merged = [x for pair in zip(r0, r1) for x in pair]
    # equals the unsharded stream at the same global batch of 4
    assert merged == list(RandomSampler(dataset_len=16, batch_size=4,
                                        num_iter=8, restore_iter=0, seed=0))


def test_dataloader_batches(tmp_path):
    root = str(tmp_path)
    fd = _mk(root, "fd", "L001", [f"{i:03d}" for i in range(6)], (8, 8))
    ds = SiemensDatasetNpz(fdimg_path=fd)
    loader = DataLoader(ds, batch_size=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0][2].shape == (2, 8, 8, 1)


# ----------------------------------------------------------- yeo-johnson --

def test_yeo_johnson_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.gamma(2.0, 1.0, (1, 32, 32, 1)) * 0.05).astype(np.float32)
    y, tr = yeo_johnson_transform(x)
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-3
    back = yeo_johnson_inverse_transform(y, tr)
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_yeo_johnson_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.preprocessing")
    rng = np.random.default_rng(1)
    x = rng.gamma(3.0, 2.0, 500).astype(np.float64)
    ours = YeoJohnsonTransformer.fit(x)
    pt = sklearn.PowerTransformer(method="yeo-johnson")
    ref = pt.fit_transform(x.reshape(-1, 1)).ravel()
    np.testing.assert_allclose(ours.transform(x), ref, atol=1e-4)
    assert abs(ours.lmbda - pt.lambdas_[0]) < 1e-3


# ---------------------------------------------------------------- metrics --

@pytest.fixture(scope="module")
def img_pair():
    rng = np.random.default_rng(0)
    a = rng.random((64, 64))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    return a, b


def test_psnr_ssim_match_skimage(img_pair):
    skm = pytest.importorskip("skimage.metrics")
    a, b = img_pair
    assert psnr(a, b, data_range=1) == pytest.approx(
        skm.peak_signal_noise_ratio(a, b, data_range=1), abs=1e-8)
    assert ssim(a, b, win_size=11, data_range=1) == pytest.approx(
        skm.structural_similarity(a, b, win_size=11, data_range=1), abs=1e-6)


def test_metrics_identical_images(img_pair):
    a, _ = img_pair
    assert ssim(a, a, win_size=11, data_range=1) == pytest.approx(1.0)
    assert fsim(a, a, data_range=1) == pytest.approx(1.0, abs=1e-3)
    assert np.isinf(psnr(a, a, data_range=1))


def test_metrics_monotonic_in_noise(img_pair):
    """More noise → lower score, for every metric."""
    a, _ = img_pair
    rng = np.random.default_rng(2)
    small = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1)
    big = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1)
    assert psnr(a, small, 1) > psnr(a, big, 1)
    assert ssim(a, small, 11, 1) > ssim(a, big, 11, 1)
    assert fsim(a, small, 1) > fsim(a, big, 1)
    assert vif_p(a, small, 1) > vif_p(a, big, 1)
    assert nqm(a, small) > nqm(a, big)


def test_ldct_simulator_statistics():
    """add_noise variance follows the compound-Poisson approximation
    (Low_dose_CT_simulate.py:38-44)."""
    import jax
    import jax.numpy as jnp
    from ipdm_tpu.recon.simulate import NE, N0, add_noise
    p = jnp.full((200, 200), 3.0)
    noisy = add_noise(p, jax.random.PRNGKey(0), factor=0.25)
    f, e = 0.25, np.exp(3.0)
    var = (1 - f) * e * (1 + ((1 + f) * NE * e) / (f * N0)) / (f * N0)
    emp = float(jnp.var(noisy - p))
    assert emp == pytest.approx(var, rel=0.05)
