"""End-to-end engine tests on tiny synthetic data (CPU, virtual mesh).

Covers the reference's implicit integration surface (SURVEY.md §4): training
loop convergence smoke, img-only test mode with metric/artifact layout,
config mutation (update_opt/reset_opt), checkpoint save/load, and the metric
aggregation helpers (train_test_utils.py:59-118)."""

import glob
import json
import os

import numpy as np
import pytest

from ipdm_tpu.config.config import IPDMConfig
from ipdm_tpu.engine.denoiser import (DotDict, ProgressiveDomainDenoiser,
                                      ResultTempDict, dict_add, dict_mean,
                                      dict_std, dict_value_minus_mean_square)


def _make_dataset(root, n=3, size=32):
    """Tiny μ-map dataset: <root>/{ld,fd}/<patient>/<slice>.npy."""
    rng = np.random.default_rng(0)
    paths = {}
    for kind in ("ld_img", "fd_img"):
        base = os.path.join(root, kind)
        os.makedirs(os.path.join(base, "L001"), exist_ok=True)
        for i in range(n):
            arr = rng.random((size, size), np.float32) * 0.03
            np.save(os.path.join(base, "L001", f"{i:03d}.npy"), arr)
        paths[kind] = base
    return paths


def _tiny_img_opt(tmp_path, mode, **kw):
    # NOTE on sizing: counterintuitively, SHRINKING this model makes the
    # suite slower — XLA:CPU compiled the 4-ch/(1,2) variant's train step
    # in 916 s vs 382 s for this 8-ch/(1,1,2) one (1-core box, 2026-08-19)
    paths = _make_dataset(str(tmp_path / "data"))
    opt = IPDMConfig(
        mode=mode, run_name="t", batch_size=2, test_batch_size=1,
        max_epochs=2, save_freq=2, test_numbers=1, init_lr=1e-3,
        model_channels_img=8, channel_mult_img=[1, 1, 2],
        attention_resolutions_img=[4], timesteps_img=50,
        partial_timesteps_img=10, t_start_img=[3, 2],
        constant_guidance_img=0.45, ultra_img_denoise=False,
        metrics=["psnr", "ssim"], patch=[16, 16], patch_per_image=2,
        train_dataset_path_LD_img=paths["ld_img"],
        train_dataset_path_FD_img=paths["fd_img"],
        test_dataset_path_LD_img=paths["ld_img"],
        test_dataset_path_FD_img=paths["fd_img"],
    )
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


@pytest.mark.slow
def test_train_img_end_to_end(tmp_path):
    # slow tier: XLA:CPU needs 300-900 s to compile ANY UNet fwd+bwd on a
    # 1-core box (smaller UNets compile slower, measured 2026-08-19). The
    # smoke tier proves the train-step math on a fast-compiling conv model
    # (test_parallel.py) and the full fit-loop mechanics run here.
    opt = _tiny_img_opt(tmp_path, "train_img", test_numbers=0)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    assert opt.max_iter == 3  # 3 slices · 2 epochs // batch 2
    eng.fit()
    assert int(eng.train_state.step) == opt.max_iter
    # checkpoint written at iter 2 (save_freq=2)
    assert eng.ckpt.load("img_model", 1) is not None
    # option.json dumped
    with open(os.path.join(eng.logger.models_save_dir, "option.json")) as f:
        assert json.load(f)["mode"] == "train_img"


def test_test_img_end_to_end(tmp_path):
    opt = _tiny_img_opt(tmp_path, "test_img")
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    # artifact layout: save_test_results/Save_Iter_0/<patient>/<slice>/metric.json
    metrics = glob.glob(os.path.join(
        eng.save_root_path, "Save_Iter_0", "L001", "*", "metric.json"))
    assert len(metrics) == 1
    with open(metrics[0]) as f:
        mi = json.load(f)
    # LDCT baseline + per-iteration deImg (2 t_start iters + ensemble = 3)
    assert "psnr_iter_0" in mi["LDCT"]
    assert {"psnr_iter_1", "psnr_iter_2", "psnr_iter_3"} <= set(mi["deImg"])
    # aggregate metric.json with mean + std keys
    with open(os.path.join(eng.save_root_path, "Save_Iter_0",
                           "metric.json")) as f:
        mt = json.load(f)
    assert "psnr_iter_1" in mt["deImg"] and "psnr_iter_1_std" in mt["deImg"]


def test_update_and_reset_opt(tmp_path):
    opt = _tiny_img_opt(tmp_path, "test_img")
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.update_opt({"eta_img": 0.9, "convertor": "FBP"})
    assert eng.opt.eta_img == 0.9
    assert eng.convertor.kind == "FBP"
    eng.update_opt({"nonexistent_key_xyz": 1})  # warns, doesn't raise
    eng.reset_opt()
    assert eng.opt.eta_img == 0.5


def test_checkpoint_roundtrip(tmp_path):
    opt = _tiny_img_opt(tmp_path, "train_img", test_numbers=0)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.checkpoints(7)
    loaded = eng.ckpt.load("img_model", 7, target=eng.img_params)
    leaves_a = [np.asarray(x) for x in
                __import__("jax").tree_util.tree_leaves(eng.img_params)]
    leaves_b = [np.asarray(x) for x in
                __import__("jax").tree_util.tree_leaves(loaded)]
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)


# -- proj / progressive modes (train_test_utils.py:274-324, 552-567) --------

GEO_TINY = dict(nx=32, ny=32, dx=42 / 32, dy=42 / 32, nr=64,
                dr=0.0010125 * 912 / 64, na=60, ta_dimx=401, ta_dimy=91)


@pytest.fixture(scope="module")
def prog_root(tmp_path_factory):
    """Tiny 4-stream dataset (2 slices) on the GEO_TINY scanner."""
    import jax.numpy as jnp
    from ipdm_tpu.recon.geometry import (FanBeamGeometry, area_lut,
                                         default_betas)
    from ipdm_tpu.recon.phantom import shepp_logan
    from ipdm_tpu.recon.projector import forward_project

    root = str(tmp_path_factory.mktemp("prog_data"))
    g = FanBeamGeometry(**GEO_TINY)
    lut = jnp.asarray(area_lut(g))
    betas = jnp.asarray(default_betas(g))
    rng = np.random.default_rng(0)
    for i in range(2):
        ph = np.asarray(shepp_logan(32), np.float32) * 0.03 * (1 + 0.1 * i)
        proj = np.asarray(forward_project(jnp.asarray(ph), g, lut, betas))
        ld_proj = proj + rng.normal(0, 0.02 * proj.max(),
                                    proj.shape).astype(np.float32)
        for kind, arr in (("fd_img", ph.T), ("ld_img", ph.T),
                          ("fd_proj", proj), ("ld_proj", ld_proj)):
            d = os.path.join(root, kind, "L001")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"{i:03d}.npy"), arr)
    return root


def _prog_opt(root, mode, **kw):
    opt = IPDMConfig(
        mode=mode, run_name="p", batch_size=1, test_batch_size=1,
        max_epochs=2, save_freq=2, test_numbers=1, init_lr=1e-3,
        convertor="FBP", fbp_sharpen=True, ultra_img_denoise=False,
        model_channels_img=8, channel_mult_img=[1, 1, 2],
        attention_resolutions_img=[4], timesteps_img=50,
        partial_timesteps_img=10, t_start_img=[3, 2],
        constant_guidance_img=0.45,
        model_channels_proj=8, channel_mult_proj=[1, 1, 2],
        attention_resolutions_proj=[4], timesteps_proj=50,
        partial_timesteps_proj=10, t_start_proj=[3, 2],
        constant_guidance_proj=0.5, sart_nstart=2, sart_subsets=6,
        metrics=["psnr", "ssim"], geometry=GEO_TINY,
        patch=[16, 16], patch_per_image=2,
        train_dataset_path_LD_proj=os.path.join(root, "ld_proj"),
        train_dataset_path_FD_proj=os.path.join(root, "fd_proj"),
        test_dataset_path_LD_img=os.path.join(root, "ld_img"),
        test_dataset_path_FD_img=os.path.join(root, "fd_img"),
        test_dataset_path_LD_proj=os.path.join(root, "ld_proj"),
        test_dataset_path_FD_proj=os.path.join(root, "fd_proj"),
    )
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


@pytest.mark.slow
def test_train_proj_end_to_end(prog_root, tmp_path):
    """train_proj: sinogram-domain DDPM training loop + checkpoints
    (reference train_test_utils.py:253-272 with mode=train_proj)."""
    opt = _prog_opt(prog_root, "train_proj", test_numbers=0)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    assert int(eng.train_state.step) == opt.max_iter
    assert eng.ckpt.load("proj_model", 1) is not None
    assert eng.ckpt.load("optimizer", 1) is not None


@pytest.mark.slow
def test_test_proj_end_to_end(prog_root, tmp_path):
    """test_proj: proj-domain denoise + batched per-iteration convert →
    deProj + deProj2img metric groups (train_test_utils.py:301-306)."""
    opt = _prog_opt(prog_root, "test_proj")
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    metrics = glob.glob(os.path.join(
        eng.save_root_path, "Save_Iter_0", "L001", "*", "metric.json"))
    assert len(metrics) == 1
    with open(metrics[0]) as f:
        mi = json.load(f)
    # per-iteration converted-image metrics (2 t_start iters + ensemble)
    assert {"psnr_iter_1", "psnr_iter_2", "psnr_iter_3"} <= \
        set(mi["deProj2img"])
    assert all(np.isfinite(v) for v in mi["deProj2img"].values())


@pytest.mark.slow
@pytest.mark.parametrize("convertor", ["FBP", "ART"])
def test_test_prog_end_to_end(prog_root, tmp_path, convertor):
    """test_prog: the flagship progressive pipeline (proj stage → convert →
    sharpen → img stage → ultra pass) with both convertors."""
    opt = _prog_opt(prog_root, "test_prog", convertor=convertor,
                    ultra_img_denoise=True, save_it_state_img=True)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    metrics = glob.glob(os.path.join(
        eng.save_root_path, "Save_Iter_0", "L001", "*", "metric.json"))
    with open(metrics[0]) as f:
        mi = json.load(f)
    assert "psnr_iter_1" in mi["deProj"]
    # save_it_state_img=True keeps every iteration: 3 (2 t_start + ensemble)
    # + 4 from the ultra pass (3 + ensemble) = 7
    assert "psnr_iter_7" in mi["deProg"], sorted(mi["deProg"])
    assert all(np.isfinite(v) for v in mi["deProg"].values())


@pytest.mark.slow
def test_test_prog_sharded_mesh_matches_unsharded(prog_root, tmp_path):
    """test_prog under a [4,2] device mesh: params replicate, the sample
    inputs' H axis shards over all 8 virtual devices so every UNet eval
    inside the guided scans runs spatially partitioned (XLA SPMD inserts
    the conv halo exchanges / GN psums); converts run replicated. Metrics
    must match the unsharded run within the golden-fixture tolerances
    (the only differences are f32 reduction reorderings)."""
    def run(save, **kw):
        opt = _prog_opt(prog_root, "test_prog", convertor="ART",
                        ultra_img_denoise=True, **kw)
        eng = ProgressiveDomainDenoiser(opt, result_save_path=save)
        eng.fit()
        mfile = glob.glob(os.path.join(
            eng.save_root_path, "Save_Iter_0", "L001", "*", "metric.json"))[0]
        with open(mfile) as f:
            return json.load(f)

    m0 = run(str(tmp_path / "a"))
    m1 = run(str(tmp_path / "b"), mesh_shape=[4, 2])
    for grp in ("deProj", "deProg"):
        for key, val in m0[grp].items():
            if not np.isfinite(val):
                continue
            tol = 0.05 if "psnr" in key else 1e-3
            assert m1[grp][key] == pytest.approx(val, abs=tol), (
                f"{grp}.{key}: sharded {m1[grp][key]:.6f} vs {val:.6f}")


@pytest.mark.slow
def test_prog_adaptive_and_proj_state(prog_root, tmp_path):
    """Adaptive proj schedule (t_start_proj=None & constant=None classifies
    noise strength, model.py:596-613) + save_proj_state stores raw proj
    iterations (train_test_utils.py:431-444)."""
    opt = _prog_opt(prog_root, "test_prog", t_start_proj=None,
                    constant_guidance_proj=None)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    # manual drive (test() would re-run the whole harness)
    ld_img, fd_proj, fd_img, ld_proj = eng.test_dataset[0]
    eng.data_sample_load(ldct=ld_img[None], ldproj=ld_proj[None],
                         fdproj=fd_proj, fdct=fd_img[None])
    res = eng.progressive_denoiser(save_proj_state=True)
    assert eng.noise_strength in ("high", "mid", "low")
    assert res.shape[1:3] == (32, 32)
    assert "iter_1" in eng.proj_denoise_result


@pytest.mark.slow
def test_prog_sparse_ddim_end_to_end(prog_root, tmp_path):
    """Sparse (DDIM) sampling in BOTH domains through the engine — the
    reference notebook cell-3 path (sample_method_*="sparse" →
    sparse_guided_reverse_process, train_test_utils.py:445-453,505-514)."""
    opt = _prog_opt(prog_root, "test_prog",
                    sample_method_proj="sparse", ddim_timesteps_proj=[1, 2],
                    sample_method_img="sparse", ddim_timesteps_img=[1, 2])
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    ld_img, fd_proj, fd_img, ld_proj = eng.test_dataset[0]
    eng.data_sample_load(ldct=ld_img[None], ldproj=ld_proj[None],
                         fdproj=fd_proj, fdct=fd_img[None])
    res = eng.progressive_denoiser()
    assert res.shape[1:3] == (32, 32)
    assert np.all(np.isfinite(np.asarray(res)))
    # both stages stored per-iteration results (2 t_start iters + ensemble)
    assert "iter_1" in eng.proj_denoise_convert2img_result
    assert "iter_1" in eng.progressive_denoise_result


@pytest.mark.slow
def test_resume_restores_optimizer_state(tmp_path):
    """Resume must restore params INTO the train state plus the optimizer
    state and step (reference loggerx.py:71-80 restores every registered
    module incl. 'optimizer'; a resume that restarts Adam moments silently
    diverges from the reference)."""
    import jax

    opt = _tiny_img_opt(tmp_path, "train_img", test_numbers=0)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    assert eng.ckpt.load("optimizer", 1) is not None

    opt2 = _tiny_img_opt(tmp_path, "train_img", test_numbers=0,
                         resume_epochs_img=1,
                         load_img_model_path=eng.logger.models_save_dir)
    eng2 = ProgressiveDomainDenoiser(opt2,
                                     result_save_path=str(tmp_path / "o2"))
    # restored params are synced into the train state (not a fresh init)
    for a, b in zip(jax.tree_util.tree_leaves(eng2.train_state.params),
                    jax.tree_util.tree_leaves(eng2.img_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    saved_m = eng.ckpt.load("img_model", 1, target=eng.img_params)
    for a, b in zip(jax.tree_util.tree_leaves(eng2.train_state.params),
                    jax.tree_util.tree_leaves(saved_m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam moments survive the restart bit-exactly, and are real (nonzero)
    saved_o = eng.ckpt.load("optimizer", 1, target=eng.train_state.opt_state)
    got = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(eng2.train_state.opt_state)]
    want = [np.asarray(x) for x in jax.tree_util.tree_leaves(saved_o)]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    assert any(np.abs(l).max() > 0 for l in got if l.ndim > 0)
    # step resumes at resume_epochs·save_freq/batch (train_test_utils.py:362)
    assert int(eng2.train_state.step) == 1


def test_dict_aggregation_mean_std():
    samples = [DotDict(m=DotDict(psnr_iter_1=float(v))) for v in (1, 2, 3)]
    d = DotDict()
    mean = DotDict()
    for s in samples:
        dict_add(mean, s, d)
    dict_mean(mean, d)
    d2 = DotDict()
    for s in samples:
        dict_value_minus_mean_square(s, mean, d2)
    dict_std(mean, d2)
    assert mean["m"]["psnr_iter_1"] == pytest.approx(2.0)
    # population std (÷N) of [1,2,3]
    assert mean["m"]["psnr_iter_1_std"] == pytest.approx(np.sqrt(2 / 3))


def test_result_temp_dict_indexing():
    r = ResultTempDict()
    r["iter_1"] = "a"
    r["iter_2"] = "b"
    assert r[1] == "a" and r[2] == "b" and r[-1] == "b"


@pytest.mark.slow
def test_figure_save_writes_pngs(tmp_path):
    """display_result path: annotated PNG grids land in the artifact dir
    (reference figure modes, train_test_utils.py:596-763)."""
    opt = _tiny_img_opt(tmp_path, "test_img", display_result=True,
                        test_result_data_save=True)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    pngs = glob.glob(os.path.join(eng.save_root_path, "Save_Iter_0",
                                  "L001", "*", "deImg.png"))
    assert len(pngs) == 1 and os.path.getsize(pngs[0]) > 1000
    npzs = glob.glob(os.path.join(eng.save_root_path, "Save_Iter_0",
                                  "L001", "*", "img_denoise_result.npz"))
    assert len(npzs) == 1
    arrs = np.load(npzs[0])
    assert arrs["iter_1"].shape[1] == 1  # NCHW artifact layout


@pytest.mark.slow
def test_yeo_johnson_mode_end_to_end(tmp_path):
    """opt.normal: inputs Gaussianised before the sampler, results
    inverse-transformed (reference model.py:762-807 path)."""
    opt = _tiny_img_opt(tmp_path, "test_img", normal=True)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    metrics = glob.glob(os.path.join(
        eng.save_root_path, "Save_Iter_0", "L001", "*", "metric.json"))
    with open(metrics[0]) as f:
        mi = json.load(f)
    assert np.isfinite(mi["deImg"]["psnr_iter_1"])


@pytest.mark.slow
def test_benchmark_test_mode_scores_convertor_only(tmp_path):
    """benchmark_test short-circuits the diffusion (reference
    model.py:521-523): deImg metrics equal the LDCT input's."""
    opt = _tiny_img_opt(tmp_path, "test_img", benchmark_test=True)
    eng = ProgressiveDomainDenoiser(opt, result_save_path=str(tmp_path / "o"))
    eng.fit()
    metrics = glob.glob(os.path.join(
        eng.save_root_path, "Save_Iter_0", "L001", "*", "metric.json"))
    with open(metrics[0]) as f:
        mi = json.load(f)
    assert mi["deImg"]["psnr_iter_1"] == pytest.approx(
        mi["LDCT"]["psnr_iter_0"], abs=1e-6)
