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


def test_train_img_end_to_end(tmp_path):
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
