"""Config system: reference JSON presets load unmodified; CLI wins over JSON;
merge warns (not fails) on unknown keys; snapshot/restore works."""

import json
import os

from ipdm_tpu.config import IPDMConfig, cfg_load, default_cfg

REF_CFG_DIR = "/root/reference/Config/Mayo-Config"


def test_defaults_match_reference_flags():
    opt = IPDMConfig()
    assert opt.save_freq == 10000
    assert opt.channel_mult_proj == [1 / 64, 2 / 64, 4 / 64, 2, 2, 4, 4]
    assert opt.metrics == ["psnr", "ssim", "fsim", "vif", "nqm"]
    assert opt.t_start_img is None
    assert opt.partial_timesteps_img == 50


def test_reference_presets_load():
    for name in ("test_progressive_option.json", "train_img_option.json",
                 "train_proj_option.json"):
        path = os.path.join(REF_CFG_DIR, name)
        if not os.path.exists(path):
            continue
        opt = IPDMConfig()
        with open(path) as f:
            opt.merge(json.load(f))
        assert opt.data_type == "mayo"
        if name == "test_progressive_option.json":
            assert opt.mode == "test_prog"
            assert opt.convertor == "ART"
            assert opt.t_start_img == [15, 15, 15]
            assert opt.constant_guidance_img == 0.45
            assert opt.channel_mult_proj == [0.0625, 0.125, 0.25, 2, 2, 4, 4]
            assert opt.schedule_power_proj == 5


def test_cli_wins_over_json(tmp_path):
    preset = {"init_lr": 0.001, "batch_size": 16}
    p = tmp_path / "opt.json"
    p.write_text(json.dumps(preset))
    opt = default_cfg(["--load_option_path", str(p), "--batch_size", "2"])
    assert opt.batch_size == 2  # CLI wins
    assert opt.init_lr == 0.001  # JSON overrides default


def test_unknown_key_warns_not_fails(capsys):
    opt = IPDMConfig()
    opt.merge({"not_a_key": 1})
    assert "not_a_key" in capsys.readouterr().out


def test_copy_restore():
    opt = IPDMConfig()
    snap = opt.copy()
    opt.merge({"eta_img": 0.9})
    assert opt.eta_img == 0.9 and snap.eta_img == 0.5


def test_reference_presets_load(tmp_path):
    """The three shipped Mayo presets load through the JSON overlay with
    no unknown-key failures and the expected headline values."""
    import json
    import os.path as osp
    from ipdm_tpu.config.config import IPDMConfig, load_option
    root = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "Config", "Mayo-Config")
    for name, checks in (
            ("train_img_option.json",
             dict(mode="train_img", partial_timesteps_img=50)),
            ("train_proj_option.json",
             dict(mode="train_proj", partial_timesteps_proj=50)),
            ("test_progressive_option.json",
             dict(mode="test_prog", convertor="ART",
                  t_start_img=[15, 15, 15], constant_guidance_img=0.45,
                  eta_img=0.7, fbp_sharpen=True))):
        opt = IPDMConfig()
        load_option(opt, osp.join(root, name), exception=[])
        for k, v in checks.items():
            assert getattr(opt, k) == v, (name, k, getattr(opt, k))
        assert opt.metrics == ["psnr", "ssim", "fsim", "vif", "nqm"]
