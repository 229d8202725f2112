"""Verify drive: full progressive dual-domain pipeline on small geometry.

The /verify skill's end-to-end recipe (see .claude/skills/verify/SKILL.md):
synthesises a tiny scanner + phantom, runs mode=test_prog with the FBP
convertor (dense constant-guidance), then the adaptive+ART path. Run with:
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/verify_drive.py
"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import os.path as _osp, sys as _sys
_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))
import numpy as np

from ipdm_tpu.config.config import IPDMConfig
from ipdm_tpu.engine.denoiser import ProgressiveDomainDenoiser
from ipdm_tpu.recon.geometry import FanBeamGeometry, area_lut, default_betas
from ipdm_tpu.recon.phantom import shepp_logan
from ipdm_tpu.recon.projector import forward_project

root = "/tmp/drive_data"
GEO = dict(nx=64, ny=64, dx=42 / 64, dy=42 / 64, nr=128,
           dr=0.0010125 * 912 / 128, na=180, ta_dimx=401, ta_dimy=91)
g = FanBeamGeometry(**GEO)

# synthetic dataset: one phantom slice, four streams
import jax.numpy as jnp
lut = jnp.asarray(area_lut(g))
betas = jnp.asarray(default_betas(g))
ph = np.asarray(shepp_logan(64), np.float32) * 0.03
proj = np.asarray(forward_project(jnp.asarray(ph), g, lut, betas))
rng = np.random.default_rng(0)
ld_proj = proj + rng.normal(0, 0.02 * proj.max(), proj.shape).astype(np.float32)
for kind, arr in (("fd_img", ph.T), ("ld_img", ph.T), ("fd_proj", proj),
                  ("ld_proj", ld_proj)):
    d = os.path.join(root, kind, "L001")
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, "000.npy"), arr)

opt = IPDMConfig(
    mode="test_prog", run_name="drive", test_numbers=1,
    convertor="FBP", fbp_sharpen=True, ultra_img_denoise=True,
    model_channels_img=8, channel_mult_img=[1, 1, 2],
    attention_resolutions_img=[4], timesteps_img=50,
    t_start_img=[3, 2], constant_guidance_img=0.45,
    model_channels_proj=8, channel_mult_proj=[1, 1, 2],
    attention_resolutions_proj=[4], timesteps_proj=50,
    t_start_proj=[3, 2], constant_guidance_proj=0.5,
    metrics=["psnr", "ssim", "nqm"], geometry=GEO,
    test_dataset_path_LD_img=os.path.join(root, "ld_img"),
    test_dataset_path_FD_img=os.path.join(root, "fd_img"),
    test_dataset_path_LD_proj=os.path.join(root, "ld_proj"),
    test_dataset_path_FD_proj=os.path.join(root, "fd_proj"),
)
eng = ProgressiveDomainDenoiser(opt, result_save_path="/tmp/drive_out")
eng.fit()
import json, glob
mfile = glob.glob(os.path.join(eng.save_root_path,
                               "Save_Iter_0/L001/*/metric.json"))[0]
m = json.load(open(mfile))
print("LDCT:", m["LDCT"])
print("deProj:", m["deProj"])
print("deProg keys:", sorted(m["deProg"]))
assert "psnr_iter_1" in m["deProj"], "proj→img stage metrics missing"
assert len(m["deProg"]) > 0, "progressive metrics missing"
print("E2E PROGRESSIVE DRIVE OK")

# adaptive-λ path (t_start=None) + ART convertor, one quick pass
eng.update_opt({"convertor": "ART", "t_start_proj": None,
                "constant_guidance_proj": None, "sart_nstart": 2,
                "sart_subsets": 18})
eng.init_convertor("ART")
eng.temp_clear()
res = eng.progressive_denoiser()
print("adaptive+ART progressive OK, noise class:", eng.noise_strength,
      "out shape:", res.shape)
