"""Entry point (reference main.py:3-6): build config, run the denoiser.

    python main.py --load_option_path Config/Mayo-Config/train_img_option.json
"""

from ipdm_tpu.config.config import default_cfg
from ipdm_tpu.engine.denoiser import progressive_domain_denoiser

if __name__ == "__main__":
    from ipdm_tpu.utils.comp_cache import enable_persistent_cache
    enable_persistent_cache()
    opt = default_cfg()
    model = progressive_domain_denoiser(opt)
    model.fit()
