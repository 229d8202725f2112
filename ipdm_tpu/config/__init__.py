from ipdm_tpu.config.config import IPDMConfig, cfg_load, default_cfg, load_option

__all__ = ["IPDMConfig", "cfg_load", "default_cfg", "load_option"]
