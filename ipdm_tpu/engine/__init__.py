"""Engine layer: trainer, orchestrator, checkpointing, logging."""

from ipdm_tpu.engine.checkpoint import CheckpointManager
from ipdm_tpu.engine.denoiser import (ProgressiveDomainDenoiser,
                                      progressive_domain_denoiser)
from ipdm_tpu.engine.logging import LoggerX, ScalarWriter
from ipdm_tpu.engine.trainer import (TrainState, init_train_state,
                                     make_optimizer, make_train_step)

__all__ = ["ProgressiveDomainDenoiser", "progressive_domain_denoiser",
           "CheckpointManager", "LoggerX", "ScalarWriter", "TrainState",
           "init_train_state", "make_optimizer", "make_train_step"]
