"""Checkpoint save/load — Orbax-backed.

Replaces torch.save/load of per-module state_dicts (reference LoggerX
.checkpoints/.load_checkpoints, Utils/loggerx.py:62-80) with Orbax pytree
checkpoints under the same `save_models/{name}-{epoch}` layout, so resume
semantics (resume_epochs_{img,proj} → checkpoint id) carry over unchanged.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_tree(path: str, tree: Any) -> None:
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def load_tree(path: str, target: Optional[Any] = None) -> Any:
    ckptr = _checkpointer()
    if target is not None:
        import orbax.checkpoint as ocp
        try:
            return ckptr.restore(os.path.abspath(path),
                                 restore_args=ocp.checkpoint_utils.
                                 construct_restore_args(target))
        except Exception:
            pass
    return ckptr.restore(os.path.abspath(path))


class CheckpointManager:
    """`save_models/{name}-{epoch}` layout (loggerx.py:62-80)."""

    def __init__(self, models_save_dir: str, rank: int = 0):
        self.dir = models_save_dir
        self.rank = rank
        os.makedirs(models_save_dir, exist_ok=True)

    def save(self, name: str, epoch: int, tree: Any) -> None:
        if self.rank != 0:
            return
        save_tree(osp.join(self.dir, f"{name}-{epoch}"), tree)

    def load(self, name: str, epoch: int, target: Optional[Any] = None,
             load_dir: Optional[str] = None) -> Optional[Any]:
        path = osp.join(load_dir or self.dir, f"{name}-{epoch}")
        if not osp.exists(path):
            return None
        return load_tree(path, target)
