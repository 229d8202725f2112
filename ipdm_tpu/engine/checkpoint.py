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


def _migrate_gn(tree: Any) -> Any:
    """Flatten the pre-refactor `GN_*/GroupNorm_0/{scale,bias}` nesting to
    the current `GN_*/{scale,bias}` structure (GN was once implemented as a
    wrapper around nn.GroupNorm; old checkpoints carry the extra level)."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            v = _migrate_gn(v)
            if (isinstance(v, dict) and set(v) == {"GroupNorm_0"}
                    and isinstance(v["GroupNorm_0"], dict)):
                v = v["GroupNorm_0"]
            out[k] = v
        return out
    return tree


def _key_paths(tree: Any, prefix=()) -> set:
    if isinstance(tree, dict):
        out = set()
        for k, v in tree.items():
            out |= _key_paths(v, prefix + (k,))
        return out
    return {prefix}


def load_tree(path: str, target: Optional[Any] = None) -> Any:
    ckptr = _checkpointer()
    if target is not None:
        import orbax.checkpoint as ocp
        try:
            return ckptr.restore(os.path.abspath(path),
                                 restore_args=ocp.checkpoint_utils.
                                 construct_restore_args(target))
        except Exception:
            # Structure mismatch: restore raw, migrate known legacy
            # layouts, and fail loudly if it still doesn't line up (a
            # silent target-less fallback would only surface later as a
            # confusing missing-param error inside model.apply).
            raw = _migrate_gn(ckptr.restore(os.path.abspath(path)))
            want = _key_paths(_to_plain(target))
            got = _key_paths(_to_plain(raw))
            if want and got != want:
                missing = sorted("/".join(p) for p in want - got)[:5]
                extra = sorted("/".join(p) for p in got - want)[:5]
                raise ValueError(
                    f"checkpoint {path} does not match the target "
                    f"structure (after legacy-GN migration). missing="
                    f"{missing} extra={extra} — the checkpoint likely "
                    "predates a model refactor; re-save or convert it.")
            return raw
    return ckptr.restore(os.path.abspath(path))


def _to_plain(tree: Any) -> Any:
    """Unwrap FrozenDict-like containers to plain dicts for comparison."""
    if hasattr(tree, "items") and not isinstance(tree, dict):
        tree = dict(tree.items())
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


class CheckpointManager:
    """`save_models/{name}-{epoch}` layout (loggerx.py:62-80).

    Multi-host: Orbax's save IS the rank gate — it is a COLLECTIVE
    (every process must call it; internally only the shard owners write,
    so replicated params are written once by process 0). An explicit
    `if rank != 0: return` here deadlocks real multi-process runs on
    orbax's sync_global_processes barrier — found by
    scripts/multihost_dryrun.py; the reference's torch rank gating
    (loggerx.py) does not transfer to orbax."""

    def __init__(self, models_save_dir: str, rank: int = 0):
        self.dir = models_save_dir
        self.rank = rank
        os.makedirs(models_save_dir, exist_ok=True)

    def save(self, name: str, epoch: int, tree: Any) -> None:
        save_tree(osp.join(self.dir, f"{name}-{epoch}"), tree)

    def load(self, name: str, epoch: int, target: Optional[Any] = None,
             load_dir: Optional[str] = None) -> Optional[Any]:
        path = osp.join(load_dir or self.dir, f"{name}-{epoch}")
        if not osp.exists(path):
            return None
        return load_tree(path, target)
