"""Run logging: stdout metric lines, JSONL scalar stream, option snapshots.

Equivalent of the reference LoggerX (Utils/loggerx.py:25-120) minus the
stack-inspection variable-name magic (callers pass names explicitly) and with
a JSONL scalar stream replacing the hard TensorBoard dependency (a TensorBoard
writer attaches automatically when torch is importable, mirroring the
reference's SummaryWriter usage, train_test_utils.py:138,339).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Dict


class ScalarWriter:
    """JSONL scalar stream + optional TensorBoard twin."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(osp.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(global_step),
                                  "time": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step)

    def add_scalars(self, tag: str, values: Dict[str, float],
                    global_step: int) -> None:
        for k, v in values.items():
            self.add_scalar(f"{tag}/{k}", v, global_step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class LoggerX:
    def __init__(self, save_root: str, opt=None, rank: int = 0):
        self.models_save_dir = osp.join(save_root, "save_models")
        os.makedirs(self.models_save_dir, exist_ok=True)
        self.rank = rank
        self.save_root = save_root

    def save_option(self, opt) -> None:
        """Dump the full config (loggerx.py:82-86)."""
        d = opt.to_dict() if hasattr(opt, "to_dict") else dict(opt.__dict__)
        with open(osp.join(self.models_save_dir, "option.json"), "w") as f:
            json.dump(d, f, sort_keys=False, indent=4, separators=(",", ": "))

    def msg(self, stats: Dict[str, float], step: int) -> None:
        """Stdout metric line (loggerx.py:90-108); rank-0 only."""
        if self.rank != 0:
            return
        out = "[{}] {:05d}, ".format(
            time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()), step)
        for name, var in stats.items():
            out += "{} {:2.5f}, ".format(name, float(var))
        print(out)
