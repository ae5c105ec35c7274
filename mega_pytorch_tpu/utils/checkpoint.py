"""Checkpoint save/load with iteration resume.

Parity with mega_core/utils/checkpoint.py:14-151: periodic save of
model/optimizer/iteration, a ``last_checkpoint`` tag file for auto-resume,
and the ``ignore`` flag that drops optimizer state (the reference's
MODEL.VID.IGNORE, used when fine-tuning RDN/MEGA stage 2 from a stage-1
model). Torch/.pth ingestion lives in torch_ingest/model_ingest.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Checkpointer:
    def __init__(self, save_dir: str, logger=None):
        self.save_dir = save_dir
        self.logger = logger
        os.makedirs(save_dir, exist_ok=True)

    def _tag_file(self) -> str:
        return os.path.join(self.save_dir, "last_checkpoint")

    def save(self, name: str, params: Any, opt_state: Any = None, iteration: int = 0,
             **extra) -> str:
        path = os.path.join(self.save_dir, f"{name}.ckpt")
        payload = {
            "params": _to_host(params),
            "opt_state": _to_host(opt_state) if opt_state is not None else None,
            "iteration": iteration,
            **extra,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        with open(self._tag_file(), "w") as f:
            f.write(path)
        if self.logger:
            self.logger.info(f"Saved checkpoint to {path}")
        return path

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_file())

    def last_checkpoint(self) -> str | None:
        if not self.has_checkpoint():
            return None
        with open(self._tag_file()) as f:
            return f.read().strip()

    def load(self, path: str | None = None, ignore_optimizer: bool = False) -> dict:
        """Load `path`, or the tagged last checkpoint. Returns the payload
        dict ({} if nothing to load)."""
        path = path or self.last_checkpoint()
        if not path or not os.path.exists(path):
            return {}
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if ignore_optimizer:
            payload["opt_state"] = None
            payload["iteration"] = 0
        if self.logger:
            self.logger.info(f"Loaded checkpoint from {path}")
        return payload
