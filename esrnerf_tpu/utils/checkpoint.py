"""Checkpoint save/load.

Keeps the reference's logical two-part schema (``fine.py:466-490``):
``{"renderer": {cfg, near, far, xyz_min, xyz_max, ..., params},
   "trainer": {global_step, sampler state, optimizer state}}``
serialized as a single pickled file of host numpy arrays. The stage-handoff
convention (find the previous stage's ``last.ckpt`` by class-name
substitution in the path, e.g. ``fine.py:126``) is implemented in
:func:`resolve_stage_ckpt`.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    def conv(x):
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x

    return jax.tree.map(conv, tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(payload), f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def resolve_stage_ckpt(
    ckpt_path: Optional[str], cur_cls: str, prev_cls: str
) -> Optional[str]:
    """Derive the previous stage's checkpoint path by class-name substitution
    (reference pattern: ``ckpt.replace("coarse.Coarse", "coarse.AlphaMask")``,
    e.g. ``coarse.py:115``, ``fine.py:126``)."""
    if ckpt_path is None:
        return None
    return ckpt_path.replace(cur_cls, prev_cls)
