"""Checkpoint save/load for param/optimizer pytrees.

Same role as the reference's torch.save checkpoint dict
(reference: src/models/stage_1/evaluate.py:616-622 — models + optimizer +
iteration in one file, loaded at src/stage1_neural_atlas.py:141-146), but
serialized as a pickled numpy pytree so it is framework-neutral and safe to
load without a live accelerator.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import numpy as np

import jax


def to_host(tree: Any) -> Any:
    """Device pytree -> numpy pytree (leaves materialized on host).

    np.array(copy=True), NOT np.asarray: on the CPU backend np.asarray of a
    jax.Array is ZERO-COPY (a view of the device buffer), and checkpoints
    taken mid-fit alias buffers the next donated step call reuses — the
    "checkpoint" then silently fills with garbage.  An owned copy is
    mandatory for correctness on CPU and free on TPU (D2H already copies).
    """
    return jax.tree_util.tree_map(lambda x: np.array(x, copy=True), tree)


def save_checkpoint(path: str | Path, tree: Any) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(to_host(tree), f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)        # atomic on POSIX: a crash never corrupts the ckpt
    return path


def load_checkpoint(path: str | Path) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
