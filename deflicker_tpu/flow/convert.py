"""torch RAFT checkpoint -> flax variables conversion.

Maps the reference's `raft-things.pth` state dict (keys like
`module.fnet.layer1.0.conv1.weight` — the `module.` prefix comes from the
DataParallel shell, reference: src/models/stage_1/raft_wrapper.py:22-25)
onto the deflicker_tpu.models.raft module tree:

  torch                         flax
  -----                         ----
  <m>.weight (4D conv OIHW)  -> params/<m>/kernel (HWIO)
  <m>.bias   (conv)          -> params/<m>/bias
  norm*.weight/bias (BN)     -> params/<m>/bn/{scale,bias}
  norm*.running_{mean,var}   -> batch_stats/<m>/bn/{mean,var}
  layerN.M                   -> layerN_M
  downsample.0 / .1          -> downsample_conv / norm3
  mask.0 / mask.2            -> mask_0 / mask_2

Instance norms carry no parameters in either framework.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping

import numpy as np


def _set(tree: Dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _module_path(parts) -> list:
    merged = []
    for p in parts:
        if p.isdigit():
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    fixups = {"downsample_0": "downsample_conv", "downsample_1": "norm3"}
    return [fixups.get(m, m) for m in merged]


def convert_raft_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """torch state dict (tensors or ndarrays) -> {'params', 'batch_stats'}."""
    params: Dict = {}
    batch_stats: Dict = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        path = _module_path(parts[:-1])
        v = np.asarray(getattr(val, "numpy", lambda: val)())

        is_norm = path[-1].startswith("norm")
        if is_norm:
            if leaf == "weight":
                _set(params, path + ["bn", "scale"], v)
            elif leaf == "bias":
                _set(params, path + ["bn", "bias"], v)
            elif leaf == "running_mean":
                _set(batch_stats, path + ["bn", "mean"], v)
            elif leaf == "running_var":
                _set(batch_stats, path + ["bn", "var"], v)
            else:
                raise KeyError(f"unexpected norm leaf: {key}")
        elif leaf == "weight":
            if v.ndim != 4:
                raise ValueError(f"expected 4D conv weight at {key}, got {v.shape}")
            _set(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _set(params, path + ["bias"], v)
        else:
            raise KeyError(f"unexpected leaf: {key}")
    return {"params": params, "batch_stats": batch_stats}


def load_raft_checkpoint(path: str | Path) -> Dict:
    """Load RAFT weights from a torch .pth (converted on the fly) or from a
    pre-converted pickled-variables file (utils.checkpoint format)."""
    path = Path(path)
    if path.suffix in (".pth", ".pt"):
        import torch  # noqa: PLC0415 — host-side conversion only

        sd = torch.load(str(path), map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return convert_raft_state_dict(sd)
    from ..utils.checkpoint import load_checkpoint  # noqa: PLC0415

    return load_checkpoint(path)
