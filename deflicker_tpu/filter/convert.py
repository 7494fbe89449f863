"""torch stage-2 checkpoints (neural_filter.pth / local_refinement_net.pth)
-> flax variables for deflicker_tpu.models.{unet,refine}.

Key mapping is mechanical because the flax modules mirror the torch module
names: digits merge into their parent (`ResBlocks.0` -> `ResBlocks_0`,
`upconv4.1` -> `upconv4_1`), conv weights transpose OIHW -> HWIO.  The
TransformNet checkpoint's InstanceNorm running-stat keys are dropped — those
layers are never applied by the reference at inference
(network_local.py:136 quirk; see models/refine.py docstring).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping

import numpy as np

from ..flow.convert import _module_path, _set


def convert_conv_state_dict(state_dict: Mapping, skip_substr=("norm_layer",)
                            ) -> Dict:
    """Generic converter for conv-only torch nets (UNet, TransformNet)."""
    params: Dict = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if any(s in key for s in skip_substr):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        path = _module_path(parts[:-1])
        v = np.asarray(getattr(val, "numpy", lambda: val)())
        if leaf == "weight":
            if v.ndim != 4:
                raise ValueError(f"expected conv weight at {key}: {v.shape}")
            _set(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _set(params, path + ["bias"], v)
        else:
            raise KeyError(f"unexpected leaf: {key}")
    return {"params": params}


def load_stage2_checkpoint(path: str | Path) -> Dict:
    """Load UNet/TransformNet weights from torch .pth (converted on the fly)
    or a pre-converted pickled-variables file."""
    path = Path(path)
    if path.suffix in (".pth", ".pt"):
        import torch  # noqa: PLC0415 — host-side conversion only

        sd = torch.load(str(path), map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return convert_conv_state_dict(sd)
    from ..utils.checkpoint import load_checkpoint  # noqa: PLC0415

    return load_checkpoint(path)
