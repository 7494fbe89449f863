from .sampling import bilinear_sample, flow_warp
from .coords import coords_grid, normalize_xyt
from .consistency import compute_consistency, consistency_masks, resize_flow
from .pad import Padder
from .convex_upsample import convex_upsample_flow, upflow8

__all__ = [
    "bilinear_sample", "flow_warp", "coords_grid", "normalize_xyt",
    "compute_consistency", "consistency_masks", "resize_flow", "Padder",
    "convex_upsample_flow", "upflow8",
]
