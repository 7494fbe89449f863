from .providers import (CarvekitMasks, GrabCutMasks, MaskRCNNMasks,
                        PrecomputedMasks, get_mask_provider, preprocess_masks)

__all__ = [
    "CarvekitMasks", "GrabCutMasks", "MaskRCNNMasks", "PrecomputedMasks",
    "get_mask_provider", "preprocess_masks",
]
