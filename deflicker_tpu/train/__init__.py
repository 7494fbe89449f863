"""In-framework stage-2 training (synthetic data; no pretrained blobs).

The reference's stage-2 networks exist only as unavailable pretrained
downloads; `deflicker_tpu.train` regenerates them from scratch — see
`synth` (procedural clips) and `stage2_trainer` (UNet + TransformNet
training loops).
"""

from .stage2_trainer import (TrainConfig, train_filter, train_refiner,
                             train_stage2)
from .synth import Clip, make_clip, warp_valid_mask

__all__ = ["TrainConfig", "train_filter", "train_refiner", "train_stage2",
           "Clip", "make_clip", "warp_valid_mask"]
