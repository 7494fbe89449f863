from .convert import convert_conv_state_dict, load_stage2_checkpoint
from .engine import (FilterEngine, filter_frames, load_filter_engine,
                     refine_sequence, refine_span)

__all__ = [
    "convert_conv_state_dict", "load_stage2_checkpoint", "FilterEngine",
    "filter_frames", "load_filter_engine", "refine_sequence", "refine_span",
]
