from .data import VideoData, load_video_data
from .engine import (AtlasSpecs, FitResult, build_specs, fit_atlas,
                     init_models, make_loss_fn, pretrain_mapping)
from .render import evaluate_and_save, render_frame, render_frames

__all__ = [
    "VideoData", "load_video_data", "AtlasSpecs", "FitResult", "build_specs",
    "fit_atlas", "init_models", "make_loss_fn", "pretrain_mapping",
    "evaluate_and_save", "render_frame", "render_frames",
]
