from .convert import convert_raft_state_dict, load_raft_checkpoint
from .engine import (FarnebackFlow, RAFTFlow, load_flow_image,
                     preprocess_optical_flow)

__all__ = [
    "convert_raft_state_dict", "load_raft_checkpoint", "FarnebackFlow",
    "RAFTFlow", "load_flow_image", "preprocess_optical_flow",
]
