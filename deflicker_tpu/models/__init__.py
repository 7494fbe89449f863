from .imlp import IMLPSpec, imlp_init, imlp_apply, positional_encoding
from .raft import (RAFTModules, build_corr_pyramid, corr_lookup, raft_flow,
                   raft_init)
from .refine import TransformNet, transformnet_init
from .unet import UNet, unet_init

__all__ = [
    "IMLPSpec", "imlp_init", "imlp_apply", "positional_encoding",
    "RAFTModules", "build_corr_pyramid", "corr_lookup", "raft_flow",
    "raft_init", "TransformNet", "transformnet_init", "UNet", "unet_init",
]
