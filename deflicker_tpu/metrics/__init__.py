from .psnr import psnr
from .ewarp import warp_error, occlusion_mask

__all__ = ["psnr", "warp_error", "occlusion_mask"]
