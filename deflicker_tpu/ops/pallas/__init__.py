from .imlp_kernel import fused_imlp_available, fused_imlp_linear_chain

__all__ = ["fused_imlp_available", "fused_imlp_linear_chain"]
