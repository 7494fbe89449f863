from .imlp import IMLPSpec, imlp_init, imlp_apply, positional_encoding

__all__ = ["IMLPSpec", "imlp_init", "imlp_apply", "positional_encoding"]
