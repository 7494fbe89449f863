from .atlas_losses import (
    safe_norm, rgb_loss, gradient_loss, rigidity_loss, flow_loss,
    sparsity_loss, alpha_bootstrap_loss, alpha_flow_loss, masked_mean,
)

__all__ = [
    "safe_norm", "rgb_loss", "gradient_loss", "rigidity_loss", "flow_loss",
    "sparsity_loss", "alpha_bootstrap_loss", "alpha_flow_loss", "masked_mean",
]
