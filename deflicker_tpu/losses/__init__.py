from .atlas_losses import (
    rgb_loss, gradient_loss, rigidity_loss, flow_loss,
    sparsity_loss, alpha_bootstrap_loss, alpha_flow_loss, masked_mean,
)

__all__ = [
    "rgb_loss", "gradient_loss", "rigidity_loss", "flow_loss",
    "sparsity_loss", "alpha_bootstrap_loss", "alpha_flow_loss", "masked_mean",
]
