"""User-facing loss models: SamplesLoss, grid losses, barycenters."""

from .samples_loss import SamplesLoss

__all__ = ["SamplesLoss"]
