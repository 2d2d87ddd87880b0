"""geomloss_tpu — Geometric loss functions between sampled measures, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the GeomLoss library
(reference: jeanfeydy/geomloss): debiased Sinkhorn divergences, kernel
(MMD) norms, Hausdorff divergences, grid Sinkhorn on images/volumes and
Wasserstein barycenters — with streaming TPU kernels in place of KeOps
CUDA routines, static-shape annealing loops, envelope-theorem gradients,
and a POT-compatible ``ot.solve`` result API.

Top-level exports mirror the reference (``src/geomloss/__init__.py:3-9``).
"""

__version__ = "0.3.1"

from .models.samples_loss import SamplesLoss


def __getattr__(name):
    # Lazy imports keep the base import light and avoid cycles:
    if name == "ImagesBarycenter":
        from .models.barycenter_images import ImagesBarycenter

        return ImagesBarycenter
    if name == "sinkhorn_divergence":
        from .models.sinkhorn_images import sinkhorn_divergence

        return sinkhorn_divergence
    if name == "ImagesLoss":
        from .models.sinkhorn_images import ImagesLoss

        return ImagesLoss
    if name == "VolumesLoss":
        from .models.sinkhorn_images import VolumesLoss

        return VolumesLoss
    if name == "ot":
        import importlib

        return importlib.import_module("geomloss_tpu.ot")
    raise AttributeError(f"module 'geomloss_tpu' has no attribute {name!r}")


__all__ = [
    "SamplesLoss",
    "ImagesBarycenter",
    "sinkhorn_divergence",
    "ImagesLoss",
    "VolumesLoss",
    "ot",
    "__version__",
]
