"""Multi-chip scale-out: device meshes and ring-softmin collectives."""
