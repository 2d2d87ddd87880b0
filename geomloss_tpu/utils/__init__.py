"""Shared utilities: typing, validation, caching."""

from .typing import CostMatrices, DescentParameters, SinkhornPotentials

__all__ = ["CostMatrices", "DescentParameters", "SinkhornPotentials"]
