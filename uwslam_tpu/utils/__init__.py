"""Shared utilities: precision control, profiling, checkpointing."""
from .precision import HIGHEST, einsum, mm

__all__ = ["HIGHEST", "mm", "einsum"]
