"""Pallas TPU kernels for the hot ops."""
from .pallas_sample import pallas_bilinear_sample

__all__ = ["pallas_bilinear_sample"]
