"""Bundle adjustment: Schur-complement LM over sliding windows."""
from .schur import (
    BAProblem,
    BAResult,
    build_normal_equations,
    bundle_adjust,
    reproject_residuals,
    solve_schur,
)

__all__ = [
    "BAProblem",
    "BAResult",
    "bundle_adjust",
    "build_normal_equations",
    "solve_schur",
    "reproject_residuals",
]
