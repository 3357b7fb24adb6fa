"""Bundle adjustment: Schur-complement LM over sliding windows, plus
SE(3)/Sim(3) pose-graph optimization."""
from .pose_graph import (
    PGOResult,
    PoseGraph,
    Sim3PoseGraph,
    add_loop_edge,
    odometry_edges,
    optimize_pose_graph,
    optimize_pose_graph_sim3,
)
from .photometric import (
    PhotoBAProblem,
    PhotoBAResult,
    photo_ba_problem_from_keyframes,
    photometric_bundle_adjust,
)
from .schur import (
    BAProblem,
    BAResult,
    build_normal_equations,
    bundle_adjust,
    reproject_residuals,
    solve_schur,
)

__all__ = [
    "PhotoBAProblem",
    "PhotoBAResult",
    "photometric_bundle_adjust",
    "photo_ba_problem_from_keyframes",
    "BAProblem",
    "BAResult",
    "bundle_adjust",
    "build_normal_equations",
    "solve_schur",
    "reproject_residuals",
    "PoseGraph",
    "Sim3PoseGraph",
    "PGOResult",
    "odometry_edges",
    "add_loop_edge",
    "optimize_pose_graph",
    "optimize_pose_graph_sim3",
]
