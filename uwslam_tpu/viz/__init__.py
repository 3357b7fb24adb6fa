"""Host-side visualization export (ROS-free Visualizer replacement)."""
from .export import EventStream, trajectory_svg, write_ply, write_trajectory_html
from .server import VizServer

__all__ = [
    "write_ply",
    "trajectory_svg",
    "write_trajectory_html",
    "EventStream",
    "VizServer",
]
