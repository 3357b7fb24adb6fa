"""Keyframe and map-point management."""
from .keyframes import Keyframe, KeyframeDecision, KeyframeStore, MapPoints

__all__ = ["Keyframe", "KeyframeStore", "KeyframeDecision", "MapPoints"]
