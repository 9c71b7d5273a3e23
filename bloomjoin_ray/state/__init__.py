from .base import MergeableSketch, merge_all, pack_state, sketch_from_bytes, unpack_state
from .bloom import BloomSketch

__all__ = [
    "MergeableSketch",
    "merge_all",
    "pack_state",
    "unpack_state",
    "sketch_from_bytes",
    "BloomSketch",
]
