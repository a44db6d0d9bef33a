"""Utility layer: batched linear-algebra drivers and compatibility helpers."""
