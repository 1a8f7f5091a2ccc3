"""Scalar helpers shared across operators and plans."""
