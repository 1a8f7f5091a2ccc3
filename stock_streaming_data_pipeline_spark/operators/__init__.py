"""Reusable DataFrame operators (the engine's operator library)."""
