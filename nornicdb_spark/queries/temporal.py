"""Placeholder — populated in the temporal batch."""
