"""Placeholder — populated in the search batch."""
