"""Placeholder — populated in the llm_pipeline batch."""
