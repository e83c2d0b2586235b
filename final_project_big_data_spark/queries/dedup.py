"""Placeholder — filled in by the LLM-pipeline extension task."""
