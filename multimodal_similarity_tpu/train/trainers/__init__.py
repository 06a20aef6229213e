"""Experiment entrypoints, one module per reference trainer (SURVEY.md §2.5)."""
