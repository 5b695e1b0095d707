"""Structured Streaming extension (SURVEY.md §7 phase 4/5).

The reference is 100% batch (SURVEY.md §2 F note); streams are the
engine's extension target driven by the `events` test table.
"""
