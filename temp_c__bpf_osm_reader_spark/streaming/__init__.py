"""Structured Streaming analogues (the reference is batch-only — SURVEY §2.4)."""
