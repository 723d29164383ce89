"""Structured Streaming surface (SURVEY §2.10 ST1–ST5)."""
