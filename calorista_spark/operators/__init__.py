"""Relational + LLM-pipeline operators (SURVEY §2.4–§2.11).

Everything here is a composition of built-in DataFrame ops — Catalyst
sees through all of it (pushdown, join strategy selection, AQE). The
only Python-executed code paths in the package are the clearly-marked
Pandas-UDF escape hatches in ``multimodal.py`` and ``udfs.py`` (L6).
"""
