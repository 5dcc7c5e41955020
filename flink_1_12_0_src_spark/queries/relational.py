"""Operator-by-operator coverage queries (SURVEY.md §2.2–2.7). Filled in incrementally."""

from __future__ import annotations
