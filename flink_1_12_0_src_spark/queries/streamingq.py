"""Structured Streaming queries driven to completion (SURVEY.md §2.8). Filled in incrementally."""

from __future__ import annotations
