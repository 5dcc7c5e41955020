"""Window aggregation queries (SURVEY.md §2.4 group windows, §2.5 OVER). Filled in incrementally."""

from __future__ import annotations
