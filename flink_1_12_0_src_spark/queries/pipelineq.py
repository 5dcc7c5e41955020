"""LLM-data-pipeline queries (dedup / similarity / text / multimodal). Filled in incrementally."""

from __future__ import annotations
