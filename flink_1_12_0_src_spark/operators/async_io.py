"""Async I/O enrichment operator (SURVEY.md §2.8).

Reference semantics: Flink AsyncDataStream / AsyncWaitOperator
(flink-streaming-java/src/main/java/org/apache/flink/streaming/api/operators/
async/AsyncWaitOperator.java:372) and AsyncTableFunction lookup joins
(flink-table/flink-table-common/.../functions/AsyncTableFunction.java:93):
per-record calls to an external service, many in flight, results merged back
in order.

Spark-first mapping: ``mapInPandas`` — the external calls batch per Arrow
chunk and run concurrently on an asyncio loop inside the worker. This is
*better* than per-record async at scale: one connection pool per task, natural
micro-batching, and Spark's ordered pipelining gives Flink's ORDERED output
mode for free. Capacity (Flink's in-flight limit) maps to the gather width —
bounded here by unique keys per Arrow batch (tune via
``spark.sql.execution.arrow.maxRecordsPerBatch``).

The client is injected, so tests/queries use a deterministic coroutine (an
md5-tag "service") while production plugs an aiohttp/DB client with the same
signature.
"""

from __future__ import annotations

import asyncio
import hashlib
from collections.abc import Awaitable, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


async def md5_tag_service(key) -> str:
    """Deterministic stand-in for an external lookup service: an 8-hex-char
    tag derived from the key. Being pure, any SQL engine can verify the
    enrichment (substr(md5('svc|' || key), 1, 8))."""
    return hashlib.md5(f"svc|{key}".encode()).hexdigest()[:8]


def async_enrich(
    df: DataFrame,
    key_col: str,
    out_col: str,
    fetch: Callable[[object], Awaitable[object]] = md5_tag_service,
    out_type: str = "string",
) -> DataFrame:
    """Append ``out_col`` = await fetch(key) for every row, with all unique
    keys of each Arrow batch fetched concurrently (one asyncio.gather per
    batch — the AsyncWaitOperator capacity window)."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} {out_type}"]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def fetch_all(keys):
            return await asyncio.gather(*[fetch(k) for k in keys])

        for pdf in batches:
            keys = pdf[key_col].drop_duplicates().tolist()
            # asyncio.run creates AND closes the loop — long-lived Python
            # workers must not leak a loop (+ selector fd) per Arrow batch
            vals = asyncio.run(fetch_all(keys))
            pdf = pdf.copy()
            pdf[out_col] = pdf[key_col].map(dict(zip(keys, vals)))
            yield pdf

    return df.mapInPandas(mapper, out_schema)
