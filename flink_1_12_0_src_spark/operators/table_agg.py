"""Table aggregate functions (SURVEY.md §2.4 / §2.10).

Reference semantics: Flink TableAggregateFunction — an aggregate that emits
MULTIPLE rows per group (flink-table/flink-table-common/src/main/java/org/
apache/flink/table/functions/TableAggregateFunction.java:162; runtime
GroupTableAggFunction, planner node StreamExecGroupTableAggregate.scala:46).
Flink's documentation example is Top2: per group, emit the two largest values
with their rank.

Spark-first mapping: ``applyInPandas`` — the grouped pandas function *is* a
table aggregate (group in, any number of rows out), Arrow-batched. At scale
the shuffle is the groupBy hash partitioning only; each group is processed
once, map-side combining does not apply (semantics need the whole group), so
skewed groups are the risk — mitigate upstream with a pre-filter/pre-top-k
where the function allows (top-k does: a partial per-partition top-k before
the shuffle bounds every group, mirroring Flink's local/global split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def top_n_table_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    n: int = 2,
) -> DataFrame:
    """Flink's Top2 TableAggregateFunction generalized to top-n: per group emit
    (group_cols…, value, rank). Pre-bounds each group with a partial
    per-partition top-n (the local/global two-stage shape) before the
    applyInPandas emit stage."""
    import pandas as pd

    # local stage: per-partition top-n bounds the group size before the shuffle
    part_w = W.partitionBy(F.spark_partition_id(), *group_cols).orderBy(
        F.desc(value_col), F.asc(tiebreak_col)
    )
    pruned = (
        df.withColumn("_prn", F.row_number().over(part_w))
        .filter(F.col("_prn") <= n)
        .drop("_prn")
    )

    out_fields = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.select(*group_cols).schema.fields]
        + [
            f"{value_col} {df.schema[value_col].dataType.simpleString()}",
            "rank int",
        ]
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        top = pdf.sort_values([value_col, tiebreak_col], ascending=[False, True]).head(n)
        top = top[[*group_cols, value_col]].copy()
        top["rank"] = range(1, len(top) + 1)
        return top

    return pruned.groupBy(*group_cols).applyInPandas(emit, out_fields)
