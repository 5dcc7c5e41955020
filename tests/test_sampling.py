"""Dataset-assembly operator properties (pipeline/sampling.py): split
stability and proportions, quota bounds, packing invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_1_12_0_src_spark.pipeline.sampling import (
    hash_split,
    pack_sequences,
    quota_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    from flink_1_12_0_src_spark.catalog import table

    return table(spark, "/root/testdata/sf0.01", "documents")


def test_hash_split_is_stable_and_proportional(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    # stability: identical assignment on a re-run over a repartitioned input
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id").select("doc_id", "split").collect()
    }
    assert a == b
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    # 500 docs: binomial(500, .9) stays within ±5pp with overwhelming margin
    assert 0.85 <= frac_train <= 0.95
    assert set(a.values()) == {"train", "val", "test"}


def test_hash_split_subset_invariance(spark, docs):
    """A document's split never changes when the corpus grows — assignment
    depends only on the id (leakage-safe incremental ingestion)."""
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.filter(F.col("doc_id") % 3 == 0), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_quota_sample_bounds_and_prefers_order(spark, docs):
    d = docs.withColumn("_len", F.length("text"))
    out = quota_sample(d, "lang", 10, "_len", "doc_id")
    per = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert all(c <= 10 for c in per.values())
    # the kept set per lang is exactly the top-10 by (len desc, id)
    kept_en = sorted(r["doc_id"] for r in out.filter("lang = 'en'").collect())
    ref = sorted(
        r["doc_id"]
        for r in d.filter("lang = 'en'")
        .orderBy(F.col("_len").desc(), "doc_id")
        .limit(10)
        .collect()
    )
    assert kept_en == ref


def test_pack_sequences_invariants(spark, docs):
    budget = 512
    toks = F.size(F.split(F.col("text"), " "))
    out = pack_sequences(docs, "doc_id", "lang", toks, budget).collect()
    by_stream: dict = {}
    for r in out:
        by_stream.setdefault(r["lang"], []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: r["doc_id"])
        # offsets are the exclusive cumsum in id order
        cum = 0
        for r in rows:
            assert r["start_offset"] == cum
            assert r["pack_id"] == cum // budget
            cum += r["n_tokens"]
        # pack ids are contiguous from 0 per stream
        packs = sorted({r["pack_id"] for r in rows})
        assert packs == list(range(len(packs)))


def test_pack_efficiency_hand_numbers(spark):
    """Fill fraction is tokens / (n_packs * budget) with n_packs =
    ceil(tokens / budget) — a stream exactly filling its packs reports 1.0,
    a one-token overflow adds a whole nearly-empty tail pack."""
    from flink_1_12_0_src_spark.pipeline.sampling import pack_efficiency_report

    rows = [
        ("full", 10), ("full", 10),          # 20 tokens = 2 packs of 10 → 1.0
        ("spill", 10), ("spill", 11),        # 21 tokens = 3 packs → 0.7
        ("tiny", 1),                          # 1 token = 1 pack → 0.1
    ]
    df = spark.createDataFrame(rows, "stream string, nt int")
    got = {
        r["stream"]: (r["n_docs"], r["total_tokens"], r["n_packs"], r["fill_frac"])
        for r in pack_efficiency_report(df, "stream", F.col("nt"), 10).collect()
    }
    assert got == {
        "full": (2, 20, 2, 1.0),
        "spill": (2, 21, 3, 0.7),
        "tiny": (1, 1, 1, 0.1),
    }


def test_shuffle_shard_is_a_permutation_and_seed_stable(spark, sf_dir):
    from flink_1_12_0_src_spark.catalog import table
    from flink_1_12_0_src_spark.pipeline.sampling import shuffle_shard

    docs = table(spark, sf_dir, "documents")
    out = shuffle_shard(docs, "doc_id", seed=77).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["position"])
    # within every shard, positions are exactly 1..n (a permutation)
    for shard, pos in by_shard.items():
        assert 0 <= shard < 16
        assert sorted(pos) == list(range(1, len(pos) + 1))
    # identical across re-runs (stateless), different under a new seed
    again = shuffle_shard(docs, "doc_id", seed=77).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = {(r["doc_id"]): (r["shard_id"], r["position"])
             for r in shuffle_shard(docs, "doc_id", seed=78).collect()}
    moved = sum((r["shard_id"], r["position"]) != other[r["doc_id"]] for r in out)
    assert moved > len(out) // 2


def test_token_budget_block_size_invariance(spark, sf_dir):
    """The two-phase distributed prefix sum is EXACT: any block size (including
    one so large the whole source is a single block — the naive single-window
    formulation) yields identical (cum_before, selected) assignments."""
    from pyspark.sql import functions as F

    from flink_1_12_0_src_spark.catalog import table
    from flink_1_12_0_src_spark.pipeline.sampling import token_budget_select

    docs = table(spark, sf_dir, "documents")
    tok = F.size(F.split(F.col("text"), " "))

    def run(block):
        rows = token_budget_select(
            docs, "doc_id", "source", tok, budget=2000, block=block
        ).collect()
        return sorted(map(tuple, rows))

    single_window = run(10**9)  # one block per source == naive formulation
    assert run(64) == single_window
    assert run(257) == single_window  # non-power-of-two, misaligned boundaries
    # budget boundary: per source, the selected set is a prefix in id order
    # and stops exactly where cum_before crosses the budget
    by_src = {}
    for doc_id, src, n, cum, sel in single_window:
        by_src.setdefault(src, []).append((doc_id, n, cum, sel))
    for src, rows in by_src.items():
        rows.sort()
        cum = 0
        for doc_id, n, cum_before, sel in rows:
            assert cum_before == cum
            assert sel == (cum_before < 2000)
            cum += n


def test_token_budget_null_tokens_contribute_zero(spark):
    """A NULL token count must not poison the prefix sum: the row gets a
    concrete cum_before/selected (NULL contributes 0, like SQL window SUM)."""
    from pyspark.sql import functions as F

    from flink_1_12_0_src_spark.pipeline.sampling import token_budget_select

    df = spark.createDataFrame(
        [(0, "a", 5), (1, "a", None), (2, "a", 7), (3, "b", None), (4, "b", 2)],
        "doc_id long, source string, n long",
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["cum_before"], r["selected"])
        for r in token_budget_select(
            df, "doc_id", "source", F.col("n"), budget=10, block=2
        ).collect()
    }
    assert rows[0] == (5, 0, True)
    assert rows[1] == (None, 5, True)   # concrete, not NULL
    assert rows[2] == (7, 5, True)      # NULL row added nothing
    assert rows[3] == (None, 0, True)   # leading NULL in a fresh source
    assert rows[4] == (2, 0, True)


def test_token_budget_property_matches_python_reference(spark):
    """Hypothesis: random (id, source, tokens-with-nulls) tables — the
    two-phase distributed prefix sum must equal the sequential python
    reference exactly, for any block size."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    from pyspark.sql import functions as F

    from flink_1_12_0_src_spark.pipeline.sampling import token_budget_select

    rows_strategy = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.one_of(st.none(), st.integers(0, 50))),
        min_size=1,
        max_size=25,
    )

    @given(rows=rows_strategy, block=st.sampled_from([1, 3, 7, 1000]), budget=st.integers(0, 120))
    @settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(rows, block, budget):
        pdf = pd.DataFrame(
            [(i, s, n) for i, (s, n) in enumerate(rows)], columns=["doc_id", "source", "n"]
        )
        sdf = spark.createDataFrame(
            pdf.astype(object).where(pdf.notna(), None), "doc_id long, source string, n long"
        )
        got = {
            r["doc_id"]: (r["cum_before"], r["selected"])
            for r in token_budget_select(sdf, "doc_id", "source", F.col("n"), budget, block=block).collect()
        }
        cum: dict = {}
        for i, (s, n) in enumerate(rows):
            before = cum.get(s, 0)
            assert got[i] == (before, before < budget), (i, s, n, block, budget)
            cum[s] = before + (n or 0)

    run()


def test_epoch_repeat_targets_volume(spark, sf_dir):
    """Repeat counts are floor/ceil of the per-source epoch target, epoch
    indices are dense 0..repeat_count-1, and the realized epoch-expanded
    char volume lands near each source's target volume."""
    from flink_1_12_0_src_spark.catalog import table
    from flink_1_12_0_src_spark.pipeline.sampling import epoch_repeat

    docs = table(spark, sf_dir, "documents")
    rows = epoch_repeat(docs).collect()
    vols = {
        r["source"]: r["vol"]
        for r in docs.groupBy("source").agg(F.sum("n_chars").alias("vol")).collect()
    }
    mx = max(vols.values())
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault((r["doc_id"], r["source"]), []).append(r["epoch_idx"])
        epochs = min(mx / vols[r["source"]], 3.0)
        assert r["repeat_count"] in (int(epochs), int(epochs) + 1)
    for (doc_id, _), idxs in per_doc.items():
        assert sorted(idxs) == list(range(len(idxs))), doc_id
    # realized volume ≈ target volume per source (fractional repeats are
    # hash-Bernoulli with the exact target expectation)
    chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    realized: dict = {}
    for (doc_id, src), idxs in per_doc.items():
        realized[src] = realized.get(src, 0) + chars[doc_id] * len(idxs)
    for src, vol in vols.items():
        target = min(mx / vol, 3.0) * vol
        assert abs(realized[src] - target) / target < 0.25, (src, realized[src], target)


def test_weighted_sample_biases_toward_weight(spark, sf_dir):
    """The A-ES sample is length-biased (mean n_chars above the corpus
    mean), exactly k rows, stable under repartitioning, and its keys are
    the top-k of the full key distribution."""
    from flink_1_12_0_src_spark.catalog import table
    from flink_1_12_0_src_spark.pipeline.sampling import weighted_sample

    docs = table(spark, sf_dir, "documents")
    got = weighted_sample(docs, k=100).collect()
    assert len(got) == 100
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r["n_chars"] for r in got) / len(got)
    assert sample_mean > corpus_mean
    again = weighted_sample(docs.repartition(7, "doc_id"), k=100).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    all_keys = sorted(
        (r["es_key"] for r in weighted_sample(docs, k=10**9).collect()), reverse=True
    )
    assert sorted((r["es_key"] for r in got), reverse=True) == all_keys[:100]
