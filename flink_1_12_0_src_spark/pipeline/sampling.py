"""Dataset assembly operators: deterministic splits, per-source quotas,
and sequence packing — the data-mixing stage of a training pipeline
(runs after dedup/quality filtering, before tokenization at scale).

Scale design (100 TB):
- hash split: one stateless projection — no shuffle, no global ordering,
  reproducible on any engine (md5 is the portable hash, as everywhere in
  this package);
- quota sampling: one window rank per source partition — the same shuffle
  a groupBy would need, bounded output (quota × sources);
- packing: the concat-then-chunk model LLM pretraining uses — documents
  are laid out in a deterministic order per stream and a document joins
  the pack its start offset falls into, so pack assignment is one window
  cumsum, no sequential driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_1_12_0_src_spark.pipeline.stageclock import stage
from flink_1_12_0_src_spark.pipeline.text import tokens

# lexicographic thresholds over the first 8 md5 hex chars == numeric
# thresholds over the implied uint32 (fixed width, lowercase): 0.9 and 0.95
# of the hash space. String comparison keeps the split verifiable in any
# SQL engine without hex→int conversion.
SPLIT_TRAIN_BOUND = "e6666666"  # 0.9 × 16^8
SPLIT_VAL_BOUND = "f3333333"  # 0.95 × 16^8


def _salted_hash(id_col: str, seed: int):
    """The package's portable id hash: md5(f"{seed}|{id}") — every sampling
    primitive and its DuckDB oracle mirror this exact format, so the salt
    layout lives in ONE place."""
    return F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))


def hash_split(df: DataFrame, id_col: str, seed: int = 42) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by content-independent
    id hash: split = bucket of md5(seed|id) in the hash space. Stateless and
    engine-portable — the split survives re-runs, repartitioning, and
    incremental ingestion (a document's split never changes), which is the
    property leakage-safe dataset assembly needs."""
    h = F.substring(_salted_hash(id_col, seed), 1, 8)
    return df.withColumn(
        "split",
        F.when(h < SPLIT_TRAIN_BOUND, "train")
        .when(h < SPLIT_VAL_BOUND, "val")
        .otherwise("test"),
    )


def quota_sample(
    df: DataFrame, source_col: str, quota: int, order_col: str, id_col: str
) -> DataFrame:
    """Per-source quota (data-mixing cap): keep at most ``quota`` documents
    per source, preferring the highest ``order_col`` (ties broken by id for
    determinism). One window rank per source partition; at corpus scale the
    per-source output is bounded at quota rows."""
    w = Window.partitionBy(source_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    stream_col: str,
    token_col,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Sequence packing, concat-then-chunk model: documents of one stream
    are concatenated in deterministic (id) order and chunked every
    ``budget`` tokens; a document joins the pack its START offset falls
    into (pack_id = floor(start_offset / budget)) — exactly the layout a
    pretraining pack writer produces, as one window cumsum instead of a
    sequential loop. ``token_col`` is a Column expression for the
    document's token count.

    Scale note: the cumsum sorts each stream in ONE window partition, so a
    stream holding most of a 100 TB corpus concentrates on one task (the
    sort spills, but the task is serial). Pass ``shard_col`` (e.g.
    :func:`shuffle_shard`'s deterministic shard id) to pack each
    (stream, shard) independently — pack ids become shard-local, which is
    exactly how production pack writers parallelize a stream across
    output files."""
    parts = [stream_col] + ([shard_col] if shard_col else [])
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.select(
        id_col,
        *parts,
        token_col.cast("bigint").alias("n_tokens"),
        (cum - token_col).cast("bigint").alias("start_offset"),
        F.floor((cum - token_col) / budget).cast("bigint").alias("pack_id"),
    )


def shuffle_shard(df: DataFrame, id_col: str, seed: int = 77, n_shards: int = 16) -> DataFrame:
    """Deterministic global shuffle + sharding — the pretraining writer
    layout: shard = first hex nibble of the salted id hash (16 shards),
    within-shard position = rank of the hash (with id tiebreak). Stateless:
    (shard, position) is a pure function of (seed, id), invariant to
    partitioning and re-runs — re-shuffling an epoch is just a new seed.
    ONE window shuffle keyed by shard; no global sort, no RNG state."""
    from pyspark.sql import Window as W

    h = _salted_hash(id_col, seed)
    w = W.partitionBy(F.substring(h, 1, 1)).orderBy(h, F.col(id_col))
    return df.select(
        F.col(id_col),
        F.conv(F.substring(h, 1, 1), 16, 10).cast("int").alias("shard_id"),
        F.row_number().over(w).cast("bigint").alias("position"),
    )


def source_mix_report(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus accounting — the mix report a data curator reads
    before setting sampling weights: document/char/token volumes, language
    spread, and each source's share of the corpus.

    Scale (100 TB): ONE source-keyed hash aggregate with map-side partials
    (token counts are computed map-side from the text, so the shuffle carries
    only per-source partial sums, never text). The corpus-wide total is a
    one-row aggregate cross-joined back via broadcast — no global window, no
    single-partition stage over data-sized input.
    """
    per_source = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(lang_col)).alias("n_langs"),
        F.sum(F.col(chars_col)).cast("bigint").alias("total_chars"),
        F.sum(F.size(tokens(text_col)).cast("bigint")).alias("total_tokens"),
    )
    return _mix_shares(per_source)


def _mix_shares(per_source: DataFrame) -> DataFrame:
    """Derived mix columns over a per-source volume table — shared by the
    batch report and the streaming twin's snapshot rollup."""
    totals = per_source.agg(F.sum("n_docs").alias("_corpus_docs"))
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_langs",
            "total_chars",
            "total_tokens",
            F.round(F.col("total_chars") / F.col("n_docs"), 6).alias("avg_chars"),
            F.round(F.col("n_docs") / F.col("_corpus_docs"), 6).alias("doc_share"),
        )
    )


def source_mix_from_lang_groups(groups: DataFrame) -> DataFrame:
    """The report half of :func:`source_mix_report` over PRE-AGGREGATED
    (source, lang, n_docs, total_chars, total_tokens) rows — the final
    snapshot of a continuously-maintained streaming grouped aggregate
    (``stream_source_mix``). n_langs is an exact COUNT(lang) because the
    input is one row per (source, lang) — counting the COLUMN (not *) skips
    a NULL-lang group exactly as the batch report's countDistinct(lang) and
    the oracles' COUNT(DISTINCT lang) do; every other statistic is a sum of
    sums, so the rollup equals the batch report exactly."""
    per_source = groups.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.col("lang")).alias("n_langs"),
        F.sum("total_chars").cast("bigint").alias("total_chars"),
        F.sum("total_tokens").cast("bigint").alias("total_tokens"),
    )
    return _mix_shares(per_source)


def pack_efficiency_report(
    df: DataFrame,
    stream_col: str,
    token_col,
    budget: int,
    shard_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Packing-efficiency audit for the concat-then-chunk writer
    (:func:`pack_sequences`): per (stream[, shard]), the document/token
    volumes, how many ``budget``-token packs they chunk into, and the fill
    fraction (tokens / pack capacity). Under concat-then-chunk every pack is
    full except each partition's TAIL pack, so 1 - fill_frac is exactly the
    tail waste — the quantity that grows with shard count (more shards =
    more parallel writers = more tails), which is the trade this report
    exists to measure before choosing a shard fan-out.

    Scale (100 TB): ONE (stream[, shard])-keyed hash aggregate with map-side
    partials; token counts are computed map-side so the shuffle carries only
    partial sums, never text. Output is |streams|×|shards| rows.
    """
    parts = [stream_col] + ([shard_col] if shard_col else [])
    agg = df.groupBy(*parts).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("total_tokens"),
    )
    return pack_fill_from_volumes(agg, parts, budget, round_digits)


def pack_fill_from_volumes(
    agg: DataFrame, parts: list, budget: int, round_digits: int = 6
) -> DataFrame:
    """The derived half of :func:`pack_efficiency_report` over PRE-AGGREGATED
    (parts..., n_docs, total_tokens) rows — shared with the streaming twin
    (``stream_pack_efficiency``), whose volume counters a streaming grouped
    aggregate maintains; pack count and fill fraction are pure functions of
    the volumes, so the snapshot report equals the batch report exactly."""
    n_packs = F.ceil(F.col("total_tokens") / F.lit(budget)).cast("bigint")
    # NULLIF-guard the pack capacity: a zero-token group has 0 packs, and
    # Spark's NULL-on-/0 vs DuckDB's float inf/NaN would diverge — NULLIF
    # pins both engines to NULL (same hardening as zscore_report / funnel).
    return agg.select(
        *parts,
        "n_docs",
        "total_tokens",
        n_packs.alias("n_packs"),
        F.round(
            F.col("total_tokens")
            / F.nullif((n_packs * F.lit(budget)).cast("double"), F.lit(0.0)),
            round_digits,
        ).alias("fill_frac"),
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_col,
    budget: int,
    block: int = 4096,
) -> DataFrame:
    """Per-source TOKEN-budget fill (the data-mixing knob when the recipe is
    "N tokens of source X", not "N documents"): documents fill each source's
    budget in deterministic ascending-id order, and a document is selected
    while its START offset is still inside the budget (prefix-truncation —
    the boundary document is kept and truncated downstream at tokenization,
    exactly the pack-writer convention in :func:`pack_sequences`).

    Scale design (100 TB): the naive formulation is one running-sum window
    per source — a single serial task per source, the same scale-killer the
    unsharded flagship pack had. Instead this is an exact two-phase
    distributed prefix sum: blocks of ``block`` consecutive ids align with
    the fill order, so (1) a per-(source, block) window computes the
    intra-block running sum with the widest window partition capped at
    ``block`` rows, (2) the per-block subtotals (corpus_rows / block rows —
    tiny) cumsum per source into each block's starting offset, and (3) a
    join on (source, block) adds offset + intra-block sum. AQE broadcasts
    the offsets side when it fits; sizing ``block`` trades offset-table
    rows against intra-block window width.

    ``token_col`` is a Column expression for the document's token count; a
    NULL count contributes 0 tokens to the running sum (matching SQL window
    SUM's NULL-skipping), so the row still gets a concrete cum_before and
    selected instead of a NULL that drops it from both result sets.
    Output: (id, source, n_tokens, cum_before, selected).
    """
    d = df.select(
        F.col(id_col),
        F.col(source_col),
        token_col.cast("bigint").alias("n_tokens"),
        F.floor(F.col(id_col) / block).alias("_blk"),
    )
    intra = (
        Window.partitionBy(source_col, "_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_cum_in", F.sum("n_tokens").over(intra))
    subtot = d.groupBy(source_col, "_blk").agg(F.sum("n_tokens").alias("_tot"))
    prior = (
        Window.partitionBy(source_col)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = subtot.select(
        source_col,
        "_blk",
        F.coalesce(F.sum("_tot").over(prior), F.lit(0)).alias("_off"),
    )
    cum_before = (
        F.col("_off")
        + F.coalesce(F.col("_cum_in"), F.lit(0))  # all-NULL frame → no tokens yet
        - F.coalesce(F.col("n_tokens"), F.lit(0))
    ).cast("bigint")
    return (
        d.join(offs, [source_col, "_blk"])
        .select(
            id_col,
            source_col,
            "n_tokens",
            cum_before.alias("cum_before"),
            (cum_before < budget).alias("selected"),
        )
    )


def temperature_sample(
    df: DataFrame, id_col: str, group_col: str, seed: int = 7
) -> DataFrame:
    """Temperature-based domain mixing at T=2 (α=0.5): deterministically
    downsample each source so its expected kept size is ∝ sqrt(n_g) — the
    multilingual/multi-domain rebalancing rule (mBERT / XLM-R exponential
    smoothing; The Pile / LLaMA source weighting), normalized so the smallest
    group keeps everything: keep_p(g) = sqrt(min_n / n_g).

    Bit-determinism across engines: the per-group probability uses only
    count, MIN (order-independent), one IEEE divide and one correctly-rounded
    sqrt — no floating SUM whose result depends on accumulation order. The
    keep decision compares the first 8 md5 hex chars of the salted id against
    a per-group fixed-width hex threshold (floor(keep_p·16^8), capped at
    16^8−1), so membership is a pure function of (seed, id, group counts) and
    is reproducible in any SQL engine.

    Scale shape: one small count agg (|groups| rows) joined back by BROADCAST,
    then a stateless filter — no wide shuffle of the corpus, no RNG state,
    invariant to partitioning and re-runs.
    """
    from pyspark.sql.functions import broadcast

    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    mn = counts.agg(F.min("_n").alias("_mn"))
    # keep_p == 1 (the smallest group) must keep EVERY row: a capped
    # numeric threshold of 0xffffffff would still drop ids whose hash prefix
    # is exactly 'ffffffff' (one in 2^32 — real rows at corpus scale), so
    # those groups compare against the sentinel 'g', which every hex string
    # sorts below
    thr = counts.crossJoin(broadcast(mn)).select(
        group_col,
        F.when(F.col("_n") <= F.col("_mn"), F.lit("g"))
        .otherwise(
            F.lpad(
                F.lower(
                    F.hex(
                        F.least(
                            F.floor(
                                F.sqrt(F.col("_mn").cast("double") / F.col("_n"))
                                * F.lit(4294967296.0)
                            ),
                            F.lit(4294967295),
                        )
                    )
                ),
                8,
                "0",
            )
        )
        .alias("_thr"),
    )
    h = F.substring(_salted_hash(id_col, seed), 1, 8)
    return (
        df.join(broadcast(thr), group_col)
        .filter(h < F.col("_thr"))
        .drop("_thr")
    )


def epoch_repeat(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    volume_col: str = "n_chars",
    cap: float = 3.0,
    seed: int = 13,
) -> DataFrame:
    """Deterministic fractional-epoch upsampling — the repeat-count mechanic
    of a pretraining data mix (LLaMA/Pile-style source weighting): scarce
    sources are repeated toward the largest source's volume, capped at
    ``cap`` epochs. ``epochs_g = min(max_volume / volume_g, cap)``; every
    document gets ``floor(epochs_g)`` guaranteed repeats plus one more when
    the first 8 md5 hex chars of its salted id fall below the fixed-width
    hex threshold of the fractional part — so the expected per-source volume
    matches the target exactly while each document's repeat count is a pure
    function of (seed, id, group volumes), reproducible in any engine.

    Output: one row per (document, epoch_idx) with the repeat_count carried —
    the epoch-expanded layout a pack-writer consumes.

    Scale (100 TB): one |groups|-row volume aggregate joined back by
    BROADCAST; repeat derivation is stateless per row, and the explode fans
    out at most ``cap``× — no wide shuffle, no RNG state, invariant to
    partitioning and re-runs.
    """
    from pyspark.sql.functions import broadcast

    vols = df.groupBy(group_col).agg(F.sum(volume_col).alias("_vol"))
    mx = vols.agg(F.max("_vol").alias("_mx"))
    epochs = F.least(F.col("_mx").cast("double") / F.col("_vol"), F.lit(cap))
    plan = vols.crossJoin(broadcast(mx)).select(
        group_col,
        F.floor(epochs).cast("int").alias("_base"),
        (epochs - F.floor(epochs)).alias("_frac"),
    )
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("_frac") * F.lit(4294967296.0)).cast("bigint"))),
        8,
        "0",
    )
    h8 = F.substring(_salted_hash(id_col, seed), 1, 8)
    rc = (F.col("_base") + (h8 < thr).cast("int")).alias("repeat_count")
    return (
        df.join(broadcast(plan), group_col)
        .select(id_col, group_col, rc)
        .filter(F.col("repeat_count") > 0)
        .withColumn(
            "epoch_idx",
            F.explode(F.sequence(F.lit(0), F.col("repeat_count") - 1)),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = 100,
    seed: int = 17,
    round_digits: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Vassilopoulos A-ES scheme (each item ranks by
    ``u^(1/w)``, equivalently by the monotone key ``ln(u)/w``): the k items
    with the largest keys form an exact weighted sample, and the selection
    is a pure function of (seed, id, weight) — rerun- and
    partitioning-stable, the weighted sibling of :func:`uniform_sample`.
    Items with non-positive weight are excluded.

    Bit-determinism: ``u`` derives from the first 8 md5 hex chars of the
    salted id ((v+1)/2^32, so u ∈ (0, 1]); the single ``ln`` rounds to 9 dp
    before ranking with an id tiebreak, so a last-ULP libm divergence
    between engines cannot flip the selection (the `text_unigram_logppl`
    precedent).

    Scale (100 TB): map-side key derivation, then ONE top-k
    (TakeOrderedAndProject — per-partition heads, single k-row merge); no
    RNG state, no full sort, no shuffle of the corpus.
    """
    v = F.conv(F.substring(_salted_hash(id_col, seed), 1, 8), 16, 10).cast("bigint")
    u = (v + 1).cast("double") / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col), round_digits)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.desc("es_key"), F.col(id_col))
        .limit(k)
    )


def uniform_sample(df: DataFrame, id_col: str, k: int, seed: int = 11) -> DataFrame:
    """Deterministic fixed-size uniform sample: keep the ``k`` documents with
    the smallest salted id hashes — the distributed, rerun-stable equivalent
    of reservoir sampling (every id is equally likely under the hash's
    uniformity, the chosen set is a pure function of (seed, id-set), and
    adding new documents only ever displaces the largest hashes).

    Scale shape: one TakeOrderedAndProject (top-k by hash) — no full sort,
    no RNG state, map-side partial top-k then a single k-row merge."""
    h = _salted_hash(id_col, seed)
    return (
        df.withColumn("_h", h)
        .orderBy("_h", id_col)
        .limit(k)
        .drop("_h")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    hex_chars: int = 2,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): score every raw-pool document by how
    much more likely its hashed-unigram bag is under the target domain's
    token distribution than under the raw pool's own —
    ``logw(doc) = Σ_tokens ln(p_target(bucket) / p_raw(bucket))`` with add-1
    smoothing over the ``B = 16^hex_chars`` hashed buckets. Documents with
    positive log-weights look like the target domain; DSIR then resamples
    proportionally (here the weight itself is the output, plus the
    ``selected`` indicator ``logw > 0``, so the resampling policy stays a
    downstream choice).

    Determinism / portability: the bucket is the first ``hex_chars`` chars of
    md5(token) — a string join key in both engines, no hex→int conversion;
    each bucket's log-ratio is rounded to 6 dp once, multiplied by the exact
    per-(doc, bucket) count in DECIMAL(28,9), and accumulated in DECIMAL —
    the partitioning-invariant float recipe used package-wide. 6 dp (not the
    package's usual 9) because ``ln`` is a transcendental whose last ULP
    differs between the JVM's and DuckDB's libm: a 9-dp round preserves the
    flip and the DECIMAL sum faithfully accumulates it (the r05 driver-red),
    while 6 dp sits inside any correctly-rounded libm's agreement.

    Scale shape at 100 TB: the target side is small by definition (a quality
    domain sample vs the whole crawl), ONE scan each for target and raw
    bucket counts (explode → hash-agg, B-row outputs), the B-row log-ratio
    table BROADCASTS, and scoring is one more raw scan reduced to
    (doc, bucket) counts before the broadcast join — no corpus-size shuffle
    beyond the doc-keyed sum."""
    from pyspark.sql.functions import broadcast

    from flink_1_12_0_src_spark.pipeline.text import tokens

    n_buckets = 16 ** hex_chars

    def bucketed(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
            .filter(F.col("term") != "")
            .select(
                F.col(id_col),
                F.substring(F.md5("term"), 1, hex_chars).alias("bucket"),
            )
        )

    tgt_counts = bucketed(target).groupBy("bucket").agg(F.count("*").alias("ct"))
    raw_tok = bucketed(raw)
    raw_counts = raw_tok.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt_tot = tgt_counts.agg(F.sum("ct").cast("double").alias("_tt"))
    raw_tot = raw_counts.agg(F.sum("cr").cast("double").alias("_tr"))
    ratio = (
        raw_counts.join(tgt_counts, "bucket", "full")
        .crossJoin(broadcast(tgt_tot))
        .crossJoin(broadcast(raw_tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.coalesce("ct", F.lit(0)) + 1) / (F.col("_tt") + n_buckets))
                    / ((F.coalesce("cr", F.lit(0)) + 1) / (F.col("_tr") + n_buckets))
                ),
                6,
            )
            # decimal(20,9) × decimal(9,0) keeps the product inside Spark's
            # 38-digit cap with scale 9 intact (28,9 × 28,9 would overflow
            # precision and silently truncate the scale to 6)
            .cast("decimal(20,9)")
            .alias("lr"),
        )
    )
    doc_buckets = raw_tok.groupBy(id_col, "bucket").agg(
        F.count("*").cast("decimal(9,0)").alias("n")
    )
    return (
        doc_buckets.join(broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n").cast("bigint")).alias("n_tokens"),
            F.sum(F.col("n") * F.col("lr")).cast("decimal(38,9)").alias("_s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.col("_s").cast("double").alias("log_weight"),
            (F.col("_s") > 0).alias("selected"),
        )
    )


def doremi_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    rounds: int = 4,
    eta: float = 0.5,
    smoothing: float = 0.02,
    materialize: bool = True,
) -> DataFrame:
    """DoReMi domain-weight training (Xie et al. 2023, "DoReMi: Optimizing
    Data Mixtures Speeds Up Language Model Pretraining", Algorithm 1) —
    the FIFTH member of the iterative-training class (kmeans_fit_exact =
    Lloyd, logreg_fit_exact = logistic GD, text_bpe_fit = merge loop,
    pca_power_exact = power iteration): ``rounds`` exponentiated-gradient
    updates over the per-domain EXCESS LOSS, unrolled into ONE lazy plan,
    no ``collect()`` between rounds.

    The published recipe: a small PROXY model trains under the current
    domain weights while a fixed REFERENCE model supplies per-domain
    baseline losses; domains where the proxy's loss exceeds the
    reference's (excess loss) are upweighted multiplicatively, and the
    RETURNED mixture is the AVERAGE of the per-round iterates smoothed
    with uniform (Algorithm 1's output step — NOT the last iterate). Here
    the proxy is a unigram LM RETRAINED each round on the current
    MIXTURE — p_t(term) = Σ_d α_{t-1}(d)·p(term|d), the weighted domain
    distribution Algorithm 1 trains the proxy under — and the reference
    the stronger FIXED add-1-smoothed bigram LM (the repo's two
    engine-exact perplexity scorers, pipeline/text.py): excess_t(d) =
    max(0, L_mixture-unigram,t(d) − L_bigram(d)) measures how much of
    domain d's difficulty the current-mixture proxy cannot close, so
    upweighting a hard domain makes its terms more probable under the
    proxy, its loss falls, and its excess self-corrects — the paper's
    genuine coupled dynamic (rounds ≤ 11 used a static corpus-global
    unigram, under which the loop converged toward the argmax-excess
    corner; the round-12 coupling is the r11 verdict's task #4).

    Per round t: retrain the proxy (mixture addends snapped to exact
    PICO-unit integers before the cross-domain sum, ln rounded to 6 dp
    once — see :func:`doremi_weights_from_counts`), then
    α_t(d) = round(α_{t-1}(d)·e_t(d) in exact NANO-UNIT integers,
    normalized by the exact integer sum, 6 dp), with
    e_t(d) = round(exp(η·excess_t(d)), 6) — ``exp`` is a transcendental
    whose last ULP differs across libms, so it is rounded to 6 dp once
    (the dsir_weights ``ln`` discipline) and every normalization works on
    round(α·e·10⁹, 0) BIGINTs whose sum is exact — partitioning- and
    engine-invariant. Final weight_d = round((1−s)·avg_t α_t(d) + s/K, 6)
    with uniform smoothing s and K domains; reported proxy_nll /
    excess_loss are the FINAL round's.

    Scale (100 TB): the ONLY corpus-scale work is the two LM scoring
    passes — one (domain, term)-keyed count and one (domain, bigram)-keyed
    count, both map-side partial, both collapsing to vocab-bounded
    relations BEFORE any weight math; every round then broadcasts the
    K-row iterate onto the (domain, term) relation (K×V rows, NOT the
    corpus) for the proxy re-score and normalizes with one-row
    exact-integer aggregates — the corpus never shuffles on rounds.
    ``materialize`` (default True) localCheckpoints the (domain, term,
    n, n_tok) relation once (cuts the corpus subtree out of the
    2-references-per-round lazy chain, which would otherwise re-execute
    it 2^rounds times), the K-row reference-loss relation once, and the
    K-row iterate per round; ``materialize=False`` keeps the plan fully
    lazy for golden pinning.

    Returns (domain, n_docs, proxy_nll, ref_nll, excess_loss, weight).
    Reference scope note: the reference engine has no training operator —
    brief-driven LLM-pipeline surface; nearest analog is the iterative
    fixpoint machinery (flink-libraries/flink-gelly iteration drivers),
    realized as plan unrolling like operators/graph.py."""
    toks = df.select(
        F.col(domain_col).alias("domain"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    dterm = toks.groupBy("domain", "term").agg(
        F.count(F.lit(1)).cast("decimal(15,0)").alias("n")
    )
    w = F.filter(tokens(text_col), lambda x: x != "")
    bg = (
        df.select(F.col(domain_col).alias("domain"), w.alias("_w"))
        .filter(F.size("_w") >= 2)
        # explode the bigram START first, then read the pair with ordinary
        # codegen'd element_at projections (the transform lambda ran
        # interpreted — see text.exploded_shingles)
        .select(
            "domain",
            "_w",
            F.explode(F.sequence(F.lit(1), F.size("_w") - 1)).alias("_i"),
        )
        .select(
            "domain",
            F.element_at("_w", F.col("_i")).alias("w1"),
            F.element_at("_w", F.col("_i") + 1).alias("w2"),
        )
    )
    dbg = bg.groupBy("domain", "w1", "w2").agg(
        F.count(F.lit(1)).cast("decimal(15,0)").alias("n")
    )
    nd = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return doremi_weights_from_counts(
        dterm, dbg, nd, rounds, eta, smoothing, materialize
    )


def doremi_state_rows(df: DataFrame, text_col: str, domain_col: str) -> DataFrame:
    """(kind, domain, k1, k2) row per DoReMi sufficient-statistic event —
    ROW-LOCAL derivation (runs unchanged on a streaming scan): kind 't' per
    token (k1 = term), 'b' per adjacent bigram (k1, k2), 'd' once per
    document. The grouped COUNT over these keys IS the exact sufficient
    statistic set of :func:`doremi_weights` — (domain, term) counts,
    (domain, bigram) counts, per-domain doc counts; everything else (the
    global vocabulary, totals, V) derives from them by rollup, so a
    streaming grouped aggregate maintains the whole training input
    incrementally (the mergeable counter-class state of the twins)."""
    toks = F.filter(F.coalesce(tokens(text_col), F.array().cast("array<string>")),
                    lambda x: x != "")
    dcol = F.col(domain_col)
    t_entries = F.transform(
        toks,
        lambda t: F.struct(
            F.lit("t").alias("kind"), dcol.alias("dom"),
            t.alias("k1"), F.lit("").alias("k2"),
        ),
    )
    b_entries = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.lit("b").alias("kind"), dcol.alias("dom"),
                F.element_at(toks, i).alias("k1"),
                F.element_at(toks, i + 1).alias("k2"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<kind:string,dom:string,k1:string,k2:string>>")
    )
    d_entry = F.array(
        F.struct(
            F.lit("d").alias("kind"), dcol.alias("dom"),
            F.lit("").alias("k1"), F.lit("").alias("k2"),
        )
    )
    return df.select(
        F.explode(F.concat(t_entries, b_entries, d_entry)).alias("e")
    ).select(
        F.col("e.kind").alias("kind"), F.col("e.dom").alias("domain"),
        F.col("e.k1").alias("k1"), F.col("e.k2").alias("k2"),
    )


def doremi_counts_from_state(state: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split a counted :func:`doremi_state_rows` snapshot (kind, domain,
    k1, k2, n) back into the three relations
    :func:`doremi_weights_from_counts` consumes — shared with the
    streaming twin, whose grouped-aggregate snapshot IS the state."""
    dterm = state.filter(F.col("kind") == "t").select(
        "domain", F.col("k1").alias("term"), F.col("n").cast("decimal(15,0)").alias("n")
    )
    dbg = state.filter(F.col("kind") == "b").select(
        "domain", F.col("k1").alias("w1"), F.col("k2").alias("w2"),
        F.col("n").cast("decimal(15,0)").alias("n"),
    )
    nd = state.filter(F.col("kind") == "d").select(
        "domain", F.col("n").cast("bigint").alias("n_docs")
    )
    return dterm, dbg, nd


def doremi_weights_from_counts(
    dterm: DataFrame,
    dbg: DataFrame,
    nd: DataFrame,
    rounds: int = 4,
    eta: float = 0.5,
    smoothing: float = 0.02,
    materialize: bool = True,
) -> DataFrame:
    """The loss + exponentiated-gradient TAIL of :func:`doremi_weights`
    over explicit sufficient-statistic relations — (domain, term, n),
    (domain, w1, w2, n), (domain, n_docs) — shared with the streaming
    twin. The per-domain term totals, the bigram counts and the
    vocabulary size all derive from the hand-ins by rollup (counts are
    decomposable), so the statistics are the COMPLETE training input and
    the tail is a pure function of them.

    COUPLED rounds (round-12 upgrade — Algorithm 1's genuine dynamic):
    round t's PROXY loss is the unigram NLL under the round-(t−1)
    MIXTURE-WEIGHTED LM — p_t(term) = Σ_d α_{t−1}(d)·n(d,term)/n_tok(d),
    re-scored each round the way ``logreg_fit_exact`` couples its GD
    rounds — instead of the static corpus-global unigram of rounds ≤ 11
    (under which the loop converged toward the argmax-excess corner and
    only the iterate average carried signal). Upweighting a hard domain
    now makes its terms more probable under the proxy, its loss falls,
    and its excess self-corrects — the paper's feedback loop.

    Determinism of the per-round re-score: each mixture addend
    α·n/n_tok is computed in DOUBLE (correctly-rounded IEEE ops on
    identical inputs — engine-exact) then snapped to PICO-unit integers
    (round(x·10¹⁵) BIGINT, the micro-unit discipline at higher
    resolution since probabilities reach ~10⁻¹²) whose SUM across
    domains is exact and order-invariant; the summed probability is
    floored at one pico-unit (a domain mixture can never expose ln(0)),
    and ln's output — the one transcendental — rounds to 6 dp once
    before the DECIMAL per-domain accumulation, exactly the dsir/doremi
    libm discipline."""
    if rounds < 1:
        raise ValueError("doremi_weights: rounds must be >= 1")
    # (domain, term, n, n_tok): the relation every round re-scores — K×V
    # rows, far below the token stream it aggregates.
    ntok = dterm.groupBy("domain").agg(
        F.sum(F.col("n").cast("bigint")).alias("ntok")
    )
    dtn = dterm.join(ntok, "domain")
    if materialize:
        # every round reads dtn twice (mixture LM + per-domain loss); an
        # unpersisted relation would re-execute the corpus-scale tokenize
        # aggregate feeding dterm once per reference. Stage probe: the
        # proxy-side corpus scoring pass, for the bench stage ledger.
        with stage("scoring"):
            dtn = dtn.localCheckpoint(eager=True)
    vocab = dtn.groupBy("term").agg(F.sum(F.col("n").cast("bigint")).alias("c"))
    # reference loss: add-1-smoothed bigram LM (bigram_logprob's LM), the
    # stronger FIXED model (the paper's reference does not retrain) —
    # counts aggregate before any join (the (domain, bigram) relation is
    # vocab-bounded, far below the token stream)
    uni = vocab.select(F.col("term").alias("w1"), F.col("c").alias("cu"))
    v = vocab.agg(F.count(F.lit(1)).cast("double").alias("_v"))
    nll_b = F.round(
        -F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("_v"))), 6
    ).cast("decimal(20,6)")
    # NOTE kept as aggregate-then-join-back, NOT a (w1, w2) window sum: the
    # aggregated count relations are far smaller than the occurrence-keyed
    # input and the planner broadcasts/hashes them, so the join never
    # re-shuffles the big side — an A/B of the window form measured 1.5×
    # SLOWER end-to-end (the window forces a full sort of the big relation
    # that the broadcast join shape never pays). Contrast soft_dedup_weights,
    # where the "aggregate" is gram-frequency (near-corpus-sized, never
    # broadcastable) and the window form wins.
    cbg = dbg.groupBy("w1", "w2").agg(F.sum(F.col("n").cast("bigint")).alias("cb"))
    lr_ = (
        dbg.join(cbg, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("domain")
        .agg(
            (
                F.sum(F.col("n") * nll_b).cast("double")
                / F.sum(F.col("n").cast("bigint")).cast("double")
            ).alias("lr")
        )
    )
    dom = nd.join(lr_, "domain").select("domain", "n_docs", "lr")
    if materialize:
        # cut the bigram-LM subtree out of the per-round chain: each round
        # references the previous iterate twice (normalizer + update), so an
        # unpersisted domain relation would re-execute the reference pass
        # 2^rounds times. Stage probe: the reference-side scoring pass.
        with stage("ref_loss"):
            dom = dom.localCheckpoint(eager=True)

    kk = dom.agg(F.count(F.lit(1)).cast("bigint").alias("_k"))
    dec = "decimal(28,9)"

    # explicit micro/nano-unit rounding for every computed-double render: a
    # bare round(x, d) is not engine-stable on .5 boundaries (the
    # slm_token_select lesson); transcendental OUTPUTS (ln/exp) keep the
    # established bare 6-dp round — their inputs are unit-quantized here.
    def _u6(c):
        return F.round(c * F.lit(1e6), 0).cast("bigint") / F.lit(1e6)

    def _u9(c):
        return F.round(c * F.lit(1e9), 0).cast("bigint") / F.lit(1e9)

    cur = dom.crossJoin(F.broadcast(kk)).select(
        "domain", "n_docs", "lr", "_k",
        F.lit(0.0).alias("lp"),
        F.lit(0.0).alias("excess"),
        _u9(F.lit(1.0) / F.col("_k")).alias("alpha"),
        F.lit(0).cast(dec).alias("acc"),
    )
    pico = F.round(
        F.col("alpha") * F.col("n").cast("double") / F.col("ntok").cast("double")
        * F.lit(1e15),
        0,
    ).cast("bigint")
    nll_m = F.round(
        -F.log(F.col("pm").cast("double") / F.lit(1e15)), 6
    ).cast("decimal(20,6)")
    for _ in range(rounds):
        # proxy re-score under the current mixture: K-row alpha broadcast
        # onto the (domain, term) relation, one term-keyed aggregate (the
        # mixture LM), one domain-keyed aggregate (the per-domain loss).
        # Kept as aggregate-then-join-back, NOT a per-term window sum: the
        # vocab-sized pm_rel broadcasts back onto the checkpointed dtn, so
        # the K×V relation is never sorted or re-shuffled — an A/B of the
        # window form measured 1.5× slower per round (see ref_loss note).
        pm_rel = (
            dtn.join(F.broadcast(cur.select("domain", "alpha")), "domain")
            .groupBy("term")
            .agg(F.greatest(F.sum(pico), F.lit(1)).alias("pm"))
        )
        lpd = (
            dtn.join(pm_rel.select("term", nll_m.alias("_nll")), "term")
            .groupBy("domain")
            .agg(
                (
                    F.sum(F.col("n") * F.col("_nll")).cast("double")
                    / F.sum(F.col("n").cast("bigint")).cast("double")
                ).alias("_lp")
            )
        )
        stepped = (
            cur.drop("lp", "excess")
            .join(F.broadcast(lpd), "domain")
            .select(
                "domain", "n_docs", "lr", "_k", "alpha", "acc",
                F.col("_lp").alias("lp"),
                _u6(F.greatest(F.lit(0.0), F.col("_lp") - F.col("lr"))).alias(
                    "excess"
                ),
            )
            .select(
                "*", F.round(F.exp(F.lit(eta) * F.col("excess")), 6).alias("e")
            )
        )
        numn = F.round(F.col("alpha") * F.col("e") * F.lit(1e9), 0).cast("bigint")
        stepped = stepped.select("*", numn.alias("numn"))
        z = stepped.agg(F.sum("numn").alias("_z"))
        alpha1 = _u6(F.col("numn").cast("double") / F.col("_z"))
        cur = (
            stepped.crossJoin(F.broadcast(z))
            .select(
                "domain", "n_docs", "lr", "_k", "lp", "excess",
                alpha1.alias("alpha"),
                (F.col("acc") + alpha1.cast(dec)).cast(dec).alias("acc"),
            )
        )
        if materialize:
            # stage probe accumulates across rounds: the per-round proxy
            # re-score + exponentiated-gradient work, vs the one-time
            # scoring/ref_loss passes above (the r11 verdict's bench ask)
            with stage("gd_rounds"):
                cur = cur.localCheckpoint(eager=True)
    return cur.select(
        "domain",
        "n_docs",
        _u6(F.col("lp")).alias("proxy_nll"),
        _u6(F.col("lr")).alias("ref_nll"),
        F.col("excess").alias("excess_loss"),
        _u6(
            F.lit(1.0 - smoothing) * (F.col("acc").cast("double") / F.lit(float(rounds)))
            + F.lit(smoothing) * (F.lit(1.0) / F.col("_k"))
        ).alias("weight"),
    )


def doremi_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    rounds: int = 4,
    eta: float = 0.5,
    smoothing: float = 0.02,
    seed: int = 13,
    materialize: bool = True,
) -> DataFrame:
    """APPLY the trained DoReMi mixture: deterministically downsample each
    domain so the kept corpus realizes :func:`doremi_weights`' target
    shares — the train-time half the weights exist for (DoReMi's output is
    the mixture the FINAL model trains under). A domain's per-doc keep
    probability is proportional to weight_d / n_docs_d, normalized so the
    bottleneck domain (largest ratio) keeps everything — the same
    no-replacement realization rule as :func:`temperature_sample`, with
    the learned weights in place of the sqrt law.

    Bit-determinism: the ratio uses the engine-exact weight and an exact
    count with IEEE divides only (no floating SUM); the keep decision is
    the package's fixed-width hex-threshold idiom — floor(keep_p·16⁸)
    compared against the salted md5 prefix, with the sentinel 'g' for
    keep_p = 1 groups (a numeric cap would still drop the one-in-2³²
    'ffffffff' ids). Membership is a pure function of
    (seed, id, trained weights) — reproducible in any engine, invariant
    to partitioning.

    Scale: everything after doremi_weights' two LM passes is a K-row
    relation; the threshold table broadcasts and the keep decision is a
    stateless filter inside the scan — no corpus shuffle."""
    from pyspark.sql.functions import broadcast

    w = doremi_weights(
        df, id_col, text_col, domain_col, rounds, eta, smoothing, materialize
    ).select("domain", "n_docs", "weight")
    r = F.col("weight") / F.col("n_docs")
    mx = w.agg(F.max(F.col("weight") / F.col("n_docs")).alias("_mx"))
    thr = w.crossJoin(broadcast(mx)).select(
        "domain",
        F.when(r >= F.col("_mx"), F.lit("g"))
        .otherwise(
            F.lpad(
                F.lower(
                    F.hex(
                        F.least(
                            F.floor(r / F.col("_mx") * F.lit(4294967296.0)).cast(
                                "bigint"
                            ),
                            F.lit(4294967295),
                        )
                    )
                ),
                8,
                "0",
            )
        )
        .alias("_thr"),
    )
    h = F.substring(_salted_hash(id_col, seed), 1, 8)
    return (
        df.select(F.col(id_col), F.col(domain_col).alias("domain"))
        .join(broadcast(thr), "domain")
        .filter(h < F.col("_thr"))
        .select(id_col, "domain")
    )


def source_diversity(
    df: DataFrame, group_col: str, source_col: str, round_digits: int = 6
) -> DataFrame:
    """Per-group source-DIVERSITY audit — the data-mixing health metric next
    to the raw shares of :func:`source_mix_report`: for each ``group_col``
    (language), the Shannon entropy in bits of the doc-count distribution
    over ``source_col`` (domains/crawl snapshots), the effective number of
    sources 2^H (the "how many equally-sized domains is this worth"
    headline every corpus card publishes), and the largest single-source
    share (the concentration red flag). A corpus whose effective source
    count collapses is one scrape away from domain overfitting.

    Determinism: each −p·log2(p) term rounds to 9 dp and accumulates in
    DECIMAL(28,9) (the package's partitioning-invariant float recipe);
    2^H and the top share round once at the end.

    Shape at 100 TB: one (group, source)-keyed count aggregate (map-side
    partials), one group-keyed rollup over the sources-sized relation —
    nothing downstream of the first aggregate scales with the corpus."""
    counts = df.groupBy(group_col, source_col).agg(F.count(F.lit(1)).alias("c"))
    return source_diversity_from_counts(counts, group_col, round_digits)


def source_diversity_from_counts(
    counts: DataFrame, group_col: str, round_digits: int = 6
) -> DataFrame:
    """The derived half of :func:`source_diversity` over PRE-AGGREGATED
    (group, source, c) count rows — shared with the streaming twin
    (``stream_source_diversity``), whose (group, source) counters a
    streaming grouped aggregate maintains; entropy/effective-sources/top
    share are pure functions of the counts, so the snapshot report equals
    the batch report exactly."""
    w = Window.partitionBy(group_col)
    p = F.col("c").cast("double") / F.sum("c").over(w).cast("double")
    terms = counts.select(
        F.col(group_col),
        p.alias("_p"),
        F.round(-p * F.log2(p), 9).cast("decimal(28,9)").alias("_th"),
    )
    h = F.sum("_th").cast("double")
    return terms.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        h.alias("entropy_bits"),
        F.round(F.pow(F.lit(2.0), h), round_digits).alias("effective_sources"),
        F.round(F.max("_p"), round_digits).alias("top_share"),
    )


def pack_boundary_audit(
    df: DataFrame,
    id_col: str,
    stream_col: str,
    token_col,
    budget: int,
    round_digits: int = 6,
) -> DataFrame:
    """Cross-document boundary audit of the concat-then-chunk pack layout —
    the packing-quality metric next to :func:`pack_efficiency_report`'s fill
    fraction: every extra document inside a pack adds one cross-document
    boundary an attention window can straddle, so per stream the audit
    reports docs, packs, tokens, mean docs per pack, and boundaries per 1k
    tokens ((n_docs − n_packs) / total_tokens × 1000 — each pack's first
    doc starts it, every later doc adds a boundary). High boundary density
    means short documents are bleeding context into each other; the fix is
    doc-length-aware packing or masked attention.

    Shape at 100 TB: reuses :func:`pack_sequences`' one window cumsum, then
    ONE stream-keyed aggregate (count + distinct pack ids + token sum) —
    the distinct is over pack ids which are dense integers per stream."""
    packed = pack_sequences(df, id_col, stream_col, token_col, budget)
    nd = F.count(F.lit(1)).cast("bigint")
    np_ = F.countDistinct("pack_id").cast("bigint")
    nt = F.sum("n_tokens").cast("bigint")
    return packed.groupBy(stream_col).agg(
        nd.alias("n_docs"),
        np_.alias("n_packs"),
        nt.alias("total_tokens"),
        F.round(nd.cast("double") / np_, round_digits).alias("avg_docs_per_pack"),
        F.round((nd - np_).cast("double") / nt * 1000, round_digits).alias(
            "boundaries_per_1k_tokens"
        ),
    )
