#!/usr/bin/env python
"""Record the OBSERVED margin of every probabilistic sketch-contract row.

The sketch contracts (Bloom expected-FP, approx_percentile rank band, HLL++
4-sigma band, Count-Min (e/width)·N, CMS-priced SoftDeDup drift) pin
booleans that hold with high probability — a dataset regen, SF change, or
Spark sketch-implementation bump can legitimately flip one and surface as a
driver red that looks like an engine bug (round-11 ADVICE). This tool
records how far inside each bound the data actually sits, so a future red
is triaged as contract-flake vs regression from the artifact alone.

Usage: python tools/contract_margins.py   # writes CONTRACT_MARGINS.json
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from flink_1_12_0_src_spark.catalog import table  # noqa: E402
from flink_1_12_0_src_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    out: dict = {"sf": float(m.group(1)) if m else None, "contracts": {}}
    spark = get_spark(app_name="contract_margins", cpus=cpus, shuffle_partitions=cpus)

    # approx_percentile rank band: slack (in ranks, normalized by n) between
    # the sketch answer's rank interval and the floor/ceil band edges.
    # Parameters come from the SAME constants the contract rows assert
    # (operators/analytics.py) — a parameter change there retargets this
    # tool automatically.
    from flink_1_12_0_src_spark.operators.analytics import (
        HLL_RSD,
        HLL_TOL_MULT,
        PCT_ACCURACY,
        PCT_PERCENTILES,
    )

    ev = table(spark, sf_dir, "events")
    from flink_1_12_0_src_spark.operators.analytics import PCT_BAND_MULT

    ps, acc = list(PCT_PERCENTILES), PCT_ACCURACY
    # STRICT sketch bound (the published ε); the registered rows pin the
    # wider PCT_BAND_MULT·ε band, so strict-slack here is the early-warning
    # signal — it can go negative without the pinned boolean flipping.
    eps = 1.0 / acc
    agg = ev.groupBy("event_type").agg(
        F.count("value").cast("bigint").alias("n"),
        F.percentile_approx("value", F.lit(ps), F.lit(acc)).alias("ap"),
    )
    ans = agg.select(
        "event_type", "n", F.posexplode("ap").alias("i", "apv")
    ).select(
        "event_type", "n", F.element_at(F.lit(ps), F.col("i") + 1).alias("q"), "apv"
    )
    ranked = (
        ev.select("event_type", F.col("value").alias("_v"))
        .join(F.broadcast(ans), "event_type")
        .groupBy("event_type", "q", "n", "apv")
        .agg(
            F.sum((F.col("_v") <= F.col("apv")).cast("bigint")).alias("n_le"),
            F.sum((F.col("_v") < F.col("apv")).cast("bigint")).alias("n_lt"),
        )
    )
    rows = ranked.select(
        (
            (F.col("n_le") - F.floor((F.col("q") - eps) * F.col("n")))
            / F.col("n").cast("double")
        ).alias("lo_slack"),
        (
            (F.ceil((F.col("q") + eps) * F.col("n")) - (F.col("n_lt") + 1))
            / F.col("n").cast("double")
        ).alias("hi_slack"),
    ).collect()
    out["contracts"]["events_value_percentiles_approx"] = {
        "bound": f"strict sketch bound eps={eps}; pinned boolean uses "
        f"{PCT_BAND_MULT}x this band",
        "min_lo_slack_frac": round(min(r["lo_slack"] for r in rows), 6),
        "min_hi_slack_frac": round(min(r["hi_slack"] for r in rows), 6),
        "note": "slack vs the STRICT band as fraction of n; the pinned "
        "boolean flips only past the wider band, so strict slack going "
        "negative is the early warning, not a red",
    }

    # HLL++ 4-sigma band: observed relative error vs 4*rsd.
    rsd = HLL_RSD
    hll = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").cast("double").alias("ex"),
            F.approx_count_distinct("user_id", rsd).cast("double").alias("ap"),
        )
        .select((F.abs(F.col("ap") - F.col("ex")) / F.col("ex")).alias("rel"))
        .collect()
    )
    worst = max(r["rel"] for r in hll)
    out["contracts"]["events_distinct_users_approx"] = {
        "bound": f"rel_err <= {HLL_TOL_MULT}*rsd = {HLL_TOL_MULT * rsd}",
        "max_rel_err": round(worst, 6),
        "margin_used_frac": round(worst / (HLL_TOL_MULT * rsd), 4),
    }

    # Count-Min heavy hitters: worst overestimate vs (e/width)*N.
    from flink_1_12_0_src_spark.pipeline.dedup import cms_state_rows, cms_topk_contract
    from flink_1_12_0_src_spark.pipeline.text import shingles
    from flink_1_12_0_src_spark.queries.pipelineq import (
        CMS_HEX,
        CMS_K,
        CMS_SLICES,
        CMS_TOPK,
    )

    docs = table(spark, sf_dir, "documents")
    state = (
        cms_state_rows(docs, "text", CMS_K, CMS_SLICES, CMS_HEX)
        .groupBy("i", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grams = docs.select(F.explode(shingles("text", CMS_K)).alias("sh"))
    cms = cms_topk_contract(state, grams, "sh", CMS_TOPK, CMS_SLICES, CMS_HEX).collect()
    n_total = grams.count()
    bound = math.e / float(16 ** CMS_HEX) * n_total
    worst_over = max(r["overestimate"] for r in cms)
    out["contracts"]["text_heavy_hitters_cms"] = {
        "bound": f"overestimate <= (e/width)*N = {round(bound, 1)}",
        "max_overestimate": int(worst_over),
        "margin_used_frac": round(worst_over / bound, 4),
    }

    # CMS-priced SoftDeDup: worst mean-nll gap vs ln(1 + (e/width)*N_grams).
    from flink_1_12_0_src_spark.queries import load_all

    reg = load_all()
    soft = reg["dedup_soft_weights_cms"].spark(spark, sf_dir).collect()
    out["contracts"]["dedup_soft_weights_cms"] = {
        "bound": "mean-nll gap <= ln(1+(e/width)*N); drift reported",
        "max_weight_drift": round(max(r["drift"] for r in soft), 6),
        "all_within_bound": all(r["within_bound"] for r in soft),
        "all_conservative": all(r["cms_conservative"] for r in soft),
    }

    # Bloom: measured probe FP rate vs the closed-form expectation.
    blm = reg["dedup_bloom_membership"].spark(spark, sf_dir).collect()
    non = [r for r in blm if not r["actual_member"]]
    measured = sum(1 for r in non if r["false_positive"]) / max(len(non), 1)
    rep = reg["stream_bloom_filter_only"].spark(spark, sf_dir).collect()
    expected = rep[0]["expected_fp_rate"]
    out["contracts"]["bloom_membership"] = {
        "bound": "measured FP ~= closed-form expected FP (binomial noise)",
        "measured_fp": round(measured, 6),
        "expected_fp": round(float(expected), 6),
    }

    # ----- streaming halves (r12 verdict task #8) -----------------------
    # The twins assert the SAME bounds on their maintained snapshot state;
    # recording their observed margins makes a twin-side contract red
    # triageable from the artifact alone. Margin fields come from the
    # registered twins' own outputs (each runs its real Structured Streaming
    # job to completion internally).
    out["streaming"] = {}

    # Quantile-histogram twin: the rank answer v*(q) comes from the
    # histogram, not approx_percentile, so its slack is genuinely different
    # from the batch row's. The snapshot equals the batch-derived counts
    # (pinned by the order/boundary-invariance and losslessness tests), so
    # derive the slack from the batch-equivalent state.
    # state + bucket walk via the SAME operator code the registered twin
    # runs (hist_bucket_answers / PCT_SCALE) — a scale or walk change there
    # retargets this measurement automatically instead of silently diverging
    from flink_1_12_0_src_spark.operators.analytics import (
        hist_bucket_answers,
        percentile_state_rows,
    )

    hist = (
        percentile_state_rows(ev)
        .groupBy("event_type", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nv = (
        hist.filter(F.col("cv").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("n").cast("bigint").alias("nv"))
    )
    tq = nv.select(
        "event_type", "nv", F.explode(F.lit(ps)).alias("q")
    ).withColumn("_r", F.ceil(F.col("q") * F.col("nv")))
    hans = hist_bucket_answers(hist, tq, "event_type")
    hranked = (
        ev.select("event_type", F.col("value").alias("_v"))
        .join(F.broadcast(hans), "event_type")
        .groupBy("event_type", "q", "nv", "apv")
        .agg(
            F.sum((F.col("_v") <= F.col("apv")).cast("bigint")).alias("n_le"),
            F.sum((F.col("_v") < F.col("apv")).cast("bigint")).alias("n_lt"),
        )
    )
    hrows = hranked.select(
        ((F.col("n_le") - F.floor((F.col("q") - eps) * F.col("nv")))
         / F.col("nv").cast("double")).alias("lo_slack"),
        ((F.ceil((F.col("q") + eps) * F.col("nv")) - (F.col("n_lt") + 1))
         / F.col("nv").cast("double")).alias("hi_slack"),
    ).collect()
    out["streaming"]["stream_value_percentiles"] = {
        "bound": f"strict sketch bound eps={eps}; pinned boolean uses "
        f"{PCT_BAND_MULT}x this band",
        "min_lo_slack_frac": round(min(r["lo_slack"] for r in hrows), 6),
        "min_hi_slack_frac": round(min(r["hi_slack"] for r in hrows), 6),
        "note": "histogram rank answer on the twin's snapshot state "
        "(batch-equivalent counts; equality pinned by the invariance tests)",
    }

    # CMS twin: same (e/width)*N bound, overestimates read from the twin's
    # own streaming output.
    scms = reg["stream_heavy_hitters_cms"].spark(spark, sf_dir).collect()
    worst_s = max(r["overestimate"] for r in scms)
    out["streaming"]["stream_heavy_hitters_cms"] = {
        "bound": f"overestimate <= (e/width)*N = {round(bound, 1)}",
        "max_overestimate": int(worst_s),
        "margin_used_frac": round(worst_s / bound, 4),
    }

    # Sketch-only SoftDeDup twin: drift contract fields are in the output.
    ssoft = reg["stream_soft_weights_cms"].spark(spark, sf_dir).collect()
    out["streaming"]["stream_soft_weights_cms"] = {
        "bound": "mean-nll gap <= ln(1+(e/width)*N); drift reported",
        "max_weight_drift": round(max(r["drift"] for r in ssoft), 6),
        "all_within_bound": all(r["within_bound"] for r in ssoft),
        "all_conservative": all(r["cms_conservative"] for r in ssoft),
    }

    # Bloom twin: measured FP on the streamed filter state vs closed form.
    sblm = reg["stream_bloom_membership"].spark(spark, sf_dir).collect()
    snon = [r for r in sblm if not r["actual_member"]]
    smeasured = sum(1 for r in snon if r["false_positive"]) / max(len(snon), 1)
    out["streaming"]["stream_bloom_membership"] = {
        "bound": "measured FP ~= closed-form expected FP (binomial noise)",
        "measured_fp": round(smeasured, 6),
        "expected_fp": round(float(expected), 6),
    }

    spark.stop()
    path = Path(__file__).resolve().parent.parent / "CONTRACT_MARGINS.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
