#!/usr/bin/env python
"""Benchmark harness: run the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-13 hardening — the r12 driver artifact lost its
medians to tail truncation of one huge JSON line):

- the FULL payload (medians + spread + sentinel + stages + retimed + loadavg)
  is written to BENCH_local.json in the repo root, committed per round;
- stdout's LAST line is a COMPACT medians-only JSON object
  {"metric", "value", "unit", "queries", "sf", "full"} (~700 chars for 34
  queries) so a tail-truncating capture always preserves a parseable line.

Queries tagged "bench" in the registry are the headline set (TPC-H-style
scan/agg, multi-join, top-k + window/dedup/pipeline flagships). Each is timed
to full materialization after warm-ups; see _time_one for the protocol.

`python bench.py --retime q1,q2` is the fresh-session adjudication mode: a
NEW process/JVM times just those queries (same warm-up + median-of-3
protocol) and prints {"retimed": {...}} — used automatically by the main run
for burst-suspect movers, and manually when adjudicating round-over-round
movers on a quiet host.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_1_12_0_src_spark.queries import load_all  # noqa: E402
from flink_1_12_0_src_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parent


def preflight_load_gate(cpus: int) -> tuple[tuple | None, bool]:
    """Pre-flight host-load gate. Recording a load field was not enough —
    the r08 artifact was taken at loadavg 17.4/32 and showed a uniform
    phantom 1.95× that cost an adjudication cycle. If the host is busy
    (1-min loadavg above ~cpus/8), WAIT for quiet — bounded, default 5
    minutes — and only if it never quiets down proceed with an explicit
    ``contaminated`` flag, so the recorded artifact is trustworthy
    standalone. Returns (loadavg_start, contaminated); loadavg_start is
    None when the platform has no getloadavg."""
    try:
        loadavg_start: tuple[float, float, float] | None = os.getloadavg()
    except OSError:
        return None, False
    la = loadavg_start
    print(
        f"# host loadavg at start: {la[0]:.1f} {la[1]:.1f} {la[2]:.1f} (cpus={cpus})",
        file=sys.stderr,
    )
    load_gate = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", str(cpus / 8)))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT_SEC", "300"))
    poll = min(15.0, max(wait_budget, 0.01))
    contaminated = False
    if loadavg_start[0] > load_gate:
        deadline = time.monotonic() + wait_budget
        while loadavg_start[0] > load_gate and time.monotonic() < deadline:
            print(
                f"# host busy (1-min loadavg {loadavg_start[0]:.1f} > gate "
                f"{load_gate:.1f}); waiting for quiet...",
                file=sys.stderr,
            )
            time.sleep(poll)
            loadavg_start = os.getloadavg()
        if loadavg_start[0] > load_gate:
            contaminated = True
            print(
                f"# still busy after {wait_budget:.0f}s "
                f"(loadavg {loadavg_start[0]:.1f}); proceeding CONTAMINATED",
                file=sys.stderr,
            )
    return loadavg_start, contaminated


def _reset_caches(spark) -> None:
    # clearCache only clears the SQL cache; every materializing operator run
    # also leaves its localCheckpoint RDD pinned MEMORY_AND_DISK — ~150 runs
    # into the set the accumulated blocks squeeze execution memory and later
    # queries read 5-10× slower (observed: pipeline_clean_corpus 2 s
    # fresh-session vs 24 s late-session on identical code).
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def _warm_session(spark) -> None:
    """Warm up the JVM + whole-stage-codegen paths the headline queries use
    (agg, shuffle, window, join, explode+hash) on tiny synthetic data, so the
    first timed query measures steady-state throughput, not JIT compilation."""
    warm = spark.range(100_000).selectExpr(
        "id", "id % 97 AS k", "md5(concat('x', id)) AS s"
    )
    warm.groupBy("k").count().count()
    warm.selectExpr(
        "k", "row_number() OVER (PARTITION BY k ORDER BY id) AS rn"
    ).where("rn <= 3").count()
    warm.alias("a").join(warm.alias("b"), "k").count()
    warm.selectExpr("explode(split(s, '')) AS c").groupBy("c").count().count()


def _time_one(
    spark, q, sf_dir: str, runs: int, warmups: int
) -> tuple[list[float], list[dict[str, float]], int]:
    """Per-query timing protocol: TWO untimed warm-up runs (pays
    plan-shape-specific codegen/JIT, which at bench SF can exceed the actual
    work), then runs timed samples — steady-state throughput, the regime a
    long-lived 100 TB job operates in, robust to transient host load (this
    machine shows up to 20× timing variance under co-tenant pressure; a
    single sample recorded a phantom regression in round 3). Two warm-ups,
    not one: queries with deep multi-stage plans (dedup_minhash_lsh runs ~36
    stages) measurably still pay JIT in the first 1-2 post-warm-up runs —
    settling only from run 3, which inflated the r07 median ~1.4× on
    unchanged code. When the spread is pathological (max > 3× min — a
    co-tenant spike poisoning one sample), takes two extra runs so the
    median re-centers on the steady state. Returns (sorted samples,
    per-run stage dicts, last row count)."""
    from flink_1_12_0_src_spark.pipeline.stageclock import record_stages

    for _ in range(warmups):
        _reset_caches(spark)
        q.spark(spark, sf_dir).count()
    samples: list[float] = []
    stage_runs: list[dict[str, float]] = []
    n = 0

    def timed_run():
        nonlocal n
        _reset_caches(spark)
        stages: dict[str, float] = {}
        t0 = time.perf_counter()
        with record_stages(stages):
            df = q.spark(spark, sf_dir)
            n = df.count()
        samples.append(time.perf_counter() - t0)
        stage_runs.append(stages)

    for _ in range(runs):
        timed_run()
    if max(samples) > 3 * min(samples):
        timed_run()
        timed_run()
    samples.sort()
    return samples, stage_runs, n


def retime_main(names: list[str]) -> None:
    """Fresh-session adjudication: time just `names` in this (new) process
    and print {"retimed": {name: {"median", "spread"}}} as the last stdout
    line. The parent bench run (or a human adjudicating a mover) reads it."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
    reg = load_all()
    spark = get_spark(app_name="bench-retime", cpus=cpus, shuffle_partitions=cpus)
    _warm_session(spark)
    out: dict[str, dict] = {}
    for name in names:
        q = reg.get(name)
        if q is None:
            print(f"# retime: unknown query {name!r}, skipping", file=sys.stderr)
            continue
        samples, _, n = _time_one(spark, q, sf_dir, runs, warmups)
        out[name] = {
            "median": round(samples[len(samples) // 2], 4),
            "spread": [round(samples[0], 4), round(samples[-1], 4)],
        }
        print(f"# retime {name}: {out[name]} rows={n}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"retimed": out}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Host-load context for the reader: this machine shows up to 20× timing
    # variance under co-tenant pressure (see round-3/6 phantom regressions) —
    # a high 1-min load average at start means the run should be re-taken.
    # Recorded INTO the JSON artifact (not just stderr) so any future mover
    # self-adjudicates against the load it ran under.
    loadavg_start, contaminated = preflight_load_gate(cpus)

    reg = load_all()
    bench_qs = {name: q for name, q in sorted(reg.items()) if "bench" in q.tags}

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus)
    _warm_session(spark)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    stage_medians: dict[str, dict[str, float]] = {}
    # Session-health sentinel: the same tiny stable query re-timed every few
    # queries. Per-query spread exposes WITHIN-query bursts, but in-session
    # degradation (accumulated JVM/shuffle state inflating late-position
    # queries ~2x on some runs, observed round 12: pipeline_refinedweb_corpus
    # 8.1 s in-session vs 4.2 s fresh-session on identical code) is only
    # visible against a fixed yardstick. A drifting sentinel tells the
    # reader to fresh-session re-time late movers before adjudicating.
    sentinel_q = bench_qs.get("tpch_q6")
    sentinel: dict[str, float] = {}
    # sentinel probe name -> index of the query it fired before (len(bench_qs)
    # for the end probe); used to attribute a burst to the queries timed
    # between two probes.
    sentinel_pos: dict[str, int] = {}

    def probe_sentinel(after: str, pos: int):
        if sentinel_q is None:
            return
        t0 = time.perf_counter()
        sentinel_q.spark(spark, sf_dir).count()
        sentinel[after] = round(time.perf_counter() - t0, 4)
        sentinel_pos[after] = pos

    # The generic warm block doesn't execute the sentinel's own plan, so the
    # first recorded probe would measure its cold codegen, not host health —
    # one untimed run first makes every probe measure the same warmed state
    # (r12 ADVICE).
    if sentinel_q is not None:
        sentinel_q.spark(spark, sf_dir).count()

    for qi, (name, q) in enumerate(bench_qs.items()):
        if qi % 5 == 0:
            probe_sentinel(f"before_{name}", qi)
        samples, stage_runs, n = _time_one(spark, q, sf_dir, runs, warmups)
        timings[name] = round(samples[len(samples) // 2], 4)
        # Per-query min/max across the timed runs: additive host noise shows
        # as a wide uniform spread, so a future mover self-adjudicates
        # host-drift vs plan-regression from the artifact alone (the r11
        # uniform +0.08 s drift cost an adjudication cycle).
        spreads[name] = [round(samples[0], 4), round(samples[-1], 4)]
        # Per-stage wall times for the composed flagships (the operators'
        # eager stage barriers report through pipeline/stageclock.py):
        # median per stage across the timed runs, so a future mover
        # localizes to a stage instead of costing an adjudication cycle.
        stage_keys = sorted({k for sr in stage_runs for k in sr})
        if stage_keys:
            stage_medians[name] = {
                k: round(sorted(sr.get(k, 0.0) for sr in stage_runs)[len(stage_runs) // 2], 4)
                for k in stage_keys
            }
        print(
            f"# {name}: median {timings[name]:.3f}s of {[round(s, 3) for s in samples]} rows={n}"
            + (f" stages={stage_medians[name]}" if stage_keys else ""),
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    try:
        loadavg_end: tuple[float, float, float] | None = os.getloadavg()
    except OSError:
        loadavg_end = None
    probe_sentinel("end", len(bench_qs))

    # Auto-adjudication (r12 verdict task #4): a query whose in-session
    # spread is wide (max/min > 1.5) while an adjacent sentinel probe shows a
    # host burst (> 2× the best probe) is a burst suspect — three rounds
    # running, such movers cost a judge-side re-run. Re-time them in a FRESH
    # process (new JVM, quiet protocol) after the main session stops, and
    # record the result in the artifact as `retimed` so it self-adjudicates.
    retimed: dict[str, dict] = {}
    suspects: list[str] = []
    if sentinel and os.environ.get("SPARK_GRAFT_BENCH_RETIME", "1") == "1":
        yardstick = min(sentinel.values())
        probes = sorted(sentinel_pos.items(), key=lambda kv: kv[1])
        for qi, name in enumerate(bench_qs):
            lo, hi = spreads[name]
            if lo <= 0 or hi / lo <= 1.5:
                continue
            # probes bracketing this query: last at pos <= qi, first after
            before = [sentinel[k] for k, p in probes if p <= qi]
            after = [sentinel[k] for k, p in probes if p > qi]
            near = before[-1:] + after[:1]
            if near and max(near) > 2 * yardstick:
                suspects.append(name)
    spark.stop()
    if suspects:
        print(f"# burst suspects, fresh-session retiming: {suspects}", file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--retime", ",".join(suspects)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            sys.stderr.write(proc.stderr)
            last = proc.stdout.strip().splitlines()[-1]
            retimed = json.loads(last).get("retimed", {})
        except Exception as ex:  # adjudication is best-effort; never fail the bench
            print(f"# retime subprocess failed: {ex}", file=sys.stderr)

    payload = {
        "metric": "headline_query_set_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if spreads:
        payload["spread"] = spreads
    if sentinel:
        payload["sentinel"] = sentinel
    if stage_medians:
        payload["stages"] = stage_medians
    if retimed:
        payload["retimed"] = retimed
    # Self-adjudication context: loadavg at start/end (1/5/15-min). With 3
    # runs per query this process alone settles near `cpus` while executing,
    # so the 1-min START value (taken before the session spins up) and the
    # 15-min values are the co-tenancy signals to read.
    if loadavg_start is not None:
        payload["loadavg_start"] = [round(x, 2) for x in loadavg_start]
    if loadavg_end is not None:
        payload["loadavg_end"] = [round(x, 2) for x in loadavg_end]
    if contaminated:
        payload["contaminated"] = True

    # Full payload → committed file; compact medians-only line → LAST stdout
    # line. The r12 driver capture kept only the TAIL of stdout and the
    # single huge JSON line lost its front (medians unrecoverable, judge fell
    # back to spread midpoints). The compact line is ~700 chars for 34
    # queries, so any tail window preserves it whole; `full` points at the
    # committed artifact carrying spread/sentinel/stages/retimed.
    full_path = REPO / "BENCH_local.json"
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# full payload written to {full_path}", file=sys.stderr)
    compact = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "full": "BENCH_local.json",
    }
    # the contamination verdict must survive a stdout-tail-only capture too —
    # a consumer that never sees BENCH_local.json must not take a busy-host
    # run's medians at face value
    if contaminated:
        compact["contaminated"] = True
    print(json.dumps(compact))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--retime":
        if len(sys.argv) < 3 or not sys.argv[2].strip(","):
            sys.exit("usage: bench.py --retime q1[,q2,...]  (no names given; "
                     "refusing to fall through to the full benchmark)")
        retime_main([s for s in sys.argv[2].split(",") if s])
    else:
        main()
