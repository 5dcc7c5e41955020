"""Property-based aggregate-function parity (the reference's per-function test
strategy, SURVEY.md §5.5: …/planner/functions/aggfunctions/*Test.java drive
each aggregate over generated accumulate/retract tables).

Here: hypothesis generates random (key, value-with-nulls) tables; every
aggregate must agree exactly between Spark and DuckDB on the same pandas
input. Exactness discipline: integer domains (sums/products exact), avg as
one double division of two exact values, variance via exact sum-of-squares,
ordered listagg — so no float tolerance is needed, mirroring the oracle gate.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.one_of(st.none(), st.integers(-100, 100))),
    min_size=0,
    max_size=30,
)


@given(data=ROWS)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_agg_function_parity(spark, data):
    pdf = pd.DataFrame(data, columns=["k", "v"]).astype({"k": "int64", "v": "Int64"})
    sdf = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None), "k bigint, v bigint")
    got = {
        tuple(r[:1]): tuple(r[1:])
        for r in sdf.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.count("v").alias("nv"),
            F.count_distinct("v").alias("nd"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            (F.sum("v").cast("double") / F.count("v")).alias("avg"),
            F.sum(F.col("v") * F.col("v")).alias("ssq"),
            F.array_join(F.sort_array(F.collect_list(F.col("v").cast("string"))), ",").alias("lst"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        tuple(r[:1]): tuple(r[1:])
        for r in con.execute(
            """
            SELECT k, COUNT(*), COUNT(v), COUNT(DISTINCT v),
                   CAST(SUM(v) AS BIGINT), MIN(v), MAX(v),
                   CAST(SUM(v) AS DOUBLE) / COUNT(v),
                   CAST(SUM(v * v) AS BIGINT),
                   COALESCE(string_agg(CAST(v AS VARCHAR), ',' ORDER BY CAST(v AS VARCHAR)), '')
            FROM t GROUP BY k
            """
        ).fetchall()
    }
    con.close()
    assert got == want


EDGE_SETS = st.sets(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] < e[1]),
    min_size=0,
    max_size=16,
)


@given(es=EDGE_SETS)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_triadic_census_matches_bruteforce(spark, es):
    from itertools import combinations

    from flink_1_12_0_src_spark.operators.graph import triadic_census

    if not es:
        return
    verts = sorted({v for e in es for v in e})
    counts = [0, 0, 0, 0]
    for triple in combinations(verts, 3):
        k = sum(
            1
            for a, b in combinations(sorted(triple), 2)
            if (a, b) in es
        )
        counts[k] += 1
    df = spark.createDataFrame(sorted(es), ["src", "dst"])
    row = triadic_census(df).collect()[0]
    assert (row["t0"], row["t1"], row["t2"], row["t3"]) == tuple(counts)
    assert row["n_vertices"] == len(verts) and row["n_edges"] == len(es)


DOC_TEXTS = st.lists(
    st.lists(st.sampled_from(list("abc")), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=6,
)


@given(texts=DOC_TEXTS)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicated_spans_matches_bruteforce(spark, texts):
    from flink_1_12_0_src_spark.pipeline.dedup import duplicated_spans

    W = 3
    docs = list(enumerate(texts))
    # brute force: hash every W-token window, find cross-doc duplicates,
    # count windows + distinct covered positions per doc
    wins = {}
    for i, t in docs:
        toks = t.split(" ")
        for p in range(len(toks) - W + 1):
            wins.setdefault(" ".join(toks[p : p + W]), []).append((i, p))
    dup = {g for g, occ in wins.items() if len({d for d, _ in occ}) >= 2}
    expect = {}
    for i, t in docs:
        toks = t.split(" ")
        hits = [p for g in dup for (d, p) in wins[g] if d == i]
        cov = {x for p in hits for x in range(p, p + W)}
        expect[i] = (len(toks), len(hits), len(cov))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["dup_tokens"])
        for r in duplicated_spans(df, "doc_id", "text", window=W).collect()
    }
    assert got == expect


# (user_id, seconds-offset, event_id) triples; ids unique by construction idx
EVENT_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 7200)),
    min_size=1,
    max_size=40,
)


@given(rows=EVENT_ROWS)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sessionize_matches_bruteforce(spark, rows):
    """Gap-based sessionization vs a straight Python reference on random
    event sets — pins the strict-> boundary (a gap of exactly 1800 s stays
    in-session) and the (ts, event_id) tiebreak."""
    import datetime

    from flink_1_12_0_src_spark.operators.analytics import sessionize_stats

    base = datetime.datetime(2024, 1, 1)
    data = [
        (u, base + datetime.timedelta(seconds=s), i)
        for i, (u, s) in enumerate(rows)
    ]
    sdf = spark.createDataFrame(data, "user_id bigint, ts timestamp, event_id bigint")
    got = {
        (r["user_id"], r["session_seq"]): (r["started_at"], r["n_events"], r["duration_sec"])
        for r in sessionize_stats(sdf, gap_sec=1800).collect()
    }
    # brute force: per user, sort by (ts, id), split where gap > 1800 s
    want = {}
    by_user: dict = {}
    for u, ts, i in sorted(data, key=lambda t: (t[0], t[1], t[2])):
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        seq, sess = 1, [tss[0]]
        for prev, cur in zip(tss, tss[1:]):
            if (cur - prev).total_seconds() > 1800:
                want[(u, seq)] = (sess[0], len(sess), int((sess[-1] - sess[0]).total_seconds()))
                seq, sess = seq + 1, [cur]
            else:
                sess.append(cur)
        want[(u, seq)] = (sess[0], len(sess), int((sess[-1] - sess[0]).total_seconds()))
    assert got == want


@given(rows=EVENT_ROWS)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_transition_matrix_matches_bruteforce(spark, rows):
    """First-order transition counts vs a Python reference — pins the
    per-user adjacency (no cross-user bigrams) and the (ts, id) ordering."""
    import datetime
    from collections import Counter

    from flink_1_12_0_src_spark.operators.analytics import transition_matrix

    base = datetime.datetime(2024, 1, 1)
    types = ["a", "b", "c"]
    data = [
        (u, base + datetime.timedelta(seconds=s), i, types[i % 3])
        for i, (u, s) in enumerate(rows)
    ]
    sdf = spark.createDataFrame(
        data, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in transition_matrix(sdf).collect()
    }
    want: Counter = Counter()
    by_user: dict = {}
    for u, ts, i, t in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        by_user.setdefault(u, []).append(t)
    for seq in by_user.values():
        want.update(zip(seq, seq[1:]))
    assert got == dict(want)


@given(rows=EVENT_ROWS)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_retention_cohorts_matches_bruteforce(spark, rows):
    """Weekly cohort retention vs a per-user Python reference — pins the
    ISO-Monday week truncation, the distinct-per-(user, week) counting, and
    the cohort-size normalization."""
    import datetime

    from flink_1_12_0_src_spark.operators.analytics import retention_cohorts

    base = datetime.datetime(2024, 1, 1)  # a Monday
    # spread offsets across ~6 weeks so cohorts and offsets both vary
    data = [
        (u, base + datetime.timedelta(seconds=s * 1800), i)
        for i, (u, s) in enumerate(rows)
    ]
    sdf = spark.createDataFrame(data, "user_id bigint, ts timestamp, event_id bigint")
    got = {
        (r["cohort_week"], r["week_offset"]): (r["n_active"], r["retention"])
        for r in retention_cohorts(sdf).collect()
    }
    act = {
        (u, (ts.date() - datetime.timedelta(days=ts.weekday())))
        for u, ts, _ in data
    }
    first = {}
    for u, wk in sorted(act):
        first.setdefault(u, wk)
    from collections import Counter

    counts: Counter = Counter()
    for u, wk in act:
        counts[(first[u], (wk - first[u]).days // 7)] += 1
    want = {
        (cw, off): (n, round(n / counts[(cw, 0)], 6))
        for (cw, off), n in counts.items()
    }
    assert got == want


# small word alphabet so paragraph blocks collide across docs with real
# probability; doc length up to ~3 blocks exercises tail paragraphs
PARA_TEXTS = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=40).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


@given(texts=PARA_TEXTS)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_paragraph_dedup_matches_bruteforce(spark, texts):
    """Paragraph near-dedup vs an exact Python twin (same md5 minhash math,
    banding, hot cap, cross-doc rule) on random low-entropy corpora — pins
    block splitting (incl. short tails), the <k-token no-signature drop,
    and the distinct-doc bucket condition."""
    from collections import defaultdict

    from flink_1_12_0_src_spark.pipeline.dedup import paragraph_dedup_report

    BLOCK, NH, K, ROWS, CAP = 8, 12, 3, 4, 256
    docs = list(enumerate(texts))
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_paragraphs"], r["n_dup_paragraphs"], r["dup_frac"])
        for r in paragraph_dedup_report(
            sdf, block=BLOCK, num_hashes=NH, shingle_k=K, band_rows=ROWS, max_bucket=CAP
        ).collect()
    }

    buckets, paras = _brute_para_buckets(docs, BLOCK, NH, K, ROWS)
    n_par = {i: len(paras[i]) for i, _ in docs}
    dup_p = set()
    for members in buckets.values():
        if len(members) <= CAP and len({d for d, _ in members}) >= 2:
            dup_p.update(members)
    nd = defaultdict(int)
    for d, _ in dup_p:
        nd[d] += 1
    want = {i: (n_par[i], nd[i], round(nd[i] / n_par[i], 6)) for i, _ in docs}
    assert got == want


def _brute_para_buckets(docs, block, nh, k, rows):
    """(band, bk) -> [(doc, pid)] buckets via the reference md5 minhash math
    — shared by the paragraph audit and rewrite brute-force twins."""
    import hashlib
    from collections import defaultdict

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    buckets = defaultdict(list)
    paras = {}
    for i, t in docs:
        w = t.lower().split(" ")
        nb = max(-(-len(w) // block), 1)
        paras[i] = [" ".join(w[pid * block : pid * block + block]) for pid in range(nb)]
        for pid in range(nb):
            pw = w[pid * block : pid * block + block]
            if len(pw) < k:
                continue
            sh = {" ".join(pw[g : g + k]) for g in range(len(pw) - k + 1)}
            sig = [
                min(md5(f"{s // 4}|{x}")[(s % 4) * 8 : (s % 4) * 8 + 8] for x in sh)
                for s in range(nh)
            ]
            for b in range(nh // rows):
                bk = md5("|".join(sig[b * rows : (b + 1) * rows]))
                buckets[(b, bk)].append((i, pid))
    return buckets, paras


@given(texts=PARA_TEXTS)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_paragraph_rewrite_matches_bruteforce(spark, texts):
    """Survivor REWRITE vs an exact Python twin — pins the deterministic
    keeper rule (per duplicated capped bucket the MIN doc id keeps its
    paragraph; cross-doc members of other docs drop), the within-doc-
    repetition-never-drops contract, and the pid-order text reassembly
    (including all-paragraphs-dropped docs reassembling to '')."""
    from flink_1_12_0_src_spark.pipeline.dedup import paragraph_dedup_rewrite

    BLOCK, NH, K, ROWS, CAP = 8, 12, 3, 4, 256
    docs = list(enumerate(texts))
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_paragraphs"], r["n_kept"], r["clean_text"])
        for r in paragraph_dedup_rewrite(
            sdf, block=BLOCK, num_hashes=NH, shingle_k=K, band_rows=ROWS, max_bucket=CAP
        ).collect()
    }
    buckets, paras = _brute_para_buckets(docs, BLOCK, NH, K, ROWS)
    drops = set()
    for members in buckets.values():
        if len(members) <= CAP and len({d for d, _ in members}) >= 2:
            keep_did = min(d for d, _ in members)
            drops.update((d, pid) for d, pid in members if d != keep_did)
    want = {}
    for i, _ in docs:
        kept = [p for pid, p in enumerate(paras[i]) if (i, pid) not in drops]
        want[i] = (len(paras[i]), len(kept), " ".join(kept))
    assert got == want


@given(texts=PARA_TEXTS)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_neardedup_keepfirst_matches_bruteforce(spark, texts):
    """Doc-level keep-first admission vs a Python twin — pins the order-free
    first-wins rule (admitted iff MIN id in every capped bucket occupied),
    the per-band dup-bucket counting, and the no-shingle-docs-admitted
    convention."""
    import hashlib
    from collections import defaultdict

    from flink_1_12_0_src_spark.pipeline.dedup import neardedup_keep_first

    NH, K, ROWS, CAP = 12, 3, 4, 256
    docs = list(enumerate(texts))
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_dup_buckets"], r["admitted"])
        for r in neardedup_keep_first(
            sdf, num_hashes=NH, shingle_k=K, band_rows=ROWS, max_bucket=CAP
        ).collect()
    }

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    buckets = defaultdict(list)
    doc_keys = defaultdict(list)
    for i, t in docs:
        w = t.lower().split(" ")
        if len(w) < K:
            continue  # no shingles -> no signature -> no buckets
        sh = {" ".join(w[g : g + K]) for g in range(len(w) - K + 1)}
        sig = [
            min(md5(f"{s // 4}|{x}")[(s % 4) * 8 : (s % 4) * 8 + 8] for x in sh)
            for s in range(NH)
        ]
        for b in range(NH // ROWS):
            bk = md5("|".join(sig[b * ROWS : (b + 1) * ROWS]))
            buckets[(b, bk)].append(i)
            doc_keys[i].append((b, bk))
    want = {}
    for i, _ in docs:
        n_dup = sum(
            1
            for key in doc_keys.get(i, [])
            if len(buckets[key]) <= CAP and min(buckets[key]) < i
        )
        want[i] = (n_dup, n_dup == 0)
    assert got == want


@given(texts=PARA_TEXTS)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_minhash_calibration_matches_bruteforce(spark, texts):
    """LSH calibration audit vs a Python twin — pins that est_jaccard is the
    signature-component agreement fraction, true_jaccard the exact distinct-
    shingle-set Jaccard, and that exactly the LSH candidate pairs appear."""
    import hashlib
    from itertools import combinations

    from flink_1_12_0_src_spark.pipeline.dedup import minhash_calibration_report

    NH, K, ROWS, CAP = 12, 3, 4, 256
    docs = list(enumerate(texts))
    sdf = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["est_jaccard"], r["true_jaccard"], r["abs_err"])
        for r in minhash_calibration_report(
            sdf, num_hashes=NH, shingle_k=K, band_rows=ROWS, max_bucket=CAP
        ).collect()
    }

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    sh_of, sig_of, buckets = {}, {}, {}
    for i, t in docs:
        w = t.lower().split(" ")
        if len(w) < K:
            continue
        sh = {" ".join(w[g : g + K]) for g in range(len(w) - K + 1)}
        sh_of[i] = sh
        sig_of[i] = [
            min(md5(f"{s // 4}|{x}")[(s % 4) * 8 : (s % 4) * 8 + 8] for x in sh)
            for s in range(NH)
        ]
        for b in range(NH // ROWS):
            bk = md5("|".join(sig_of[i][b * ROWS : (b + 1) * ROWS]))
            buckets.setdefault((b, bk), []).append(i)
    cands = set()
    for ids in buckets.values():
        if len(ids) <= CAP:
            cands.update((a, b) for a, b in combinations(sorted(ids), 2))
    want = {}
    for a, b in cands:
        est = round(sum(x == y for x, y in zip(sig_of[a], sig_of[b])) / NH, 6)
        inter = len(sh_of[a] & sh_of[b])
        true = round(inter / (len(sh_of[a]) + len(sh_of[b]) - inter), 6)
        want[(a, b)] = (est, true, round(abs(est - true), 6))
    assert got == want


@given(texts=PARA_TEXTS)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_neardedup_incremental_matches_bruteforce(spark, texts):
    """Incremental admission (incoming batch vs corpus snapshot) vs a Python
    twin — pins the two-part rule (a capped bucket with ANY corpus member
    rejects; otherwise min-batch-id wins), the separate corpus/batch dup
    counters, and that the combined bucket size drives the hot-bucket cap."""
    import hashlib
    from collections import defaultdict

    from flink_1_12_0_src_spark.pipeline.dedup import neardedup_incremental

    NH, K, ROWS, CAP = 12, 3, 4, 4  # tiny cap so hypothesis can hit it
    docs = list(enumerate(texts))
    corpus = [(i, t) for i, t in docs if i % 2 == 0]
    batch = [(i, t) for i, t in docs if i % 2 == 1]
    if not batch:
        return
    schema = "doc_id bigint, text string"
    got = {
        r["doc_id"]: (r["n_corpus_dup_buckets"], r["n_batch_dup_buckets"], r["admitted"])
        for r in neardedup_incremental(
            spark.createDataFrame(corpus or [(-(10**9), "")], schema),
            spark.createDataFrame(batch, schema),
            num_hashes=NH,
            shingle_k=K,
            band_rows=ROWS,
            max_bucket=CAP,
        ).collect()
    }

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    def keys(t: str):
        w = t.lower().split(" ")
        if len(w) < K:
            return []
        sh = {" ".join(w[g : g + K]) for g in range(len(w) - K + 1)}
        sig = [
            min(md5(f"{s // 4}|{x}")[(s % 4) * 8 : (s % 4) * 8 + 8] for x in sh)
            for s in range(NH)
        ]
        return [
            (b, md5("|".join(sig[b * ROWS : (b + 1) * ROWS])))
            for b in range(NH // ROWS)
        ]

    corp_in, batch_in = defaultdict(int), defaultdict(list)
    for i, t in corpus:
        if i < 0:
            continue  # placeholder row for the empty-corpus draw
        for key in keys(t):
            corp_in[key] += 1
    bkeys = {i: keys(t) for i, t in batch}
    for i, ks in bkeys.items():
        for key in ks:
            batch_in[key].append(i)
    want = {}
    for i, _ in batch:
        nc = nb = 0
        for key in bkeys[i]:
            if corp_in[key] + len(batch_in[key]) > CAP:
                continue
            if corp_in[key] > 0:
                nc += 1
            if min(batch_in[key]) < i:
                nb += 1
        want[i] = (nc, nb, nc + nb == 0)
    assert got == want


# (user, stage-index-or-other, seconds) — a TINY time domain (0..20 s) forces
# timestamp ties, and the 4th type value exercises non-funnel noise events;
# repeated and missing stages arise naturally from random draws
FUNNEL_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3), st.integers(0, 20)),
    min_size=1,
    max_size=40,
)


@given(rows=FUNNEL_ROWS)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_funnel_conversion_matches_bruteforce(spark, rows):
    """Strict-sequence funnel vs a per-user Python scan — pins the strict
    ``ts >`` qualification (a stage-N event at exactly the stage-(N-1)
    timestamp does NOT advance), MIN-of-qualifying per stage, and the
    NULL rates of an empty stage."""
    import datetime

    from flink_1_12_0_src_spark.operators.analytics import funnel_conversion

    stages = ("view", "click", "purchase")
    types = [*stages, "other"]
    base = datetime.datetime(2024, 1, 1)
    data = [
        (u, types[k], base + datetime.timedelta(seconds=s)) for u, k, s in rows
    ]
    sdf = spark.createDataFrame(data, "user_id bigint, event_type string, ts timestamp")
    got = {
        r["stage_idx"]: (r["stage"], r["n_users"], r["conv_from_prev"], r["conv_from_start"])
        for r in funnel_conversion(sdf).collect()
    }

    by_user: dict = {}
    for u, t, ts in data:
        by_user.setdefault(u, []).append((t, ts))
    counts = []
    prev: dict = {}
    for i, stage in enumerate(stages):
        nxt = {}
        for u, evs in by_user.items():
            if i > 0 and u not in prev:
                continue
            cand = [ts for t, ts in evs if t == stage and (i == 0 or ts > prev[u])]
            if cand:
                nxt[u] = min(cand)
        prev = nxt
        counts.append(len(nxt))

    def rate(n, d):
        return round(n / d, 6) if d else None

    for i, stage in enumerate(stages):
        n, p = counts[i], counts[i - 1] if i else counts[i]
        assert got[i + 1] == (stage, n, rate(n, p), rate(n, counts[0])), (
            i,
            counts,
            got,
        )


URL_PARTS = st.tuples(
    st.sampled_from(["http", "https", "HTTP", "HTTPS", "Http"]),
    st.sampled_from(["a.com", "A.Com", "sub.ex.org", "SUB.EX.ORG"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/x", "/x/", "/x/y", "/x/y//"]),
    st.lists(st.sampled_from(["a=1", "b=2", "c=", "z=9"]), max_size=3, unique=True),
    st.sampled_from(["", "#f", "#s2"]),
)


@given(parts=st.lists(URL_PARTS, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_url_normalize_properties(spark, parts):
    """url_normalize over generated messy URLs: (a) IDEMPOTENT — normalizing
    a normalized URL is a fixpoint (the defining property of a canonical
    form; a normalizer that isn't idempotent silently splits dup groups),
    (b) case/default-port/fragment/trailing-slash/param-order variants of
    the same resource collapse to ONE canonical form, (c) non-default ports
    are preserved."""
    from flink_1_12_0_src_spark.pipeline.dedup import url_normalize

    urls = [
        f"{sch}://{host}{port}{path}" + ("?" + "&".join(q) if q else "?a=1") + frag
        for sch, host, port, path, q, frag in parts
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    one = df.select(url_normalize("url").alias("n1"))
    two = one.select(F.col("n1").alias("url")).select(
        url_normalize("url").alias("n2")
    )
    n1 = [r["n1"] for r in one.collect()]
    n2 = [r["n2"] for r in two.collect()]
    assert n1 == n2  # idempotence
    for u, n in zip(urls, n1):
        assert "#" not in n
        sch = u.split("://")[0].lower()
        assert n.startswith(sch + "://")
        if ":8080" in u:
            assert ":8080" in n  # non-default port preserved
        elif f"{sch}:" == "http:" and ":80" in u:
            assert ":80" not in n  # scheme default stripped
        elif f"{sch}:" == "https:" and ":443" in u:
            assert ":443" not in n
        elif ":80" in u or ":443" in u:
            # a default-looking port on the OTHER scheme is non-default
            assert ":80" in n or ":443" in n


def test_url_normalize_collapses_cosmetic_variants(spark):
    """All cosmetic spellings of one resource → one canonical URL."""
    from flink_1_12_0_src_spark.pipeline.dedup import url_normalize

    variants = [
        "http://A.com/x/y?b=2&a=1#frag",
        "HTTP://a.COM:80/x/y/?a=1&b=2",
        "Http://a.com/x/y//?b=2&a=1#other",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    got = {r[0] for r in df.select(url_normalize("url")).collect()}
    assert got == {"http://a.com/x/y?a=1&b=2"}


def _py_bpe_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right single-pass BPE merge."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=12
    ),
    pair=st.tuples(st.text(alphabet="abc", min_size=1, max_size=2),
                   st.text(alphabet="abc", min_size=1, max_size=2)),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_merge_fold_matches_python_reference(spark, pair, words):
    """The delimited-string merge fold (pipeline/text.py _bpe_merge_fold)
    must equal the plain-Python greedy single-pass merge on arbitrary
    symbol sequences and an arbitrary merge pair — including overlapping
    chains (aaa + (a,a) → [aa, a]) and pairs where the merged symbol
    equals a following symbol."""
    from flink_1_12_0_src_spark.pipeline.text import BPE_SEP, _bpe_merge_fold

    a, b = pair
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = (
        df.select(
            "w",
            F.filter(
                F.split(
                    _bpe_merge_fold(
                        F.transform(
                            F.sequence(F.lit(1), F.length("w")),
                            lambda i: F.substring(F.col("w"), i, 1),
                        ),
                        F.lit(a),
                        F.lit(b),
                    ),
                    BPE_SEP,
                ),
                lambda x: x != "",
            ).alias("s"),
        )
        .collect()
    )
    for r in got:
        assert r["s"] == _py_bpe_merge(list(r["w"]), a, b), (r["w"], a, b)


@given(texts=DOC_TEXTS)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_substring_rewrite_matches_bruteforce(spark, texts):
    """Brute-force twin of the ExactSubstr survivor rewrite: per cross-doc
    duplicated W-window, the (MIN doc, MIN pos) occurrence keeps its
    positions; every other occurrence's positions are removed; survivors
    reassemble in order."""
    from flink_1_12_0_src_spark.pipeline.dedup import exact_substring_rewrite

    W = 3
    docs = list(enumerate(texts))
    wins: dict[str, list[tuple[int, int]]] = {}
    for i, t in docs:
        toks = t.split(" ")
        for p in range(len(toks) - W + 1):
            wins.setdefault(" ".join(toks[p : p + W]), []).append((i, p))
    removed: dict[int, set[int]] = {i: set() for i, _ in docs}
    for occ in wins.values():
        if len({d for d, _ in occ}) < 2:
            continue
        keeper = min(occ)
        for d, p in occ:
            if (d, p) != keeper:
                removed[d].update(range(p, p + W))
    expect = {}
    for i, t in docs:
        toks = t.split(" ")
        kept = [w for p, w in enumerate(toks) if p not in removed[i]]
        expect[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in exact_substring_rewrite(df, "doc_id", "text", window=W).collect()
    }
    assert got == expect


@given(texts=DOC_TEXTS)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_substring_span_stats_matches_bruteforce(spark, texts):
    """Brute-force twin of the maximal-span ExactSubstr audit: the removed
    position set is the rewrite's (keeper = (MIN doc, MIN pos) per
    duplicated W-window, coverage union of the rest); spans are its maximal
    contiguous runs. n_removed must equal the rewrite's by construction
    (shared removed_positions relation)."""
    from flink_1_12_0_src_spark.pipeline.dedup import substring_span_stats

    W = 3
    docs = list(enumerate(texts))
    wins: dict[str, list[tuple[int, int]]] = {}
    for i, t in docs:
        toks = t.split(" ")
        for p in range(len(toks) - W + 1):
            wins.setdefault(" ".join(toks[p : p + W]), []).append((i, p))
    removed: dict[int, set[int]] = {i: set() for i, _ in docs}
    for occ in wins.values():
        if len({d for d, _ in occ}) < 2:
            continue
        keeper = min(occ)
        for d, p in occ:
            if (d, p) != keeper:
                removed[d].update(range(p, p + W))
    expect = {}
    for i, t in docs:
        toks = t.split(" ")
        spans: list[int] = []
        prev = None
        for p in sorted(removed[i]):
            if prev is not None and p == prev + 1:
                spans[-1] += 1
            else:
                spans.append(1)
            prev = p
        expect[i] = (
            len(toks),
            len(spans),
            sum(spans),
            max(spans, default=0),
            (sum(spans) / len(spans)) if spans else 0.0,
        )
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in substring_span_stats(df, "doc_id", "text", window=W).collect()
    }
    assert set(got) == set(expect)
    for i, (nt, ns, nr, mx, avg) in expect.items():
        r = got[i]
        assert (r["n_tokens"], r["n_spans"], r["n_removed"], r["max_span_len"]) == (
            nt, ns, nr, mx,
        ), i
        assert abs(r["avg_span_len"] - avg) < 1e-6, i
